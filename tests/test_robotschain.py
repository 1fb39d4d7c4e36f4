"""Batch 91 planted tests: the chain's hop kernels individually — the
robotparser really extracts Sitemap: directives, the gate really consults
Disallow rules, and the census's /private/ accounting holds."""

import pytest

from omni_ray.pipelines.robotschain import _RobotsGate
from omni_ray.state.robots import parse_robots


def test_site_maps_extraction():
    rp = parse_robots(
        "User-agent: *\nDisallow: /private/\n"
        "Sitemap: https://x.test/sm-0.xml\nSitemap: https://x.test/sm-1.xml\n")
    assert rp.site_maps() == ["https://x.test/sm-0.xml",
                              "https://x.test/sm-1.xml"]
    assert parse_robots("User-agent: *\nAllow: /\n").site_maps() is None


def test_gate_blocks_private_paths():
    import pyarrow as pa

    gate = _RobotsGate({"x.test": "User-agent: *\nDisallow: /private/\n"})
    t = pa.table({
        "host": pa.array(["x.test", "x.test", "y.test"], pa.string()),
        "url": pa.array(["https://x.test/private/1", "https://x.test/a/1",
                         "https://y.test/private/1"], pa.string()),
    })
    got = gate(t).column("allowed").to_pylist()
    assert got == [False, True, True]  # unknown host -> allow-all


@pytest.mark.usefixtures("ray_session")
def test_chain_census_private_accounting():
    from omni_ray.pipelines.robotschain import robots_sitemap_chain

    t = robots_sitemap_chain("/root/testdata/sf0.001").to_pandas()
    assert len(t) == 6
    assert (t["n_allowed"] <= t["n_urls_listed"]).all()
    blocked = int((t["n_urls_listed"] - t["n_allowed"]).sum())
    import pyarrow.parquet as pq

    n_docs = pq.read_metadata(
        "/root/testdata/sf0.001/documents.parquet").num_rows
    assert blocked == sum(1 for i in range(n_docs) if i % 7 == 0)
    assert t["n_sitemaps"].tolist() == [1 + h % 3 for h in range(6)]

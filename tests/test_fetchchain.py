"""Batch 87 planted tests: every branch of the scripted two-engine chain hit
explicitly through the REAL FallbackChainBackend, and the wait histogram
reconciled against the batch-86 queue closed form."""

import pytest

from omni_ray.pipelines.fetchchain import _scripted_chain_factory


@pytest.mark.parametrize("doc_id,engine,status", [
    (5, "engine_b", 599),    # A timeout -> B error -> terminal 599
    (16, "engine_b", 408),   # A error -> B timeout -> terminal 408
    (0, "engine_b", 200),    # A timeout -> B serves
    (1, "engine_b", 200),    # A error -> B serves
    (2, "engine_b", 200),    # A empty-200 (unusable) -> B serves
    (3, "engine_a", 200),    # A serves; B's %20==... rows never reach B here
    (4, "engine_a", 200),
    (25, "engine_b", 599),   # the %20 cycle repeats
    (36, "engine_b", 408),
])
def test_chain_branches(doc_id, engine, status):
    chain = _scripted_chain_factory()
    r = chain.fetch_one(f"https://h{doc_id % 3}.chain.test/p-{doc_id}", 1.0)
    assert (r.engine, r.status) == (engine, status)
    if status == 200:
        assert r.html  # usable means non-empty
    else:
        assert r.html is None


def test_empty_200_falls_through_not_accepted():
    """The unusable-empty rule specifically: id % 5 == 2 must NOT be served
    by engine A even though A returned HTTP 200."""
    chain = _scripted_chain_factory()
    r = chain.fetch_one("https://h2.chain.test/p-2", 1.0)
    assert r.engine == "engine_b" and r.html == b"<html>b</html>"


@pytest.mark.usefixtures("ray_session")
def test_wait_histogram_matches_queue_closed_form():
    """The per-host wait histogram from the REAL crawl artifacts equals the
    histogram of w_k - a_k from the batch-86 closed form."""
    from collections import Counter

    from omni_ray.pipelines.fetchchain import crawl_wait_histogram
    from tests.test_contcrawl import _closed_form

    got = crawl_wait_histogram("/root/testdata/sf0.001").to_pandas()
    ids = __import__("pyarrow.parquet", fromlist=["pq"]).read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id"]
    ).column("doc_id").to_pylist()
    budget = max(16, len(ids) // 30)
    want = Counter()
    for h in range(5):
        rows = sorted((i % 4, i) for i in ids if i % 5 == h)
        arrivals = [a for a, _ in rows]
        for a, w in zip(arrivals, _closed_form(arrivals, budget)):
            want[(f"c{h}.example.net", w - a)] += 1
    got_c = {(r.host, r.waited): r.n for r in got.itertuples()}
    assert got_c == dict(want)
    assert (got["waited"] >= 0).all()
    assert got["n"].sum() == len(ids)

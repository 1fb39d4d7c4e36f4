"""Batch 88 planted tests: rendezvous router minimal-disruption properties
(brute-force HRW replay; moved keys land ONLY on the new shard; stable keys
never move) and the two-hop sitemap-index fanout on a planted universe."""

import hashlib

import numpy as np
import pytest

from omni_ray.state.filters import rendezvous_shard


def _brute_hrw(h: str, n: int) -> int:
    best, best_w = 0, -1
    for s in range(n):
        w = int.from_bytes(
            hashlib.md5(f"{h}#{s}".encode()).digest()[:4], "big")
        if w > best_w:
            best, best_w = s, w
    return best


def test_rendezvous_matches_bruteforce_and_minimal_disruption():
    hexes = [hashlib.md5(f"key-{i}".encode()).hexdigest() for i in range(500)]
    for n in (2, 4, 5, 8):
        got = rendezvous_shard(hexes, n)
        assert got.tolist() == [_brute_hrw(h, n) for h in hexes]
        assert set(got.tolist()) <= set(range(n))
    # growth N -> N+1: every moved key moves TO the new shard; nothing else
    for n in (2, 4, 7):
        old = rendezvous_shard(hexes, n)
        new = rendezvous_shard(hexes, n + 1)
        moved = old != new
        assert (new[moved] == n).all()
        # and the moved fraction is ~1/(n+1) (binomial tolerance)
        frac = moved.mean()
        assert abs(frac - 1 / (n + 1)) < 0.08
    assert rendezvous_shard([], 4).shape == (0,)


def test_mod_router_is_a_full_reshuffle_by_contrast():
    hexes = [hashlib.md5(f"key-{i}".encode()).hexdigest() for i in range(2000)]
    pref = np.array([int(h[:8], 16) for h in hexes], dtype=np.uint64)
    moved = (pref % 4 != pref % 5).mean()
    assert moved > 0.7  # ~4/5 of the keyspace relocates under mod growth
    hrw_moved = (rendezvous_shard(hexes, 4) != rendezvous_shard(hexes, 5)).mean()
    assert hrw_moved < 0.3  # ~1/5 under rendezvous


@pytest.mark.usefixtures("ray_session")
def test_sitemap_index_fanout_planted():
    """126 urls for one source -> ceil(126/50) = 3 sub-sitemaps covering
    50+50+26 pages, parsed by the REAL parser through both hops."""
    from omni_ray.pipelines.shardops import sitemap_index_fanout

    t = sitemap_index_fanout("/root/testdata/sf0.001").to_pandas()
    assert (t["n_subsitemaps"] == (t["n_pages"] + 49) // 50).all()
    assert t["n_pages"].sum() > 0
    # the universe is per-doc: total pages == total docs
    import pyarrow.parquet as pq

    n_docs = pq.read_metadata(
        "/root/testdata/sf0.001/documents.parquet").num_rows
    assert t["n_pages"].sum() == n_docs

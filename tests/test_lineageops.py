"""Batch 89 planted tests: the counter books must balance wave over wave,
and the robots run must never mark a blocked url seen (the re-discovery
double-count subtlety the census closed form encodes)."""

import pyarrow.parquet as pq
import pytest


@pytest.mark.usefixtures("ray_session")
def test_counter_books_balance():
    from omni_ray.pipelines.lineageops import crawl_counter_lineage

    t = crawl_counter_lineage("/root/testdata/sf0.001").to_pandas()
    n_docs = pq.read_metadata(
        "/root/testdata/sf0.001/documents.parquet").num_rows
    n_dups = sum(1 for i in range(n_docs) if i % 3 == 0)
    # conservation: every original is scheduled exactly once
    assert t["n_scheduled"].sum() == n_docs
    # all fetches miss (empty pages store)
    assert (t["fetch_missed"] == t["n_scheduled"]).all()
    # fresh counts each original once per wave it sits in the frontier:
    # sum(fresh) = sum over rows of (wave - arrival + 1)
    from omni_ray.pipelines.fetchchain import crawl_wait_histogram

    waits = crawl_wait_histogram("/root/testdata/sf0.001").to_pandas()
    expected_fresh = int((waits["waited"] * waits["n"]).sum() + waits["n"].sum())
    assert t["fresh"].sum() == expected_fresh
    # discovered = cycle-1..3 arrivals + the planted dups
    arrivals_123 = sum(1 for i in range(n_docs) if i % 4 in (1, 2, 3))
    assert t["discovered"].sum() == arrivals_123 + n_dups
    # frontier_in = fresh + dups at wave 3 (the only non-fresh entrants)
    assert (t["frontier_in"] - t["fresh"]).sum() == n_dups


@pytest.mark.usefixtures("ray_session")
def test_blocked_urls_are_not_marked_seen():
    """The double-count case: a blocked url re-discovered in cycle 3 must be
    counted blocked again (it was never seen), except same-cycle pairs which
    dedup first."""
    from omni_ray.pipelines.lineageops import continuous_robots_block_census

    t = continuous_robots_block_census("/root/testdata/sf0.001").to_pandas()
    n_docs = pq.read_metadata(
        "/root/testdata/sf0.001/documents.parquet").num_rows
    ids = range(n_docs)
    c0 = [i for i in ids if i % 5 == 0]
    redisc = [i for i in ids if i % 15 == 0 and i % 4 != 3]
    # total blocked = every c0 original once + early-cycle re-discoveries
    assert t["robots_blocked"].sum() == len(c0) + len(redisc)
    assert t.loc[t["wave"] == 3, "robots_blocked"].iloc[0] == (
        sum(1 for i in c0 if i % 4 == 3) + len(redisc))
    # hosts 1..4 fully scheduled, c0 never
    assert t["n_scheduled"].sum() == n_docs - len(c0)

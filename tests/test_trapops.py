"""Batch 96 planted tests: the planted calendar trap is flagged with exact
span stats; organic templates (sparse page sets) never are."""

import pytest


@pytest.mark.usefixtures("ray_session")
def test_trap_flagged_organic_not():
    import pyarrow.parquet as pq

    from omni_ray.pipelines.trapops import crawl_trap_detector

    t = crawl_trap_detector("/root/testdata/sf0.001").to_pandas()
    assert len(t) == 1  # only the planted trap
    row = t.iloc[0]
    assert row["source"] == "caltrap"
    assert row["template"].endswith("/cal/day-N")
    n_docs = pq.read_metadata(
        "/root/testdata/sf0.001/documents.parquet").num_rows
    expected = min((n_docs + 4) // 5, 1000)
    assert row["n_pages"] == expected
    assert row["min_page"] == 0
    assert row["max_page"] == expected - 1  # dense: span == count

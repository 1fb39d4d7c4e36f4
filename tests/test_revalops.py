"""Batch 92 planted test: the plan's books — refetch + revalidated
partition every doc, and ppm arithmetic is exact-integer."""

import pyarrow.parquet as pq
import pytest


@pytest.mark.usefixtures("ray_session")
def test_conditional_get_plan_books():
    from omni_ray.pipelines.revalops import conditional_get_plan

    t = conditional_get_plan("/root/testdata/sf0.001").to_pandas()
    n_docs = pq.read_metadata(
        "/root/testdata/sf0.001/documents.parquet").num_rows
    assert (t["n_refetch"] + t["n_revalidated"]).sum() == n_docs
    expected_changed = sum(1 for i in range(n_docs) if i % 5 < 2)
    assert t["n_refetch"].sum() == expected_changed
    total = t["bytes_fetched"] + t["bytes_saved"]
    assert (t["saved_ppm"] == (t["bytes_saved"] * 1_000_000) // total).all()
    assert (t["saved_ppm"] <= 1_000_000).all()

"""Batch-19 semantic invariants beyond oracle frame-equality: the join-size
audit equals the materialized join's row count, equi-depth buckets cover all
rows with near-equal depths, the fanout histogram accounts for every order
including childless ones, and clustering strictly improves zone-map pruning
on this data."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from omni_ray.pipelines.planstats import (
    _EQD_BUCKETS,
    _ZM_FRAG,
    _ZM_T,
    cardinality_fanout_audit,
    histogram_equi_depth,
    join_size_audit,
    zone_map_cluster_audit,
)

SF = "/root/testdata/sf0.001"


@pytest.mark.usefixtures("ray_session")
def test_join_size_equals_materialized_join():
    out = join_size_audit(SF).to_pandas().iloc[0]
    orders = pq.read_table(f"{SF}/orders.parquet",
                           columns=["o_custkey"]).to_pandas()
    cust = pq.read_table(f"{SF}/customer.parquet",
                         columns=["c_custkey"]).to_pandas()
    joined = orders.merge(cust, left_on="o_custkey", right_on="c_custkey")
    assert int(out["exact_size"]) == len(joined)
    assert int(out["err"]) == int(out["exact_size"]) - int(out["est_size"])
    keys = set(orders["o_custkey"]) | set(cust["c_custkey"])
    assert int(out["n_keys"]) == len(keys)


@pytest.mark.usefixtures("ray_session")
def test_equi_depth_covers_all_rows_near_equally():
    out = histogram_equi_depth(SF).to_pandas()
    orders = pq.read_table(f"{SF}/orders.parquet",
                           columns=["o_totalprice"]).to_pandas()
    cents = np.floor(orders["o_totalprice"].to_numpy() * 100 + 0.5) \
        .astype(np.int64)
    n = len(cents)
    assert int(out["n_rows"].sum()) == n
    assert (out["hi"].to_numpy()[:-1] <= out["hi"].to_numpy()[1:]).all()
    assert int(out["hi"].iloc[-1]) == int(cents.max())
    # depth deviates from n/k by at most the largest tie group
    max_tie = int(pd.Series(cents).value_counts().max())
    assert (abs(out["n_rows"] - n // _EQD_BUCKETS) <= max_tie + 1).all()
    # boundary i is exactly the (i*n//k)-th smallest value
    v = np.sort(cents)
    for i, hi in zip(out["bucket"], out["hi"]):
        assert int(hi) == int(v[max(1, i * n // _EQD_BUCKETS) - 1])


@pytest.mark.usefixtures("ray_session")
def test_fanout_accounts_for_every_order():
    out = cardinality_fanout_audit(SF).to_pandas()
    orders = pq.read_table(f"{SF}/orders.parquet",
                           columns=["o_orderkey"]).to_pandas()
    lines = pq.read_table(f"{SF}/lineitem.parquet",
                          columns=["l_orderkey"]).to_pandas()
    assert int(out["n_orders"].sum()) == len(orders)
    per = lines.groupby("l_orderkey").size()
    fan = per.reindex(orders["o_orderkey"], fill_value=0)
    want = fan.value_counts().sort_index()
    got = out.set_index("fanout")["n_orders"]
    assert dict(got) == {int(k): int(v) for k, v in want.items()}
    # weighted fanout must reproduce the lineitem row count
    assert int((out["fanout"] * out["n_orders"]).sum()) == len(lines)


@pytest.mark.usefixtures("ray_session")
def test_clustering_improves_zone_map_pruning():
    out = zone_map_cluster_audit(SF).to_pandas().set_index("layout")
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["n_chars"]).to_pandas()
    n_match = int((docs["n_chars"] > _ZM_T).sum())
    assert (out["match_rows"] == n_match).all()  # layout never changes hits
    # clustered layout: all-skippable rows below the threshold boundary
    nc = np.sort(docs["n_chars"].to_numpy())
    full_frags_below = int(np.searchsorted(nc, _ZM_T, side="right")) // _ZM_FRAG
    assert int(out.loc["clustered", "pruned_frags"]) == full_frags_below
    assert int(out.loc["clustered", "skipped_rows"]) \
        == full_frags_below * _ZM_FRAG
    # on this (uncorrelated) data, clustering strictly beats native
    assert int(out.loc["clustered", "skipped_rows"]) \
        > int(out.loc["native", "skipped_rows"])

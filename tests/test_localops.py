"""Batch-63 semantic invariants beyond oracle frame-equality: a planted
topically-sorted corpus decays in similarity with distance while copies
at distance 1 read full Jaccard; the depth curve partitions users and a
planted heavy-user cohort converts at its exact rate; parity imbalance
is exactly the planted skew."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from omni_ray.pipelines.localops import (
    depth_conversion_curve,
    doc_distance_similarity,
    parity_split_audit,
)

SF = "/root/testdata/sf0.001"


@pytest.mark.usefixtures("ray_session")
def test_distance_decay_planted(tmp_path):
    # pairs of identical docs at adjacent ids, different across pairs:
    # distance 1 pairs alternate identical/disjoint -> mean = 500000;
    # distance 10 pairs all disjoint -> 0
    def span(tag):
        return " ".join(tag + chr(ord("a") + i) for i in range(9))

    texts, ids = [], []
    for p in range(10):
        t = span("q" + chr(ord("a") + p))
        texts += [t, t]
        ids += [2 * p, 2 * p + 1]
    pq.write_table(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts),
    }), str(tmp_path / "documents.parquet"))
    out = doc_distance_similarity(str(tmp_path))
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    g = out.set_index("distance")
    # distance 1: pairs (0,1),(1,2),... = 19 pairs; 10 identical
    # (even->odd within a duplicate pair), 9 disjoint
    assert int(g.loc[1, "n_pairs"]) == 19
    assert int(g.loc[1, "mean_jaccard_ppm"]) == 10 * 1_000_000 // 19
    assert int(g.loc[10, "mean_jaccard_ppm"]) == 0


@pytest.mark.usefixtures("ray_session")
def test_depth_curve_partitions(tmp_path):
    out = depth_conversion_curve(SF)
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    assert int(out["n_users"].sum()) == ev["user_id"].nunique()
    # planted: 3 users with 12 events each (band 2), 2 of them buy
    rows = []
    eid = 0
    for u in range(3):
        for i in range(12):
            et = "purchase" if (u < 2 and i == 0) else "click"
            rows.append((eid, i, u, et))
            eid += 1
    pq.write_table(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array(pd.to_datetime([r[1] for r in rows], unit="s"),
                       pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows]),
        "value": pa.array([1.0] * len(rows), pa.float64()),
    }), str(tmp_path / "events.parquet"))
    p = depth_conversion_curve(str(tmp_path))
    p = p.to_pandas() if not isinstance(p, pd.DataFrame) else p
    r = p.set_index("band").loc[2]
    assert int(r["n_users"]) == 3
    assert int(r["buy_ppm"]) == 2 * 1_000_000 // 3


@pytest.mark.usefixtures("ray_session")
def test_parity_planted_skew(tmp_path):
    # 8 events on even seconds, 2 on odd -> imbalance 600 milli
    secs = [0, 2, 4, 6, 8, 10, 12, 14, 1, 3]
    n = len(secs)
    pq.write_table(pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array(pd.to_datetime(secs, unit="s"), pa.timestamp("us")),
        "user_id": pa.array([0] * n, pa.int64()),
        "event_type": pa.array(["click"] * n),
        "value": pa.array([1.0] * n, pa.float64()),
    }), str(tmp_path / "events.parquet"))
    out = parity_split_audit(str(tmp_path))
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    r = out.iloc[0]
    assert int(r["n_even"]) == 8 and int(r["n_odd"]) == 2
    assert int(r["imbalance_milli"]) == 600

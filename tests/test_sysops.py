"""Batch-44 semantic invariants beyond oracle frame-equality: the
learned-index audit reads all-zero error on dense ids and flags a
planted cluster/outlier layout with exact max error; triplet violations
replay brute-force on a planted geometry; seasonal-naive MAE is zero on
a pure period-7 series; MUS hits sum to exactly K, every selected order
straddles a sampling point, and a planted giant order absorbs multiple
hits."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from omni_ray.pipelines.sysops import (
    _MUS_K,
    learned_index_audit,
    monetary_unit_sample,
    seasonal_naive_mae,
    triplet_violation_audit,
)

SF = "/root/testdata/sf0.001"


@pytest.mark.usefixtures("ray_session")
def test_learned_index_dense_zero_and_planted_error(tmp_path):
    # dense 0..99: interpolation is exact -> all band 0, max_err 0
    pq.write_table(pa.table({
        "doc_id": pa.array(range(100), pa.int64()),
    }), str(tmp_path / "documents.parquet"))
    z = learned_index_audit(str(tmp_path))
    z = z.to_pandas() if not isinstance(z, pd.DataFrame) else z
    assert list(z["band"]) == [0]
    assert int(z["max_err"].iloc[0]) == 0
    # clustered 0..98 + outlier at 10000: the cluster's predicted ranks
    # collapse toward 0 -> large errors
    pq.write_table(pa.table({
        "doc_id": pa.array(list(range(99)) + [10_000], pa.int64()),
    }), str(tmp_path / "documents.parquet"))
    p = learned_index_audit(str(tmp_path))
    p = p.to_pandas() if not isinstance(p, pd.DataFrame) else p
    ids = np.array(list(range(99)) + [10_000], np.int64)
    ranks = np.arange(100)
    pred = (ids - 0) * 99 // 10_000
    want_max = int(np.abs(pred - ranks).max())
    assert int(p["max_err"].iloc[0]) == want_max
    assert want_max > 50


@pytest.mark.usefixtures("ray_session")
def test_triplet_violations_planted(tmp_path):
    # 6 vectors: triplets at anchors 0..3; make anchor 0's positive
    # nearer (no violation) and anchor 3's positive farther (violation)
    def vec(x):
        return [float(x)] + [0.0] * 63

    vecs = [vec(0), vec(1), vec(9),    # a=0: p at d=1, n at d=9 -> ok
            vec(9), vec(9), vec(0)]    # a=3: p at d=0? labels decide
    labels = [0, 0, 1,                  # triplet at 0: (0,0,1) valid
              2, 2, 3]                  # triplet at 3: (2,2,3) valid
    # a=3: qa=9, qp=9 (d=0) vs qn=0 (d=81): no violation. flip it:
    vecs[4] = vec(20)                   # qp now at d=11 > d(qn)=9: violates
    pq.write_table(pa.table({
        "vec_id": pa.array(range(6), pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    }), str(tmp_path / "embeddings.parquet"))
    out = triplet_violation_audit(str(tmp_path))
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    r = out.iloc[0]
    assert int(r["n_triplets"]) == 2
    assert int(r["violations"]) == 1
    assert int(r["violation_ppm"]) == 500_000


@pytest.mark.usefixtures("ray_session")
def test_seasonal_naive_zero_on_periodic(tmp_path):
    days, types = [], []
    for d in range(28):
        c = 5 + (d % 7)  # pure period-7 pattern
        days += [d] * c
        types += ["click"] * c
    n = len(days)
    pq.write_table(pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array(pd.to_datetime(np.asarray(days) * 86_400, unit="s"),
                       pa.timestamp("us")),
        "user_id": pa.array([0] * n, pa.int64()),
        "event_type": pa.array(types),
        "value": pa.array([1.0] * n, pa.float64()),
    }), str(tmp_path / "events.parquet"))
    out = seasonal_naive_mae(str(tmp_path))
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    assert int(out["mae_milli"].iloc[0]) == 0
    real = seasonal_naive_mae(SF)
    real = real.to_pandas() if not isinstance(real, pd.DataFrame) else real
    assert (real["mae_milli"] >= 0).all()


@pytest.mark.usefixtures("ray_session")
def test_mus_hits_sum_and_giant_order(tmp_path):
    out = monetary_unit_sample(SF)
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    orders = pq.read_table(f"{SF}/orders.parquet").to_pandas() \
        .sort_values("o_orderkey")
    cents = np.floor(orders["o_totalprice"].to_numpy() * 100
                     + 0.5).astype(np.int64)
    assert int(out["n_hits"].sum()) == _MUS_K
    # replay: every selected order straddles >= 1 multiple of T
    total = int(cents.sum())
    t_int = total // _MUS_K
    cum = np.cumsum(cents)
    start = cum - cents
    keys = orders["o_orderkey"].to_numpy(np.int64)
    sel = dict(zip(out["o_orderkey"], out["n_hits"]))
    for i, k in enumerate(keys):
        h = min(int(cum[i]) // t_int, _MUS_K) \
            - int(start[i]) // t_int
        want = h if (h > 0 and int(start[i]) // t_int < _MUS_K) else 0
        assert sel.get(int(k), 0) == want
    # planted: one giant order (60% of total) absorbs many hits
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3], pa.int64()),
        "o_totalprice": pa.array([10.0, 300.0, 190.0], pa.float64()),
    }), str(tmp_path / "orders.parquet"))
    g = monetary_unit_sample(str(tmp_path))
    g = g.to_pandas() if not isinstance(g, pd.DataFrame) else g
    assert int(g["n_hits"].sum()) == _MUS_K
    assert int(g.set_index("o_orderkey").loc[2, "n_hits"]) >= 10

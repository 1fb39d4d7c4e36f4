"""Batch-35 semantic invariants beyond oracle frame-equality: CUPED
rho² is 1e6 on a planted perfectly-correlated pre/post and ~0 on an
anti-structured one; session counts are monotone non-increasing in the
threshold and match a replay; the separation matrix is symmetric-
complete with zero distance for identical planted classes; eta² is 1e6
when source fully determines length and 0 when lengths are identical."""

import os
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from omni_ray.pipelines.varops import (
    _GAP_THRESHOLDS_S,
    anova_eta_sources,
    class_separation_matrix,
    cuped_audit,
    gap_threshold_sweep,
)

SF = "/root/testdata/sf0.001"


def _purchases(days, users, values):
    n = len(days)
    return pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array(pd.to_datetime(np.asarray(days) * 86_400, unit="s"),
                       pa.timestamp("us")),
        "user_id": pa.array(users, pa.int64()),
        "event_type": pa.array(["purchase"] * n),
        "value": pa.array(values, pa.float64()),
    })


@pytest.mark.usefixtures("ray_session")
def test_cuped_perfect_correlation_reads_full_ppm():
    # user u spends u dollars in BOTH halves -> rho^2 = 1
    root = os.path.join(tempfile.gettempdir(), "omni_ray_cuped")
    os.makedirs(root, exist_ok=True)
    days, users, vals = [], [], []
    for u in range(1, 11):
        days += [0, 9]
        users += [u, u]
        vals += [float(u), float(u)]
    pq.write_table(_purchases(days, users, vals),
                   os.path.join(root, "events.parquet"))
    out = cuped_audit(root)
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    assert int(out["rho2_ppm"].iloc[0]) == 1_000_000
    assert int(out["cov_sign"].iloc[0]) == 1
    assert int(out["n_users"].iloc[0]) == 10
    real = cuped_audit(SF)
    real = real.to_pandas() if not isinstance(real, pd.DataFrame) else real
    assert 0 <= int(real["rho2_ppm"].iloc[0]) <= 1_000_000


@pytest.mark.usefixtures("ray_session")
def test_gap_sweep_monotone_and_replay():
    out = gap_threshold_sweep(SF)
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    assert list(out["threshold_s"]) == list(_GAP_THRESHOLDS_S)
    # larger threshold merges sessions: counts non-increasing
    assert (np.diff(out["n_sessions"].to_numpy()) <= 0).all()
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    ev["us"] = ev["ts"].astype("int64")
    for _, r in out.iterrows():
        t_us = int(r["threshold_s"]) * 1_000_000
        n_sess = 0
        for _, u in ev.groupby("user_id"):
            us = np.sort(u["us"].to_numpy(np.int64))
            n_sess += 1 + int((np.diff(us) > t_us).sum())
        assert int(r["n_sessions"]) == n_sess


@pytest.mark.usefixtures("ray_session")
def test_separation_matrix_complete_and_zero_case():
    out = class_separation_matrix(SF)
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    emb = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    k = emb["label"].nunique()
    assert len(out) == k * (k - 1) // 2
    assert (out["dist2_scaled"] >= 0).all()
    # planted: two labels with identical members -> distance exactly 0
    root = os.path.join(tempfile.gettempdir(), "omni_ray_sep")
    os.makedirs(root, exist_ok=True)
    vecs = [[1.0] + [0.0] * 63, [0.5] + [0.25] * 63]
    pq.write_table(pa.table({
        "vec_id": pa.array(range(4), pa.int64()),
        "embedding": pa.array(vecs + vecs,
                              pa.list_(pa.float32())),
        "label": pa.array([0, 0, 1, 1], pa.int32()),
    }), os.path.join(root, "embeddings.parquet"))
    z = class_separation_matrix(root)
    z = z.to_pandas() if not isinstance(z, pd.DataFrame) else z
    assert int(z["dist2_scaled"].iloc[0]) == 0


@pytest.mark.usefixtures("ray_session")
def test_anova_extremes():
    root = os.path.join(tempfile.gettempdir(), "omni_ray_anova")
    os.makedirs(root, exist_ok=True)
    # source fully determines length -> eta^2 = 1
    pq.write_table(pa.table({
        "source": pa.array(["a"] * 5 + ["b"] * 5),
        "n_chars": pa.array([10] * 5 + [50] * 5, pa.int64()),
    }), os.path.join(root, "documents.parquet"))
    hi = anova_eta_sources(root)
    hi = hi.to_pandas() if not isinstance(hi, pd.DataFrame) else hi
    assert int(hi["eta2_ppm"].iloc[0]) == 1_000_000
    # identical lengths everywhere -> SST = 0 -> defined as 0
    pq.write_table(pa.table({
        "source": pa.array(["a", "a", "b", "b"]),
        "n_chars": pa.array([7, 7, 7, 7], pa.int64()),
    }), os.path.join(root, "documents.parquet"))
    lo = anova_eta_sources(root)
    lo = lo.to_pandas() if not isinstance(lo, pd.DataFrame) else lo
    assert int(lo["eta2_ppm"].iloc[0]) == 0
    real = anova_eta_sources(SF)
    real = real.to_pandas() if not isinstance(real, pd.DataFrame) else real
    assert 0 <= int(real["eta2_ppm"].iloc[0]) <= 1_000_000

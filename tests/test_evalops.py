"""Batch-27 semantic invariants beyond oracle frame-equality: NDCG is
bounded by 1.0 and equals 1.0 exactly when the system order is an ideal
order; Benford shares sum to ~1e6 and the audit fires on planted uniform
digits; the CUSUM closed form equals the literal recurrence replay; and
the EMD is zero for a source identical to the corpus and equals a
hand-computed value on a planted two-source table."""

import os
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from omni_ray.pipelines.evalops import (
    _BENFORD_PPM,
    _NDCG_DISC,
    benford_audit,
    cusum_changepoint,
    emd_length_drift,
    ndcg_eval,
)

SF = "/root/testdata/sf0.001"


@pytest.mark.usefixtures("ray_session")
def test_ndcg_bounded_and_perfect_when_aligned():
    out = ndcg_eval(SF).to_pandas()
    assert (out["ndcg_ppm"] <= 1_000_000).all()
    assert (out["dcg_milli"] <= out["idcg_milli"]).all()
    # planted: length order == relevance order -> ndcg is exactly 1.0
    root = os.path.join(tempfile.gettempdir(), "omni_ray_ndcg")
    os.makedirs(root, exist_ok=True)
    def word(i, j):  # purely alphabetic so the [a-z]+ tokenizer keeps it
        s, j = "", j + 1
        while j:
            s += chr(ord("a") + j % 26)
            j //= 26
        return chr(ord("q") + i) + s

    texts = [" ".join(word(i, j) for j in range(n)) for i, n in
             enumerate([350, 250, 150, 50])]  # distinct terms: 350..50
    pq.write_table(pa.table({
        "doc_id": pa.array(range(4), pa.int64()),
        "text": pa.array(texts),
        "source": pa.array(["s"] * 4),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }), os.path.join(root, "documents.parquet"))
    r = ndcg_eval(root).to_pandas().iloc[0]
    # rel grades: 3, 2, 1, 0; longer text has more chars AND more terms
    want = 3 * _NDCG_DISC[0] + 2 * _NDCG_DISC[1] + 1 * _NDCG_DISC[2]
    assert int(r["dcg_milli"]) == want
    assert int(r["ndcg_ppm"]) == 1_000_000


@pytest.mark.usefixtures("ray_session")
def test_benford_shares_and_planted_uniform():
    out = benford_audit(SF).to_pandas()
    assert list(out["digit"]) == list(range(1, 10))
    assert list(out["exp_ppm"]) == _BENFORD_PPM
    # integer-floor shares must sum to within 9 ppm of 1e6
    assert 1_000_000 - 9 <= int(out["obs_ppm"].sum()) <= 1_000_000
    assert int(sum(_BENFORD_PPM)) in (999_999, 1_000_000, 1_000_001)
    # planted uniform first digits -> digit 1 under-observed vs Benford
    root = os.path.join(tempfile.gettempdir(), "omni_ray_benford")
    os.makedirs(root, exist_ok=True)
    vals = [d * 1.11 for d in range(1, 10)] * 90  # every digit 90 times
    pq.write_table(pa.table({
        "event_type": pa.array(["purchase"] * len(vals)),
        "value": pa.array(vals, pa.float64()),
        "ts": pa.array(pd.to_datetime(np.arange(len(vals)), unit="s")),
    }), os.path.join(root, "events.parquet"))
    u = benford_audit(root).to_pandas()
    assert (u["obs"] == 90).all()
    assert int(u.loc[u["digit"] == 1, "gap_ppm"].iloc[0]) < -100_000


@pytest.mark.usefixtures("ray_session")
def test_cusum_closed_form_equals_recurrence():
    out = cusum_changepoint(SF)
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    dev = out["dev_scaled"].to_numpy(np.int64)
    assert int(dev.sum()) == 0  # scaled deviations always sum to zero
    s = np.int64(0)
    t = np.int64(0)
    for i, d in enumerate(dev):
        s = max(np.int64(0), s + d)
        t = min(np.int64(0), t + d)
        assert int(out["cusum_pos"].iloc[i]) == int(s)
        assert int(out["cusum_neg"].iloc[i]) == int(-t)


@pytest.mark.usefixtures("ray_session")
def test_emd_zero_for_identical_and_exact_when_planted():
    out = emd_length_drift(SF)
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    assert (out["emd_scaled"] >= 0).all()
    # planted: source a = all length 10, source b = all length 30,
    # corpus = 50/50. EMD(a, corpus) in units 1/(n_a*n) over support
    # {10, 30}: |cdf_a(10) - cdf(10)| * 20 = |4*8 - 4*4| * 20 = 320
    root = os.path.join(tempfile.gettempdir(), "omni_ray_emd")
    os.makedirs(root, exist_ok=True)
    pq.write_table(pa.table({
        "source": pa.array(["a"] * 4 + ["b"] * 4),
        "n_chars": pa.array([10] * 4 + [30] * 4, pa.int64()),
    }), os.path.join(root, "documents.parquet"))
    p = emd_length_drift(root)
    p = p.to_pandas() if not isinstance(p, pd.DataFrame) else p
    assert int(p.loc[p["source"] == "a", "emd_scaled"].iloc[0]) == 320
    assert int(p.loc[p["source"] == "b", "emd_scaled"].iloc[0]) == 320
    # a source distributed exactly like the corpus has EMD 0
    pq.write_table(pa.table({
        "source": pa.array(["a", "a", "b", "b"]),
        "n_chars": pa.array([10, 30, 10, 30], pa.int64()),
    }), os.path.join(root, "documents.parquet"))
    z = emd_length_drift(root)
    z = z.to_pandas() if not isinstance(z, pd.DataFrame) else z
    assert (z["emd_scaled"] == 0).all()

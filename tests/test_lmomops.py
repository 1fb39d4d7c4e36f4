"""Batch-59 semantic invariants beyond oracle frame-equality: L-moments
replay against a brute-force sorted computation (l2 equals the mean
pairwise Gini difference halved; symmetric plantings read L-skew 0,
right-skewed positive); McNemar is 0 for identical labelers and exactly
(b-c)^2/(b+c) on a planted split; the shingle sweep is monotone (longer
shingles never MORE duplicated) with a fully repetitive corpus near 1e6
at every size."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from omni_ray.pipelines.lmomops import (
    l_moments_spend,
    mcnemar_len_vocab,
    shingle_size_sweep,
)

SF = "/root/testdata/sf0.001"


def _purchases(tmp_path, values):
    n = len(values)
    pq.write_table(pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array(pd.to_datetime(np.arange(n), unit="s"),
                       pa.timestamp("us")),
        "user_id": pa.array([0] * n, pa.int64()),
        "event_type": pa.array(["purchase"] * n),
        "value": pa.array(values, pa.float64()),
    }), str(tmp_path / "events.parquet"))


def _l_moments_brute(cents):
    x = np.sort(np.asarray(cents, dtype=object))
    n = len(x)
    l1 = sum(x) / n
    # l2 = half the mean absolute pairwise difference (Gini mean diff / 2)
    s = 0
    for i in range(n):
        for j in range(i + 1, n):
            s += abs(int(x[i]) - int(x[j]))
    l2 = s / (n * (n - 1))
    return l1, l2


@pytest.mark.usefixtures("ray_session")
def test_l_moments_brute_replay_and_skew_signs(tmp_path):
    vals = [1.0, 2.0, 2.0, 3.0, 7.0, 10.0]
    _purchases(tmp_path, vals)
    out = l_moments_spend(str(tmp_path))
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    r = out.iloc[0]
    cents = [round(v * 100) for v in vals]
    l1, l2 = _l_moments_brute(cents)
    assert int(r["l1_milli"]) == int(l1 * 1000)
    assert abs(int(r["l2_milli"]) - l2 * 1000) <= 1
    # right-skewed planting -> positive L-skewness
    assert int(r["lskew_milli"]) > 0
    # symmetric planting -> L-skew exactly 0
    _purchases(tmp_path, [1.0, 2.0, 3.0, 4.0, 5.0])
    sym = l_moments_spend(str(tmp_path))
    sym = sym.to_pandas() if not isinstance(sym, pd.DataFrame) else sym
    assert int(sym["lskew_milli"].iloc[0]) == 0


@pytest.mark.usefixtures("ray_session")
def test_mcnemar_real_and_bounds():
    out = mcnemar_len_vocab(SF)
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    r = out.iloc[0]
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    assert (int(r["concordant"]) + int(r["b_len_only"])
            + int(r["c_vocab_only"])) == len(docs)
    b, c = int(r["b_len_only"]), int(r["c_vocab_only"])
    want = (b - c) ** 2 * 1000 // (b + c) if b + c else 0
    assert int(r["mcnemar_milli"]) == want


@pytest.mark.usefixtures("ray_session")
def test_shingle_sweep_monotone_and_repetitive(tmp_path):
    out = shingle_size_sweep(SF)
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    assert list(out["shingle_words"]) == [3, 5, 8]
    # longer shingles can only be less (or equally) duplicated
    assert (np.diff(out["dup_ppm"].to_numpy()) <= 0).all()
    # fully repetitive corpus: "x" * 60 -> all shingles identical
    pq.write_table(pa.table({
        "text": pa.array(["x " * 60, "x " * 60]),
    }), str(tmp_path / "documents.parquet"))
    rep = shingle_size_sweep(str(tmp_path))
    rep = rep.to_pandas() if not isinstance(rep, pd.DataFrame) else rep
    assert (rep["n_distinct"] == 1).all()
    assert (rep["dup_ppm"] > 980_000).all()

"""Batch-49 semantic invariants beyond oracle frame-equality: every
richness estimator replays against a Counter on a planted corpus with
known f1/f2/q1, Chao1 >= observed, Good-Turing mass is f1/N exactly,
jackknife sits between observed and observed+q1, and the German tank
estimate is exact on a planted sequential-id draw."""

import re
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from omni_ray.pipelines.richops import (
    chao1_vocab,
    german_tank_users,
    good_turing_mass,
    jackknife1_vocab,
)

SF = "/root/testdata/sf0.001"
_WORD = re.compile(r"[a-z]+")


def _planted_docs(tmp_path):
    # occurrences: aa x1 (singleton), bb x2 (doubleton), cc x3, dd x1
    # doc freq: aa in 1 doc, bb in 2 docs, cc in 2, dd in 1
    texts = ["aa bb cc", "bb cc cc dd"]
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(texts),
    }), str(tmp_path / "documents.parquet"))
    return texts


@pytest.mark.usefixtures("ray_session")
def test_chao1_planted_and_bound(tmp_path):
    _planted_docs(tmp_path)
    out = chao1_vocab(str(tmp_path))
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    r = out.iloc[0]
    # occurrences: aa=1, dd=1 (f1=2), bb=2 (f2=1), cc=3
    assert int(r["observed"]) == 4
    assert int(r["f1"]) == 2
    assert int(r["f2"]) == 1
    assert int(r["chao1_est"]) == 4 + 4 // 2
    real = chao1_vocab(SF)
    real = real.to_pandas() if not isinstance(real, pd.DataFrame) else real
    assert int(real["chao1_est"].iloc[0]) >= int(real["observed"].iloc[0])


@pytest.mark.usefixtures("ray_session")
def test_good_turing_planted(tmp_path):
    _planted_docs(tmp_path)
    out = good_turing_mass(str(tmp_path))
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    r = out.iloc[0]
    assert int(r["n_tokens"]) == 7
    assert int(r["unseen_mass_ppm"]) == 2 * 1_000_000 // 7


@pytest.mark.usefixtures("ray_session")
def test_jackknife_planted_and_bracket(tmp_path):
    _planted_docs(tmp_path)
    out = jackknife1_vocab(str(tmp_path))
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    r = out.iloc[0]
    # doc frequencies: aa=1, dd=1 (q1=2), bb=2, cc=2
    assert int(r["q1"]) == 2
    assert int(r["jk1_est"]) == 4 + 2 * 1 // 2
    real = jackknife1_vocab(SF)
    real = real.to_pandas() if not isinstance(real, pd.DataFrame) else real
    rr = real.iloc[0]
    assert int(rr["observed"]) <= int(rr["jk1_est"]) \
        <= int(rr["observed"]) + int(rr["q1"])


@pytest.mark.usefixtures("ray_session")
def test_german_tank_planted(tmp_path):
    # ids drawn from 1..N with max 80 and k=8 -> est = 80 + 10 - 1 = 89
    pq.write_table(pa.table({
        "user_id": pa.array([3, 12, 25, 31, 47, 58, 66, 80], pa.int64()),
    }), str(tmp_path / "events.parquet"))
    out = german_tank_users(str(tmp_path))
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    r = out.iloc[0]
    assert int(r["observed_max"]) == 80
    assert int(r["k_distinct"]) == 8
    assert int(r["tank_est"]) == 89

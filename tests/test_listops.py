"""Batch-52 semantic invariants beyond oracle frame-equality: RBO is
exactly the full geometric mass for identical rankings and near zero for
reversed ones on a planted metric table; the price ladder finds a
planted dominant mode; the CSR estimate replays and flips sign between
a sparse and a dense planted matrix."""

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from omni_ray.pipelines.listops import (
    _RBO_P_PPM,
    csr_footprint_estimate,
    price_ladder_audit,
    rbo_rankings,
)

SF = "/root/testdata/sf0.001"
_WORD = re.compile(r"[a-z]+")


def _mk_docs(tmp_path, spec):
    rows, did = [], 0
    for src, (nd, cpd, vpd) in spec.items():
        for _ in range(nd):
            words = [src * 2 + chr(ord("a") + i % 26)
                     + chr(ord("a") + i // 26) for i in range(vpd)]
            rows.append((did, " ".join(words), src, cpd))
            did += 1
    pq.write_table(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows]),
        "source": pa.array([r[2] for r in rows]),
        "n_chars": pa.array([r[3] for r in rows], pa.int64()),
    }), str(tmp_path / "documents.parquet"))


@pytest.mark.usefixtures("ray_session")
def test_rbo_identical_and_reversed(tmp_path):
    # chars and vocab rank sources identically -> overlap@d = d at
    # every depth -> rbo = (1/9)*sum(w_d * 1e6) exactly
    _mk_docs(tmp_path, {"a": (1, 400, 40), "b": (1, 300, 30),
                        "c": (1, 200, 20), "d": (1, 100, 10)})
    out = rbo_rankings(str(tmp_path))
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    want = sum(_RBO_P_PPM[d] * 1_000_000 * (d + 1) // (d + 1)
               for d in range(4)) // (9 * 1_000_000)
    assert int(out["rbo_ppm"].iloc[0]) == want
    # reversed rankings: overlap only completes at the bottom depth
    _mk_docs(tmp_path, {"a": (1, 400, 10), "b": (1, 300, 20),
                        "c": (1, 200, 30), "d": (1, 100, 40)})
    rev = rbo_rankings(str(tmp_path))
    rev = rev.to_pandas() if not isinstance(rev, pd.DataFrame) else rev
    assert int(rev["rbo_ppm"].iloc[0]) < want // 2


@pytest.mark.usefixtures("ray_session")
def test_price_ladder_planted_mode(tmp_path):
    pq.write_table(pa.table({
        "p_partkey": pa.array([0, 1], pa.int64()),
        "p_brand": pa.array(["b1", "b2"]),
    }), str(tmp_path / "part.parquet"))
    prices = [9.99] * 7 + [19.99] * 2 + [4.99]
    pq.write_table(pa.table({
        "l_partkey": pa.array([0] * 10 + [1], pa.int64()),
        "l_extendedprice": pa.array(prices + [42.0], pa.float64()),
    }), str(tmp_path / "lineitem.parquet"))
    out = price_ladder_audit(str(tmp_path))
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    g = out.set_index("brand")
    assert int(g.loc["b1", "n_price_points"]) == 3
    assert int(g.loc["b1", "modal_cents"]) == 999
    assert int(g.loc["b1", "modal_ppm"]) == 700_000
    assert int(g.loc["b2", "modal_ppm"]) == 1_000_000


@pytest.mark.usefixtures("ray_session")
def test_csr_replay_and_sparse_vs_dense(tmp_path):
    out = csr_footprint_estimate(SF)
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    per_doc = [set(_WORD.findall((t or "").lower())) for t in docs["text"]]
    nnz = sum(len(s) for s in per_doc)
    vocab = len(set().union(*per_doc))
    r = out.iloc[0]
    assert int(r["nnz"]) == nnz
    assert int(r["cols"]) == vocab
    assert int(r["csr_bytes"]) == 16 * nnz + 8 * (len(docs) + 1)
    # planted sparse: 100 docs, each 1 unique word of a 100-word vocab
    pq.write_table(pa.table({
        "doc_id": pa.array(range(100), pa.int64()),
        "text": pa.array(["w" + chr(ord("a") + i % 26)
                          + chr(ord("a") + i // 26) for i in range(100)]),
    }), str(tmp_path / "documents.parquet"))
    sp = csr_footprint_estimate(str(tmp_path))
    sp = sp.to_pandas() if not isinstance(sp, pd.DataFrame) else sp
    assert int(sp["savings_ppm"].iloc[0]) > 900_000  # 1% density

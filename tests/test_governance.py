"""Batch-18 semantic invariants beyond oracle frame-equality: the
k-anonymity risk counts match a pandas replay of the QI grouping, FD
violation counts match replayed distinct censuses, k-core peeling is
monotone and matches a dense numpy replay, and the compaction plan is
contiguous, lossless, and reproduces the prefix-sum bin assignment."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from omni_ray.pipelines.governance import (
    _COMPACT_TARGET,
    _FD_CANDIDATES,
    _KANON_BAND,
    _KANON_K,
    _KCORE_K,
    compaction_plan,
    fd_violation_audit,
    kanon_violations,
    kcore_peel,
)

SF = "/root/testdata/sf0.001"


@pytest.mark.usefixtures("ray_session")
def test_kanon_counts_match_pandas_replay():
    out = kanon_violations(SF).to_pandas()
    cust = pq.read_table(f"{SF}/customer.parquet").to_pandas()
    cents = np.floor(cust["c_acctbal"].to_numpy() * 100 + 0.5).astype(np.int64)
    cust["band"] = cents // _KANON_BAND
    g = cust.groupby(["c_nationkey", "c_mktsegment", "band"]).size()
    small = g[g < _KANON_K]
    assert int(out["risk_rows"].sum()) == int(small.sum())
    assert int(out["small_groups"].sum()) == len(small)
    per_nat = small.groupby(level=0).sum()
    for nat, rows in per_nat.items():
        assert int(out.loc[out["nat"] == nat, "risk_rows"].iloc[0]) == rows


@pytest.mark.usefixtures("ray_session")
def test_fd_audit_matches_distinct_census():
    out = fd_violation_audit(SF).to_pandas().set_index("fd")
    part = pq.read_table(f"{SF}/part.parquet").to_pandas()
    for fd, a, b in _FD_CANDIDATES:
        nun = part.groupby(part[a].astype(str))[b].apply(
            lambda s: s.astype(str).nunique())
        sizes = part.groupby(part[a].astype(str)).size()
        assert int(out.loc[fd, "lhs_keys"]) == len(nun)
        assert int(out.loc[fd, "violating_keys"]) == int((nun > 1).sum())
        assert int(out.loc[fd, "violating_rows"]) == int(sizes[nun > 1].sum())
    # at least one candidate must actually be violated for the audit to bite
    assert (out["violating_keys"] > 0).any()


@pytest.mark.usefixtures("ray_session")
def test_kcore_peel_matches_dense_replay():
    out = kcore_peel(SF).to_pandas()
    s = out["survivors"].to_numpy()
    assert (s[:-1] >= s[1:]).all()  # peeling never grows the core
    n = pq.ParquetFile(f"{SF}/documents.parquet").metadata.num_rows
    d = np.arange(n)
    edges = set()
    for j in (1, 2, 3):
        for a, b in zip(d, (7 * d + j) % n):
            if a != b:
                edges.add((min(a, b), max(a, b)))
    ea = np.array([a for a, _ in edges])
    eb = np.array([b for _, b in edges])
    surv = np.ones(n, bool)
    for r in range(len(out)):
        keep = surv[ea] & surv[eb]
        deg = np.bincount(ea[keep], minlength=n) \
            + np.bincount(eb[keep], minlength=n)
        surv = deg >= _KCORE_K
        assert int(out["survivors"].iloc[r]) == int(surv.sum())
        assert int(out["id_sum"].iloc[r]) == int(np.flatnonzero(surv).sum())


@pytest.mark.usefixtures("ray_session")
def test_compaction_plan_contiguous_and_lossless():
    out = compaction_plan(SF).to_pandas()
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "source", "n_chars"]).to_pandas()
    assert int(out["n_docs"].sum()) == len(docs)
    assert int(out["chars"].sum()) == int(docs["n_chars"].sum())
    for src, g in out.groupby("source"):
        fi = g["file_idx"].to_numpy()
        assert fi[0] == 0 and (np.diff(fi) == 1).all()  # contiguous plan
        d = docs[docs["source"] == src].sort_values("doc_id")
        start = np.concatenate([[0], np.cumsum(d["n_chars"].to_numpy())[:-1]])
        want = pd.Series(start // _COMPACT_TARGET).value_counts().sort_index()
        assert (g.set_index("file_idx")["n_docs"] == want).all()

"""Batch-61 semantic invariants beyond oracle frame-equality: an AR(1)-
free alternating series reads PACF2 near the known -r1^2/(1-r1^2) form
while a pure 2-periodic series reads strong positive PACF2; a planted
half-repeating document lands in the top similarity band while disjoint
halves land in band 0; the IDF profile conserves terms and occurrence
mass with rare terms in the highest band."""

import re
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from omni_ray.pipelines.identops import (
    bm25_idf_profile,
    intra_doc_similarity_census,
    pacf2_daily,
)

SF = "/root/testdata/sf0.001"
_WORD = re.compile(r"[a-z]+")


@pytest.mark.usefixtures("ray_session")
def test_pacf2_periodic_signature(tmp_path):
    # strict period-2 series: acf1 strongly negative, and pacf2 = (c2c0
    # - c1^2)/(c0^2 - c1^2) replayed exactly
    days, types = [], []
    for d in range(16):
        c = 9 if d % 2 == 0 else 1
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
    out = pacf2_daily(str(tmp_path))
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    r = out.iloc[0]
    assert int(r["acf1_ppm"]) < -800_000
    # replay exactly
    x = np.array([9 if d % 2 == 0 else 1 for d in range(16)], object)
    nn = len(x)
    e = nn * x - int(sum(x))
    c0 = int(sum(v * v for v in e))
    c1 = int(sum(e[t] * e[t + 1] for t in range(nn - 1)))
    c2 = int(sum(e[t] * e[t + 2] for t in range(nn - 2)))
    num = 1_000_000 * (c2 * c0 - c1 * c1)
    den = c0 * c0 - c1 * c1
    want = abs(num) // abs(den) * (1 if (num < 0) == (den < 0) else -1)
    assert int(r["pacf2_ppm"]) == want


@pytest.mark.usefixtures("ray_session")
def test_intra_doc_bands_planted(tmp_path):
    span = " ".join("q" + chr(ord("a") + i % 26) + chr(ord("a") + i // 26)
                    for i in range(20))
    other = " ".join("z" + chr(ord("a") + i % 26) + chr(ord("a") + i // 26)
                     for i in range(20))
    pq.write_table(pa.table({
        "text": pa.array([f"{span} {span}",      # identical halves
                          f"{span} {other}"]),   # disjoint halves
    }), str(tmp_path / "documents.parquet"))
    out = intra_doc_similarity_census(str(tmp_path))
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    got = out.set_index("band")["n_docs"]
    assert int(got.get(10, 0)) == 1   # identical halves -> jaccard 1
    assert int(got.get(0, 0)) == 1    # disjoint -> band 0


@pytest.mark.usefixtures("ray_session")
def test_idf_profile_conserves():
    out = bm25_idf_profile(SF)
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    occ: Counter = Counter()
    dfs: Counter = Counter()
    for t in docs["text"]:
        ws = _WORD.findall((t or "").lower())
        occ.update(ws)
        dfs.update(set(ws))
    assert int(out["n_terms"].sum()) == len(dfs)
    assert int(out["occ_mass"].sum()) == sum(occ.values())
    # common terms (negative/low IDF) carry most of the occurrence mass
    low = out[out["band"] <= 0]["occ_mass"].sum()
    assert int(low) > int(out["occ_mass"].sum()) // 2

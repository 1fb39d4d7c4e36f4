"""Batch-50 semantic invariants beyond oracle frame-equality: Yule's K
replays against a Counter and a maximally repetitive planted source far
exceeds a diverse one; digram entropy is 0 for a single-digram corpus
and replays the quantized formula; crest is exactly 1000 for a flat
series; STTR is exactly 1000 for all-distinct windows and low for
repetitive ones."""

import math
import re
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from omni_ray.pipelines.lexstat2 import (
    _STTR_WINDOW,
    crest_factor_daily,
    digram_entropy_by_source,
    sttr_by_source,
    yule_k_by_source,
)

SF = "/root/testdata/sf0.001"
_WORD = re.compile(r"[a-z]+")


@pytest.mark.usefixtures("ray_session")
def test_yule_k_replay_and_repetition(tmp_path):
    out = yule_k_by_source(SF)
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    for _, r in out.head(3).iterrows():
        c = Counter()
        for t in docs.loc[docs["source"] == r["source"], "text"]:
            c.update(_WORD.findall((t or "").lower()))
        n = sum(c.values())
        ssq = sum(v * v for v in c.values())
        assert int(r["yule_k_scaled"]) == 10 ** 7 * (ssq - n) // (n * n)
    # repetitive source ("x" 50 times) >> diverse source (50 singletons)
    div = " ".join("w" + chr(ord("a") + i % 26) + chr(ord("a") + i // 26)
                   for i in range(50))
    pq.write_table(pa.table({
        "source": pa.array(["rep", "div"]),
        "text": pa.array(["x " * 50, div]),
    }), str(tmp_path / "documents.parquet"))
    p = yule_k_by_source(str(tmp_path)).to_pandas() \
        if not isinstance(yule_k_by_source(str(tmp_path)), pd.DataFrame) \
        else yule_k_by_source(str(tmp_path))
    p = p if isinstance(p, pd.DataFrame) else p.to_pandas()
    g = p.set_index("source")
    assert int(g.loc["rep", "yule_k_scaled"]) > \
        100 * max(1, int(g.loc["div", "yule_k_scaled"]))


@pytest.mark.usefixtures("ray_session")
def test_digram_entropy_zero_case(tmp_path):
    # all words "ababab": digrams ab/ba only, each deterministic given
    # the first char -> H(c2|c1) = 0
    pq.write_table(pa.table({
        "source": pa.array(["s"]),
        "text": pa.array(["ababab ababab ababab"]),
    }), str(tmp_path / "documents.parquet"))
    z = digram_entropy_by_source(str(tmp_path))
    z = z.to_pandas() if not isinstance(z, pd.DataFrame) else z
    assert int(z["h_micro_nats"].iloc[0]) == 0
    real = digram_entropy_by_source(SF)
    real = real.to_pandas() if not isinstance(real, pd.DataFrame) else real
    assert (real["h_micro_nats"] >= 0).all()
    assert (real["h_micro_nats"] <= int(math.log(26) * 1e6) + 1).all()


@pytest.mark.usefixtures("ray_session")
def test_crest_flat_is_1000(tmp_path):
    days = [d for d in range(10) for _ in range(7)]
    n = len(days)
    pq.write_table(pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array(pd.to_datetime(np.asarray(days) * 86_400, unit="s"),
                       pa.timestamp("us")),
        "user_id": pa.array([0] * n, pa.int64()),
        "event_type": pa.array(["click"] * n),
        "value": pa.array([1.0] * n, pa.float64()),
    }), str(tmp_path / "events.parquet"))
    out = crest_factor_daily(str(tmp_path))
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    assert int(out["crest_milli"].iloc[0]) == 1000


@pytest.mark.usefixtures("ray_session")
def test_sttr_extremes(tmp_path):
    distinct = " ".join("q" + chr(ord("a") + i % 26) + chr(ord("a") + i // 26)
                        for i in range(_STTR_WINDOW))
    pq.write_table(pa.table({
        "source": pa.array(["hi", "lo"]),
        "text": pa.array([distinct, "x " * _STTR_WINDOW]),
    }), str(tmp_path / "documents.parquet"))
    out = sttr_by_source(str(tmp_path))
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    g = out.set_index("source")
    assert int(g.loc["hi", "sttr_milli"]) == 1000
    assert int(g.loc["lo", "sttr_milli"]) == 1000 // _STTR_WINDOW

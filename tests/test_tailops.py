"""Batch-55 semantic invariants beyond oracle frame-equality: the Hill
estimator reads ~1/alpha on a planted exact-Pareto-quantile spend ladder;
syndication direction attributes the planted origin by lowest doc_id
with originated+copied conserving the shared-lead incidences; dow eta2
is ~1e6 on a planted pure weekday pattern and exactly 0 on a flat one."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from omni_ray.pipelines.tailops import (
    dow_eta2,
    hill_tail_index,
    syndication_direction,
)

SF = "/root/testdata/sf0.001"


@pytest.mark.usefixtures("ray_session")
def test_hill_on_planted_pareto_ladder(tmp_path):
    # spends at exact Pareto(alpha=2) quantile ladder: x_i = C / i^(1/2)
    # for i = 1..30 -> Hill 1/alpha ~ 0.5 (500_000 micro)
    spends = [int(1_000_000 / math.sqrt(i)) for i in range(1, 31)]
    rows = []
    for u, s in enumerate(spends):
        rows.append((u, s / 100.0))
    n = len(rows)
    pq.write_table(pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array(pd.to_datetime(np.arange(n), unit="s"),
                       pa.timestamp("us")),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array(["purchase"] * n),
        "value": pa.array([r[1] for r in rows], pa.float64()),
    }), str(tmp_path / "events.parquet"))
    out = hill_tail_index(str(tmp_path))
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    r = out.iloc[0]
    assert abs(int(r["inv_alpha_micro"]) - 500_000) < 60_000
    assert 1_700 < int(r["alpha_milli"]) < 2_300


@pytest.mark.usefixtures("ray_session")
def test_syndication_direction_planted(tmp_path):
    lead = "alpha beta gamma delta epsilon zeta"
    texts = [f"{lead} original tail", f"{lead} copy one",
             f"{lead} copy two", "completely unrelated text here now ok"]
    pq.write_table(pa.table({
        "doc_id": pa.array([5, 10, 20, 30], pa.int64()),
        "text": pa.array(texts),
        "source": pa.array(["orig", "c1", "c2", "orig"]),
    }), str(tmp_path / "documents.parquet"))
    out = syndication_direction(str(tmp_path))
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    g = out.set_index("source")
    assert int(g.loc["orig", "originated"]) == 1
    assert int(g.loc["orig", "copied"]) == 0
    assert int(g.loc["c1", "copied"]) == 1
    assert int(g.loc["c2", "copied"]) == 1
    assert int(out["originated"].sum() + out["copied"].sum()) == 3


@pytest.mark.usefixtures("ray_session")
def test_dow_eta2_extremes(tmp_path):
    def write(counts):
        days = [d for d, c in enumerate(counts) for _ in range(c)]
        n = len(days)
        pq.write_table(pa.table({
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(pd.to_datetime(np.asarray(days) * 86_400,
                                          unit="s"), pa.timestamp("us")),
            "user_id": pa.array([0] * n, pa.int64()),
            "event_type": pa.array(["click"] * n),
            "value": pa.array([1.0] * n, pa.float64()),
        }), str(tmp_path / "events.parquet"))

    # pure weekday pattern repeated over 4 weeks -> eta2 = 1e6 exactly
    pat = [3, 9, 4, 8, 5, 7, 6]
    write(pat * 4)
    hi = dow_eta2(str(tmp_path))
    hi = hi.to_pandas() if not isinstance(hi, pd.DataFrame) else hi
    assert int(hi["eta2_ppm"].iloc[0]) >= 999_999
    # flat series -> SST = 0 -> defined 0
    write([5] * 28)
    lo = dow_eta2(str(tmp_path))
    lo = lo.to_pandas() if not isinstance(lo, pd.DataFrame) else lo
    assert int(lo["eta2_ppm"].iloc[0]) == 0

"""Batch-68/69 semantic invariants.

styleops:
  * two-source Burrows' Delta is EXACTLY 2,000,000 ppm whenever any top
    term differs (with n=2, |dx|·n/√D = 2 identically) and 0 when sources
    are clones — a closed-form pin on the whole z-difference machinery.
  * hoeffding_bh_fdr: a planted extreme source gets p_ppm = 0 and a flag;
    flags are a prefix of the p-sorted order (step-up closure).
  * allan_variance_daily: clockwork days → 0 at every τ; a linear ramp →
    avar_ppm = 10⁶·τ²//2 exactly.

interop:
  * csv/jsonl round-trips survive quoting edge cases (commas, quotes,
    unicode in the group key) — the aggregate equals the direct one.
  * neyman_allocation: zero-variance strata get zero slots, slots sum to
    the budget, and a hand-computed 2-strata split is exact.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from omni_ray.pipelines.interop import (
    csv_roundtrip_stats,
    jsonl_roundtrip_stats,
    neyman_allocation,
)
from omni_ray.pipelines.styleops import (
    allan_variance_daily,
    burrows_delta_sources,
    hoeffding_bh_fdr,
)

SF = "/root/testdata/sf0.001"


def _docs(tmp_path, rows):
    pq.write_table(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows]),
        "lang": pa.array(["en"] * len(rows)),
        "source": pa.array([r[2] for r in rows]),
        "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
    }), str(tmp_path / "documents.parquet"))


def _events_daily(tmp_path, day_counts):
    rows = []
    eid = 0
    for day, cnt in enumerate(day_counts):
        for _ in range(cnt):
            rows.append((eid, day * 86_400 + (eid % 3600)))
            eid += 1
    pq.write_table(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array(pd.to_datetime([r[1] for r in rows], unit="s"),
                       pa.timestamp("us")),
        "user_id": pa.array([0] * len(rows), pa.int64()),
        "event_type": pa.array(["click"] * len(rows)),
        "value": pa.array([1.0] * len(rows), pa.float64()),
    }), str(tmp_path / "events.parquet"))


@pytest.mark.usefixtures("ray_session")
def test_burrows_two_source_closed_form(tmp_path):
    _docs(tmp_path, [
        (0, "alpha beta gamma alpha", "s1"),
        (1, "alpha beta beta delta", "s2"),
    ])
    out = burrows_delta_sources(str(tmp_path)).to_pandas()
    assert out[["s1", "s2"]].values.tolist() == [["s1", "s2"]]
    assert int(out["delta_ppm"].iloc[0]) == 2_000_000
    # clone sources: every term's D = 0 -> no usable terms -> delta 0
    _docs(tmp_path, [
        (0, "alpha beta gamma", "s1"),
        (1, "alpha beta gamma", "s2"),
    ])
    out = burrows_delta_sources(str(tmp_path)).to_pandas()
    assert int(out["delta_ppm"].iloc[0]) == 0


@pytest.mark.usefixtures("ray_session")
def test_hoeffding_fdr_planted(tmp_path):
    # 'hot' source: 400 long docs of 2100 chars; 3 base sources all short
    rows = []
    i = 0
    for _ in range(400):
        rows.append((i, "x" * 2100, "hot")); i += 1
    for s in ("a", "b", "c"):
        for _ in range(400):
            rows.append((i, "x" * 100, s)); i += 1
    _docs(tmp_path, rows)
    out = hoeffding_bh_fdr(str(tmp_path)).to_pandas()
    hot = out[out["source"] == "hot"].iloc[0]
    assert hot["share_ppm"] == 1_000_000 and hot["p_ppm"] == 0
    assert hot["flagged"] == 1
    # step-up closure: flagged rows form a prefix of the p-sorted order
    srt = out.sort_values(["p_ppm", "source"]).reset_index(drop=True)
    flags = srt["flagged"].tolist()
    assert flags == sorted(flags, reverse=True)


@pytest.mark.usefixtures("ray_session")
def test_allan_clockwork_and_ramp(tmp_path):
    _events_daily(tmp_path, [7] * 16)
    z = allan_variance_daily(str(tmp_path)).to_pandas()
    assert z["avar_ppm"].tolist() == [0, 0, 0]
    # ramp 1..16: block-sum diffs are exactly tau^2 at every tau
    _events_daily(tmp_path, list(range(1, 17)))
    r = allan_variance_daily(str(tmp_path)).to_pandas()
    got = dict(zip(r["tau"], r["avar_ppm"]))
    assert got == {1: 500_000, 2: 2_000_000, 4: 8_000_000}


@pytest.mark.usefixtures("ray_session")
def test_roundtrip_quoting_edges(tmp_path):
    rows = [
        (0, "plain", 'src,with,commas'),
        (1, "quoted", 'src "quoted"'),
        (2, "uni", "srcünï"),
        (3, "newline-ish", "src with space"),
        (16, "same shard as 0", 'src,with,commas'),
    ]
    _docs(tmp_path, rows)
    want = {}
    for r in rows:
        s = r[2]
        n, sc, si = want.get(s, (0, 0, 0))
        want[s] = (n + 1, sc + len(r[1]), si + r[0])
    for fn in (csv_roundtrip_stats, jsonl_roundtrip_stats):
        out = fn(str(tmp_path)).to_pandas()
        got = {r["source"]: (int(r["n_docs"]), int(r["sum_chars"]),
                             int(r["sum_ids"])) for _, r in out.iterrows()}
        assert got == want, fn.__name__


@pytest.mark.usefixtures("ray_session")
def test_neyman_planted(tmp_path):
    rows = []
    i = 0
    for _ in range(100):          # zero variance -> weight 0 -> 0 slots
        rows.append((i, "x" * 50, "flat")); i += 1
    for j in range(100):          # alternating 10/90 chars
        rows.append((i, "x" * (10 if j % 2 else 90), "wild")); i += 1
    for j in range(100):          # alternating 40/60
        rows.append((i, "x" * (40 if j % 2 else 60), "mild")); i += 1
    _docs(tmp_path, rows)
    out = neyman_allocation(str(tmp_path)).to_pandas()
    got = dict(zip(out["source"], out["n_slots"]))
    w = dict(zip(out["source"], out["weight"]))
    assert w["flat"] == 0 and got["flat"] == 0
    # weights: N*sigma = isqrt(N^2 * 40^2) = 4000 vs isqrt(N^2 * 10^2)=1000
    assert (w["wild"], w["mild"]) == (4000, 1000)
    assert got["wild"] == 8000 and got["mild"] == 2000
    assert out["n_slots"].sum() == 10_000


@pytest.mark.usefixtures("ray_session")
def test_real_data_sanity():
    out = neyman_allocation(SF).to_pandas()
    assert out["n_slots"].sum() == 10_000
    d = burrows_delta_sources(SF).to_pandas()
    # delta is a metric-ish distance: non-negative, symmetric pair listing
    assert (d["delta_ppm"] >= 0).all()
    assert (d["s1"] < d["s2"]).all()

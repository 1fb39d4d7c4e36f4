"""Batch-31 semantic invariants beyond oracle frame-equality: the KS
statistic dominates every pointwise CDF gap and is zero for an identical
source; apportioned seats always sum to the budget and differ from pure
rounding in the planted remainder case; hapax replays against a Counter;
a planted constant series has Fano exactly 0 and an all-on-one-day burst
has Fano ≈ n·(n−1)·1e6/n² · ... > 1e6."""

import os
import re
import tempfile
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from omni_ray.pipelines.allocops import (
    _QUOTA_SLOTS,
    burstiness_fano,
    hapax_rate_by_source,
    ks_length_drift,
    quota_apportionment,
)

SF = "/root/testdata/sf0.001"
_WORD = re.compile(r"[a-z]+")


def _events(days, types):
    n = len(days)
    return pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array(pd.to_datetime(np.asarray(days) * 86_400, unit="s"),
                       pa.timestamp("us")),
        "user_id": pa.array([0] * n, pa.int64()),
        "event_type": pa.array(types),
        "value": pa.array([1.0] * n, pa.float64()),
    })


@pytest.mark.usefixtures("ray_session")
def test_ks_dominates_pointwise_gaps_and_zero_case():
    out = ks_length_drift(SF)
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    support = np.sort(docs["n_chars"].unique())
    n = len(docs)
    cum_all = np.searchsorted(np.sort(docs["n_chars"]), support,
                              side="right")
    for _, r in out.iterrows():
        sub = np.sort(docs.loc[docs["source"] == r["source"], "n_chars"])
        cum_s = np.searchsorted(sub, support, side="right")
        diffs = np.abs(cum_s * n - cum_all * len(sub))
        assert int(r["ks_scaled"]) == int(diffs.max())
        k = int(diffs.argmax())
        assert int(r["argmax_chars"]) == int(support[k])
    # identical-to-corpus source -> KS 0
    root = os.path.join(tempfile.gettempdir(), "omni_ray_ks")
    os.makedirs(root, exist_ok=True)
    pq.write_table(pa.table({
        "source": pa.array(["a", "a", "b", "b"]),
        "n_chars": pa.array([10, 30, 10, 30], pa.int64()),
    }), os.path.join(root, "documents.parquet"))
    z = ks_length_drift(root)
    z = z.to_pandas() if not isinstance(z, pd.DataFrame) else z
    assert (z["ks_scaled"] == 0).all()


@pytest.mark.usefixtures("ray_session")
def test_quota_sums_to_budget_and_largest_remainder_bites():
    out = quota_apportionment(SF)
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    assert int(out["seats"].sum()) == _QUOTA_SLOTS
    assert (out["seats"] - out["base"]).isin([0, 1]).all()
    # planted: volumes 10/10/10/70 over 3 seats-worth of remainder skew:
    # chars [1,1,1,7] -> quotas 1000,1000,1000,7000: exact, extras 0
    # chars [1,1,1,6] -> quotas 10000/9: bases 1111,1111,1111,6666 = 9999
    root = os.path.join(tempfile.gettempdir(), "omni_ray_quota")
    os.makedirs(root, exist_ok=True)
    pq.write_table(pa.table({
        "source": pa.array(["a", "b", "c", "d"]),
        "n_chars": pa.array([1, 1, 1, 6], pa.int64()),
    }), os.path.join(root, "documents.parquet"))
    p = quota_apportionment(root)
    p = p.to_pandas() if not isinstance(p, pd.DataFrame) else p
    assert int(p["seats"].sum()) == _QUOTA_SLOTS
    # remainders: a,b,c = 1/9 (1111.1), d = 6/9 (6666.7): d wins the seat
    assert int(p.loc[p["source"] == "d", "extra"].iloc[0]) == 1
    assert int(p["extra"].sum()) == 1


@pytest.mark.usefixtures("ray_session")
def test_hapax_matches_counter_replay():
    out = hapax_rate_by_source(SF)
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    for _, r in out.iterrows():
        c: Counter = Counter()
        for t in docs.loc[docs["source"] == r["source"], "text"]:
            c.update(_WORD.findall((t or "").lower()))
        hap = sum(1 for v in c.values() if v == 1)
        assert int(r["n_terms"]) == len(c)
        assert int(r["n_hapax"]) == hap
        assert int(r["hapax_ppm"]) == hap * 1_000_000 // len(c)


@pytest.mark.usefixtures("ray_session")
def test_fano_constant_zero_and_burst_high():
    root = os.path.join(tempfile.gettempdir(), "omni_ray_fano")
    os.makedirs(root, exist_ok=True)
    # type "flat": 5 events every day for 10 days -> variance 0 -> F = 0
    # type "burst": 50 events all on day 0 -> F = (n-1)*mean*1e6... >> 1e6
    days = [d for d in range(10) for _ in range(5)] + [0] * 50
    types = ["flat"] * 50 + ["burst"] * 50
    pq.write_table(_events(days, types), os.path.join(root, "events.parquet"))
    out = burstiness_fano(root)
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    f = out.set_index("event_type")
    assert int(f.loc["flat", "fano_ppm"]) == 0
    # burst: x = [50,0,...], n=10, T=50: sum e^2 = 450^2 + 9*50^2 = 225000
    # F_ppm = 1e6 * 225000 // (100*50) = 45_000_000
    assert int(f.loc["burst", "fano_ppm"]) == 45_000_000
    assert int(f.loc["flat", "n_days"]) == 10

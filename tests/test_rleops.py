"""Batch-64 semantic invariants beyond oracle frame-equality: the RLE
audit replays run count, ratio, longest run and its type against a
single-pass pandas scan on the real data, and a planted bursty stream
with a cross-block-sized long run reads exactly its geometry."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from omni_ray.pipelines.rleops import type_rle_audit

SF = "/root/testdata/sf0.001"


def _replay(ev):
    ev = ev.sort_values(["us", "event_id"])
    et = ev["event_type"].to_numpy()
    runs, best_len, best_type, cur = 1, 1, str(et[0]), 1
    for i in range(1, len(et)):
        if et[i] == et[i - 1]:
            cur += 1
        else:
            runs += 1
            cur = 1
        if cur > best_len or (cur == best_len and str(et[i]) < best_type):
            best_len, best_type = cur, str(et[i])
    return runs, best_len, best_type


@pytest.mark.usefixtures("ray_session")
def test_rle_replays_real_data():
    out = type_rle_audit(SF)
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    ev["us"] = ev["ts"].astype("int64")
    runs, best_len, best_type = _replay(ev)
    r = out.iloc[0]
    assert int(r["n_events"]) == len(ev)
    assert int(r["n_runs"]) == runs
    assert int(r["longest_run"]) == best_len
    assert r["longest_type"] == best_type
    assert int(r["rle_ratio_ppm"]) == runs * 1_000_000 // len(ev)


@pytest.mark.usefixtures("ray_session")
def test_rle_planted_burst(tmp_path):
    # 500 interleaved a/b then a burst of 3000 c then 500 a/b again:
    # the c-run must survive block-boundary reconciliation intact
    types = (["a", "b"] * 250) + ["c"] * 3000 + (["a", "b"] * 250)
    n = len(types)
    pq.write_table(pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array(pd.to_datetime(np.arange(n), unit="s"),
                       pa.timestamp("us")),
        "user_id": pa.array([0] * n, pa.int64()),
        "event_type": pa.array(types),
        "value": pa.array([1.0] * n, pa.float64()),
    }), str(tmp_path / "events.parquet"))
    out = type_rle_audit(str(tmp_path))
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    r = out.iloc[0]
    assert int(r["longest_run"]) == 3000
    assert r["longest_type"] == "c"
    assert int(r["n_runs"]) == 500 + 1 + 500

"""Batch-60 semantic invariants beyond oracle frame-equality: the
inspection factor is exactly 1000 for clockwork gaps and exactly the
hand-computed value for a planted bimodal gap mix; burstiness B is -1000
clockwork and positive for the planted heavy mix; the Zipf slope is
exactly -1000 milli on a planted exact-Zipf(1) count ladder."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from omni_ray.pipelines.renewops import (
    gap_burstiness_b,
    inspection_paradox_audit,
    zipf_slope_theil,
)

SF = "/root/testdata/sf0.001"


def _user_events(tmp_path, secs, types=None):
    n = len(secs)
    pq.write_table(pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array(pd.to_datetime(np.asarray(secs), unit="s"),
                       pa.timestamp("us")),
        "user_id": pa.array([0] * n, pa.int64()),
        "event_type": pa.array(types if types is not None
                               else ["click"] * n),
        "value": pa.array([1.0] * n, pa.float64()),
    }), str(tmp_path / "events.parquet"))


@pytest.mark.usefixtures("ray_session")
def test_inspection_clockwork_and_bimodal(tmp_path):
    _user_events(tmp_path, list(range(0, 110, 10)))  # gaps all 10 s
    z = inspection_paradox_audit(str(tmp_path))
    z = z.to_pandas() if not isinstance(z, pd.DataFrame) else z
    assert int(z["factor_milli"].iloc[0]) == 1000
    # bimodal: gaps [1,1,1,1,16]: n=5, sum=20, ss=260 -> 1000*5*260//400
    _user_events(tmp_path, [0, 1, 2, 3, 4, 20])
    b = inspection_paradox_audit(str(tmp_path))
    b = b.to_pandas() if not isinstance(b, pd.DataFrame) else b
    assert int(b["factor_milli"].iloc[0]) == 1000 * 5 * 260 // 400


@pytest.mark.usefixtures("ray_session")
def test_burstiness_extremes(tmp_path):
    _user_events(tmp_path, list(range(0, 110, 10)))
    z = gap_burstiness_b(str(tmp_path))
    z = z.to_pandas() if not isinstance(z, pd.DataFrame) else z
    assert int(z["b_milli"].iloc[0]) == -1000  # zero variance
    _user_events(tmp_path, [0, 1, 2, 3, 4, 20])
    hot = gap_burstiness_b(str(tmp_path))
    hot = hot.to_pandas() if not isinstance(hot, pd.DataFrame) else hot
    assert int(hot["b_milli"].iloc[0]) > 0
    real = gap_burstiness_b(SF)
    real = real.to_pandas() if not isinstance(real, pd.DataFrame) else real
    assert real["b_milli"].between(-1000, 1000).all()


@pytest.mark.usefixtures("ray_session")
def test_zipf_slope_on_exact_ladder(tmp_path):
    # counts = 2520 // rank for ranks 1..9 (2520 divisible by all):
    # exact Zipf(1) -> slope -1000 milli within quantization slack
    words = []
    for r in range(1, 10):
        w = "z" + chr(ord("a") + r)
        words += [w] * (2520 // r)
    pq.write_table(pa.table({
        "text": pa.array([" ".join(words)]),
    }), str(tmp_path / "documents.parquet"))
    out = zipf_slope_theil(str(tmp_path))
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    assert abs(int(out["alpha_milli"].iloc[0]) - 1000) <= 2
    real = zipf_slope_theil(SF)
    real = real.to_pandas() if not isinstance(real, pd.DataFrame) else real
    assert int(real["alpha_milli"].iloc[0]) > 0  # counts do decay

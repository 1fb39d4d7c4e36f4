"""Batch-46 semantic invariants beyond oracle frame-equality: mix-drift
shares sum to ~1000 per decile and a planted vanishing source reads its
exact drift; shared values replay; circular stats read r = 1e6 with the
right peak for a single-hour planting and ~0 for uniform hours; kappa
is exactly 1e6 for identical labelings and ~0 for independent ones."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from omni_ray.pipelines.circops import (
    circular_hour_stats,
    cohens_kappa_bins,
    shared_value_audit,
    source_mix_drift,
)

SF = "/root/testdata/sf0.001"


@pytest.mark.usefixtures("ray_session")
def test_mix_drift_planted_vanishing_source(tmp_path):
    out = source_mix_drift(SF)
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    slack = len(out)
    assert abs(int(out["first_milli"].sum()) - 1000) <= slack
    assert abs(int(out["last_milli"].sum()) - 1000) <= slack
    # planted: source a fills the first decile, b the last (100 docs)
    pq.write_table(pa.table({
        "doc_id": pa.array(range(100), pa.int64()),
        "source": pa.array(["a"] * 50 + ["b"] * 50),
    }), str(tmp_path / "documents.parquet"))
    p = source_mix_drift(str(tmp_path))
    p = p.to_pandas() if not isinstance(p, pd.DataFrame) else p
    g = p.set_index("source")
    assert int(g.loc["a", "first_milli"]) == 1000
    assert int(g.loc["a", "last_milli"]) == 0
    assert int(g.loc["a", "drift_milli"]) == -1000
    assert int(g.loc["b", "drift_milli"]) == 1000


@pytest.mark.usefixtures("ray_session")
def test_shared_values_replay():
    out = shared_value_audit(SF)
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    p = ev[ev["event_type"] == "purchase"].copy()
    p["cents"] = np.floor(p["value"].to_numpy() * 100 + 0.5).astype(np.int64)
    users = p.groupby("cents")["user_id"].nunique()
    want = sorted(users.index, key=lambda v: (-users[v], v))[:10]
    assert list(out["cents"]) == [int(v) for v in want]
    for _, r in out.iterrows():
        assert int(r["n_users"]) == int(users[r["cents"]])


@pytest.mark.usefixtures("ray_session")
def test_circular_planted_peak_and_uniform(tmp_path):
    # "spike": all events at hour 7 -> r = 1e6 (within literal rounding),
    # peak_hour 7; "uniform": one event every hour -> r ~ 0
    us, types = [], []
    for _ in range(24):
        us.append(7 * 3_600_000_000)
        types.append("spike")
    for h in range(24):
        us.append(h * 3_600_000_000)
        types.append("uniform")
    n = len(us)
    pq.write_table(pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array(pd.to_datetime(np.asarray(us), unit="us"),
                       pa.timestamp("us")),
        "user_id": pa.array([0] * n, pa.int64()),
        "event_type": pa.array(types),
        "value": pa.array([1.0] * n, pa.float64()),
    }), str(tmp_path / "events.parquet"))
    out = circular_hour_stats(str(tmp_path))
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    g = out.set_index("event_type")
    assert int(g.loc["spike", "peak_hour"]) == 7
    assert int(g.loc["spike", "r_ppm"]) >= 999_990
    assert int(g.loc["uniform", "r_ppm"]) <= 1_000


@pytest.mark.usefixtures("ray_session")
def test_kappa_bounds_and_real():
    out = cohens_kappa_bins(SF)
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    r = out.iloc[0]
    assert -1_000_000 <= int(r["kappa_ppm"]) <= 1_000_000
    # length and vocab are strongly related in this corpus: kappa >> 0
    assert int(r["kappa_ppm"]) > 200_000
    assert 0 < int(r["agree"]) <= int(r["n_docs"])

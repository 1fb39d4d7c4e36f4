"""Batch-62 semantic invariants beyond oracle frame-equality: first-touch
cells partition users with the planted buyer attributed to its entry
type; PR/F1 replays exactly on the separable planted corpus (F1 = 1000);
AoI is exactly half the gap for clockwork arrivals and dominated by the
big gap on a planted bimodal mix."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from omni_ray.pipelines.funnelops import (
    age_of_information,
    first_touch_census,
    stump_pr_f1,
)

SF = "/root/testdata/sf0.001"


def _events(secs, types, users):
    n = len(secs)
    return pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array(pd.to_datetime(np.asarray(secs), unit="s"),
                       pa.timestamp("us")),
        "user_id": pa.array(users, pa.int64()),
        "event_type": pa.array(types),
        "value": pa.array([1.0] * n, pa.float64()),
    })


@pytest.mark.usefixtures("ray_session")
def test_first_touch_partition_and_planted(tmp_path):
    out = first_touch_census(SF)
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    assert int(out["n_users"].sum()) == ev["user_id"].nunique()
    # planted: user 1 starts with click then buys; user 2 starts with
    # view, never buys
    pq.write_table(_events([0, 10, 0, 5],
                           ["click", "purchase", "view", "click"],
                           [1, 1, 2, 2]),
                   str(tmp_path / "events.parquet"))
    p = first_touch_census(str(tmp_path))
    p = p.to_pandas() if not isinstance(p, pd.DataFrame) else p
    g = p.set_index("first_type")
    assert int(g.loc["click", "buy_ppm"]) == 1_000_000
    assert int(g.loc["view", "buy_ppm"]) == 0


@pytest.mark.usefixtures("ray_session")
def test_stump_f1_separable(tmp_path):
    def letters(i):
        s, i = "", i + 1
        while i:
            s += chr(ord("a") + i % 26)
            i //= 26
        return s

    poor = ["w " * 20] * 6
    rich = [" ".join("q" + letters(j) for j in range(220))] * 4
    texts = poor + rich
    pq.write_table(pa.table({
        "text": pa.array(texts),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }), str(tmp_path / "documents.parquet"))
    out = stump_pr_f1(str(tmp_path))
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    r = out.iloc[0]
    assert int(r["tp"]) == 4 and int(r["fp"]) == 0 and int(r["fn"]) == 0
    assert int(r["f1_milli"]) == 1000
    real = stump_pr_f1(SF)
    real = real.to_pandas() if not isinstance(real, pd.DataFrame) else real
    rr = real.iloc[0]
    assert 0 <= int(rr["f1_milli"]) <= 1000


@pytest.mark.usefixtures("ray_session")
def test_aoi_clockwork_and_bimodal(tmp_path):
    # clockwork gaps of 10 s -> AoI = 5 s = 5000 milli
    pq.write_table(_events(list(range(0, 110, 10)), ["click"] * 11,
                           [0] * 11),
                   str(tmp_path / "events.parquet"))
    z = age_of_information(str(tmp_path))
    z = z.to_pandas() if not isinstance(z, pd.DataFrame) else z
    assert int(z["aoi_milli_s"].iloc[0]) == 5000
    # gaps [1,1,1,1,16]: AoI = (4 + 256)/(2*20) = 6.5 s
    pq.write_table(_events([0, 1, 2, 3, 4, 20], ["click"] * 6, [0] * 6),
                   str(tmp_path / "events.parquet"))
    b = age_of_information(str(tmp_path))
    b = b.to_pandas() if not isinstance(b, pd.DataFrame) else b
    assert int(b["aoi_milli_s"].iloc[0]) == 6500

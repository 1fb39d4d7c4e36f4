"""Batch-37 semantic invariants beyond oracle frame-equality: the AMS
counters and the exact F2 both replay sign-for-sign against the
definition, and the 16-counter estimate lands within the expected
multiplicative band; the density audit flags planted gaps and
duplicates; snake loads are near-balanced (spread bounded by the
largest single volume) and the deal order snakes; h-index replays
against its definition and matches a hand-built corpus."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from omni_ray.pipelines.sketchops import (
    _SNAKE_SHARDS,
    ams_f2_audit,
    lineitem_density_audit,
    snake_shard_assign,
    source_h_index,
)

SF = "/root/testdata/sf0.001"


@pytest.mark.usefixtures("ray_session")
def test_ams_exact_side_and_estimate_replay():
    out = ams_f2_audit(SF)
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    c = ev.groupby("user_id").size().to_numpy()
    assert int(out["exact_f2"].iloc[0]) == int((c.astype(object) ** 2).sum())
    # estimate replay: counter sums over the whole stream
    uids = ev["user_id"].to_numpy()
    z = []
    for k in range(16):
        z.append(sum(
            1 if int(hashlib.md5(f"{k}:{u}".encode()).hexdigest()[:15],
                     16) & 1 else -1 for u in uids))
    means = sorted(sum(z[g * 4 + i] ** 2 for i in range(4)) // 4
                   for g in range(4))
    assert int(out["est_f2"].iloc[0]) == means[1]
    # AMS is unbiased: at 16 counters the estimate lands within 3x
    assert 0 < int(out["est_f2"].iloc[0]) \
        < 5 * int(out["exact_f2"].iloc[0])


@pytest.mark.usefixtures("ray_session")
def test_density_audit_flags_planted_defects(tmp_path):
    out = lineitem_density_audit(SF)
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    li = pq.read_table(f"{SF}/lineitem.parquet").to_pandas()
    assert int(out["n_orders"].sum()) == li["l_orderkey"].nunique()
    assert int(out["n_lines"].sum()) == len(li)
    # planted: order 1 contiguous, order 2 gapped, order 3 duplicated
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1, 2, 2, 3, 3], pa.int64()),
        "l_linenumber": pa.array([1, 2, 1, 3, 1, 1], pa.int32()),
    }), str(tmp_path / "lineitem.parquet"))
    p = lineitem_density_audit(str(tmp_path))
    p = p.to_pandas() if not isinstance(p, pd.DataFrame) else p
    v = p.set_index("verdict")["n_orders"]
    assert int(v.loc[0]) == 1 and int(v.loc[1]) == 1 and int(v.loc[2]) == 1


@pytest.mark.usefixtures("ray_session")
def test_snake_shards_near_balanced():
    out = snake_shard_assign(SF)
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    vol = docs.groupby("source")["n_chars"].sum()
    assert int(out["chars"].sum()) == int(vol.sum())
    assert out["shard"].between(0, _SNAKE_SHARDS - 1).all()
    loads = out.groupby("shard")["chars"].sum()
    # snake balance bound: spread can't exceed the largest single volume
    assert int(loads.max() - loads.min()) <= int(vol.max())
    # rank 1..8 get shards 0..7; rank 9..16 reverse (the snake turn)
    first16 = out.sort_values("rank").head(16)["shard"].tolist()
    assert first16[:8] == list(range(8))
    assert first16[8:] == list(range(7, -1, -1))


@pytest.mark.usefixtures("ray_session")
def test_h_index_replays_and_hand_case(tmp_path):
    out = source_h_index(SF).to_pandas()
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    for _, r in out.iterrows():
        s = np.sort(docs.loc[docs["source"] == r["source"], "n_chars"]
                    .to_numpy(np.int64) // 100)[::-1]
        h = int((s >= np.arange(1, len(s) + 1)).sum())
        assert int(r["h_index"]) == h
    # hand case: scores 5,4,2,1 -> ranks 1..4: 5>=1, 4>=2, 2<3 -> h = 2
    pq.write_table(pa.table({
        "source": pa.array(["x"] * 4),
        "n_chars": pa.array([500, 400, 200, 100], pa.int64()),
    }), str(tmp_path / "documents.parquet"))
    p = source_h_index(str(tmp_path)).to_pandas()
    assert int(p["h_index"].iloc[0]) == 2

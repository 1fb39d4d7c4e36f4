"""Batch-24 semantic invariants beyond oracle frame-equality: MMR picks are
distinct, lead with the relevance top-1 and beat a pure-relevance list on
diversity; bloom geometry satisfies the FPP inequality; the arrival audit
is consistent with a direct watermark replay; and the vacuum plan
partitions every row exactly once."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from omni_ray.pipelines.advisory import (
    _BLOOM_BITS_PER_KEY_MICRO,
    _BLOOM_TABLES,
    _VACUUM_TTL_DAYS,
    bloom_size_advisor,
    mmr_rerank,
    ooo_arrival_audit,
    vacuum_plan,
)

SF = "/root/testdata/sf0.001"


@pytest.mark.usefixtures("ray_session")
def test_mmr_picks_distinct_and_diverse():
    out = mmr_rerank(SF).to_pandas()
    assert list(out["pick_order"]) == [1, 2, 3, 4, 5]
    assert out["vec_id"].nunique() == 5
    emb = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    order = np.argsort(emb["vec_id"].to_numpy())
    ids = emb["vec_id"].to_numpy()[order].astype(np.int64)
    mat = np.floor(np.stack(emb["embedding"].to_numpy()[order])
                   .astype(np.float64) * 1_000_000 + 0.5).astype(np.int64)
    qi = int(np.searchsorted(ids, 0))
    rel = mat @ mat[qi]
    rel[qi] = np.iinfo(np.int64).min // 2
    top_rel = ids[np.argsort(-rel, kind="stable")]
    # pick 1 is always the pure-relevance winner
    assert int(out["vec_id"].iloc[0]) == int(top_rel[0])
    # rel_q column carries the true relevance of each pick
    for _, r in out.iterrows():
        assert int(r["rel_q"]) == int(rel[np.searchsorted(ids, r["vec_id"])])
    # diversified list has no higher intra-list similarity than the pure
    # relevance top-5 (the point of MMR)
    def intra(sel):
        cols = np.searchsorted(ids, sel)
        s = mat[cols] @ mat[cols].T
        iu = np.triu_indices(len(sel), 1)
        return int(s[iu].max())
    assert intra(out["vec_id"].to_numpy()) <= intra(top_rel[:5])


@pytest.mark.usefixtures("ray_session")
def test_bloom_geometry_satisfies_fpp_bound():
    out = bloom_size_advisor(SF).to_pandas().set_index("tbl")
    import duckdb
    for tbl, col in _BLOOM_TABLES:
        n = duckdb.sql(f"SELECT count(DISTINCT {col}) FROM "
                       f"read_parquet('{SF}/{tbl}.parquet')").fetchone()[0]
        r = out.loc[tbl]
        assert int(r["n_keys"]) == n
        # m >= n * 9.585059 (the 1% FPP requirement), within 1 bit of tight
        assert n * _BLOOM_BITS_PER_KEY_MICRO <= int(r["m_bits"]) * 1_000_000 \
            < n * _BLOOM_BITS_PER_KEY_MICRO + 1_000_000
        # optimal k for 1% is 7 (ceil/round of 9.585*ln2 = 6.64)
        assert int(r["k_hashes"]) == 7
        assert int(r["filter_bytes"]) == (int(r["m_bits"]) + 7) // 8


@pytest.mark.usefixtures("ray_session")
def test_arrival_audit_matches_watermark_replay():
    out = ooo_arrival_audit(SF).to_pandas().set_index("event_type")
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    for etype, g in ev.groupby("event_type"):
        g = g.sort_values("event_id")
        us = g["ts"].astype("int64").to_numpy()
        run = np.maximum.accumulate(us)
        prev = np.concatenate([[np.iinfo(np.int64).min], run[:-1]])
        late = prev > us
        r = out.loc[etype]
        assert int(r["n_events"]) == len(g)
        assert int(r["late_events"]) == int(late.sum())
        assert int(r["adj_inversions"]) == int((us[1:] < us[:-1]).sum())
        assert int(r["sum_lateness_us"]) == int((prev - us)[late].sum())


@pytest.mark.usefixtures("ray_session")
def test_arrival_audit_bites_on_planted_disorder():
    # the shipped stream arrives in ts order (audit reads all zeros), so
    # plant a shuffled arrival to prove the watermark logic fires
    import os
    import tempfile

    import pandas as pd
    import pyarrow as pa

    root = os.path.join(tempfile.gettempdir(), "omni_ray_oooaudit")
    os.makedirs(root, exist_ok=True)
    ts = pd.to_datetime([3, 1, 2, 5, 4], unit="s")  # arrival vs time order
    pa.parquet.write_table(pa.table({
        "event_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "event_type": pa.array(["x"] * 5, pa.string()),
    }), os.path.join(root, "events.parquet"))
    out = ooo_arrival_audit(root).to_pandas().iloc[0]
    # late: ids 1 (wm 3s, ts 1s), 2 (wm 3s, ts 2s), 4 (wm 5s, ts 4s)
    assert int(out["late_events"]) == 3
    assert int(out["adj_inversions"]) == 2  # 3->1 and 5->4
    assert int(out["max_lateness_us"]) == 2_000_000
    assert int(out["sum_lateness_us"]) == 4_000_000


@pytest.mark.usefixtures("ray_session")
def test_vacuum_plan_partitions_every_row():
    out = vacuum_plan(SF).to_pandas()
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    assert int((out["expired_rows"] + out["live_rows"]).sum()) == len(ev)
    day = ev["ts"].astype("int64") // 86_400_000_000
    cutoff = int(day.max()) - _VACUUM_TTL_DAYS
    expired = day < cutoff
    assert int(out["expired_rows"].sum()) == int(expired.sum())
    size = ev["props"].str.len().to_numpy() + 40
    assert int(out["reclaim_bytes"].sum()) == int(size[expired.to_numpy()].sum())

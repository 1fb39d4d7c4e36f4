"""Batch-25 semantic invariants beyond oracle frame-equality: the nearest
join really picks the time-nearest same-user click (brute-force replay);
percentile picks bracket the right share of each day's values; the dense
pivot conserves the corpus totals and carries genuine zero cells; and the
merkle digests are partition-order invariant with a bit-flip actually
flipping exactly one day plus the root."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from omni_ray.pipelines.engineops import _CK_MOD
from omni_ray.pipelines.integrity import (
    _NEJ_TOL_US,
    daily_value_percentiles,
    lang_source_pivot,
    merkle_partition_digest,
    nearest_event_join,
)

SF = "/root/testdata/sf0.001"


@pytest.mark.usefixtures("ray_session")
def test_nearest_join_matches_bruteforce_replay():
    out = nearest_event_join(SF).to_pandas()
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    ev["us"] = ev["ts"].astype("int64")
    clicks = ev[ev["event_type"] == "click"]
    got = out.set_index("purchase_id")
    n_matched = 0
    for _, p in ev[ev["event_type"] == "purchase"].iterrows():
        c = clicks[clicks["user_id"] == p["user_id"]].copy()
        c["delta"] = (c["us"] - p["us"]).abs()
        c = c[c["delta"] <= _NEJ_TOL_US]
        if c.empty:
            assert p["event_id"] not in got.index
            continue
        n_matched += 1
        best = c.sort_values(["delta", "us", "event_id"]).iloc[0]
        r = got.loc[p["event_id"]]
        assert int(r["click_id"]) == int(best["event_id"])
        assert int(r["delta_us"]) == int(best["delta"])
    assert n_matched == len(out) and n_matched > 0


@pytest.mark.usefixtures("ray_session")
def test_percentiles_bracket_the_right_share():
    out = daily_value_percentiles(SF).to_pandas()
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    ev["day"] = ev["ts"].astype("int64") // 86_400_000_000
    ev["cents"] = np.floor(ev["value"].to_numpy() * 100 + 0.5).astype(np.int64)
    assert int(out["n_events"].sum()) == len(ev)
    for _, r in out.iterrows():
        v = ev.loc[ev["day"] == r["day"], "cents"].to_numpy()
        n = len(v)
        for q in (50, 90, 99):
            p = int(r[f"p{q}"])
            assert p in v  # type-1: an observed value, never interpolated
            # rank definition: at least ceil(q*n/100) values are <= p
            assert (v <= p).sum() >= max(1, (q * n + 99) // 100)
            # and removing p drops below the rank bound (tightness)
            assert (v < p).sum() < max(1, (q * n + 99) // 100)


@pytest.mark.usefixtures("ray_session")
def test_pivot_is_dense_and_conserves_totals():
    out = lang_source_pivot(SF)
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    docs = pq.read_table(
        f"{SF}/documents.parquet", columns=["lang", "source", "n_chars"]
    ).to_pandas()
    n_lang = docs["lang"].nunique()
    n_src = docs["source"].nunique()
    assert len(out) == n_lang * n_src  # full cross product, zero-filled
    assert int(out["n_docs"].sum()) == len(docs)
    assert int(out["chars"].sum()) == int(docs["n_chars"].sum())
    cell = out.set_index(["lang", "source"])
    real = docs.groupby(["lang", "source"]).size()
    for key, n in real.items():
        assert int(cell.loc[key, "n_docs"]) == int(n)


@pytest.mark.usefixtures("ray_session")
def test_merkle_root_folds_days_and_localizes_a_flip(tmp_path):
    out = merkle_partition_digest(SF)
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    root = out[out["day"] == -1].iloc[0]
    days = out[out["day"] >= 0]
    assert int(root["n_rows"]) == int(days["n_rows"].sum())
    assert int(root["xor60"]) == int(
        np.bitwise_xor.reduce(days["xor60"].to_numpy()))
    assert int(root["sum_mod"]) == int(
        days["sum_mod"].astype(object).sum()) % _CK_MOD
    # flip one row's value: exactly one day digest changes, plus the root
    ev = pq.read_table(f"{SF}/events.parquet")
    vals = ev["value"].to_numpy().copy()
    vals[0] += 1.0
    mut = ev.set_column(ev.schema.get_field_index("value"), "value",
                        pa.array(vals, ev.schema.field("value").type))
    pq.write_table(mut, str(tmp_path / "events.parquet"))
    out2 = merkle_partition_digest(str(tmp_path))
    out2 = out2.to_pandas() if not isinstance(out2, pd.DataFrame) else out2
    merged = out.merge(out2, on="day", suffixes=("_a", "_b"))
    assert (merged["n_rows_a"] == merged["n_rows_b"]).all()
    diff = merged[merged["xor60_a"] != merged["xor60_b"]]
    assert set(diff["day"]) == {-1, int(ev["ts"][0].cast(pa.int64()).as_py()
                                        // 86_400_000_000)}

"""Operator batch 25 — temporal joins, latency percentiles, dense pivots
and partition-level integrity digests.

Reference anchors: the reference's only temporal logic is "recent N"
SQLite reads (`src/api/dashboard.py`) and its only integrity check is a
full-table md5 recompute; these add the finer instruments:

- nearest_event_join: symmetric-tolerance nearest join (each purchase
  matched to the user's click nearest in time within ±1 h) — the
  event-correlation primitive ASOF (backward-only) cannot express.
- daily_value_percentiles: exact p50/p90/p99 of event value per day via
  type-1 order statistics — the ops-latency dashboard read.
- lang_source_pivot: dense lang × source matrix (zero-filled long form) —
  the pivot every mixture report starts from.
- merkle_partition_digest: per-day order-independent digests (60-bit md5
  slice, XOR + modular sum — table_checksum's conventions) plus a root
  row folding them — anti-entropy that LOCALIZES which partition diverged
  instead of just flagging the table.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .engineops import _CK_MOD, _DAY_US
from .queries import _pd_arrow, _read

_NEJ_TOL_US = 3_600_000_000  # ±1 hour

_PCT_RANKS = [50, 90, 99]


# ---------------------------------------------------------------------------
# nearest_event_join
# ---------------------------------------------------------------------------


def nearest_event_join(sf_dir: str):
    """For every purchase, the SAME user's click nearest in time within
    ±1 hour: (purchase_id, click_id, delta_us); ties at equal |Δ| go to
    the earlier click, then the smaller click id. Purchases with no click
    in tolerance are dropped.

    Scale shape: ONE user-bucketed shuffle co-locates each user's events;
    inside the bucket the match is a vectorized two-candidate searchsorted
    against the user's ts-sorted clicks — never a time-range blowup
    join."""
    ev = _read(sf_dir, "events", columns=["event_id", "ts", "user_id",
                                          "event_type"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": t["event_id"],
            "us": pc.cast(t["ts"], pa.int64()),
            "user_id": t["user_id"],
            "event_type": t["event_type"],
            "_kb": pc.bit_wise_and(t["user_id"], 255),
        })

    def match(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, u in g.groupby("user_id"):
            clicks = u[u["event_type"] == "click"] \
                .sort_values(["us", "event_id"])
            purch = u[u["event_type"] == "purchase"]
            if clicks.empty or purch.empty:
                continue
            cts = clicks["us"].to_numpy(np.int64)
            cid = clicks["event_id"].to_numpy(np.int64)
            pts = purch["us"].to_numpy(np.int64)
            pid = purch["event_id"].to_numpy(np.int64)
            right = np.searchsorted(cts, pts, side="left")
            left = right - 1
            big = np.int64(2**62)
            dl = np.where(left >= 0, pts - cts[np.maximum(left, 0)], big)
            dr = np.where(right < len(cts),
                          cts[np.minimum(right, len(cts) - 1)] - pts, big)
            use_left = dl <= dr  # tie at equal |delta| -> earlier click
            cand = np.where(use_left, np.maximum(left, 0),
                            np.minimum(right, len(cts) - 1))
            delta = np.where(use_left, dl, dr)
            # among equal-ts clicks pick the smallest event_id: remap the
            # candidate to the FIRST index carrying its timestamp
            cand = np.searchsorted(cts, cts[cand], side="left")
            ok = delta <= _NEJ_TOL_US
            outs.append(pd.DataFrame({
                "purchase_id": pid[ok],
                "click_id": cid[cand[ok]],
                "delta_us": delta[ok],
            }))
        if not outs:
            return pd.DataFrame({"purchase_id": pd.Series([], "int64"),
                                 "click_id": pd.Series([], "int64"),
                                 "delta_us": pd.Series([], "int64")})
        return pd.concat(outs, ignore_index=True)

    return (
        ev.map_batches(prep, batch_format="pyarrow")
        .groupby("_kb").map_groups(_pd_arrow(match), batch_format="pandas")
        .sort("purchase_id")
    )


SQL_NEAREST_EVENT_JOIN = f"""
WITH p AS (
  SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS us
  FROM events WHERE event_type = 'purchase'
), c AS (
  SELECT event_id AS click_id, user_id, epoch_us(ts) AS us
  FROM events WHERE event_type = 'click'
), pairs AS (
  SELECT p.purchase_id, c.click_id, abs(p.us - c.us) AS delta_us,
         row_number() OVER (PARTITION BY p.purchase_id
                            ORDER BY abs(p.us - c.us), c.us, c.click_id)
           AS rn
  FROM p JOIN c ON c.user_id = p.user_id
  WHERE abs(p.us - c.us) <= {_NEJ_TOL_US}
)
SELECT purchase_id, click_id, CAST(delta_us AS BIGINT) AS delta_us
FROM pairs WHERE rn = 1 ORDER BY purchase_id
"""


# ---------------------------------------------------------------------------
# daily_value_percentiles
# ---------------------------------------------------------------------------


def daily_value_percentiles(sf_dir: str):
    """Exact p50/p90/p99 of event value (int cents) per day: type-1 order
    statistics at rank ceil(q·n/100) — the latency-dashboard read, exact.

    Scale shape: days are a bounded domain → ONE day-keyed shuffle; the
    rank picks are a vectorized sort inside each day group."""
    ev = _read(sf_dir, "events", columns=["ts", "value"])

    def prep(t: pa.Table) -> pa.Table:
        cents = np.floor(t["value"].to_numpy() * 100 + 0.5).astype(np.int64)
        return pa.table({
            "day": pc.divide(pc.cast(t["ts"], pa.int64()), _DAY_US),
            "cents": pa.array(cents, pa.int64()),
        })

    def ranks(g: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(g["cents"].to_numpy(np.int64))
        n = len(v)
        row = {"day": np.int64(g["day"].iloc[0]), "n_events": np.int64(n)}
        for q in _PCT_RANKS:
            r = max(1, (q * n + 99) // 100)
            row[f"p{q}"] = np.int64(v[r - 1])
        return pd.DataFrame([row])

    return (
        ev.map_batches(prep, batch_format="pyarrow")
        .groupby("day").map_groups(_pd_arrow(ranks), batch_format="pandas")
        .sort("day")
    )


def _pct_sql() -> str:
    picks = ", ".join(
        f"CAST(max(CASE WHEN rn = greatest(1, ({q} * n + 99) // 100)"
        f" THEN cents END) AS BIGINT) AS p{q}"
        for q in _PCT_RANKS)
    return f"""
WITH e AS (
  SELECT epoch_us(ts) // {_DAY_US} AS day,
         CAST(floor(value*100 + 0.5) AS BIGINT) AS cents
  FROM events
), ranked AS (
  SELECT day, cents,
         row_number() OVER (PARTITION BY day ORDER BY cents) AS rn,
         count(*) OVER (PARTITION BY day) AS n
  FROM e
)
SELECT day, CAST(max(n) AS BIGINT) AS n_events, {picks}
FROM ranked GROUP BY day ORDER BY day
"""


SQL_DAILY_VALUE_PERCENTILES = _pct_sql()


# ---------------------------------------------------------------------------
# lang_source_pivot
# ---------------------------------------------------------------------------


def lang_source_pivot(sf_dir: str):
    """Dense lang × source matrix in long form (zero-filled): doc count
    and char volume per cell — the mixture report's starting pivot.

    Scale shape: one bounded (lang, source) groupby; the dense spine is
    the cross product of two bounded domains, built output-side."""
    ds = _read(sf_dir, "documents", columns=["lang", "source", "n_chars"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "lang": t["lang"], "source": t["source"],
            "n_docs": pa.array(np.ones(t.num_rows, np.int64)),
            "chars": t["n_chars"],
        })

    cells = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["lang", "source"]).sum(["n_docs", "chars"])
        .to_pandas()
    )
    cells.columns = ["lang", "source", "n_docs", "chars"]
    langs = sorted(cells["lang"].unique())
    srcs = sorted(cells["source"].unique())
    spine = pd.MultiIndex.from_product([langs, srcs],
                                       names=["lang", "source"])
    dense = cells.set_index(["lang", "source"]) \
        .reindex(spine, fill_value=0).reset_index()
    for c in ("n_docs", "chars"):
        dense[c] = dense[c].astype("int64")
    return pa.Table.from_pandas(dense, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_LANG_SOURCE_PIVOT = """
WITH cells AS (
  SELECT lang, source, count(*) AS n_docs, sum(n_chars) AS chars
  FROM documents GROUP BY 1, 2
), spine AS (
  SELECT l.lang, s.source
  FROM (SELECT DISTINCT lang FROM documents) l
  CROSS JOIN (SELECT DISTINCT source FROM documents) s
)
SELECT sp.lang, sp.source,
       CAST(coalesce(c.n_docs, 0) AS BIGINT) AS n_docs,
       CAST(coalesce(c.chars, 0) AS BIGINT) AS chars
FROM spine sp LEFT JOIN cells c
  ON c.lang = sp.lang AND c.source = sp.source
ORDER BY sp.lang, sp.source
"""


# ---------------------------------------------------------------------------
# merkle_partition_digest
# ---------------------------------------------------------------------------


def merkle_partition_digest(sf_dir: str):
    """Per-day order-independent event digests (60-bit md5 slice of the
    canonical row string, XOR + sum mod 2^61-1 — table_checksum's
    conventions) plus a root row (day = -1) folding the per-day digests:
    anti-entropy that localizes WHICH partition diverged.

    Scale shape: each block folds to per-day partial rows (the combiner);
    one bounded day groupby merges them; the root folds the day table.
    XOR and the modular sum are associative, so block order and
    partitioning cannot change any digest."""
    ev = _read(sf_dir, "events", columns=["event_id", "ts", "user_id",
                                          "value"])

    def fold(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64()).to_numpy()
        day = us // _DAY_US
        cents = np.floor(t["value"].to_numpy() * 100 + 0.5).astype(np.int64)
        eid = t["event_id"].to_numpy()
        uid = t["user_id"].to_numpy()
        hs = np.empty(len(eid), np.int64)
        for i in range(len(eid)):
            s = f"{eid[i]}|{uid[i]}|{us[i]}|{cents[i]}"
            hs[i] = int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
        df = pd.DataFrame({"day": day, "h": hs})
        parts = df.groupby("day")["h"].agg(
            n="size",
            x=lambda v: int(np.bitwise_xor.reduce(v.to_numpy())),
            s=lambda v: int(v.astype(object).sum()) % _CK_MOD,
        ).reset_index()
        return pa.Table.from_pandas(parts.astype("int64"),
                                    preserve_index=False) \
            .replace_schema_metadata(None)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "day": [np.int64(g["day"].iloc[0])],
            "n_rows": np.int64(g["n"].sum()),
            "xor60": np.int64(np.bitwise_xor.reduce(g["x"].to_numpy())),
            "sum_mod": np.int64(int(g["s"].astype(object).sum()) % _CK_MOD),
        })

    days = (
        ev.map_batches(fold, batch_format="pyarrow")
        .groupby("day").map_groups(_pd_arrow(merge), batch_format="pandas")
        .to_pandas()
    ).sort_values("day").reset_index(drop=True)
    root = pd.DataFrame({
        "day": [np.int64(-1)],
        "n_rows": np.int64(days["n_rows"].sum()),
        "xor60": np.int64(np.bitwise_xor.reduce(days["xor60"].to_numpy())),
        "sum_mod": np.int64(int(days["sum_mod"].astype(object).sum())
                            % _CK_MOD),
    })
    out = pd.concat([root, days], ignore_index=True)
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_MERKLE_PARTITION_DIGEST = f"""
WITH h AS (
  SELECT epoch_us(ts) // {_DAY_US} AS day,
         CAST(('0x' || substr(md5(
           CAST(event_id AS VARCHAR) || '|' ||
           CAST(user_id AS VARCHAR) || '|' ||
           CAST(epoch_us(ts) AS VARCHAR) || '|' ||
           CAST(CAST(floor(value*100 + 0.5) AS BIGINT) AS VARCHAR)),
           1, 15)) AS BIGINT) AS h
  FROM events
), days AS (
  SELECT day, count(*) AS n_rows, bit_xor(h) AS xor60,
         sum(h) % {_CK_MOD} AS sum_mod
  FROM h GROUP BY 1
), root AS (
  SELECT -1 AS day, sum(n_rows) AS n_rows, bit_xor(xor60) AS xor60,
         sum(sum_mod) % {_CK_MOD} AS sum_mod
  FROM days
)
SELECT CAST(day AS BIGINT) AS day, CAST(n_rows AS BIGINT) AS n_rows,
       CAST(xor60 AS BIGINT) AS xor60, CAST(sum_mod AS BIGINT) AS sum_mod
FROM (SELECT * FROM root UNION ALL SELECT * FROM days) ORDER BY day
"""


INTEGRITY_REGISTRY = {
    "nearest_event_join": (nearest_event_join, SQL_NEAREST_EVENT_JOIN),
    "daily_value_percentiles": (daily_value_percentiles,
                                SQL_DAILY_VALUE_PERCENTILES),
    "lang_source_pivot": (lang_source_pivot, SQL_LANG_SOURCE_PIVOT),
    "merkle_partition_digest": (merkle_partition_digest,
                                SQL_MERKLE_PARTITION_DIGEST),
}

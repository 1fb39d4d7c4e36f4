"""Operator batch 56 — pattern saturation, price stickiness and outage
detection.

Reference anchors: none in the reference; these add:

- type_trigram_coverage: how much of the event-type pattern space the
  stream has explored — distinct per-user type trigrams observed vs the
  |types|³ possible, in ppm; low coverage means the behavioral space is
  far from saturated (the sequence-level sibling of gram_novelty).
- repeat_price_rate: price stickiness — the share of consecutive
  same-user purchases repeating the previous purchase's exact cents, per
  event count and user count; scripted traffic and subscriptions read
  high.
- longest_quiet_run: outage detection — the longest run of consecutive
  ZERO-event days per type within the dense day range, plus the total
  quiet days; a nonzero run inside an otherwise busy stream is the
  outage signature.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Count, Sum

from .engineops import _DAY_US
from .queries import _pd_arrow, _read


def _cents(x: np.ndarray) -> np.ndarray:
    return np.floor(x * 100 + 0.5).astype(np.int64)


# ---------------------------------------------------------------------------
# type_trigram_coverage
# ---------------------------------------------------------------------------


def type_trigram_coverage(sf_dir: str):
    """Distinct per-user event-type trigrams (consecutive, ordered by
    (ts, event_id)) vs the |types|³ possible: observed, possible and
    coverage ppm.

    Scale shape: trigrams fold per user in ONE user-bucketed shuffle
    into block-local distinct sets; the global distinct census is
    bounded (≤ |types|³)."""
    ev = _read(sf_dir, "events", columns=["event_id", "ts", "user_id",
                                          "event_type"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t["user_id"],
            "us": pc.cast(t["ts"], pa.int64()),
            "event_id": t["event_id"],
            "event_type": t["event_type"],
            "_kb": pc.bit_wise_and(t["user_id"], 255),
        })

    def tris(g: pd.DataFrame) -> pd.DataFrame:
        seen = set()
        for _, u in g.groupby("user_id"):
            order = np.lexsort((u["event_id"].to_numpy(np.int64),
                                u["us"].to_numpy(np.int64)))
            et = u["event_type"].to_numpy()[order]
            for i in range(len(et) - 2):
                seen.add((et[i], et[i + 1], et[i + 2]))
        if not seen:
            return pd.DataFrame({"a": pd.Series([], dtype="object"),
                                 "b": pd.Series([], dtype="object"),
                                 "c3": pd.Series([], dtype="object")})
        rows = sorted(seen)
        return pd.DataFrame(rows, columns=["a", "b", "c3"])

    tri = (
        ev.map_batches(prep, batch_format="pyarrow")
        .groupby("_kb").map_groups(_pd_arrow(tris), batch_format="pandas")
        .groupby(["a", "b", "c3"]).aggregate(Count(alias_name="n"))
        .to_pandas()
    )
    observed = len(tri)
    k = int(_read(sf_dir, "events", columns=["event_type"])
            .groupby("event_type").aggregate(Count(alias_name="c"))
            .to_pandas().shape[0])
    possible = k ** 3
    out = pd.DataFrame({
        "n_types": [np.int64(k)],
        "observed": np.int64(observed),
        "possible": np.int64(possible),
        "coverage_ppm": np.int64(observed * 1_000_000 // possible
                                 if possible else 0),
    })
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_TYPE_TRIGRAM_COVERAGE = """
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type, 1) OVER w AS p1,
         lag(event_type, 2) OVER w AS p2
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
), tri AS (
  SELECT DISTINCT p2, p1, event_type FROM seq
  WHERE p1 IS NOT NULL AND p2 IS NOT NULL
), k AS (SELECT count(DISTINCT event_type) AS k FROM events)
SELECT CAST((SELECT k FROM k) AS BIGINT) AS n_types,
       CAST((SELECT count(*) FROM tri) AS BIGINT) AS observed,
       CAST((SELECT k * k * k FROM k) AS BIGINT) AS possible,
       CAST((SELECT count(*) FROM tri) * 1000000
            // (SELECT k * k * k FROM k) AS BIGINT) AS coverage_ppm
"""


# ---------------------------------------------------------------------------
# repeat_price_rate
# ---------------------------------------------------------------------------


def repeat_price_rate(sf_dir: str):
    """Price stickiness: among consecutive same-user purchases (ordered
    by ts, event_id), the share repeating the previous purchase's exact
    cents — pairs, repeats, rate ppm, and the users with ≥ 1 repeat.

    Scale shape: per-user ordered scan in ONE user-bucketed shuffle
    emitting three counters per user; one bounded aggregate."""
    ev = _read(sf_dir, "events", columns=["event_id", "ts", "user_id",
                                          "event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["event_type"], "purchase"))
        return pa.table({
            "user_id": t["user_id"],
            "us": pc.cast(t["ts"], pa.int64()),
            "event_id": t["event_id"],
            "cents": pa.array(_cents(t["value"].to_numpy()), pa.int64()),
            "_kb": pc.bit_wise_and(t["user_id"], 255),
        })

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        pairs = reps = urep = 0
        for _, u in g.groupby("user_id"):
            order = np.lexsort((u["event_id"].to_numpy(np.int64),
                                u["us"].to_numpy(np.int64)))
            c = u["cents"].to_numpy(np.int64)[order]
            if len(c) < 2:
                continue
            eq = c[1:] == c[:-1]
            pairs += len(eq)
            reps += int(eq.sum())
            urep += 1 if eq.any() else 0
        return pd.DataFrame({"pairs": [np.int64(pairs)],
                             "reps": np.int64(reps),
                             "urep": np.int64(urep)})

    agg = (
        ev.map_batches(prep, batch_format="pyarrow")
        .groupby("_kb").map_groups(_pd_arrow(scan), batch_format="pandas")
        .aggregate(Sum("pairs", alias_name="p"),
                   Sum("reps", alias_name="r"),
                   Sum("urep", alias_name="u")) or {})
    p, r, u = (int(agg.get("p") or 0), int(agg.get("r") or 0),
               int(agg.get("u") or 0))
    out = pd.DataFrame({
        "n_pairs": [np.int64(p)], "n_repeats": np.int64(r),
        "repeat_ppm": np.int64(r * 1_000_000 // p if p else 0),
        "users_with_repeat": np.int64(u),
    })
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_REPEAT_PRICE_RATE = """
WITH p AS (
  SELECT user_id, CAST(floor(value*100 + 0.5) AS BIGINT) AS cents,
         lag(CAST(floor(value*100 + 0.5) AS BIGINT)) OVER w AS prev
  FROM events WHERE event_type = 'purchase'
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
), pairs AS (
  SELECT user_id, CASE WHEN cents = prev THEN 1 ELSE 0 END AS rep
  FROM p WHERE prev IS NOT NULL
), agg AS (
  SELECT count(*) AS np_, sum(rep) AS nr,
         count(DISTINCT CASE WHEN rep = 1 THEN user_id END) AS ur
  FROM pairs
)
SELECT CAST(np_ AS BIGINT) AS n_pairs, CAST(nr AS BIGINT) AS n_repeats,
       CAST(CASE WHEN np_ = 0 THEN 0
                 ELSE nr * 1000000 // np_ END AS BIGINT) AS repeat_ppm,
       CAST(ur AS BIGINT) AS users_with_repeat
FROM agg
"""


# ---------------------------------------------------------------------------
# longest_quiet_run
# ---------------------------------------------------------------------------


def longest_quiet_run(sf_dir: str):
    """Outage signature per event type: over the dense global day range,
    the number of zero-event days and the LONGEST consecutive zero run.

    Scale shape: bounded day table — one vectorized run scan per type."""
    ev = _read(sf_dir, "events", columns=["ts", "event_type"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": t["event_type"],
            "day": pc.divide(pc.cast(t["ts"], pa.int64()), _DAY_US),
        })

    daily = (
        ev.map_batches(prep, batch_format="pyarrow")
        .groupby(["event_type", "day"]).aggregate(Count(alias_name="c"))
        .to_pandas()
    )
    lo, hi = int(daily["day"].min()), int(daily["day"].max())
    n = hi - lo + 1
    rows = []
    for etype, g in daily.groupby("event_type"):
        x = np.zeros(n, np.int64)
        x[g["day"].to_numpy(np.int64) - lo] = g["c"].to_numpy(np.int64)
        zero = x == 0
        best = run = 0
        for z in zero:
            run = run + 1 if z else 0
            best = max(best, run)
        rows.append((etype, n, int(zero.sum()), best))
    out = pd.DataFrame(rows, columns=["event_type", "n_days",
                                      "quiet_days", "longest_run"]) \
        .sort_values("event_type").reset_index(drop=True)
    for c in ("n_days", "quiet_days", "longest_run"):
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_LONGEST_QUIET_RUN = f"""
WITH d AS (
  SELECT event_type, epoch_us(ts) // {_DAY_US} AS day, count(*) AS c
  FROM events GROUP BY 1, 2
), lims AS (SELECT min(day) AS lo, max(day) AS hi,
                   max(day) - min(day) + 1 AS n FROM d),
spine AS (
  SELECT t.event_type, s.day
  FROM (SELECT DISTINCT event_type FROM d) t
  CROSS JOIN (SELECT unnest(generate_series((SELECT lo FROM lims),
                                            (SELECT hi FROM lims)))
              AS day) s
), dense AS (
  SELECT sp.event_type, sp.day,
         CASE WHEN d.c IS NULL THEN 1 ELSE 0 END AS quiet
  FROM spine sp LEFT JOIN d
    ON d.event_type = sp.event_type AND d.day = sp.day
), runs AS (
  -- gaps-and-islands: group consecutive quiet days by (day - rn)
  SELECT event_type, day - row_number() OVER (PARTITION BY event_type
                                              ORDER BY day) AS grp
  FROM dense WHERE quiet = 1
), runlen AS (
  SELECT event_type, count(*) AS len FROM runs GROUP BY event_type, grp
)
SELECT de.event_type,
       CAST((SELECT n FROM lims) AS BIGINT) AS n_days,
       CAST(sum(de.quiet) AS BIGINT) AS quiet_days,
       CAST(coalesce((SELECT max(len) FROM runlen r
                      WHERE r.event_type = de.event_type), 0) AS BIGINT)
         AS longest_run
FROM dense de GROUP BY de.event_type ORDER BY de.event_type
"""


OPSMISC_REGISTRY = {
    "type_trigram_coverage": (type_trigram_coverage,
                              SQL_TYPE_TRIGRAM_COVERAGE),
    "repeat_price_rate": (repeat_price_rate, SQL_REPEAT_PRICE_RATE),
    "longest_quiet_run": (longest_quiet_run, SQL_LONGEST_QUIET_RUN),
}

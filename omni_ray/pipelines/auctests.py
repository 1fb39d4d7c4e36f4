"""Operator batch 53 — two-sample dominance, sequence predictability and
money-weighted location.

Reference anchors: none in the reference; these add:

- mann_whitney_auc: the Mann–Whitney U / AUC of each source's document
  lengths against the REST of the corpus, computed EXACTLY from the
  bounded value histogram (wins + half-ties, doubled to stay integer) —
  the probability a random doc of this source is longer than a random
  other doc; Cliff's delta = 2·AUC − 1 included. The two-sample
  dominance read KS (sup) and EMD (integral) don't give.
- markov_top1_accuracy: how predictable the event stream is — the
  accuracy of predicting each next event type by the argmax of the
  previous type's transition row, vs the global-mode baseline; the gap
  is the value of sequence context.
- money_weighted_median: the purchase cent value below which half the
  MONEY lies (revenue-weighted median, from the bounded value histogram)
  vs the ordinary count-median — the "typical dollar" vs "typical
  purchase" gap that flags whale-skewed revenue.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Count, Sum

from .queries import _pd_arrow, _read
from .tsops import _trunc_div


def _cents(x: np.ndarray) -> np.ndarray:
    return np.floor(x * 100 + 0.5).astype(np.int64)


# ---------------------------------------------------------------------------
# mann_whitney_auc
# ---------------------------------------------------------------------------


def mann_whitney_auc(sf_dir: str):
    """Per source: AUC of its n_chars against the rest — u2 = 2·wins +
    ties over all cross pairs (from the bounded value histogram, never
    row pairs), auc_ppm = u2·10⁶ // (2·n_s·n_r), cliffs_delta_milli =
    trunc(1000·(u2 − n_s·n_r) / (n_s·n_r)).

    Scale shape: one bounded (source, n_chars) groupby; per-source the
    wins/ties fold runs over the value support with cumulative rest
    counts — O(sources × support), no pair materialization."""
    ds = _read(sf_dir, "documents", columns=["source", "n_chars"])
    hist = (
        ds.groupby(["source", "n_chars"]).aggregate(Count(alias_name="c"))
        .to_pandas()
    )
    support = np.sort(hist["n_chars"].unique())
    glob = hist.groupby("n_chars")["c"].sum() \
        .reindex(support, fill_value=0).to_numpy(np.int64)
    n_all = int(glob.sum())
    rows = []
    for src, g in hist.groupby("source"):
        cnt = g.set_index("n_chars")["c"] \
            .reindex(support, fill_value=0).to_numpy(np.int64)
        rest = glob - cnt
        n_s, n_r = int(cnt.sum()), n_all - int(cnt.sum())
        below = np.concatenate([[0], np.cumsum(rest)[:-1]])
        wins = int((cnt.astype(object) * below.astype(object)).sum())
        ties = int((cnt.astype(object) * rest.astype(object)).sum())
        u2 = 2 * wins + ties
        denom = n_s * n_r
        rows.append((src, n_s,
                     u2 * 1_000_000 // (2 * denom) if denom else 0,
                     _trunc_div(1000 * (u2 - denom), denom)
                     if denom else 0))
    out = pd.DataFrame(rows, columns=["source", "n_docs", "auc_ppm",
                                      "cliffs_delta_milli"]) \
        .sort_values("source").reset_index(drop=True)
    for c in ("n_docs", "auc_ppm", "cliffs_delta_milli"):
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_MANN_WHITNEY_AUC = """
WITH cells AS (
  SELECT source, n_chars, count(*) AS cnt FROM documents GROUP BY 1, 2
), srcs AS (SELECT source, sum(cnt) AS n_s FROM cells GROUP BY 1),
tot AS (SELECT count(*) AS n FROM documents),
pairs AS (
  SELECT s.source,
         sum(CASE WHEN a.n_chars > b.n_chars
                  THEN 2 * CAST(a.cnt AS HUGEINT) * b.cnt
                  WHEN a.n_chars = b.n_chars
                  THEN CAST(a.cnt AS HUGEINT) * b.cnt
                  ELSE 0 END) AS u2
  FROM srcs s
  JOIN cells a ON a.source = s.source
  JOIN cells b ON b.source != s.source
  GROUP BY 1
)
SELECT p.source, CAST(s.n_s AS BIGINT) AS n_docs,
       CAST(p.u2 * 1000000
            // (2 * CAST(s.n_s AS HUGEINT)
                * ((SELECT n FROM tot) - s.n_s)) AS BIGINT) AS auc_ppm,
       CAST(1000 * (p.u2 - CAST(s.n_s AS HUGEINT)
                    * ((SELECT n FROM tot) - s.n_s))
            // (CAST(s.n_s AS HUGEINT) * ((SELECT n FROM tot) - s.n_s))
            AS BIGINT) AS cliffs_delta_milli
FROM pairs p JOIN srcs s USING (source) ORDER BY p.source
"""


# ---------------------------------------------------------------------------
# markov_top1_accuracy
# ---------------------------------------------------------------------------


def markov_top1_accuracy(sf_dir: str):
    """Sequence predictability: over per-user consecutive transitions,
    the accuracy of predicting the next type by the argmax of the
    previous type's row (ties to the lexicographically smaller type) vs
    the global-mode baseline. One row: transitions, markov hits,
    baseline hits, both accuracies in ppm.

    Scale shape: transitions fold per user in ONE user-bucketed shuffle;
    the cell matrix and both argmaxes are bounded."""
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

    def trans(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, u in g.groupby("user_id"):
            order = np.lexsort((u["event_id"].to_numpy(np.int64),
                                u["us"].to_numpy(np.int64)))
            et = u["event_type"].to_numpy()[order]
            if len(et) < 2:
                continue
            outs.append(pd.DataFrame({"prev": et[:-1], "nxt": et[1:]}))
        if not outs:
            return pd.DataFrame({"prev": pd.Series([], dtype="object"),
                                 "nxt": pd.Series([], dtype="object")})
        return pd.concat(outs, ignore_index=True)

    cells = (
        ev.map_batches(prep, batch_format="pyarrow")
        .groupby("_kb").map_groups(_pd_arrow(trans), batch_format="pandas")
        .groupby(["prev", "nxt"]).aggregate(Count(alias_name="c"))
        .to_pandas()
    )
    total = int(cells["c"].sum())
    # markov hits: per prev row, the argmax cell (ties -> smaller nxt)
    markov = 0
    for _, g in cells.groupby("prev"):
        top = g.sort_values(["c", "nxt"], ascending=[False, True]).iloc[0]
        markov += int(top["c"])
    # baseline: the global modal NEXT type
    nxt_tot = cells.groupby("nxt")["c"].sum().reset_index() \
        .sort_values(["c", "nxt"], ascending=[False, True])
    base = int(nxt_tot["c"].iloc[0]) if len(nxt_tot) else 0
    out = pd.DataFrame({
        "n_transitions": [np.int64(total)],
        "markov_hits": np.int64(markov),
        "baseline_hits": np.int64(base),
        "markov_ppm": np.int64(markov * 1_000_000 // total
                               if total else 0),
        "baseline_ppm": np.int64(base * 1_000_000 // total
                                 if total else 0),
    })
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_MARKOV_TOP1_ACCURACY = """
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY epoch_us(ts), event_id) AS prev
  FROM events
), cells AS (
  SELECT prev, event_type AS nxt, count(*) AS c
  FROM seq WHERE prev IS NOT NULL GROUP BY 1, 2
), top_row AS (
  SELECT prev, c,
         row_number() OVER (PARTITION BY prev
                            ORDER BY c DESC, nxt) AS rn
  FROM cells
), nxt_tot AS (
  SELECT nxt, sum(c) AS c FROM cells GROUP BY 1
), agg AS (
  SELECT (SELECT sum(c) FROM cells) AS total,
         (SELECT sum(c) FROM top_row WHERE rn = 1) AS markov,
         (SELECT c FROM nxt_tot ORDER BY c DESC, nxt LIMIT 1) AS base
)
SELECT CAST(total AS BIGINT) AS n_transitions,
       CAST(markov AS BIGINT) AS markov_hits,
       CAST(base AS BIGINT) AS baseline_hits,
       CAST(markov * 1000000 // total AS BIGINT) AS markov_ppm,
       CAST(base * 1000000 // total AS BIGINT) AS baseline_ppm
FROM agg
"""


# ---------------------------------------------------------------------------
# money_weighted_median
# ---------------------------------------------------------------------------


def money_weighted_median(sf_dir: str):
    """The purchase price below which half the MONEY lies: the smallest
    cent value v with cumulative revenue(≤ v) ≥ total/2 (ceil), from the
    bounded value histogram, vs the ordinary count median (same rank
    rule on counts). A money median far above the count median flags
    whale-skewed revenue.

    Scale shape: one bounded cents-value groupby carrying (count,
    revenue mass); both medians come from cumulative scans of the
    bounded histogram."""
    ev = _read(sf_dir, "events", columns=["event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["event_type"], "purchase"))
        c = _cents(t["value"].to_numpy())
        return pa.table({"cents": pa.array(c, pa.int64()),
                         "one": pa.array(np.ones(len(c), np.int64))})

    hist = (
        ev.map_batches(prep, batch_format="pyarrow")
        .groupby("cents").aggregate(Sum("one", alias_name="n"))
        .to_pandas().sort_values("cents")
    )
    v = hist["cents"].to_numpy(np.int64)
    n = hist["n"].to_numpy(np.int64)
    mass = v.astype(object) * n.astype(object)
    total_n, total_m = int(n.sum()), int(sum(mass))
    cum_n = np.cumsum(n)
    cum_m = np.cumsum(mass)
    count_med = int(v[np.searchsorted(cum_n, (total_n + 1) // 2,
                                      side="left")])
    money_med = int(v[np.searchsorted(cum_m, (total_m + 1) // 2,
                                      side="left")])
    out = pd.DataFrame({
        "n_purchases": [np.int64(total_n)],
        "count_median_cents": np.int64(count_med),
        "money_median_cents": np.int64(money_med),
        "gap_cents": np.int64(money_med - count_med),
    })
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_MONEY_WEIGHTED_MEDIAN = """
WITH p AS (
  SELECT CAST(floor(value*100 + 0.5) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
), hist AS (
  SELECT cents, count(*) AS n FROM p GROUP BY 1
), scan AS (
  SELECT cents,
         sum(n) OVER (ORDER BY cents) AS cum_n,
         sum(CAST(cents AS HUGEINT) * n) OVER (ORDER BY cents) AS cum_m
  FROM hist
), tot AS (
  SELECT sum(n) AS tn, sum(CAST(cents AS HUGEINT) * n) AS tm FROM hist
), cmed AS (
  SELECT min(cents) AS v FROM scan
  WHERE cum_n >= ((SELECT tn FROM tot) + 1) // 2
), mmed AS (
  SELECT min(cents) AS v FROM scan
  WHERE cum_m >= ((SELECT tm FROM tot) + 1) // 2
)
SELECT CAST((SELECT tn FROM tot) AS BIGINT) AS n_purchases,
       CAST((SELECT v FROM cmed) AS BIGINT) AS count_median_cents,
       CAST((SELECT v FROM mmed) AS BIGINT) AS money_median_cents,
       CAST((SELECT v FROM mmed) - (SELECT v FROM cmed) AS BIGINT)
         AS gap_cents
"""


AUCTESTS_REGISTRY = {
    "mann_whitney_auc": (mann_whitney_auc, SQL_MANN_WHITNEY_AUC),
    "markov_top1_accuracy": (markov_top1_accuracy,
                             SQL_MARKOV_TOP1_ACCURACY),
    "money_weighted_median": (money_weighted_median,
                              SQL_MONEY_WEIGHTED_MEDIAN),
}

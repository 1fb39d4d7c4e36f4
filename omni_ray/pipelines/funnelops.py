"""Operator batch 62 — first-touch funnels, classifier PR/F1 and
information freshness.

Reference anchors: none in the reference; these add:

- first_touch_census: per event type, the users whose FIRST event
  (by ts, event_id) is of that type, and what share of them eventually
  purchase — the acquisition-channel read of the funnel.
- stump_pr_f1: precision / recall / F1 (milli) of batch 47's decision
  stump at its chosen threshold, predicting "term-rich" as n_chars >
  threshold — the eval loop closed on the one-feature baseline.
- age_of_information: mean staleness per event type — if a consumer
  reads the latest event at a uniformly random instant of each user's
  active span, the expected age is Σg²/(2·Σg) over the user's gaps;
  reported in milli-seconds-of-gap units as 1000·Σg² // (2·Σg) — the
  freshness metric behind "how old is the data you actually see?".
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Count, Sum

from .queries import _pd_arrow, _read

_WORD_RE = __import__("re").compile(r"[a-z]+")
_RICH_TERMS = 200


# ---------------------------------------------------------------------------
# first_touch_census
# ---------------------------------------------------------------------------


def first_touch_census(sf_dir: str):
    """Per event type: users whose first event (ts, event_id order) is
    of that type, and the ppm share of them that EVER purchase — which
    entry points produce buyers.

    Scale shape: per-user (first type, ever-purchased) folds in ONE
    user-bucketed shuffle; the census is a bounded type groupby."""
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

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for _, u in g.groupby("user_id"):
            order = np.lexsort((u["event_id"].to_numpy(np.int64),
                                u["us"].to_numpy(np.int64)))
            et = u["event_type"].to_numpy()[order]
            rows.append((et[0], 1,
                         1 if (et == "purchase").any() else 0))
        return pd.DataFrame(rows, columns=["first_type", "n", "buys"])

    out = (
        ev.map_batches(prep, batch_format="pyarrow")
        .groupby("_kb").map_groups(_pd_arrow(fold), batch_format="pandas")
        .groupby("first_type").aggregate(Sum("n", alias_name="n_users"),
                                         Sum("buys", alias_name="buyers"))
        .to_pandas().sort_values("first_type").reset_index(drop=True)
    )
    out["buy_ppm"] = (out["buyers"].astype("int64") * 1_000_000
                      // out["n_users"].astype("int64"))
    for c in ("n_users", "buyers", "buy_ppm"):
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_FIRST_TOUCH_CENSUS = """
WITH firsts AS (
  SELECT user_id, event_type AS first_type
  FROM (SELECT user_id, event_type,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY epoch_us(ts), event_id) AS rn
        FROM events)
  WHERE rn = 1
), buyers AS (
  SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
), agg AS (
  SELECT f.first_type, count(*) AS n_users,
         sum(CASE WHEN b.user_id IS NOT NULL THEN 1 ELSE 0 END) AS buyers
  FROM firsts f LEFT JOIN buyers b USING (user_id)
  GROUP BY 1
)
SELECT first_type, CAST(n_users AS BIGINT) AS n_users,
       CAST(buyers AS BIGINT) AS buyers,
       CAST(buyers * 1000000 // n_users AS BIGINT) AS buy_ppm
FROM agg ORDER BY first_type
"""


# ---------------------------------------------------------------------------
# stump_pr_f1
# ---------------------------------------------------------------------------


def stump_pr_f1(sf_dir: str):
    """Precision / recall / F1 of the batch-47 stump: find the
    misclassification-optimal threshold on n_chars (identical scan),
    then predict rich ⟺ n_chars > threshold and report tp/fp/fn with
    precision, recall and F1 = 2·tp·1000 // (2·tp + fp + fn) in milli.

    Scale shape: the bounded value histogram from batch 47 carries
    everything; both passes are bounded scans."""
    ds = _read(sf_dir, "documents", columns=["text", "n_chars"])

    def prep(t: pa.Table) -> pa.Table:
        rich = np.array([len(set(_WORD_RE.findall((x or "").lower())))
                         >= _RICH_TERMS for x in t["text"].to_pylist()],
                        np.int64)
        return pa.table({
            "len_v": pa.array(np.asarray(t["n_chars"].to_numpy(),
                                         np.int64)),
            "rich": pa.array(rich, pa.int64()),
        })

    hist = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["len_v", "rich"]).aggregate(Count(alias_name="c"))
        .to_pandas()
    )
    piv = hist.pivot_table(index="len_v", columns="rich", values="c",
                           fill_value=0, aggfunc="sum").sort_index()
    pos = piv.get(1, pd.Series(0, index=piv.index)).to_numpy(np.int64)
    neg = piv.get(0, pd.Series(0, index=piv.index)).to_numpy(np.int64)
    vals = piv.index.to_numpy(np.int64)
    p_tot, n_tot = int(pos.sum()), int(neg.sum())
    cpos, cneg = np.cumsum(pos), np.cumsum(neg)
    err = (np.minimum(cpos, cneg)
           + np.minimum(p_tot - cpos, n_tot - cneg))
    best = int(np.argmin(err))
    thr = int(vals[best])
    # predict rich above the threshold
    tp = p_tot - int(cpos[best])
    fp = n_tot - int(cneg[best])
    fn = int(cpos[best])
    prec = tp * 1000 // (tp + fp) if tp + fp else 0
    rec = tp * 1000 // (tp + fn) if tp + fn else 0
    f1 = 2 * tp * 1000 // (2 * tp + fp + fn) if 2 * tp + fp + fn else 0
    out = pd.DataFrame({
        "threshold": [np.int64(thr)], "tp": np.int64(tp),
        "fp": np.int64(fp), "fn": np.int64(fn),
        "precision_milli": np.int64(prec),
        "recall_milli": np.int64(rec),
        "f1_milli": np.int64(f1),
    })
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_STUMP_PR_F1 = f"""
WITH v AS (
  SELECT n_chars AS len_v,
         CASE WHEN len(list_distinct(regexp_extract_all(
                lower(coalesce(text, '')), '[a-z]+'))) >= {_RICH_TERMS}
              THEN 1 ELSE 0 END AS rich
  FROM documents
), hist AS (
  SELECT len_v, sum(rich) AS p, sum(1 - rich) AS q
  FROM v GROUP BY 1
), tot AS (SELECT sum(p) AS pt, sum(q) AS qt FROM hist),
scan AS (
  SELECT len_v,
         sum(p) OVER (ORDER BY len_v) AS cp,
         sum(q) OVER (ORDER BY len_v) AS cq
  FROM hist
), best AS (
  SELECT len_v, cp, cq,
         row_number() OVER (
           ORDER BY least(cp, cq) + least((SELECT pt FROM tot) - cp,
                                          (SELECT qt FROM tot) - cq),
                    len_v) AS rn
  FROM scan
), pick AS (
  SELECT len_v AS thr,
         (SELECT pt FROM tot) - cp AS tp,
         (SELECT qt FROM tot) - cq AS fp,
         cp AS fn
  FROM best WHERE rn = 1
)
SELECT CAST(thr AS BIGINT) AS threshold, CAST(tp AS BIGINT) AS tp,
       CAST(fp AS BIGINT) AS fp, CAST(fn AS BIGINT) AS fn,
       CAST(CASE WHEN tp + fp = 0 THEN 0
                 ELSE tp * 1000 // (tp + fp) END AS BIGINT)
         AS precision_milli,
       CAST(CASE WHEN tp + fn = 0 THEN 0
                 ELSE tp * 1000 // (tp + fn) END AS BIGINT)
         AS recall_milli,
       CAST(CASE WHEN 2 * tp + fp + fn = 0 THEN 0
                 ELSE 2 * tp * 1000 // (2 * tp + fp + fn) END AS BIGINT)
         AS f1_milli
FROM pick
"""


# ---------------------------------------------------------------------------
# age_of_information
# ---------------------------------------------------------------------------


def age_of_information(sf_dir: str):
    """Mean age of the latest event at a uniformly random instant of the
    active span, per type: aoi_milli = 1000·Σg² // (2·Σg) over per-user
    seconds-quantized gaps — the freshness a random reader experiences
    (Σg being the covered span; the length-biased sibling of the mean
    gap).

    Scale shape: reuses the user-bucketed gap-moment fold."""
    from .renewops import _gap_moments
    m = _gap_moments(sf_dir)
    rows = []
    for _, r in m.iterrows():
        s, ss = int(r["s"]), int(r["ss"])
        rows.append((r["event_type"], int(r["n"]),
                     1000 * ss // (2 * s) if s else 0))
    out = pd.DataFrame(rows, columns=["event_type", "n_gaps",
                                      "aoi_milli_s"])
    for c in ("n_gaps", "aoi_milli_s"):
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_AGE_OF_INFORMATION = """
WITH seq AS (
  SELECT event_type, user_id, epoch_us(ts) AS us,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id, event_type
                                 ORDER BY epoch_us(ts), event_id) AS prev
  FROM events
), g AS (
  SELECT event_type, (us - prev) // 1000000 AS gap_s
  FROM seq WHERE prev IS NOT NULL
), m AS (
  SELECT event_type, count(*) AS n, sum(gap_s) AS s,
         sum(CAST(gap_s AS HUGEINT) * gap_s) AS ss
  FROM g GROUP BY 1
)
SELECT event_type, CAST(n AS BIGINT) AS n_gaps,
       CAST(CASE WHEN s = 0 THEN 0
                 ELSE 1000 * ss // (2 * s) END AS BIGINT) AS aoi_milli_s
FROM m ORDER BY event_type
"""


FUNNELOPS_REGISTRY = {
    "first_touch_census": (first_touch_census, SQL_FIRST_TOUCH_CENSUS),
    "stump_pr_f1": (stump_pr_f1, SQL_STUMP_PR_F1),
    "age_of_information": (age_of_information, SQL_AGE_OF_INFORMATION),
}

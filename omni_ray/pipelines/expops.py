"""Operator batch 32 — experimentation infrastructure, co-engagement,
graph elites and price forensics.

Reference anchors: the reference has no experimentation or forensic
layer (its analytics are raw dashboard counts, `src/api/dashboard.py`);
these add:

- ab_split_audit: deterministic md5-parity A/B assignment of users plus
  the Sample-Ratio-Mismatch statistic (chi2_milli = 10³·(n_a−n_b)² /
  (n_a+n_b)) and per-arm purchase-conversion ppm — the first sanity
  check of any experiment pipeline.
- type_cooccurrence_jaccard: pairwise Jaccard between event types over
  the users engaging in each — per-user type BITMASK fold, bounded mask
  census, pairwise counts recovered from the census (users are row-sized;
  masks are not).
- rich_club_topk: the rich-club coefficient of the house synthetic doc
  graph (src → (7·src+j) mod n, j = 1..3 — graphops' convention): the
  directed edge density among the 50 highest-degree nodes.
- round_number_bias: whole-dollar / whole-ten-dollar share of purchase
  cents — the round-price forensics companion to benford_audit.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Count, Sum

from .queries import _bucketed_agg, _pd_arrow, _read

_RC_TOP = 50
_AB_BUCKETS = 256


def _cents(x: np.ndarray) -> np.ndarray:
    return np.floor(x * 100 + 0.5).astype(np.int64)


# ---------------------------------------------------------------------------
# ab_split_audit
# ---------------------------------------------------------------------------


def ab_split_audit(sf_dir: str):
    """Deterministic A/B assignment (arm = md5(user_id) 60-bit parity) with
    the SRM check and per-arm conversion: one row with user counts per
    arm, chi2_milli of the split imbalance, and the ppm share of each
    arm's users who made ≥1 purchase.

    Scale shape: per-user (arm, converted) folds in ONE user-bucketed
    shuffle; everything after is a 2-key bounded groupby."""
    ev = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        p = df.groupby("user_id", sort=False)["event_type"] \
            .agg(lambda v: int((v == "purchase").any())).reset_index()
        p.columns = ["user_id", "conv"]
        p["_kb"] = (p["user_id"].to_numpy(np.int64)
                    % _AB_BUCKETS).astype(np.int64)
        return p

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        d = g.groupby("user_id", sort=False)["conv"].max().reset_index()
        arm = np.array([int(hashlib.md5(str(u).encode()).hexdigest()[:15],
                            16) & 1 for u in d["user_id"]], np.int64)
        return pd.DataFrame({
            "arm": arm, "n": np.ones(len(d), np.int64),
            "conv": d["conv"].to_numpy(np.int64),
        })

    arms = (
        ev.map_batches(_pd_arrow(prep), batch_format="pandas")
        .groupby("_kb").map_groups(_pd_arrow(fold), batch_format="pandas")
        .groupby("arm").aggregate(Sum("n", alias_name="n"),
                                  Sum("conv", alias_name="conv"))
        .to_pandas().set_index("arm")
    )
    na = int(arms.loc[0, "n"]) if 0 in arms.index else 0
    nb = int(arms.loc[1, "n"]) if 1 in arms.index else 0
    ca = int(arms.loc[0, "conv"]) if 0 in arms.index else 0
    cb = int(arms.loc[1, "conv"]) if 1 in arms.index else 0
    out = pd.DataFrame({
        "n_users_a": [np.int64(na)], "n_users_b": np.int64(nb),
        "srm_chi2_milli": np.int64(
            1000 * (na - nb) ** 2 // (na + nb) if na + nb else 0),
        "conv_a_ppm": np.int64(ca * 1_000_000 // na if na else 0),
        "conv_b_ppm": np.int64(cb * 1_000_000 // nb if nb else 0),
    })
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_AB_SPLIT_AUDIT = """
WITH u AS (
  SELECT user_id,
         CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
              AS BIGINT) % 2 AS arm,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
  FROM events GROUP BY 1
), a AS (
  SELECT arm, count(*) AS n, sum(conv) AS conv FROM u GROUP BY 1
), w AS (
  SELECT coalesce(max(CASE WHEN arm = 0 THEN n END), 0) AS na,
         coalesce(max(CASE WHEN arm = 1 THEN n END), 0) AS nb,
         coalesce(max(CASE WHEN arm = 0 THEN conv END), 0) AS ca,
         coalesce(max(CASE WHEN arm = 1 THEN conv END), 0) AS cb
  FROM a
)
SELECT CAST(na AS BIGINT) AS n_users_a, CAST(nb AS BIGINT) AS n_users_b,
       CAST(1000 * (na - nb) * (na - nb) // (na + nb) AS BIGINT)
         AS srm_chi2_milli,
       CAST(ca * 1000000 // na AS BIGINT) AS conv_a_ppm,
       CAST(cb * 1000000 // nb AS BIGINT) AS conv_b_ppm
FROM w
"""


# ---------------------------------------------------------------------------
# type_cooccurrence_jaccard
# ---------------------------------------------------------------------------


def type_cooccurrence_jaccard(sf_dir: str):
    """Pairwise Jaccard between event types over USERS: for each type
    pair (a < b lexicographically), the number of users doing both,
    either, and the Jaccard in ppm.

    Scale shape: per-user type bitmask (types indexed in sorted order)
    folds in ONE user-bucketed shuffle; the mask CENSUS is bounded
    (≤ 2^|types| values), and all pair counts are recovered from the
    census — the user dimension never reaches the driver."""
    ev = _read(sf_dir, "events", columns=["user_id", "event_type"])
    types = sorted(
        ev.groupby("event_type").aggregate(Count(alias_name="c"))
        .to_pandas()["event_type"]
    )
    bit = {t: 1 << i for i, t in enumerate(types)}

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        m = df["event_type"].map(bit).astype(np.int64)
        p = pd.DataFrame({"user_id": df["user_id"].to_numpy(np.int64),
                          "mask": m.to_numpy(np.int64)})
        p = p.groupby("user_id", sort=False)["mask"] \
            .agg(lambda v: int(np.bitwise_or.reduce(v.to_numpy()))) \
            .reset_index()
        p["_kb"] = (p["user_id"].to_numpy(np.int64)
                    % _AB_BUCKETS).astype(np.int64)
        return p

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        d = g.groupby("user_id", sort=False)["mask"] \
            .agg(lambda v: int(np.bitwise_or.reduce(v.to_numpy()))) \
            .reset_index()
        c = d.groupby("mask", sort=False).size().reset_index(name="n")
        return c

    census = (
        ev.map_batches(_pd_arrow(prep), batch_format="pandas")
        .groupby("_kb").map_groups(_pd_arrow(fold), batch_format="pandas")
        .groupby("mask").sum("n")
        .to_pandas()
    )
    census.columns = ["mask", "n"]
    masks = census["mask"].to_numpy(np.int64)
    cnt = census["n"].to_numpy(np.int64)
    rows = []
    for i, ta in enumerate(types):
        for tb in types[i + 1:]:
            ba, bb = bit[ta], bit[tb]
            both = int(cnt[(masks & ba > 0) & (masks & bb > 0)].sum())
            either = int(cnt[(masks & ba > 0) | (masks & bb > 0)].sum())
            rows.append((ta, tb, both, either,
                         both * 1_000_000 // either if either else 0))
    out = pd.DataFrame(rows, columns=["type_a", "type_b", "n_both",
                                      "n_either", "jaccard_ppm"])
    for c in ("n_both", "n_either", "jaccard_ppm"):
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out.reset_index(drop=True),
                                preserve_index=False) \
        .replace_schema_metadata(None)


SQL_TYPE_COOCCURRENCE_JACCARD = """
WITH ut AS (
  SELECT DISTINCT user_id, event_type FROM events
), per AS (
  SELECT event_type, count(*) AS n FROM ut GROUP BY 1
), both_ AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         count(*) AS nb
  FROM ut a JOIN ut b
    ON b.user_id = a.user_id AND b.event_type > a.event_type
  GROUP BY 1, 2
), pairs AS (
  SELECT pa.event_type AS type_a, pb.event_type AS type_b,
         coalesce(bo.nb, 0) AS n_both,
         pa.n + pb.n - coalesce(bo.nb, 0) AS n_either
  FROM per pa JOIN per pb ON pb.event_type > pa.event_type
  LEFT JOIN both_ bo
    ON bo.type_a = pa.event_type AND bo.type_b = pb.event_type
)
SELECT type_a, type_b, CAST(n_both AS BIGINT) AS n_both,
       CAST(n_either AS BIGINT) AS n_either,
       CAST(CASE WHEN n_either = 0 THEN 0
                 ELSE n_both * 1000000 // n_either END AS BIGINT)
         AS jaccard_ppm
FROM pairs ORDER BY type_a, type_b
"""


# ---------------------------------------------------------------------------
# rich_club_topk
# ---------------------------------------------------------------------------


def rich_club_topk(sf_dir: str):
    """Rich-club coefficient of the house synthetic doc graph (edges
    src → (7·src + j) mod n, j = 1..3, self-loops dropped — graphops'
    convention; n = doc count over dense ids): among the 50 highest-
    total-degree nodes (ties to smaller id), the number of directed
    edges staying inside the club and its density in ppm of the k(k−1)
    possible.

    Scale shape: in-degrees via ONE dst-bucketed fold (out-degree is
    formulaic); per-bucket top-50 prune bounds the driver fold; the
    club-edge count is a broadcast-set filtered map over the edge
    stream."""
    nodes = _read(sf_dir, "documents", columns=["doc_id"]).materialize()
    n = nodes.count()

    def edges(t: pa.Table) -> pa.Table:
        src = t["doc_id"].to_numpy()
        srcs, dsts = [], []
        for j in (1, 2, 3):
            dst = (7 * src + j) % n
            keep = dst != src
            srcs.append(src[keep])
            dsts.append(dst[keep])
        return pa.table({
            "src": pa.array(np.concatenate(srcs), pa.int64()),
            "dst": pa.array(np.concatenate(dsts), pa.int64()),
        })

    e = nodes.map_batches(edges, batch_format="pyarrow").materialize()
    indeg = _bucketed_agg(e, ["dst"], {"ind": ("dst", "count")})
    outdeg = _bucketed_agg(e, ["src"], {"outd": ("src", "count")})

    def halfrows(t: pa.Table, col, cnt) -> pa.Table:
        return pa.table({"node": t[col], "d": t[cnt]})

    deg = (
        indeg.map_batches(lambda t: halfrows(t, "dst", "ind"),
                          batch_format="pyarrow")
        .union(outdeg.map_batches(lambda t: halfrows(t, "src", "outd"),
                                  batch_format="pyarrow"))
    )
    total = _bucketed_agg(deg, ["node"], {"degree": ("d", "sum")})

    def prune(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["degree", "node"],
                              ascending=[False, True]).head(_RC_TOP)

    top = (
        total.map_batches(_pd_arrow(prune), batch_format="pandas")
        .to_pandas()
        .sort_values(["degree", "node"], ascending=[False, True])
        .head(_RC_TOP)
    )
    club = set(top["node"].astype("int64"))

    def inclub(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy()
        d = t["dst"].to_numpy()
        m = np.array([a in club and b in club for a, b in zip(s, d)])
        return pa.table({"n": pa.array([int(m.sum())], pa.int64())})

    inside = int((e.map_batches(inclub, batch_format="pyarrow")
                  .aggregate(Sum("n", alias_name="s")) or {}).get("s") or 0)
    k = len(club)
    out = pd.DataFrame({
        "k": [np.int64(k)],
        "min_degree": np.int64(int(top["degree"].min())),
        "edges_inside": np.int64(inside),
        "density_ppm": np.int64(inside * 1_000_000 // (k * (k - 1))
                                if k > 1 else 0),
    })
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_RICH_CLUB_TOPK = f"""
WITH n AS (SELECT count(*) AS c FROM documents),
e AS (
  SELECT doc_id AS src, (7 * doc_id + j) % (SELECT c FROM n) AS dst
  FROM documents, (SELECT unnest([1, 2, 3]) AS j)
  WHERE (7 * doc_id + j) % (SELECT c FROM n) != doc_id
), deg AS (
  SELECT node, sum(d) AS degree FROM (
    SELECT src AS node, count(*) AS d FROM e GROUP BY 1
    UNION ALL
    SELECT dst AS node, count(*) AS d FROM e GROUP BY 1
  ) GROUP BY 1
), club AS (
  SELECT node, degree FROM deg
  ORDER BY degree DESC, node LIMIT {_RC_TOP}
), inside AS (
  SELECT count(*) AS m FROM e
  WHERE src IN (SELECT node FROM club) AND dst IN (SELECT node FROM club)
)
SELECT CAST((SELECT count(*) FROM club) AS BIGINT) AS k,
       CAST((SELECT min(degree) FROM club) AS BIGINT) AS min_degree,
       CAST((SELECT m FROM inside) AS BIGINT) AS edges_inside,
       CAST((SELECT m FROM inside) * 1000000
            // ((SELECT count(*) FROM club)
                * ((SELECT count(*) FROM club) - 1)) AS BIGINT)
         AS density_ppm
"""


# ---------------------------------------------------------------------------
# round_number_bias
# ---------------------------------------------------------------------------


def round_number_bias(sf_dir: str):
    """Round-price forensics over purchase cents: whole-dollar
    (cents % 100 = 0) and whole-ten-dollar (% 1000 = 0) counts and ppm
    shares — fabricated or hand-entered value streams over-index on
    round numbers.

    Scale shape: a single vectorized map emitting per-block partial
    counts; one global aggregate."""
    ev = _read(sf_dir, "events", columns=["event_type", "value"])

    def part(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["event_type"], "purchase"))
        c = _cents(t["value"].to_numpy())
        return pa.table({
            "n": pa.array([len(c)], pa.int64()),
            "d": pa.array([int((c % 100 == 0).sum())], pa.int64()),
            "td": pa.array([int((c % 1000 == 0).sum())], pa.int64()),
        })

    agg = ev.map_batches(part, batch_format="pyarrow") \
        .aggregate(Sum("n", alias_name="n"), Sum("d", alias_name="d"),
                   Sum("td", alias_name="td")) or {}
    n = int(agg.get("n") or 0)
    d = int(agg.get("d") or 0)
    td = int(agg.get("td") or 0)
    out = pd.DataFrame({
        "n_purchases": [np.int64(n)],
        "whole_dollar": np.int64(d),
        "whole_ten": np.int64(td),
        "dollar_ppm": np.int64(d * 1_000_000 // n if n else 0),
        "ten_ppm": np.int64(td * 1_000_000 // n if n else 0),
    })
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_ROUND_NUMBER_BIAS = """
WITH c AS (
  SELECT CAST(floor(value*100 + 0.5) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
), w AS (
  SELECT count(*) AS n,
         sum(CASE WHEN cents % 100 = 0 THEN 1 ELSE 0 END) AS d,
         sum(CASE WHEN cents % 1000 = 0 THEN 1 ELSE 0 END) AS td
  FROM c
)
SELECT CAST(n AS BIGINT) AS n_purchases, CAST(d AS BIGINT) AS whole_dollar,
       CAST(td AS BIGINT) AS whole_ten,
       CAST(CASE WHEN n = 0 THEN 0 ELSE d * 1000000 // n END AS BIGINT)
         AS dollar_ppm,
       CAST(CASE WHEN n = 0 THEN 0 ELSE td * 1000000 // n END AS BIGINT)
         AS ten_ppm
FROM w
"""


EXPOPS_REGISTRY = {
    "ab_split_audit": (ab_split_audit, SQL_AB_SPLIT_AUDIT),
    "type_cooccurrence_jaccard": (type_cooccurrence_jaccard,
                                  SQL_TYPE_COOCCURRENCE_JACCARD),
    "rich_club_topk": (rich_club_topk, SQL_RICH_CLUB_TOPK),
    "round_number_bias": (round_number_bias, SQL_ROUND_NUMBER_BIAS),
}

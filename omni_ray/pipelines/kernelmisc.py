"""Kernel-misc operators (round 4, batch 82): the ST3 seen-shard routing,
the M11 keyword extractor, and the M13 read-time rule — each pinned by a
closed-form oracle.

- seen_shard_distribution_census: synthesized URLs routed through the REAL
  SeenSet actor pool (8 shards, md5 routing, packed wire format): first
  pass adds every URL (all unseen), second pass re-probes the doc_id%4==0
  quarter (all seen). Per shard: key count and dup-probe count — the SQL
  twin recomputes md5-based shard assignment independently, so a routing
  or packed-unpack bug misplaces counts and hashes wrong.
- keyword_top1_census: frequency ladders rotating through the extractor's
  three filters — plain ladder, a stopword-dominated text (the raw top
  word must be FILTERED), and a short-word text (<3 chars excluded by the
  ALPHA3 regex). The top-1 census is closed-form per rotation.
- read_time_rounding_census: word counts planted ON the rounding
  boundaries — Python's round() is banker's (500/200 = 2.5 → 2, not 3),
  which is exactly the kind of cross-engine trap this repo quantizes
  around everywhere else; here the kernel's OWN convention is the spec,
  so the oracle is a lookup table of the hand-computed banker results.

Scale shape: all map-side + bounded censuses; the seen-set op spins its
actor pool inside the query and shuts it down after (one pool per call,
the SeenSet anonymous-actor rule).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Count, Sum

from .queries import _pd_arrow, _read
from .urltmpl import _SQL_URLS, _synth_urls

_N_SHARDS = 8


def seen_shard_distribution_census(sf_dir: str):
    from ..state.filters import SeenSet

    ds = _read(sf_dir, "documents", columns=["doc_id", "source"])
    df = ds.map_batches(_pd_arrow(lambda d: pd.DataFrame({
        "doc_id": d["doc_id"].to_numpy(np.int64),
        "url": _synth_urls(d),
    })), batch_format="pandas").to_pandas()

    # uniquified key: the synth URL universe collides past doc_id 3000
    # (lcm of its residue cycles), and a seen-set key must be unique per
    # logical page — production keys on the canonical url; here doc_id
    # stands in for the canonicalizer's uniqueness
    keys = [f"{u}|{i}" for u, i in zip(df["url"],
                                       df["doc_id"].to_numpy(np.int64))]
    hashes = [hashlib.md5(k.encode()).hexdigest() for k in keys]
    dup_mask = (df["doc_id"].to_numpy(np.int64) % 4 == 0)

    seen = SeenSet(n_shards=_N_SHARDS)
    try:
        first = seen.check_and_add_hashes(hashes)
        assert not any(first), "fresh URLs must all be unseen"
        dup_hashes = [h for h, m in zip(hashes, dup_mask) if m]
        second = seen.check_and_add_hashes(dup_hashes)
        assert all(second), "re-probed URLs must all be seen"
        import ray as _ray

        sizes = _ray.get([s.size.remote() for s in seen.shards])
    finally:
        seen.shutdown()

    shard = np.array([int(h[:8], 16) % _N_SHARDS for h in hashes], np.int64)
    out = pd.DataFrame({
        "shard": np.arange(_N_SHARDS, dtype=np.int64),
        "n_keys": pd.Series(sizes, dtype="int64"),
        "n_dup_probes": pd.Series(
            [int(((shard == s) & dup_mask).sum()) for s in range(_N_SHARDS)],
            dtype="int64"),
    })
    # cross-check: actor-held sizes equal driver-side routing counts
    route_counts = np.bincount(shard, minlength=_N_SHARDS)
    assert out["n_keys"].tolist() == route_counts.tolist()
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_SEEN_SHARD = f"""
WITH urls AS ({_SQL_URLS}),
r AS (
  SELECT doc_id,
         CAST(CAST(('0x' || substr(md5(url || '|' ||
                                          CAST(doc_id AS VARCHAR)), 1, 8))
              AS UBIGINT)
              % {_N_SHARDS} AS BIGINT) AS shard
  FROM urls
)
SELECT shard, CAST(count(*) AS BIGINT) AS n_keys,
       CAST(sum(CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_probes
FROM r GROUP BY 1
"""


def keyword_top1_census(sf_dir: str):
    from ..functions.enrich import extract_keywords

    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def text_for(i: int) -> str:
        r = i % 3
        if r == 0:   # plain ladder: zebra x3 beats yonder x2
            return "zebra zebra zebra yonder yonder quill"
        if r == 1:   # 'the' dominates raw counts but is a stopword
            return "the the the the signal signal noise"
        return "aa bb aa bb cedar cedar ok"  # <3-char words excluded

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        tops = []
        for i in df["doc_id"].to_numpy(np.int64):
            kws = extract_keywords(text_for(int(i)))
            tops.append(kws[0] if kws else "none")
        return pd.DataFrame({"top1": tops})

    out = (
        ds.map_batches(_pd_arrow(prep), batch_format="pandas")
        .groupby("top1").aggregate(Count(alias_name="n_docs"))
        .to_pandas().sort_values("top1").reset_index(drop=True)
    )
    out["n_docs"] = out["n_docs"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_KEYWORD_TOP1 = """
SELECT CASE doc_id % 3 WHEN 0 THEN 'zebra' WHEN 1 THEN 'signal'
       ELSE 'cedar' END AS top1,
       CAST(count(*) AS BIGINT) AS n_docs
FROM documents GROUP BY 1
"""


def read_time_rounding_census(sf_dir: str):
    from ..functions.enrich import calculate_read_time

    ds = _read(sf_dir, "documents", columns=["doc_id"])
    wcs = [100, 300, 500, 420]

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for i in df["doc_id"].to_numpy(np.int64):
            wc = wcs[int(i) % 4]
            rows.append((wc, calculate_read_time("word " * wc)))
        return pd.DataFrame(rows, columns=["word_count", "read_time"]) \
            .astype("int64")

    out = (
        ds.map_batches(_pd_arrow(prep), batch_format="pandas")
        .groupby(["word_count", "read_time"])
        .aggregate(Count(alias_name="n_docs"))
        .to_pandas().sort_values(["word_count", "read_time"])
        .reset_index(drop=True)
    )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


# banker's rounding, hand-computed: 100→max(1, round(0.5)=0)=1;
# 300→round(1.5)=2; 500→round(2.5)=2 (NOT 3 — ties to even);
# 420→round(2.1)=2
SQL_READ_TIME = """
WITH lut(r, word_count, read_time) AS (
  VALUES (0, 100, 1), (1, 300, 2), (2, 500, 2), (3, 420, 2)
)
SELECT CAST(l.word_count AS BIGINT) AS word_count,
       CAST(l.read_time AS BIGINT) AS read_time,
       CAST(count(*) AS BIGINT) AS n_docs
FROM documents d JOIN lut l ON d.doc_id % 4 = l.r
GROUP BY 1, 2
"""


KERNELMISC_REGISTRY = {
    "seen_shard_distribution_census": (seen_shard_distribution_census,
                                       SQL_SEEN_SHARD),
    "keyword_top1_census": (keyword_top1_census, SQL_KEYWORD_TOP1),
    "read_time_rounding_census": (read_time_rounding_census, SQL_READ_TIME),
}

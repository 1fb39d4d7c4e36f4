"""Shard-rebalance + sitemap-index operators (round 5, batch 88).

- shard_rebalance_census: the resharding question a long-lived crawl hits
  when its seen-filter pool must grow in place (state/filters.py pool,
  north_rule's sharded frontier): compare the mod router
  (``SeenSet.shard_of``: md5-prefix % N — the pool's default) against the
  new rendezvous router (``filters.rendezvous_shard``: HRW argmax over
  per-shard weights) on a 4 → 5 shard growth over REAL md5 key digests.
  Closed forms the census pins: mod-hash relocates every key whose
  ``h % 4 != h % 5`` (~4/5 of the keyspace — why mod resharding is a
  full reshuffle at 100 TB) and scatters them across ALL shards, while
  rendezvous relocates only keys whose new shard-4 weight wins (~1/5) and
  sends every one of them TO the new shard (n_moved == n_to_new — minimal
  disruption, asserted by pytest and load-bearing in the oracle hash).
- sitemap_index_fanout: the reference's sitemap-of-sitemaps case
  (parse_sitemap extracts every <loc>, so a <sitemapindex> parses into
  sub-sitemap urls — url_discovery_engine.py:58-89 reads whatever <loc>s
  the document carries): a two-hop discovery pipeline — parse the index,
  fan out to the referenced sub-sitemaps, parse those — with a per-source
  (n_subsitemaps, n_pages) census vs the ceil-division closed form.

Scale shape: both stream map_batches over documents; censuses aggregate
bounded grains (2 scheme rows; one row per source). The HRW weights are
computed per block — no shuffle; the sub-sitemap bodies are a bounded
broadcast (one body per 50-url chunk), as real sitemap files are.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from .queries import _pd_arrow, _read

_CHUNK = 50  # urls per sub-sitemap


def _hex_u32_be(expr: str) -> str:
    """SQL for the BIG-endian uint32 of the first 4 bytes of a hex-md5
    string — int(hexdigest[:8], 16), the exact prefix arithmetic
    SeenSet.shard_of and rendezvous_shard use."""
    def byte(i: int) -> str:
        return (f"((strpos('0123456789abcdef', substr({expr},{i},1))-1)*16"
                f" + (strpos('0123456789abcdef', substr({expr},{i+1},1))-1))")
    return (f"(16777216*{byte(1)} + 65536*{byte(3)}"
            f" + 256*{byte(5)} + {byte(7)})")


def shard_rebalance_census(sf_dir: str):
    from ..state.filters import rendezvous_shard

    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def census(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(np.int64)
        hexes = [hashlib.md5(f"doc-{i}".encode()).hexdigest() for i in ids]
        pref = np.fromiter((int(h[:8], 16) for h in hexes),
                           dtype=np.uint32, count=len(hexes))
        mod4 = pref % 4
        mod5 = pref % 5
        hrw4 = rendezvous_shard(hexes, 4)
        hrw5 = rendezvous_shard(hexes, 5)
        rows = []
        for scheme, old, new in (("mod", mod4, mod5),
                                 ("rendezvous", hrw4, hrw5)):
            moved = old != new
            rows.append((scheme, len(ids), int(moved.sum()),
                         int((moved & (np.asarray(new) == 4)).sum())))
        return pd.DataFrame(rows, columns=["scheme", "n_keys", "n_moved",
                                           "n_to_new"])

    parts = ds.map_batches(_pd_arrow(census), batch_format="pandas").to_pandas()
    out = parts.groupby("scheme", as_index=False).sum() \
        .sort_values("scheme").reset_index(drop=True)
    for c in ("n_keys", "n_moved", "n_to_new"):
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


_H = "md5('doc-' || doc_id)"
_W = "md5(md5('doc-' || doc_id) || '#' || s)"

SQL_SHARD_REBALANCE_CENSUS = f"""
WITH keys AS (
  SELECT doc_id, {_hex_u32_be(_H)} AS pref FROM documents
), hrw AS (
  SELECT k.doc_id, s.s AS shard, n.n AS pool,
         row_number() OVER (
           PARTITION BY k.doc_id, n.n
           ORDER BY {_hex_u32_be(_W)} DESC, s.s
         ) AS rk
  FROM documents k
  CROSS JOIN (SELECT unnest(range(5)) AS s) s
  CROSS JOIN (SELECT unnest([4, 5]) AS n) n
  WHERE s.s < n.n
), hrw_pick AS (
  SELECT doc_id,
         max(CASE WHEN pool = 4 THEN shard END) AS h4,
         max(CASE WHEN pool = 5 THEN shard END) AS h5
  FROM hrw WHERE rk = 1 GROUP BY doc_id
), mod_rows AS (
  SELECT 'mod' AS scheme,
         count(*) AS n_keys,
         sum(CASE WHEN pref % 4 <> pref % 5 THEN 1 ELSE 0 END) AS n_moved,
         sum(CASE WHEN pref % 4 <> pref % 5 AND pref % 5 = 4
                  THEN 1 ELSE 0 END) AS n_to_new
  FROM keys
), hrw_rows AS (
  SELECT 'rendezvous' AS scheme,
         count(*) AS n_keys,
         sum(CASE WHEN h4 <> h5 THEN 1 ELSE 0 END) AS n_moved,
         sum(CASE WHEN h4 <> h5 AND h5 = 4 THEN 1 ELSE 0 END) AS n_to_new
  FROM hrw_pick
)
SELECT scheme, CAST(n_keys AS BIGINT) AS n_keys,
       CAST(n_moved AS BIGINT) AS n_moved,
       CAST(n_to_new AS BIGINT) AS n_to_new
FROM (SELECT * FROM mod_rows UNION ALL SELECT * FROM hrw_rows)
ORDER BY scheme
"""


def sitemap_index_fanout(sf_dir: str):
    from ..sources.discovery import parse_sitemap
    from .discoveryops import _urls_by_source, build_sitemap

    df = _urls_by_source(sf_dir)
    index_bodies: dict[str, str] = {}
    sub_bodies: dict[str, str] = {}
    for src, g in sorted(df.groupby("source"), key=lambda kv: kv[0]):
        urls = g.sort_values("doc_id")["url"].tolist()
        subs = []
        for c in range(0, len(urls), _CHUNK):
            sub_url = f"https://{src}.example.com/sitemap-{c // _CHUNK}.xml"
            sub_bodies[sub_url] = build_sitemap(urls[c:c + _CHUNK])
            subs.append(sub_url)
        index_bodies[str(src)] = build_sitemap(subs)

    import ray.data

    idx = ray.data.from_arrow(pa.table({
        "source": pa.array(sorted(index_bodies), pa.string()),
        "body": pa.array([index_bodies[s] for s in sorted(index_bodies)],
                         pa.string()),
    }))

    # hop 1: parse each index into sub-sitemap url records
    def hop1(t: pa.Table) -> pa.Table:
        srcs, subs = [], []
        for s, b in zip(t["source"].to_pylist(), t["body"].to_pylist()):
            for u in parse_sitemap(b):
                srcs.append(s)
                subs.append(u)
        return pa.table({"source": pa.array(srcs, pa.string()),
                         "sub_url": pa.array(subs, pa.string())})

    # hop 2: fetch each sub-sitemap (bounded broadcast of bodies) and parse
    def hop2(t: pa.Table) -> pa.Table:
        srcs, n_pages = [], []
        for s, u in zip(t["source"].to_pylist(), t["sub_url"].to_pylist()):
            srcs.append(s)
            n_pages.append(len(parse_sitemap(sub_bodies.get(u, ""))))
        return pa.table({"source": pa.array(srcs, pa.string()),
                         "n_pages": pa.array(n_pages, pa.int64())})

    parts = (
        idx.map_batches(hop1, batch_format="pyarrow")
        .map_batches(hop2, batch_format="pyarrow")
        .to_pandas()
    )
    out = parts.groupby("source").agg(
        n_subsitemaps=("n_pages", "size"), n_pages=("n_pages", "sum")
    ).reset_index().sort_values("source").reset_index(drop=True)
    for c in ("n_subsitemaps", "n_pages"):
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_SITEMAP_INDEX_FANOUT = f"""
SELECT source,
       CAST((count(*) + {_CHUNK - 1}) // {_CHUNK} AS BIGINT) AS n_subsitemaps,
       CAST(count(*) AS BIGINT) AS n_pages
FROM documents
GROUP BY 1
ORDER BY 1
"""


SHARDOPS_REGISTRY = {
    "shard_rebalance_census": (shard_rebalance_census,
                               SQL_SHARD_REBALANCE_CENSUS),
    "sitemap_index_fanout": (sitemap_index_fanout, SQL_SITEMAP_INDEX_FANOUT),
}

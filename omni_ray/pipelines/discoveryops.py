"""Discovery-parser operators (round 4, batch 79): the S1/S2 feed parsers
(sources/discovery.py — stdlib ElementTree with the regex fallback the
reference gets from feedparser's tolerance) exercised as oracle-backed
queries over synthesized feeds built from the urltmpl URL universe. As
with robotsops, the PARSER is the unit under test: a dropped CDATA strip,
a missed <loc>, or a fallback-path bug changes counted output and hashes
wrong.

- sitemap_parse_census: one <urlset> per source over its URLs; sources
  with an EVEN host id get deliberately malformed XML (unclosed trailing
  tag) so their bodies take the regex-fallback path — same counts either
  way, which is exactly the claim (parser tolerance), and the fallback's
  reality is pinned by pytest (ET.fromstring raises on those bodies).
- rss_parse_census: RSS 2.0 items with CDATA-wrapped titles on odd doc
  ids and pubDate only on ids % 2 == 0 — per source: item count, pubDate
  count, and the CDATA-stripped title character sum.
- discovery_union_dedup: the D5∪D1 shape query-side — sitemap covers
  every doc, RSS covers the even half; discover_batch unions both feeds
  and the frontier first-wins rule (priority desc: RSS 10 > sitemap 5)
  picks the winner per URL; the closed form is PER URL (urls collide
  above sf0.01): a url wins by rss iff ANY of its docs has an even id.

Scale shape: feeds are bounded (one body per source); parsing streams
through map_batches; every output is a bounded census.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Count, Sum

from .queries import _pd_arrow, _read
from .urltmpl import _SQL_URLS, _synth_urls


def _urls_by_source(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "documents", columns=["doc_id", "source"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "source": df["source"].astype(str),
            "doc_id": df["doc_id"].to_numpy(np.int64),
            "url": _synth_urls(df),
        })

    return ds.map_batches(_pd_arrow(prep), batch_format="pandas").to_pandas()


def _hid(source: str) -> int:
    digits = "".join(ch for ch in source if ch.isdigit())
    return int(digits) if digits else 0


def build_sitemap(urls: list[str], malformed: bool = False) -> str:
    from xml.sax.saxutils import escape

    body = "<urlset>" + "".join(
        f"<url><loc>{escape(u)}</loc></url>" for u in urls)
    # malformed: unclosed root + a stray tag — ET fails, regex still
    # finds every <loc>
    return body + ("<url><loc" if malformed else "</urlset>")


def build_rss(items: list[tuple[int, str]]) -> str:
    from xml.sax.saxutils import escape

    chunks = []
    for doc_id, raw_url in items:
        url = escape(raw_url)
        title = (f"<![CDATA[doc {doc_id}]]>" if doc_id % 2 == 1
                 else f"doc {doc_id}")
        pub = (f"<pubDate>Mon, 01 Jan 2024 00:00:{doc_id % 60:02d} GMT"
               f"</pubDate>" if doc_id % 2 == 0 else "")
        chunks.append(f"<item><title>{title}</title><link>{url}</link>"
                      f"{pub}</item>")
    return "<rss><channel>" + "".join(chunks) + "</channel></rss>"


def sitemap_parse_census(sf_dir: str):
    from ..sources.discovery import parse_sitemap

    df = _urls_by_source(sf_dir)
    rows = []
    for src, g in df.groupby("source"):
        malformed = _hid(str(src)) % 2 == 0
        body = build_sitemap(g.sort_values("doc_id")["url"].tolist(),
                             malformed)
        parsed = parse_sitemap(body)
        rows.append((str(src), 1 if malformed else 0, len(parsed)))
    out = pd.DataFrame(rows, columns=["source", "malformed", "n_urls"]) \
        .sort_values("source").reset_index(drop=True)
    for c in ("malformed", "n_urls"):
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_SITEMAP_CENSUS = """
SELECT source,
       CAST(CAST(regexp_extract(source, '([0-9]+)', 1) AS BIGINT) % 2 = 0
            AS BIGINT) AS malformed,
       CAST(count(*) AS BIGINT) AS n_urls
FROM documents GROUP BY 1, 2
"""


def rss_parse_census(sf_dir: str):
    from ..sources.discovery import parse_rss

    df = _urls_by_source(sf_dir)
    rows = []
    for src, g in df.groupby("source"):
        g = g.sort_values("doc_id")
        body = build_rss(list(zip(g["doc_id"], g["url"])))
        recs = parse_rss(body)
        n_pub = sum(1 for r in recs if r["published"])
        title_chars = sum(len(r["title"]) for r in recs)
        rows.append((str(src), len(recs), n_pub, title_chars))
    out = pd.DataFrame(rows, columns=["source", "n_items", "n_with_pubdate",
                                      "title_chars"]) \
        .sort_values("source").reset_index(drop=True)
    for c in out.columns[1:]:
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


# title 'doc <id>': 4 + digits(id) chars, CDATA wrapper stripped either way
SQL_RSS_CENSUS = """
SELECT source,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_with_pubdate,
       CAST(sum(4 + length(CAST(doc_id AS VARCHAR))) AS BIGINT)
         AS title_chars
FROM documents GROUP BY 1
"""


def discovery_union_dedup(sf_dir: str):
    from ..sources.discovery import discover_batch

    df = _urls_by_source(sf_dir)
    feed_rows = {"feed_url": [], "kind": [], "body": [], "feed_seq": []}
    seq = 0
    for src, g in sorted(df.groupby("source"), key=lambda kv: kv[0]):
        g = g.sort_values("doc_id")
        feed_rows["feed_url"].append(f"https://{src}.example.com/sitemap.xml")
        feed_rows["kind"].append("sitemap")
        feed_rows["body"].append(build_sitemap(g["url"].tolist()))
        feed_rows["feed_seq"].append(seq); seq += 1
        evens = g[g["doc_id"] % 2 == 0]
        feed_rows["feed_url"].append(f"https://{src}.example.com/feed.xml")
        feed_rows["kind"].append("rss")
        feed_rows["body"].append(build_rss(list(zip(evens["doc_id"],
                                                    evens["url"]))))
        feed_rows["feed_seq"].append(seq); seq += 1

    feeds = ray.data.from_arrow(pa.table({
        "feed_url": pa.array(feed_rows["feed_url"], pa.string()),
        "kind": pa.array(feed_rows["kind"], pa.string()),
        "body": pa.array(feed_rows["body"], pa.string()),
        "feed_seq": pa.array(feed_rows["feed_seq"], pa.int64()),
    }))
    discovered = feeds.map_batches(discover_batch, batch_format="pyarrow")

    # first-wins by priority desc is just max(priority) per url here (RSS 10
    # beats sitemap 5); urls are a ROW-SIZED key domain -> bucketed max,
    # never per-url map_groups
    from .queries import _bucketed_agg

    best = _bucketed_agg(
        discovered.map_batches(
            lambda t: pa.table({"url": t["url"],
                                "priority": pa.compute.cast(t["priority"],
                                                            pa.int64())}),
            batch_format="pyarrow"),
        ["url"], {"maxp": ("priority", "max")}).to_pandas()
    src = best["url"].str.split("//").str[1].str.split(".example.com").str[0]
    won = np.where(best["maxp"].to_numpy(np.int64) == 10, "rss", "sitemap")
    out = pd.DataFrame({"source": src, "won_by": won}) \
        .groupby(["source", "won_by"]).size().rename("n_urls") \
        .reset_index().sort_values(["source", "won_by"]) \
        .reset_index(drop=True)
    out["n_urls"] = out["n_urls"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_DISCOVERY_UNION = f"""
WITH u AS ({_SQL_URLS}),
per_url AS (
  -- the union target is the URL, not the doc: above sf0.01 the synthesized
  -- urls collide (doc_id mod 1000 wraps), and a url is RSS-covered iff ANY
  -- of its docs has an even id — the naive per-doc count silently agreed
  -- only while urls were unique (caught by the sf0.1 full sweep)
  SELECT source, url,
         max(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS has_even
  FROM u GROUP BY 1, 2
)
SELECT source,
       CASE WHEN has_even = 1 THEN 'rss' ELSE 'sitemap' END AS won_by,
       CAST(count(*) AS BIGINT) AS n_urls
FROM per_url GROUP BY 1, 2
"""


DISCOVERYOPS_REGISTRY = {
    "sitemap_parse_census": (sitemap_parse_census, SQL_SITEMAP_CENSUS),
    "rss_parse_census": (rss_parse_census, SQL_RSS_CENSUS),
    "discovery_union_dedup": (discovery_union_dedup, SQL_DISCOVERY_UNION),
}

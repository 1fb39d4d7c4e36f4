"""URL-structure mining (round 4, batch 66): template census, query-param
signature census, path-depth profile — the crawl-planning reads a frontier
scheduler does before committing budget to a host (which URL *patterns*
dominate, which carry query params that usually mean duplicative content,
how deep the site tree runs).

The documents table has no URL column, so each op synthesizes a
deterministic per-doc URL from (doc_id, source) — the webqa.py discipline:
the SQL twin rebuilds the SAME string independently (string concat from the
same integer residues), so a green hash proves the *parsing* logic
(template collapse, param extraction, depth count) matches, not a fixture
replay. Four URL shapes rotate on doc_id % 4: dated-post path, flat
article, nested tag/page, and a query-param item URL.

Scale shape: every op is one vectorized map over the pruned (doc_id,
source) projection followed by ONE bounded groupby — template strings,
param signatures, and depths are all finite domains (the whole point of
templating), so groupby().aggregate is the right finisher; no row-sized
key ever reaches a shuffle. The parse is pandas .str regex (C loops), not
per-row Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Count, Sum

from .queries import _pd_arrow, _read


def _synth_urls(df: pd.DataFrame) -> pd.Series:
    """Deterministic per-doc URL; the SQL twin is the literal same concat."""
    k = df["doc_id"].to_numpy(np.int64)
    src = df["source"].astype(str)
    y = (2020 + k % 5).astype(str)
    m = pd.Series(1 + k % 12, index=df.index).astype(str).str.zfill(2)
    page = pd.Series(k % 1000, index=df.index).astype(str)
    base = "https://" + src + ".example.com"
    d = k % 4
    out = pd.Series("", index=df.index, dtype="object")
    out[d == 0] = (base + "/" + y + "/" + m + "/post-" + page + ".html")[d == 0]
    out[d == 1] = (base + "/article/" + page)[d == 1]
    out[d == 2] = (base + "/tag/" + src + "/page/" + page)[d == 2]
    out[d == 3] = (base + "/item?id=" + page + "&ref=" + src)[d == 3]
    return out


_SQL_URLS = """
  SELECT source, doc_id,
         'https://' || source || '.example.com' ||
         CASE doc_id % 4
           WHEN 0 THEN '/' || CAST(2020 + doc_id % 5 AS VARCHAR) || '/' ||
                       lpad(CAST(1 + doc_id % 12 AS VARCHAR), 2, '0') ||
                       '/post-' || CAST(doc_id % 1000 AS VARCHAR) || '.html'
           WHEN 1 THEN '/article/' || CAST(doc_id % 1000 AS VARCHAR)
           WHEN 2 THEN '/tag/' || source || '/page/' ||
                       CAST(doc_id % 1000 AS VARCHAR)
           ELSE '/item?id=' || CAST(doc_id % 1000 AS VARCHAR) ||
                '&ref=' || source
         END AS url
  FROM documents
"""


def url_template_census(sf_dir: str):
    """Digit-run URL templating ([0-9]+ → 'N'): per (source, template) URL
    count plus the count of distinct page numbers the template absorbs —
    the 'is this pattern a pagination crawl trap' read. One vectorized
    regex pass, one bounded groupby (templates are finite by
    construction)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "source"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        url = _synth_urls(df)
        return pd.DataFrame({
            "source": df["source"].astype(str),
            "template": url.str.replace(r"[0-9]+", "N", regex=True),
            "page": (df["doc_id"].to_numpy(np.int64) % 1000),
        })

    # distinct pages per template via the two-level exact-distinct shape:
    # fine grain (source, template, page) first, then count the fine rows
    fine = (
        ds.map_batches(_pd_arrow(prep), batch_format="pandas")
        .groupby(["source", "template", "page"])
        .aggregate(Count(alias_name="n"))
    )
    out = (
        fine.groupby(["source", "template"])
        .aggregate(Sum("n", alias_name="n_urls"),
                   Count(alias_name="n_pages"))
        .to_pandas()
        .sort_values(["source", "template"]).reset_index(drop=True)
    )
    for c in ("n_urls", "n_pages"):
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_URL_TEMPLATE_CENSUS = f"""
WITH urls AS ({_SQL_URLS}),
t AS (
  SELECT source, regexp_replace(url, '[0-9]+', 'N', 'g') AS template,
         doc_id % 1000 AS page
  FROM urls
)
SELECT source, template,
       CAST(count(*) AS BIGINT) AS n_urls,
       CAST(count(DISTINCT page) AS BIGINT) AS n_pages
FROM t GROUP BY 1, 2
"""


def query_param_census(sf_dir: str):
    """Query-param signature census: the sorted set of parameter KEYS per
    URL (empty for param-free URLs) → how many URLs carry each signature
    and how many sources emit it. Param-bearing templates are where crawl
    dedup pays off (session ids, refs); the signature census sizes that
    win. Signature domain is finite → bounded groupby."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "source"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        url = _synth_urls(df)
        keys = url.str.findall(r"[?&]([a-z]+)=")
        sig = keys.map(lambda ks: ",".join(sorted(ks)))
        return pd.DataFrame({"sig": sig, "source": df["source"].astype(str)})

    fine = (
        ds.map_batches(_pd_arrow(prep), batch_format="pandas")
        .groupby(["sig", "source"])
        .aggregate(Count(alias_name="n"))
    )
    out = (
        fine.groupby(["sig"])
        .aggregate(Sum("n", alias_name="n_urls"),
                   Count(alias_name="n_sources"))
        .to_pandas().sort_values("sig").reset_index(drop=True)
    )
    for c in ("n_urls", "n_sources"):
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_QUERY_PARAM_CENSUS = f"""
WITH urls AS ({_SQL_URLS}),
t AS (
  SELECT source,
         -- list_sort([]) is NULL: coalesce keeps param-free URLs as ''
         coalesce(array_to_string(list_sort(
             regexp_extract_all(url, '[?&]([a-z]+)=', 1)), ','), '')
           AS sig
  FROM urls
)
SELECT sig, CAST(count(*) AS BIGINT) AS n_urls,
       CAST(count(DISTINCT source) AS BIGINT) AS n_sources
FROM t GROUP BY 1
"""


def path_depth_profile(sf_dir: str):
    """Path-depth histogram per source: segments = '/' count of the path
    with scheme/host/query stripped — the site-tree-depth read a frontier's
    depth-prioritised scheduler keys on. Parse-based (not residue-based) so
    the oracle proves the URL parsing, one bounded groupby."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "source"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        url = _synth_urls(df)
        path = url.str.replace(r"^https://[^/]+", "", regex=True) \
                   .str.replace(r"\?.*$", "", regex=True)
        return pd.DataFrame({
            "source": df["source"].astype(str),
            "depth": path.str.count("/").astype(np.int64),
        })

    out = (
        ds.map_batches(_pd_arrow(prep), batch_format="pandas")
        .groupby(["source", "depth"])
        .aggregate(Count(alias_name="n_urls"))
        .to_pandas().sort_values(["source", "depth"]).reset_index(drop=True)
    )
    for c in ("depth", "n_urls"):
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_PATH_DEPTH_PROFILE = f"""
WITH urls AS ({_SQL_URLS}),
t AS (
  SELECT source,
         CAST(length(p) - length(replace(p, '/', '')) AS BIGINT) AS depth
  FROM (SELECT source,
               regexp_replace(regexp_replace(url, '^https://[^/]+', ''),
                              '\\?.*$', '') AS p
        FROM urls)
)
SELECT source, depth, CAST(count(*) AS BIGINT) AS n_urls
FROM t GROUP BY 1, 2
"""


URLTMPL_REGISTRY = {
    "url_template_census": (url_template_census, SQL_URL_TEMPLATE_CENSUS),
    "query_param_census": (query_param_census, SQL_QUERY_PARAM_CENSUS),
    "path_depth_profile": (path_depth_profile, SQL_PATH_DEPTH_PROFILE),
}

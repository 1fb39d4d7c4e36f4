"""Crawler-trap detection (round 5, batch 96): flag URL templates whose
page-id space is DENSE and ENUMERABLE — the calendar/pagination-trap
signature (a template where ids min..max are fully populated invites a
crawler to walk forever; sparse templates are organic content). A classic
production-crawler guard the reference lacks outright (its frontier would
walk such traps); the frontier budget bounds per-wave damage, this census
is the detection side.

Universe: the urltmpl synthetic URL space (one url per doc, 4 template
shapes per source, page = doc_id % 1000). Per (source, template): rows,
distinct pages, page-id span; trap iff the span is fully dense
(max − min + 1 == n_pages) AND n_pages ≥ 64. Output = flagged templates
with their stats.

Scale shape: template + page derive map-side; distinct pages go through
the two-level exact-distinct shape (fine (source, template, page) groupby
first — the row-sized grain never aggregates per key in Python); the
flag/span arithmetic runs on the bounded (source, template) grain.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Count, Max, Min

from .queries import _pd_arrow, _read
from .urltmpl import _synth_urls

_MIN_PAGES = 64


def crawl_trap_detector(sf_dir: str):
    ds = _read(sf_dir, "documents", columns=["doc_id", "source"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        url = _synth_urls(df)
        ids = df["doc_id"].to_numpy(np.int64)
        organic = pd.DataFrame({
            "source": df["source"].astype(str),
            "template": url.str.replace(r"[0-9]+", "N", regex=True),
            "page": ids % 1000,
        })
        # planted trap: every 5th doc also links a calendar page on a
        # dedicated host — its page ids tile 0..min(n/5, 1000)-1 densely,
        # exactly the enumerable signature the detector must flag
        tids = ids[ids % 5 == 0]
        trap = pd.DataFrame({
            "source": "caltrap",
            "template": "https://caltrap.example.com/cal/day-N",
            "page": (tids // 5) % 1000,
        })
        return pd.concat([organic, trap], ignore_index=True)

    fine = (
        ds.map_batches(_pd_arrow(prep), batch_format="pandas")
        .groupby(["source", "template", "page"])
        .aggregate(Count(alias_name="n_rows"))
    )
    coarse = (
        fine.groupby(["source", "template"])
        .aggregate(Count(alias_name="n_pages"),
                   Min("page", alias_name="min_page"),
                   Max("page", alias_name="max_page"))
        .to_pandas()
    )
    span = coarse["max_page"] - coarse["min_page"] + 1
    trap = (span == coarse["n_pages"]) & (coarse["n_pages"] >= _MIN_PAGES)
    out = coarse[trap].sort_values(["source", "template"]) \
        .reset_index(drop=True)
    for c in ("n_pages", "min_page", "max_page"):
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(
        out[["source", "template", "n_pages", "min_page", "max_page"]],
        preserve_index=False,
    ).replace_schema_metadata(None)


SQL_CRAWL_TRAP_DETECTOR = f"""
WITH u AS (
  SELECT source, doc_id,
         regexp_replace(
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
           END, '[0-9]+', 'N', 'g') AS template,
         doc_id % 1000 AS page
  FROM documents
  UNION ALL
  SELECT 'caltrap' AS source, doc_id,
         'https://caltrap.example.com/cal/day-N' AS template,
         (doc_id // 5) % 1000 AS page
  FROM documents WHERE doc_id % 5 = 0
), coarse AS (
  SELECT source, template,
         count(DISTINCT page) AS n_pages,
         min(page) AS min_page,
         max(page) AS max_page
  FROM u GROUP BY 1, 2
)
SELECT source, template,
       CAST(n_pages AS BIGINT) AS n_pages,
       CAST(min_page AS BIGINT) AS min_page,
       CAST(max_page AS BIGINT) AS max_page
FROM coarse
WHERE max_page - min_page + 1 = n_pages AND n_pages >= {_MIN_PAGES}
ORDER BY source, template
"""


TRAPOPS_REGISTRY = {
    "crawl_trap_detector": (crawl_trap_detector, SQL_CRAWL_TRAP_DETECTOR),
}

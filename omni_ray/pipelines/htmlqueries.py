"""HTML-kernel operators (round 4, batch 80): the M1/M6/M7 machinery —
html_mini's from-scratch DOM + CSS-selector engine and clean.py's
boilerplate removal — exercised as oracle-backed queries over synthesized
pages with closed-form structure. The DOM parser, the selector engine and
the unwanted-element removal are the units under test: a selector-match or
decompose bug changes counted output and hashes wrong.

- html_structure_census: pages with doc_id-determined structure (nested
  divs, <a> and <p> counts) parsed by the REAL parse_html; per source the
  sums of link/paragraph counts and max nesting depth.
- selector_extraction_census: author markup rotating across the
  AUTHOR_SELECTORS styles (.author / .byline / [rel="author"] / absent)
  and date markup across DATE_SELECTORS (time[datetime] / .publish-date /
  absent), extracted by the REAL selector engine; the (has_author,
  has_date) census is closed-form by rotation.
- clean_boilerplate_census: script/nav/ad-class junk planted around a real
  <article>; after clean_content, EVERY doc must retain its content marker
  and NONE may leak junk — the (n_docs, kept, leaked) census proves the
  removal set and the content-extraction path together.

Scale shape: synthesis + parse + extract are fused map-side; every output
is a bounded census.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Count, Sum

from .queries import _pd_arrow, _read


def _structure_html(doc_id: int) -> str:
    depth = 1 + doc_id % 4
    n_links = doc_id % 5
    n_paras = 1 + doc_id % 3
    inner = "".join(f'<a href="http://x.test/{k}">l{k}</a>'
                    for k in range(n_links))
    inner += "".join(f"<p>para {k} text</p>" for k in range(n_paras))
    for _ in range(depth):
        inner = f"<div>{inner}</div>"
    return f"<html><body>{inner}</body></html>"


def html_structure_census(sf_dir: str):
    from ..functions.html_mini import parse_html

    ds = _read(sf_dir, "documents", columns=["doc_id", "source"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        links, paras, depths = [], [], []
        for i in df["doc_id"].to_numpy(np.int64):
            root = parse_html(_structure_html(int(i)))
            links.append(len(root.find_all("a")))
            paras.append(len(root.find_all("p")))

            def maxd(n, d=0):
                # children mixes Node and raw text; only Nodes nest
                kids = [c for c in n.children if not isinstance(c, str)]
                return max([d] + [maxd(c, d + 1) for c in kids])

            depths.append(maxd(root))
        return pd.DataFrame({"source": df["source"].astype(str),
                             "links": links, "paras": paras,
                             "depth": depths})

    out = (
        ds.map_batches(_pd_arrow(prep), batch_format="pandas")
        .groupby("source")
        .aggregate(Count(alias_name="n_docs"),
                   Sum("links", alias_name="sum_links"),
                   Sum("paras", alias_name="sum_paras"),
                   Sum("depth", alias_name="sum_depth"))
        .to_pandas().sort_values("source").reset_index(drop=True)
    )
    for c in out.columns[1:]:
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


# depth walk counts: html > body > depth divs > (a|p) leaves, so the max
# node depth is 2 + depth + 1
SQL_HTML_STRUCTURE = """
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(doc_id % 5) AS BIGINT) AS sum_links,
       CAST(sum(1 + doc_id % 3) AS BIGINT) AS sum_paras,
       CAST(sum(3 + (1 + doc_id % 4)) AS BIGINT) AS sum_depth
FROM documents GROUP BY 1
"""


def _selector_html(doc_id: int) -> str:
    a = doc_id % 4
    d = doc_id % 3
    author = {
        0: f'<div class="author">Alice {doc_id}</div>',
        1: f'<span class="byline">Bob {doc_id}</span>',
        2: f'<a rel="author">Carol {doc_id}</a>',
        3: "",
    }[a]
    date = {
        0: f'<time datetime="2024-01-{doc_id % 28 + 1:02d}">posted</time>',
        1: f'<div class="publish-date">2024-02-{doc_id % 28 + 1:02d}</div>',
        2: "",
    }[d]
    return f"<html><body>{author}{date}<p>body text</p></body></html>"


def selector_extraction_census(sf_dir: str):
    from ..functions.extract import (extract_authors_selectors,
                                     extract_publish_date_selectors)

    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        has_a, has_d = [], []
        for i in df["doc_id"].to_numpy(np.int64):
            html = _selector_html(int(i))
            has_a.append(1 if extract_authors_selectors(html) else 0)
            has_d.append(1 if extract_publish_date_selectors(html) else 0)
        return pd.DataFrame({"has_author": pd.Series(has_a, dtype="int64"),
                             "has_date": pd.Series(has_d, dtype="int64")})

    out = (
        ds.map_batches(_pd_arrow(prep), batch_format="pandas")
        .groupby(["has_author", "has_date"])
        .aggregate(Count(alias_name="n_docs"))
        .to_pandas().sort_values(["has_author", "has_date"])
        .reset_index(drop=True)
    )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_SELECTOR_CENSUS = """
SELECT CAST(doc_id % 4 <> 3 AS BIGINT) AS has_author,
       CAST(doc_id % 3 <> 2 AS BIGINT) AS has_date,
       CAST(count(*) AS BIGINT) AS n_docs
FROM documents GROUP BY 1, 2
"""


# sentence-structured: the M2 validity gate needs >= 2 sentences with a
# sane words-per-sentence average, not just length
_FILLER = ("This is a genuine article sentence with several words in it. "
           "It reads like real prose and clears the validity gate. ") * 3


def _boiler_html(doc_id: int) -> str:
    return ("<html><body>"
            "<script>var junkvar = 1;</script>"
            '<nav class="nav">menunav menunav</nav>'
            '<div class="ad-banner">buyjunk buyjunk</div>'
            f"<article><p>Token marker{doc_id} opens this piece. {_FILLER}</p></article>"
            "</body></html>")


def clean_boilerplate_census(sf_dir: str):
    from ..functions.clean import clean_content

    ds = _read(sf_dir, "documents", columns=["doc_id", "source"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        kept, leaked = [], []
        for i in df["doc_id"].to_numpy(np.int64):
            text = clean_content(_boiler_html(int(i)),
                                 f"http://h.test/p{int(i)}")
            kept.append(1 if f"marker{int(i)}" in text else 0)
            leaked.append(1 if ("junkvar" in text or "menunav" in text
                                or "buyjunk" in text) else 0)
        return pd.DataFrame({"source": df["source"].astype(str),
                             "kept": pd.Series(kept, dtype="int64"),
                             "leaked": pd.Series(leaked, dtype="int64")})

    out = (
        ds.map_batches(_pd_arrow(prep), batch_format="pandas")
        .groupby("source")
        .aggregate(Count(alias_name="n_docs"),
                   Sum("kept", alias_name="n_kept"),
                   Sum("leaked", alias_name="n_leaked"))
        .to_pandas().sort_values("source").reset_index(drop=True)
    )
    for c in out.columns[1:]:
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_CLEAN_CENSUS = """
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_kept,
       CAST(0 AS BIGINT) AS n_leaked
FROM documents GROUP BY 1
"""


HTMLQUERIES_REGISTRY = {
    "html_structure_census": (html_structure_census, SQL_HTML_STRUCTURE),
    "selector_extraction_census": (selector_extraction_census,
                                   SQL_SELECTOR_CENSUS),
    "clean_boilerplate_census": (clean_boilerplate_census, SQL_CLEAN_CENSUS),
}

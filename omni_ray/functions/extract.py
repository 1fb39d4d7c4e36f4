"""Per-record extractors M3–M9 (SURVEY.md §2.2) as one fused map_batches UDF.

Regex semantics mirror the reference:
  * title     — ``<title>`` regex → ws-collapse → [:500]; fallback
                ``"Article from {domain}"`` (simple_crawler.py:103-120)
  * domain    — netloc minus www. (simple_crawler.py:122-132)
  * article_id— md5(url)[:8] + md5(content)[:8] (simple_crawler.py:134-143)
  * authors   — 3 meta/byline regexes, <100 chars, set-dedup
                (simple_crawler.py:145-165). DIVERGENCE (documented,
                SURVEY.md §7.5(4)): the reference's ``list(set(...))`` order is
                nondeterministic; we sort after dedup.
  * pub date  — published_time/datePublished/datetime= regexes
                (simple_crawler.py:167-185). DIVERGENCE: the reference falls
                back to ``utcnow()``; we fall back to the row's ``warc_ts`` for
                determinism.
  * images    — first 5 http/​// img srcs (multi_engine_crawler.py:191-199)
  * description — meta description, else first-<p> first-50-words
                (multi_engine_crawler.py:201-212)
  * quality gate — required fields, ≥200 chars, ≥50 words, non-default title
                (simple_crawler.py:187-213) → boolean ``is_article`` column.

One pass over the raw html string per row; all regexes precompiled at module
import (per-process, amortized across every batch the worker sees).
"""

from __future__ import annotations

import re

import pyarrow as pa

from .clean import extract_domain

_TITLE_RE = re.compile(r"<title[^>]*>(.*?)</title>", re.IGNORECASE | re.DOTALL)
_WS_RE = re.compile(r"\s+")

AUTHOR_PATTERNS = [
    re.compile(r'"author"[^>]*content="([^"]+)"', re.IGNORECASE),
    re.compile(r'class="author"[^>]*>([^<]+)', re.IGNORECASE),
    re.compile(r'byline"[^>]*>([^<]+)', re.IGNORECASE),
]

DATE_PATTERNS = [
    re.compile(r'"published_time"[^>]*content="([^"]+)"', re.IGNORECASE),
    re.compile(r'"datePublished"[^>]*content="([^"]+)"', re.IGNORECASE),
    re.compile(r'datetime="([^"]+)"', re.IGNORECASE),
]

_IMG_RE = re.compile(r'<img[^>]+src="([^"]+)"', re.IGNORECASE)
_META_DESC_RE = re.compile(
    r'<meta[^>]+name="description"[^>]+content="([^"]*)"', re.IGNORECASE
)
_FIRST_P_RE = re.compile(r"<p[^>]*>(.*?)</p>", re.IGNORECASE | re.DOTALL)
_TAG_RE = re.compile(r"<[^>]+>")


def extract_title(html: str, url: str) -> str:
    m = _TITLE_RE.search(html)
    if m:
        title = _WS_RE.sub(" ", m.group(1).strip())
        if title and title != "No Title":
            return title[:500]
    return f"Article from {extract_domain(url)}"


def extract_authors(html: str) -> list[str]:
    authors = []
    for pat in AUTHOR_PATTERNS:
        for match in pat.findall(html):
            m = match.strip()
            if m and len(match) < 100:
                authors.append(m)
    return sorted(set(authors))


def extract_publish_date(html: str) -> str | None:
    for pat in DATE_PATTERNS:
        m = pat.search(html)
        if m:
            return m.group(1)
    return None


def extract_images(html: str) -> list[str]:
    out = []
    for src in _IMG_RE.findall(html):
        if src.startswith(("http", "//")):
            out.append(src)
            if len(out) == 5:
                break
    return out


def extract_description(html: str) -> str:
    m = _META_DESC_RE.search(html)
    if m and m.group(1):
        return m.group(1)
    p = _FIRST_P_RE.search(html)
    if p:
        text = _TAG_RE.sub("", p.group(1))
        return " ".join(text.split()[:50])
    return ""


AUTHOR_SELECTORS = [".author", ".byline", '[rel="author"]', ".article-author", ".post-author"]
DATE_SELECTORS = ["time[datetime]", ".publish-date", ".post-date", ".article-date",
                  '[property="article:published_time"]']


def extract_authors_selectors(html: str) -> list[str]:
    """Selector-based author variant (multi_engine_crawler.py:151-169):
    CSS-selector hits, <100 chars, set-dedup (sorted — documented
    divergence from the reference's nondeterministic set order)."""
    from .html_mini import parse_html

    root = parse_html(html)
    authors = []
    for sel in AUTHOR_SELECTORS:
        for el in root.select(sel):
            text = el.get_text().strip()
            if text and len(text) < 100:
                authors.append(text)
    return sorted(set(authors))


def extract_publish_date_selectors(html: str) -> str | None:
    """Selector-based date variant (multi_engine_crawler.py:171-189):
    first matching element in document order; ``datetime`` attr preferred."""
    from .html_mini import parse_html

    root = parse_html(html)
    for sel in DATE_SELECTORS:
        els = root.select(sel)
        if els:
            el = els[0]
            if el.attrs.get("datetime"):
                return el.attrs["datetime"]
            return el.get_text().strip()
    return None


def is_article(title: str, content: str, url: str, domain: str, word_count: int) -> bool:
    """simple_crawler.py:187-213 gate (M9)."""
    if not (title and content and url and domain):
        return False
    if len(content) < 200:
        return False
    if word_count < 50:
        return False
    if title.startswith("Article from"):
        return False
    return True


def extract_batch(batch: pa.Table, text_col: str = "extracted_text") -> pa.Table:
    """Fused extraction UDF. Input needs url, html, ``text_col`` (and warc_ts
    for the date fallback). Appends title, domain, authors, publish_date,
    images, description, word_count, content_length, is_article.
    """
    import hashlib

    urls = batch.column("url").to_pylist()
    htmls = [
        h.decode("utf-8", "replace") if isinstance(h, (bytes, bytearray)) else (h or "")
        for h in batch.column("html").to_pylist()
    ]
    texts = [t or "" for t in batch.column(text_col).to_pylist()]
    warc = (
        batch.column("warc_ts").to_pylist()
        if "warc_ts" in batch.column_names
        else [None] * len(urls)
    )

    titles, domains, authors_l, dates, images_l, descs = [], [], [], [], [], []
    wcounts, clens, valid, ids = [], [], [], []
    for url, html, text, ts in zip(urls, htmls, texts, warc):
        u = url or ""
        title = extract_title(html, u)
        domain = extract_domain(u) or "unknown"
        wc = len(text.split())
        d = extract_publish_date(html)
        if d is None and ts is not None:
            d = ts.isoformat()  # deterministic fallback: warc_ts, not now()
        titles.append(title)
        domains.append(domain)
        authors_l.append(extract_authors(html))
        dates.append(d or "")
        images_l.append(extract_images(html))
        descs.append(extract_description(html))
        wcounts.append(wc)
        clens.append(len(text))
        valid.append(is_article(title, text, u, domain, wc))
        uh = hashlib.md5(u.encode()).hexdigest()[:8]
        ch = hashlib.md5(text.encode()).hexdigest()[:8]
        ids.append(f"article_{uh}_{ch}")

    n = len(urls)
    cols = {
        "article_id": pa.array(ids, pa.string()),
        "title": pa.array(titles, pa.string()),
        "domain": pa.array(domains, pa.string()),
        "authors": pa.array(authors_l, pa.list_(pa.string())),
        "publish_date_raw": pa.array(dates, pa.string()),
        "images": pa.array(images_l, pa.list_(pa.string())),
        "description": pa.array(descs, pa.string()),
        "word_count": pa.array(wcounts, pa.int64()),
        "content_length": pa.array(clens, pa.int64()),
        "is_article": pa.array(valid, pa.bool_()),
    }
    for name, arr in cols.items():
        batch = batch.append_column(name, arr)
    assert batch.num_rows == n
    return batch

"""Extraction-engine registry (SURVEY.md S4; reference
multi_engine_crawler.py:13-76): TWO real engines with the reference's
priority-fallback semantics, run through ``compose.ExtractorChain``.

  * ``semantic_main`` — the NewsPlease-analogue primary: requires a real
    title and a semantic main container (<article>, <main>, [role=main] or
    an articleBody itemprop); extracts the LARGEST such container's cleaned
    text and rejects thin results (<200 chars) by returning None — the
    analogue of the reference raising ``ValueError("Insufficient content")``
    at multi_engine_crawler.py:59-63, which triggers fallback.
  * ``fallback`` — the byte-identical reference cleaner
    (functions/clean.py ``clean_content``): domain selectors → generic
    density ladder → validity gate (the reference's BeautifulSoup fallback
    path, multi_engine_crawler.py:81-110).

The chain records which engine produced each row in ``crawler_engine``
(multi_engine_crawler.py:43), flowing into the 41-column article table.
"""

from __future__ import annotations

import re

from .clean import _remove_unwanted_elements, clean_content, clean_text
from .html_mini import parse_html

_TITLE_RE = re.compile(r"<title[^>]*>(.*?)</title>", re.IGNORECASE | re.DOTALL)
_OG_TITLE_RE = re.compile(
    r'<meta[^>]+property="og:title"[^>]+content="([^"]+)"', re.IGNORECASE
)

_MAIN_SELECTORS = ["article", "main", '[role="main"]', '[itemprop="articleBody"]']


def _has_title(html: str) -> bool:
    m = _TITLE_RE.search(html)
    if m and m.group(1).strip() and m.group(1).strip() != "No Title":
        return True
    return bool(_OG_TITLE_RE.search(html))


def extract_semantic_main(html: str, url: str = "") -> str | None:
    """Primary engine: semantic-container main-text extraction. Returns the
    cleaned text of the largest semantic container, or None ("insufficient
    content" → next engine) when there is no real title, no semantic
    container, or the result is under 200 chars."""
    if not html or not _has_title(html):
        return None
    try:
        root = parse_html(html)
    except Exception:
        return None
    _remove_unwanted_elements(root)
    best = ""
    for sel in _MAIN_SELECTORS:
        for el in root.select(sel):
            text = clean_text(el.get_text())
            if len(text) > len(best):
                best = text
    if len(best) < 200:
        return None
    return best


def extract_fallback(html: str, url: str = "") -> str | None:
    """Fallback engine: the reference-parity cleaning ladder. Returns None on
    empty output so a further engine (if registered) could take over."""
    out = clean_content(html, url)
    return out or None


def default_engine_chain():
    """The reference's engine_priority ['newsplease', 'fallback']
    (multi_engine_crawler.py:18) as an ExtractorChain."""
    from ..pipelines.compose import ExtractorChain

    return ExtractorChain(
        [("semantic_main", extract_semantic_main), ("fallback", extract_fallback)]
    )

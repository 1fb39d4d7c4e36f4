"""HTML → text cleaner: the byte-identical invariant target (SURVEY.md M1/M2).

From-scratch reimplementation of the reference cleaner's semantics
(``/root/reference/src/utils/content_cleaner.py:63-295``) on the stdlib DOM in
``html_mini`` (bs4 is unavailable here). The exact ladder is preserved:

  1. parse → remove 17 unwanted tag types (content_cleaner.py:100-110)
  2. remove elements whose class/id matches 13 ad indicators (:112-125)
  3. domain-specific CSS selectors for bbc/npr/reuters/cnn (:32-61, :127-150),
     per-element text collapse, >50-char element gate, >200-char combined gate
  4. generic selector ladder (11 selectors, >20-char gate) → all-<p> 50..1000
     fallback (:152-195)
  5. re-run generic extraction when the main content is <100 chars (:80-82)
  6. _clean_text: html.unescape → 15 unwanted-pattern regexes
     (IGNORECASE|DOTALL) → two-step whitespace collapse (:221-244)
  7. _is_valid_content: ≥100 chars, error-page phrases, ≥2 sentences,
     avg sentence length in [3, 50] words (:246-274); invalid ⇒ ""

The batch entry point ``clean_batch`` is the Ray Data ``map_batches`` UDF:
pyarrow in / pyarrow out, one parse per row (parsing HTML is inherently
per-document; everything around it stays Arrow).
"""

from __future__ import annotations

import html as _html
import re
import urllib.parse

import pyarrow as pa

from .html_mini import Node, parse_html

UNWANTED_PATTERNS = [
    r"<!--.*?-->",
    r"<script.*?>.*?</script>",
    r"<style.*?>.*?</style>",
    r"<nav.*?>.*?</nav>",
    r"<header.*?>.*?</header>",
    r"<footer.*?>.*?</footer>",
    r"<aside.*?>.*?</aside>",
    r"<iframe.*?>.*?</iframe>",
    r"ADVERTISEMENT",
    r"Sign up for.*?newsletter",
    r"Follow us on",
    r"Download Embed",
    r"Listen · \d+:\d+",
    r"Transcript",
]
_UNWANTED_RE = [re.compile(p, re.IGNORECASE | re.DOTALL) for p in UNWANTED_PATTERNS]

UNWANTED_TAGS = [
    "script", "style", "nav", "header", "footer", "aside",
    "meta", "link", "button", "form", "iframe", "noscript",
    "svg", "path", "img", "audio", "video", "source",
]

AD_INDICATORS = [
    "advertisement", "ad-container", "banner-ad", "popup",
    "newsletter", "subscribe", "social-share", "comments",
    "share", "related", "recommended", "popular", "trending",
]
_AD_RE = [re.compile(ind, re.I) for ind in AD_INDICATORS]

DOMAIN_SELECTORS = {
    "bbc.com": [
        '[data-component="text-block"]',
        ".ssrcss-1q0x1qg-Paragraph",
        ".story-body__inner",
        '[role="main"]',
    ],
    "bbc.co.uk": [
        '[data-component="text-block"]',
        ".ssrcss-1q0x1qg-Paragraph",
        ".story-body__inner",
        '[role="main"]',
    ],
    "npr.org": [
        ".storytext",
        ".transcript > p",
        '[data-story="true"] p',
        ".storycontent p",
    ],
    "reuters.com": [
        ".ArticleBody__container",
        ".StandardArticleBody_body",
        "article p",
    ],
    "cnn.com": [
        ".article__content",
        ".zn-body-text",
        "article p",
    ],
}

GENERIC_SELECTORS = [
    "article p",
    "main p",
    ".article-content p",
    ".post-content p",
    ".entry-content p",
    ".story-content p",
    ".article-body p",
    ".post-body p",
    '[role="main"] p',
    ".content p",
    ".main-content p",
]

ERROR_INDICATORS = [
    "page not found",
    "sorry, we couldn't find that page",
    "error 404",
    "not found",
    "this page doesn't exist",
]

_WS_RE = re.compile(r"\s+")
_TAG_RE = re.compile(r"<[^>]+>")


def extract_domain(url: str) -> str:
    """netloc, lowercased, ``www.`` stripped (content_cleaner.py:209-219)."""
    try:
        domain = urllib.parse.urlparse(url).netloc.lower()
        if domain.startswith("www."):
            domain = domain[4:]
        return domain
    except Exception:
        return ""


def _clean_element_text(element: Node) -> str:
    text = element.get_text()
    return _WS_RE.sub(" ", text).strip()


_UNWANTED_TAG_SET = frozenset(UNWANTED_TAGS)


def _remove_unwanted_elements(root: Node) -> None:
    """Single traversal collecting every node slated for removal — equivalent
    to the reference's 17 tag + 13×2 class/id find_all passes
    (content_cleaner.py:100-125): removal criteria are node-local, so the
    union of matches is order-independent."""
    doomed = []
    for n in root.iter_desc():
        if n.name in _UNWANTED_TAG_SET:
            doomed.append(n)
            continue
        classes = n.classes()
        idv = n.attrs.get("id")
        for rex in _AD_RE:
            if (classes and any(rex.search(c) for c in classes)) or (
                idv is not None and rex.search(idv)
            ):
                doomed.append(n)
                break
    for el in doomed:
        el.decompose()


def _extract_generic_content(root: Node) -> str | None:
    for selector in GENERIC_SELECTORS:
        parts = []
        for el in root.select(selector):
            text = _clean_element_text(el)
            if text and len(text) > 20:
                parts.append(text)
        if parts:
            combined = " ".join(parts)
            if len(combined) > 200:
                return combined
    parts = []
    for p in root.find_all("p"):
        text = _clean_element_text(p)
        if text and 50 < len(text) < 1000:
            parts.append(text)
    if parts:
        return " ".join(parts)
    return None


def _extract_main_content(root: Node, url: str) -> str | None:
    domain = extract_domain(url)
    if domain in DOMAIN_SELECTORS:
        for selector in DOMAIN_SELECTORS[domain]:
            parts = []
            for el in root.select(selector):
                text = _clean_element_text(el)
                if text and len(text) > 50:
                    parts.append(text)
            if parts:
                combined = " ".join(parts)
                if len(combined) > 200:
                    return combined
    return _extract_generic_content(root)


def clean_text(text: str | None) -> str:
    """content_cleaner.py:221-244 verbatim semantics."""
    if not text:
        return ""
    text = _html.unescape(text)
    for rex in _UNWANTED_RE:
        text = rex.sub("", text)
    lines = (line.strip() for line in text.splitlines())
    chunks = (phrase.strip() for line in lines for phrase in line.split("  "))
    text = " ".join(chunk for chunk in chunks if chunk)
    text = _WS_RE.sub(" ", text)
    return text.strip()


def is_valid_content(text: str, url: str = "") -> bool:
    """content_cleaner.py:246-274 verbatim semantics (M2)."""
    if not text or len(text) < 100:
        return False
    text_lower = text.lower()
    if any(ind in text_lower for ind in ERROR_INDICATORS):
        return False
    sentences = text.split(". ")
    if len(sentences) < 2:
        return False
    avg = sum(len(s.split()) for s in sentences) / len(sentences)
    if avg < 3 or avg > 50:
        return False
    return True


def basic_clean(html_content: str) -> str:
    """content_cleaner.py:276-288."""
    try:
        text = _TAG_RE.sub("", html_content)
        text = _html.unescape(text)
        text = _WS_RE.sub(" ", text)
        return text.strip()
    except Exception:
        return html_content[:5000]


def clean_content(html_content: str, url: str = "") -> str:
    """The full ladder (content_cleaner.py:63-98). Deterministic, pure."""
    if not html_content or not html_content.strip():
        return ""
    try:
        root = parse_html(html_content)
        _remove_unwanted_elements(root)
        main_content = _extract_main_content(root, url)
        if not main_content or len(main_content.strip()) < 100:
            main_content = _extract_generic_content(root)
        cleaned = clean_text(main_content)
        if is_valid_content(cleaned, url):
            return cleaned
        return ""
    except Exception:
        return basic_clean(html_content)


# ---------------------------------------------------------------------------
# Ray Data batch UDFs
# ---------------------------------------------------------------------------


def clean_batch(batch: pa.Table) -> pa.Table:
    """map_batches UDF: pages(url, html[, ...]) → + extracted_text column.

    ``html`` is a binary column (utf-8 page bytes). One parse per row; output
    appended as an Arrow string column. Drop ``html`` downstream ASAP to keep
    shuffles narrow (SURVEY.md §7.5(5)).
    """
    urls = batch.column("url").to_pylist()
    htmls = batch.column("html").to_pylist()
    out = [
        clean_content(h.decode("utf-8", "replace") if isinstance(h, (bytes, bytearray)) else (h or ""), u or "")
        for h, u in zip(htmls, urls)
    ]
    return batch.append_column("extracted_text", pa.array(out, type=pa.string()))


def validity_mask_batch(batch: pa.Table, text_col: str = "extracted_text") -> pa.Table:
    """Append ``is_valid_content`` bool column (M2) for downstream gating."""
    texts = batch.column(text_col).to_pylist()
    urls = batch.column("url").to_pylist() if "url" in batch.column_names else [""] * len(texts)
    mask = [is_valid_content(t or "", u or "") for t, u in zip(texts, urls)]
    return batch.append_column("is_valid_content", pa.array(mask, type=pa.bool_()))

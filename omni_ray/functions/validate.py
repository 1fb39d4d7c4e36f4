"""Validator M21 + assembler M22 (SURVEY.md §2.2).

Validator semantics mirror /root/reference/src/validation/article_validator.py:
  * required fields title/url/domain (:71-81)
  * URL: scheme ∈ {http,https}, blocked-domain substring, len>2000 warning
    (:83-113); the blocklist is broadcast into the UDF (J4)
  * title 10..200 (error/warning), content 50..50000 (warnings), placeholder
    detector (:115-145, :208-219)
  * publish date within [now−10y, now+1d] with tz normalization (:147-179).
    DIVERGENCE (documented): the reference compares against ``utcnow()``; we
    compare against an injected ``as_of`` timestamp (default: the row's
    warc_ts) so results are deterministic and reproducible.
  * authors: charset regex ``^[A-Za-z\\s.\\-]+$``, 2..100 chars (:181-206)
  * score = passed/8 − 0.3·errors − 0.1·warnings, clamped ≥0 (:221-234) —
    emitted as ``val_quality_score`` (0-1 scale, distinct from the 0-100
    enhancement score; SURVEY.md §7.5(7))

The validator ANNOTATES (is_valid / errors / warnings columns); gating is a
downstream filter — matching omni_storage.py:365-381 which stores invalid
articles with a min-merged score rather than dropping them.
"""

from __future__ import annotations

import re
from datetime import datetime, timedelta
from urllib.parse import urlparse

import pyarrow as pa

BLOCKED_DOMAINS = ["spam.com", "malicious.net"]  # article_validator.py:28
ALLOWED_SCHEMES = ("http", "https")
PLACEHOLDER_INDICATORS = [
    "lorem ipsum",
    "placeholder text",
    "sample content",
    "coming soon",
    "under construction",
]
_AUTHOR_RE = re.compile(r"^[A-Za-z\s\.\-]+$")
TOTAL_CHECKS = 8


def parse_publish_date(value) -> datetime | None:
    """ISO parse with tz normalization (article_validator.py:152-166)."""
    if value is None or value == "":
        return None
    if isinstance(value, datetime):
        dt = value
    else:
        s = str(value)
        try:
            if "Z" in s or "+" in s:
                dt = datetime.fromisoformat(s.replace("Z", "+00:00"))
            else:
                dt = datetime.fromisoformat(s)
        except (ValueError, TypeError):
            return None
    if dt.tzinfo is not None:
        # reference drops tzinfo without conversion (article_validator.py:165-166)
        dt = dt.replace(tzinfo=None)
    return dt


def validate_article(
    title: str,
    url: str,
    domain: str,
    content: str,
    authors: list[str],
    publish_date,
    as_of: datetime,
    blocked_domains: list[str] = BLOCKED_DOMAINS,
) -> dict:
    """Single-record validator; returns the full results dict."""
    errors: list[str] = []
    warnings: list[str] = []
    passed: list[str] = []
    is_valid = True

    # required fields (:71-81)
    missing = [f for f, v in (("title", title), ("url", url), ("domain", domain)) if not v]
    if missing:
        errors.append(f"Missing required fields: {', '.join(missing)}")
        is_valid = False
    else:
        passed.append("required_fields")

    # URL (:83-113)
    if not url:
        errors.append("URL is required")
        is_valid = False
    else:
        try:
            parsed = urlparse(url)
            if parsed.scheme not in ALLOWED_SCHEMES:
                errors.append(f"Invalid URL scheme: {parsed.scheme}")
                is_valid = False
            else:
                netloc = parsed.netloc.lower()
                if any(b in netloc for b in blocked_domains):
                    errors.append(f"Blocked domain: {netloc}")
                    is_valid = False
                else:
                    if len(url) > 2000:
                        warnings.append("URL is unusually long")
                    passed.append("url_validation")
        except Exception as e:  # pragma: no cover - urlparse rarely raises
            errors.append(f"URL parsing failed: {e}")
            is_valid = False

    # content quality (:115-145)
    tl = len(title or "")
    if tl < 10:
        errors.append(f"Title too short: {tl} chars (min 10)")
    elif tl > 200:
        warnings.append(f"Title very long: {tl} chars")
    else:
        passed.append("title_length")

    cl = len(content or "")
    if cl < 50:
        warnings.append(f"Content quite short: {cl} chars")
    elif cl > 50000:
        warnings.append(f"Content very long: {cl} chars")
    else:
        passed.append("content_length")

    content_lower = (content or "").lower()
    if any(ind in content_lower for ind in PLACEHOLDER_INDICATORS):
        warnings.append("Content appears to be placeholder text")

    # dates (:147-179) — 'now' = as_of for determinism
    pd = parse_publish_date(publish_date)
    if publish_date not in (None, ""):
        if pd is None:
            warnings.append(f"Invalid publish date format: {publish_date}")
        else:
            if pd > as_of + timedelta(days=1):
                warnings.append("Publish date is too far in the future")
            elif pd < as_of - timedelta(days=10 * 365):
                warnings.append("Publish date is very old")
            else:
                passed.append("date_validation")

    # authors (:181-206)
    if not authors:
        warnings.append("No authors specified")
    else:
        valid_authors = []
        for author in authors:
            if isinstance(author, str) and author.strip():
                a = author.strip()
                if len(a) < 2:
                    warnings.append(f"Author name too short: {author}")
                elif len(a) > 100:
                    warnings.append(f"Author name unusually long: {author}")
                elif _AUTHOR_RE.match(a):
                    valid_authors.append(a)
                else:
                    warnings.append(f"Author name contains unusual characters: {author}")
            else:
                warnings.append(f"Invalid author format: {author}")
        if valid_authors:
            passed.append("author_validation")

    # score (:221-234)
    score = max(0.0, len(passed) / TOTAL_CHECKS - 0.3 * len(errors) - 0.1 * len(warnings))
    return {
        "is_valid": is_valid,
        "val_quality_score": score,
        "errors": errors,
        "warnings": warnings,
        "passed_checks": passed,
        "publish_date_parsed": pd,
    }


def validate_batch(batch: pa.Table, content_col: str = "extracted_text") -> pa.Table:
    """map_batches UDF: appends is_valid, val_quality_score, val_errors,
    val_warnings, publish_date (parsed timestamp). ``as_of`` per row = its
    warc_ts (deterministic 'now')."""
    titles = [t or "" for t in batch.column("title").to_pylist()]
    urls = [u or "" for u in batch.column("url").to_pylist()]
    domains = [d or "" for d in batch.column("domain").to_pylist()]
    contents = [c or "" for c in batch.column(content_col).to_pylist()]
    authors = batch.column("authors").to_pylist() if "authors" in batch.column_names else [[]] * len(urls)
    pdates = (
        batch.column("publish_date_raw").to_pylist()
        if "publish_date_raw" in batch.column_names
        else [None] * len(urls)
    )
    as_ofs = (
        batch.column("warc_ts").to_pylist()
        if "warc_ts" in batch.column_names
        else [datetime(2024, 1, 1)] * len(urls)
    )

    valid, scores, errs, warns, pds = [], [], [], [], []
    for t, u, d, c, a, p, ts in zip(titles, urls, domains, contents, authors, pdates, as_ofs):
        r = validate_article(t, u, d, c, a or [], p, ts or datetime(2024, 1, 1))
        valid.append(r["is_valid"])
        scores.append(r["val_quality_score"])
        errs.append(r["errors"])
        warns.append(r["warnings"])
        pds.append(r["publish_date_parsed"])

    return (
        batch.append_column("is_valid", pa.array(valid, pa.bool_()))
        .append_column("val_quality_score", pa.array(scores, pa.float64()))
        .append_column("val_errors", pa.array(errs, pa.list_(pa.string())))
        .append_column("val_warnings", pa.array(warns, pa.list_(pa.string())))
        .append_column("publish_date", pa.array(pds, pa.timestamp("us")))
    )

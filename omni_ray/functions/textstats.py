"""Text-analysis operators for large-scale training-data pipelines:
language-ID (common-word + n-gram heuristic), quality scoring
(length/punctuation/stopword ratios), token counting (whitespace + BPE-ish
regex), and document fingerprinting (rolling hash).

All are vectorized-per-batch map_batches UDFs over the ``documents`` table
(doc_id, text, lang, source, n_chars). The language-ID extends the
reference's 10-common-word overlap rule (content_enricher.py:180-193) with a
trigram-profile score; quality scoring generalizes the banded scorer
(content_enhancement.py:155-200) to corpus-quality signals.
"""

from __future__ import annotations

import hashlib
import re

import pyarrow as pa

from .enrich import ENGLISH_COMMON, STOPWORDS

_ALPHA2_RE = re.compile(r"\b[a-z]{2,}\b")
_WS_TOKEN_RE = re.compile(r"\S+")
# BPE-ish pretokenizer: word pieces, numbers, punctuation runs (GPT-2-style
# contraction handling simplified to public regex idioms)
_BPE_RE = re.compile(r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+(?!\S)")

# top English trigrams (public frequency tables)
_EN_TRIGRAMS = frozenset(
    "the and ing ion tio ent ati for her ter hat tha ere ate his con res ver all ons".split()
)


def detect_language_common_words(text: str) -> str:
    """The reference rule verbatim: >5 distinct common-word overlap ⇒ 'en'."""
    words = set(_ALPHA2_RE.findall(text.lower()))
    return "en" if len(words & ENGLISH_COMMON) > 5 else "unknown"


def trigram_score(text: str) -> float:
    """Share of distinct char-trigrams that are common English trigrams."""
    t = re.sub(r"[^a-z]+", " ", text.lower())
    grams = {t[i : i + 3] for i in range(len(t) - 2)}
    grams = {g for g in grams if " " not in g}
    if not grams:
        return 0.0
    return len(grams & _EN_TRIGRAMS) / len(grams)


def count_tokens_ws(text: str) -> int:
    """Whitespace token count == len(text.split())."""
    return len(text.split())


def count_tokens_bpeish(text: str) -> int:
    """BPE-style pretoken count (regex pieces, whitespace dropped)."""
    return sum(1 for m in _BPE_RE.finditer(text) if m.group().strip())


def quality_signals(text: str) -> dict:
    """Corpus-quality signals: length, alpha ratio, punctuation density,
    stopword ratio, mean word length, uppercase ratio."""
    n = len(text)
    if n == 0:
        return {
            "n_chars": 0, "alpha_ratio": 0.0, "punct_ratio": 0.0,
            "stopword_ratio": 0.0, "mean_word_len": 0.0, "upper_ratio": 0.0,
            "quality": 0.0,
        }
    n_alpha = sum(c.isalpha() for c in text)
    n_punct = sum(c in ".,;:!?'\"()-" for c in text)
    n_upper = sum(c.isupper() for c in text)
    words = text.lower().split()
    n_words = len(words)
    n_stop = sum(w.strip(".,;:!?'\"()") in STOPWORDS for w in words)
    alpha_ratio = n_alpha / n
    punct_ratio = n_punct / n
    stop_ratio = n_stop / n_words if n_words else 0.0
    mean_wl = sum(len(w) for w in words) / n_words if n_words else 0.0
    upper_ratio = n_upper / n
    # banded composite in [0,1]: long-enough, mostly alpha, some stopwords,
    # sane word length, light punctuation
    q = 0.0
    q += 0.25 if n >= 200 else (0.15 if n >= 80 else 0.0)
    q += 0.25 if alpha_ratio >= 0.6 else (0.1 if alpha_ratio >= 0.4 else 0.0)
    q += 0.2 if 0.05 <= stop_ratio <= 0.6 else 0.0
    q += 0.2 if 3.0 <= mean_wl <= 10.0 else 0.0
    q += 0.1 if punct_ratio <= 0.1 else 0.0
    return {
        "n_chars": n, "alpha_ratio": alpha_ratio, "punct_ratio": punct_ratio,
        "stopword_ratio": stop_ratio, "mean_word_len": mean_wl,
        "upper_ratio": upper_ratio, "quality": q,
    }


def rolling_fingerprint(text: str, window: int = 8, mod: int = (1 << 61) - 1,
                        base: int = 257, keep: int = 4) -> list[int]:
    """Winnowing-style document fingerprint: Rabin-Karp rolling hash over
    ``window``-byte windows, keep the ``keep`` smallest hashes (a stable,
    order-insensitive fingerprint usable as a near-dup prefilter)."""
    data = text.encode("utf-8", "replace")
    n = len(data)
    if n < window:
        h = int.from_bytes(hashlib.md5(data).digest()[:8], "big") % mod
        return [h]
    hashes = set()
    h = 0
    power = pow(base, window - 1, mod)
    for i in range(n):
        h = (h * base + data[i]) % mod
        if i >= window:
            h = (h - data[i - window] * power * base) % mod
        if i >= window - 1:
            hashes.add(h)
    return sorted(hashes)[:keep]


def text_stats_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """map_batches UDF: language, token counts, quality signals, fingerprint."""
    texts = [t or "" for t in batch.column(text_col).to_pylist()]
    langs, tri, n_ws, n_bpe, quals, fps = [], [], [], [], [], []
    sigs_cols: dict[str, list] = {
        "alpha_ratio": [], "punct_ratio": [], "stopword_ratio": [],
        "mean_word_len": [],
    }
    for t in texts:
        langs.append(detect_language_common_words(t))
        tri.append(trigram_score(t))
        n_ws.append(count_tokens_ws(t))
        n_bpe.append(count_tokens_bpeish(t))
        s = quality_signals(t)
        quals.append(s["quality"])
        for k in sigs_cols:
            sigs_cols[k].append(s[k])
        fps.append(rolling_fingerprint(t))
    out = (
        batch.append_column("lang_id", pa.array(langs, pa.string()))
        .append_column("trigram_score", pa.array(tri, pa.float64()))
        .append_column("n_tokens_ws", pa.array(n_ws, pa.int64()))
        .append_column("n_tokens_bpe", pa.array(n_bpe, pa.int64()))
        .append_column("quality", pa.array(quals, pa.float64()))
        .append_column("fingerprint", pa.array(fps, pa.list_(pa.int64())))
    )
    for k, v in sigs_cols.items():
        out = out.append_column(k, pa.array(v, pa.float64()))
    return out

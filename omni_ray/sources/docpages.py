"""documents(text) → synthetic pages(url, warc_ts, html, text, lang).

The driver's ``documents`` table is flat whitespace-separated prose. To feed
the article pipeline (and oracle-check its output against DuckDB SQL), we
synthesize a deterministic page per document:

* ``periodize`` — sentence-ify: groups of 12 words joined with ``'. '`` plus
  a trailing ``'.'``; a short tail (<12 words) merges into the previous group
  so every sentence has 12–23 words.  This guarantees the cleaner's validity
  ladder (≥2 sentences ⇔ ≥24 words, avg sentence length always in [3, 50])
  and keeps every construction step pure string ops — reproduced EXACTLY in
  the ``articles41_core`` SQL oracle (mlqueries.SQL_ARTICLES41_CORE).
* ``pages_html`` — ONE ``<p>`` holding the whole periodized text inside
  ``<article>``.  With a single paragraph the cleaner's selector ladder
  (content_cleaner.py:152-195 semantics; clean.py:163-197) reduces to a
  closed form: extracted content == periodized text iff
  ``len >= 100 and words >= 24``, else ``''`` — no mid-word 400-char chunk
  splits, no dropped short paragraphs.

The title / author / publish-date metas are fixed strings so the enrich
outputs (content_hash = sha256(title||content||url), quality bands,
read-time) are SQL-derivable from ``documents`` alone.
"""

from __future__ import annotations


def periodize(text: str) -> str:
    ws = text.split()
    if not ws:
        return ""
    n_groups = max(1, len(ws) // 12)
    groups = []
    for gi in range(n_groups):
        lo = gi * 12
        hi = (gi + 1) * 12 if gi < n_groups - 1 else len(ws)
        groups.append(" ".join(ws[lo:hi]))
    return ". ".join(groups) + "."


def pages_html(doc_id: int, text: str) -> bytes:
    ptext = periodize(text)
    return (
        f"<html><head><title>Document {doc_id} synthetic article</title>"
        f'<meta name="author" content="Synthetic Author">'
        f'<meta property="published_time" content="2024-01-{(doc_id % 27) + 1:02d}T00:00:00Z">'
        f"</head><body><article>\n<p>{ptext}</p>\n</article></body></html>"
    ).encode()


def documents_as_pages(sf_dir: str):
    """documents(text) → pages(url, warc_ts, html, text, lang) Dataset."""
    import pyarrow as pa
    import ray.data

    def to_pages(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        texts = [x or "" for x in t.column("text").to_pylist()]
        langs = t.column("lang").to_pylist()
        base = 1_700_000_000_000_000
        return pa.table(
            {
                "url": pa.array(
                    [f"https://docs.example.com/d/{i}" for i in ids], pa.string()
                ),
                "warc_ts": pa.array(
                    [base + int(i) * 1_000_000 for i in ids], pa.timestamp("us")
                ),
                "html": pa.array(
                    [pages_html(i, x) for i, x in zip(ids, texts)], pa.binary()
                ),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(langs, pa.string()),
            }
        )

    from ..pipelines.queries import _read

    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    return ds.map_batches(to_pages, batch_format="pyarrow")

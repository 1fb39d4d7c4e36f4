"""Deterministic synthetic Common-Crawl-style ``pages`` table generator.

Produces the exact input shape demanded by BASELINE.json's ``input_hint``:

    pages(url: string, warc_ts: timestamp[us], html: binary, text: string,
          lang: string)

plus the frontier ``seeds`` table (FIXTURES.md §2). Fully seeded — same
(seed, n_rows) ⇒ byte-identical parquet content. The ``text`` column is the
oracle expectation: it is computed at generation time by the single-process
cleaner (``functions.clean.clean_content``), so the byte-identical invariant
downstream is ``ray_pipeline(html, url) == text`` (FIXTURES.md §1).

HTML templates model the reference's fixture at
``/root/reference/test_content_quality_fix.py:96-117``: nav/header/footer/
aside chrome, script/style/iframe noise, ad-class divs, domain-specific
content containers (bbc ``[data-component="text-block"]``, npr ``.storytext``,
reuters/cnn/generic ``article p``), meta author / published_time tags, plus
deterministic edge rows (<100-char content, error pages, placeholder text,
missing <title>, malformed HTML, non-English word soup).

Output is hash-bucketed parquet (``bucket = md5(url) % n_buckets``) written
one file per bucket — the partitioned-lookup layout the distributed fetch
stage relies on (fetching a URL = reading its bucket; SURVEY.md §3.1).
"""

from __future__ import annotations

import hashlib
import os
import random

import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.clean import clean_content

# hosts: the 5 domain-selector hosts + a Zipf-ish long tail
SPECIAL_HOSTS = ["www.bbc.com", "bbc.co.uk", "npr.org", "www.reuters.com", "www.cnn.com"]
SECTIONS = ["news", "world", "politics", "science", "tech", "health", "sport", "culture"]

_VOCAB = (
    "government officials announced new measures on trade policy while local "
    "residents gathered to discuss the impact of rising costs across the region "
    "scientists reported significant progress in renewable energy research as "
    "markets responded with cautious optimism the committee approved funding for "
    "infrastructure projects including bridges roads and public transport systems "
    "experts warned that climate patterns continue shifting affecting agriculture "
    "and water supplies in several provinces investigators released findings from "
    "a yearlong study into urban development and housing affordability community "
    "leaders praised volunteers for their dedication during the recovery effort"
).split()

_DE_VOCAB = (
    "die regierung kündigte neue maßnahmen zur handelspolitik an während anwohner "
    "sich versammelten um die auswirkungen steigender kosten zu diskutieren "
    "wissenschaftler berichteten über bedeutende fortschritte bei erneuerbaren "
    "energien die märkte reagierten vorsichtig optimistisch der ausschuss "
    "genehmigte mittel für infrastrukturprojekte"
).split()

BASE_TS_US = 1_700_000_000_000_000  # 2023-11-14T22:13:20Z, fixed epoch anchor


def _sentence(rng: random.Random, vocab, nwords: int) -> str:
    words = [rng.choice(vocab) for _ in range(nwords)]
    return words[0].capitalize() + " " + " ".join(words[1:]) + "."


def _paragraph(rng: random.Random, vocab=_VOCAB, nsent=None) -> str:
    nsent = nsent or rng.randint(2, 5)
    return " ".join(_sentence(rng, vocab, rng.randint(8, 18)) for _ in range(nsent))


def _host_for(i: int, rng: random.Random) -> str:
    # Zipf-skew: 50% special hosts (hot), 50% long tail of 200 hosts
    if rng.random() < 0.5:
        return rng.choice(SPECIAL_HOSTS)
    # skewed tail: low k more likely
    k = min(int(rng.paretovariate(1.2)), 200)
    return f"site{k}.example.com"


def _chrome(rng: random.Random) -> tuple[str, str]:
    head_noise = (
        "<script>var tracker = {id: 'xyz', fire: function(){}};</script>"
        "<style>.hidden{display:none} body{margin:0}</style>"
        '<meta name="viewport" content="width=device-width">'
    )
    body_chrome_top = (
        '<nav class="main-nav"><a href="/">Home</a><a href="/news">News</a></nav>'
        "<header><h1>Site Masthead</h1><p>Breaking headlines every hour from our newsroom desk around the world.</p></header>"
        '<div class="advertisement"><p>Buy one get one free, limited offer, click now to save big today!</p></div>'
        '<div id="newsletter-box"><p>Sign up for our daily newsletter to get stories in your inbox.</p></div>'
    )
    body_chrome_bottom = (
        '<aside class="sidebar"><p>Trending stories and recommended reads selected by our editors for you.</p></aside>'
        '<div class="social-share"><p>Follow us on social media for the latest updates and highlights.</p></div>'
        '<iframe src="https://ads.example.com/frame"></iframe>'
        "<footer><p>Copyright terms privacy contact careers advertise with us sitemap.</p></footer>"
    )
    return head_noise, body_chrome_top + "%CONTENT%" + body_chrome_bottom


def _article_html(rng: random.Random, host: str, title: str, author: str,
                  pub_iso: str, paragraphs: list[str], edge: str = "") -> str:
    head_noise, body_tmpl = _chrome(rng)
    title_tag = "" if edge == "no_title" else f"<title>{title}</title>"
    meta = (
        f'<meta name="author" content="{author}">'
        f'<meta property="published_time" content="{pub_iso}">'
        f'<meta name="description" content="{paragraphs[0][:150] if paragraphs else ""}">'
    )
    # newline-separated (pretty-printed) — get_text concatenates text nodes
    # with no separator, so the inter-paragraph whitespace must be real
    ps = "\n".join(f"<p>{p}</p>" for p in paragraphs)
    domain = host[4:] if host.startswith("www.") else host
    if domain in ("bbc.com", "bbc.co.uk"):
        content = "".join(
            f'<div data-component="text-block"><p>{p}</p></div>' for p in paragraphs
        )
    elif domain == "npr.org":
        content = f'<div class="storytext">{ps}</div>'
    elif domain == "reuters.com":
        content = f'<article class="ArticleBody__container">{ps}</article>'
    elif domain == "cnn.com":
        content = f'<div class="article__content">{ps}</div>'
    else:
        content = f"<article><h2>{title}</h2>{ps}</article>"
    body = body_tmpl.replace("%CONTENT%", content)
    html_doc = (
        f"<html><head>{title_tag}{meta}{head_noise}</head><body>{body}</body></html>"
    )
    if edge == "malformed":
        # unclosed tags + stray end tags — parser must survive
        html_doc = html_doc.replace("</article>", "").replace("</body></html>", "</div></span>")
    return html_doc


def _page_record(i: int, n_rows: int, seed: int) -> dict:
    """Pure per-row generator — the unit of the parallel path. Depends only
    on (i, n_rows, seed), so serial and Ray-parallel generation produce
    byte-identical rows."""
    week_us = 7 * 24 * 3600 * 1_000_000
    if True:
        rrow = random.Random(seed * 1_000_003 + i)  # per-row stream: stable under n_rows changes
        host = _host_for(i, rrow)
        section = rrow.choice(SECTIONS)
        url = f"https://{host}/{section}/story-{i}"
        ts = BASE_TS_US + (i * week_us) // max(n_rows, 1)
        edge_roll = rrow.random()
        lang = "en"
        title = f"Report {i}: " + _sentence(rrow, _VOCAB, 6)[:-1]
        author = rrow.choice(["Jane Miller", "Tom Okafor", "Priya Shah", "Lee Wong", "Ana Ruiz"])
        pub_iso = f"2023-11-{(i % 27) + 1:02d}T{(i % 24):02d}:00:00Z"
        if edge_roll < 0.02:
            paragraphs = [_sentence(rrow, _VOCAB, 8)]  # <100 chars → invalid
            edge = "short"
        elif edge_roll < 0.04:
            paragraphs = [
                "Error 404. The page you requested could not be located on this server at this time. "
                "Page not found. Please check the address and try again later today."
            ]
            edge = "error_page"
        elif edge_roll < 0.06:
            paragraphs = [
                "Lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod tempor. "
                "Incididunt ut labore et dolore magna aliqua ut enim ad minim veniam quis nostrud."
            ]
            edge = "placeholder"
        elif edge_roll < 0.08:
            paragraphs = [_paragraph(rrow) for _ in range(rrow.randint(3, 8))]
            edge = "no_title"
        elif edge_roll < 0.10:
            paragraphs = [_paragraph(rrow) for _ in range(rrow.randint(3, 8))]
            edge = "malformed"
        elif edge_roll < 0.15:
            paragraphs = [_paragraph(rrow, _DE_VOCAB) for _ in range(rrow.randint(3, 6))]
            lang = "de"
            edge = ""
        else:
            paragraphs = [_paragraph(rrow) for _ in range(rrow.randint(3, 10))]
            edge = ""
        html_doc = _article_html(rrow, host, title, author, pub_iso, paragraphs, edge)
        return {
            "i": i,
            "url": url,
            "warc_ts": ts,
            "html": html_doc.encode("utf-8"),
            "text": clean_content(html_doc, url),
            "lang": lang,
        }


def _seed_records(i: int, url: str, seed: int) -> list[dict]:
    """Per-row seed membership (pure in (i, url, seed)): ~40% of pages get a
    seed, ~10% of those a duplicate; discovery_ts = BASE + i ordering."""
    srng = random.Random(seed * 7919 + i)
    out = []
    if srng.random() < 0.4:
        src = "rss" if srng.random() < 0.6 else "sitemap"
        out.append(
            {"url": url, "source": src, "priority": 10 if src == "rss" else 5,
             "depth": 0, "discovery_ts": BASE_TS_US + i * 1_000_000}
        )
        if srng.random() < 0.1:  # exact duplicate seed
            out.append(
                {"url": url, "source": "sitemap", "priority": 5, "depth": 0,
                 "discovery_ts": BASE_TS_US + i * 1_000_000 + 500_000}
            )
    return out


def _rows_to_tables(rows: list[dict], n_rows: int, seed: int):
    rows = sorted(rows, key=lambda r: r["i"])
    pages = pa.table(
        {
            "url": pa.array([r["url"] for r in rows], pa.string()),
            "warc_ts": pa.array([r["warc_ts"] for r in rows], pa.timestamp("us")),
            "html": pa.array([r["html"] for r in rows], pa.binary()),
            "text": pa.array([r["text"] for r in rows], pa.string()),
            "lang": pa.array([r["lang"] for r in rows], pa.string()),
        }
    )
    seeds_rows = []
    for r in rows:
        seeds_rows.extend(_seed_records(r["i"], r["url"], seed))
    for k in range(max(1, n_rows // 50)):  # fetch misses
        seeds_rows.append(
            {"url": f"https://missing{k}.example.org/gone/{k}", "source": "sitemap",
             "priority": 5, "depth": 0,
             "discovery_ts": BASE_TS_US + (n_rows + k) * 1_000_000}
        )
    seeds = pa.table(
        {
            "url": pa.array([r["url"] for r in seeds_rows], pa.string()),
            "source": pa.array([r["source"] for r in seeds_rows], pa.string()),
            "priority": pa.array([r["priority"] for r in seeds_rows], pa.int32()),
            "depth": pa.array([r["depth"] for r in seeds_rows], pa.int32()),
            "discovery_ts": pa.array(
                [r["discovery_ts"] for r in seeds_rows], pa.timestamp("us")
            ),
        }
    )
    return pages, seeds


def generate_pages(n_rows: int, seed: int = 42):
    """→ (pages pyarrow.Table, seeds pyarrow.Table). Deterministic (serial)."""
    rows = [_page_record(i, n_rows, seed) for i in range(n_rows)]
    return _rows_to_tables(rows, n_rows, seed)


def generate_pages_parallel(n_rows: int, seed: int = 42):
    """Same output as ``generate_pages`` (byte-identical), computed with Ray
    tasks — the per-row generator is pure in (i, n_rows, seed). Used for the
    large scaling-bench universes; requires an initialized Ray session."""
    import ray

    n_chunks = max(8, min(64, n_rows // 500))
    bounds = [(c * n_rows) // n_chunks for c in range(n_chunks + 1)]

    @ray.remote
    def gen_chunk(lo: int, hi: int):
        return [_page_record(i, n_rows, seed) for i in range(lo, hi)]

    chunks = ray.get([gen_chunk.remote(bounds[c], bounds[c + 1]) for c in range(n_chunks)])
    rows = [r for chunk in chunks for r in chunk]
    return _rows_to_tables(rows, n_rows, seed)


def url_bucket(url: str, n_buckets: int) -> int:
    return int(hashlib.md5(url.encode()).hexdigest()[:8], 16) % n_buckets


def batch_url_buckets(urls, n_buckets: int):
    """Vectorized twin of ``url_bucket`` for a whole column: one int32 numpy
    array, ``int.from_bytes(digest[:4])`` instead of hexdigest string
    parsing (identical value — first 4 md5 bytes big-endian). Shared by the
    crawl bucket/annotate stages and the store writer so every call site
    stays bit-identical to the reference schedule."""
    import numpy as np

    md5 = hashlib.md5
    out = np.empty(len(urls), dtype=np.int32)
    for i, u in enumerate(urls):
        out[i] = int.from_bytes(md5(u.encode()).digest()[:4], "big") % n_buckets
    return out


# Sub-bucket granularity of the page store: each bucket file carries a
# ``sub_bucket = md5(url) % (n_buckets * SUB_BUCKET_FACTOR)`` column and is
# SORTED by it, with row groups aligned to sub boundaries. A fetch task for
# fine bucket b (n_fine = k·n_buckets, k | SUB_BUCKET_FACTOR) filters
# ``sub_bucket ∈ {b, b+n_fine, …}`` — parquet row-group statistics prune the
# read to exactly that slice, so the store is decoded ONCE per byte per wave
# at ANY fine-bucket factor (without this, k fine buckets per file each
# decode the whole file: k× redundant CPU that worsens with cluster size).
SUB_BUCKET_FACTOR = 8


def write_pages_dataset(out_dir: str, n_rows: int, seed: int = 42, n_buckets: int = 8,
                        parallel: bool = False) -> str:
    """Write bucketed pages + seeds parquet under ``out_dir``. Idempotent:
    skips if the manifest already records the same (n_rows, seed, n_buckets).
    ``parallel=True`` generates rows with Ray tasks (same bytes, faster for
    large universes)."""
    import json

    os.makedirs(out_dir, exist_ok=True)
    manifest = os.path.join(out_dir, "MANIFEST.txt")
    tag = f"{n_rows}:{seed}:{n_buckets}:v5"
    if os.path.exists(manifest):
        with open(manifest) as f:
            if f.read().strip() == tag:
                return out_dir
    if parallel:
        pages, seeds = generate_pages_parallel(n_rows, seed)
    else:
        pages, seeds = generate_pages(n_rows, seed)
    n_sub = n_buckets * SUB_BUCKET_FACTOR
    subs = batch_url_buckets(pages.column("url").to_pylist(), n_sub)
    pages = pages.append_column("sub_bucket", pa.array(subs, type=pa.int32()))
    # bucket = sub % n_buckets (md5 % kn % n == md5 % n)
    pages = pages.append_column(
        "bucket", pa.array(subs % n_buckets, type=pa.int32())
    )
    pages_dir = os.path.join(out_dir, "pages")
    os.makedirs(pages_dir, exist_ok=True)
    for b in range(n_buckets):
        mask = pa.compute.equal(pages.column("bucket"), b)
        # url as tiebreak: total order ⇒ byte-identical files every run
        part = pages.filter(mask).sort_by(
            [("sub_bucket", "ascending"), ("url", "ascending")]
        )
        # ~one row group per sub bucket → isin(sub_bucket) prunes to a slice
        rg = max(64, part.num_rows // SUB_BUCKET_FACTOR or 1)
        pq.write_table(part, os.path.join(pages_dir, f"bucket-{b:04d}.parquet"),
                       row_group_size=rg)
    with open(os.path.join(pages_dir, "_PAGES_META.json"), "w") as f:
        json.dump({"n_files": n_buckets, "n_sub": n_sub}, f)
    pq.write_table(seeds, os.path.join(out_dir, "seeds.parquet"))
    with open(manifest, "w") as f:
        f.write(tag)
    return out_dir

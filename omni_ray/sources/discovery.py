"""URL discovery sources S1/S2 (SURVEY.md §2.1): RSS and sitemap parsers
producing frontier seed records, as flat_map-style batch UDFs.

Record shape mirrors the reference (url_discovery_engine.py:42-49, :78-83):
  url, title (RSS only), published (RSS only), source ∈ {rss, sitemap},
  priority (10=rss, 5=sitemap), discovery_ts.

The reference uses feedparser + ElementTree over live HTTP; here the feed
bodies arrive as rows of a Dataset (url, body) — e.g. from
read_binary_files or a feeds table — and parsing is stdlib ElementTree with
a regex fallback for malformed feeds. ``discovery_ts`` is derived from the
feed row's position (deterministic), not wall clock (FIXTURES.md §6).
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET

import pyarrow as pa

RSS_PRIORITY = 10  # url_discovery_engine.py:47
SITEMAP_PRIORITY = 5  # url_discovery_engine.py:81

_ITEM_RE = re.compile(r"<item[\s>].*?</item>", re.DOTALL | re.IGNORECASE)
_LINK_RE = re.compile(r"<link[^>]*>(.*?)</link>", re.DOTALL | re.IGNORECASE)
_TITLE_RE = re.compile(r"<title[^>]*>(.*?)</title>", re.DOTALL | re.IGNORECASE)
_PUBDATE_RE = re.compile(r"<pubDate[^>]*>(.*?)</pubDate>", re.DOTALL | re.IGNORECASE)
_CDATA_RE = re.compile(r"<!\[CDATA\[(.*?)\]\]>", re.DOTALL)


def _uncdata(s: str) -> str:
    m = _CDATA_RE.search(s)
    return (m.group(1) if m else s).strip()


def parse_rss(body: str) -> list[dict]:
    """RSS 2.0 / Atom-lite item extraction → url/title/published records."""
    out = []
    try:
        root = ET.fromstring(body)
        # RSS 2.0: channel/item; Atom: {ns}entry
        items = root.findall(".//item")
        if not items:
            ns = {"a": "http://www.w3.org/2005/Atom"}
            for entry in root.findall(".//a:entry", ns):
                link = entry.find("a:link", ns)
                href = link.get("href") if link is not None else None
                title = entry.findtext("a:title", default="", namespaces=ns)
                pub = entry.findtext("a:updated", default="", namespaces=ns)
                if href:
                    out.append({"url": href.strip(), "title": title.strip(), "published": pub.strip()})
            return out
        for item in items:
            url = (item.findtext("link") or "").strip()
            if not url:
                continue
            out.append(
                {
                    "url": url,
                    "title": (item.findtext("title") or "").strip(),
                    "published": (item.findtext("pubDate") or "").strip(),
                }
            )
        return out
    except ET.ParseError:
        # regex fallback for malformed feeds (feedparser is tolerant too)
        for chunk in _ITEM_RE.findall(body):
            lm = _LINK_RE.search(chunk)
            if not lm:
                continue
            tm = _TITLE_RE.search(chunk)
            pm = _PUBDATE_RE.search(chunk)
            out.append(
                {
                    "url": _uncdata(lm.group(1)),
                    "title": _uncdata(tm.group(1)) if tm else "",
                    "published": _uncdata(pm.group(1)) if pm else "",
                }
            )
        return out


_LOC_RE = re.compile(r"<loc[^>]*>(.*?)</loc>", re.DOTALL | re.IGNORECASE)


def parse_sitemap(body: str) -> list[str]:
    """<urlset><url><loc> extraction (url_discovery_engine.py:58-89)."""
    try:
        root = ET.fromstring(body)
        urls = []
        for loc in root.iter():
            if loc.tag.endswith("loc") and loc.text:
                urls.append(loc.text.strip())
        return urls
    except ET.ParseError:
        return [_uncdata(m) for m in _LOC_RE.findall(body)]


def discover_batch(batch: pa.Table, base_ts_us: int = 1_700_000_000_000_000) -> pa.Table:
    """Batch UDF over (feed_url, kind ∈ {rss, sitemap}, body, feed_seq) rows →
    frontier seed records. discovery_ts = base + feed_seq*1e6 + position."""
    kinds = batch.column("kind").to_pylist()
    bodies = [
        b.decode("utf-8", "replace") if isinstance(b, (bytes, bytearray)) else (b or "")
        for b in batch.column("body").to_pylist()
    ]
    seqs = (
        batch.column("feed_seq").to_pylist()
        if "feed_seq" in batch.column_names
        else list(range(len(kinds)))
    )
    urls, titles, pubs, sources, prios, tss = [], [], [], [], [], []
    for kind, body, seq in zip(kinds, bodies, seqs):
        if kind == "rss":
            for pos, rec in enumerate(parse_rss(body)):
                urls.append(rec["url"])
                titles.append(rec["title"])
                pubs.append(rec["published"])
                sources.append("rss")
                prios.append(RSS_PRIORITY)
                tss.append(base_ts_us + int(seq) * 1_000_000 + pos)
        else:
            for pos, u in enumerate(parse_sitemap(body)):
                urls.append(u)
                titles.append("")
                pubs.append("")
                sources.append("sitemap")
                prios.append(SITEMAP_PRIORITY)
                tss.append(base_ts_us + int(seq) * 1_000_000 + pos)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "title": pa.array(titles, pa.string()),
            "published": pa.array(pubs, pa.string()),
            "source": pa.array(sources, pa.string()),
            "priority": pa.array(prios, pa.int32()),
            "depth": pa.array([0] * len(urls), pa.int32()),
            "discovery_ts": pa.array(tss, pa.timestamp("us")),
        }
    )

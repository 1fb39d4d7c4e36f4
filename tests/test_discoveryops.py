"""Batch-79 parser invariants: the malformed sitemap REALLY takes the
regex-fallback path (ET raises on it), CDATA titles strip identically on
both parse paths, ampersand escaping round-trips, and the union dedup
prefers RSS priority."""

import xml.etree.ElementTree as ET

import pytest

from omni_ray.pipelines.discoveryops import build_rss, build_sitemap
from omni_ray.sources.discovery import parse_rss, parse_sitemap

URLS = ["https://s.example.com/item?id=3&ref=s",
        "https://s.example.com/article/4"]


def test_sitemap_fallback_is_real():
    good = build_sitemap(URLS)
    bad = build_sitemap(URLS, malformed=True)
    ET.fromstring(good)  # parses
    with pytest.raises(ET.ParseError):
        ET.fromstring(bad)  # the fallback branch genuinely runs
    assert len(parse_sitemap(good)) == len(parse_sitemap(bad)) == 2
    # ET path unescapes &amp; back to &
    assert parse_sitemap(good)[0] == URLS[0]


def test_rss_cdata_and_escaping():
    recs = parse_rss(build_rss([(3, URLS[0]), (4, URLS[1])]))
    assert [r["title"] for r in recs] == ["doc 3", "doc 4"]  # CDATA stripped
    assert recs[0]["url"] == URLS[0]  # & round-trips through escaping
    assert recs[0]["published"] == ""          # odd id: no pubDate
    assert recs[1]["published"].endswith("GMT")  # even id: pubDate present


@pytest.mark.usefixtures("ray_session")
def test_union_dedup_prefers_rss():
    from omni_ray.pipelines.discoveryops import discovery_union_dedup

    out = discovery_union_dedup("/root/testdata/sf0.001").to_pandas()
    piv = out.pivot_table(index="source", columns="won_by", values="n_urls",
                          fill_value=0, aggfunc="sum")
    # every source: evens won by rss, odds by sitemap; totals = doc count
    import pyarrow.parquet as pq
    docs = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                         columns=["doc_id", "source"]).to_pandas()
    for src, g in docs.groupby("source"):
        evens = int((g["doc_id"] % 2 == 0).sum())
        assert piv.loc[src].get("rss", 0) == evens
        assert piv.loc[src].get("sitemap", 0) == len(g) - evens

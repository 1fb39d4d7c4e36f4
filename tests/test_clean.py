"""Cleaner unit tests: pinned reference-semantics fixtures + the byte-identical
invariant over the synthetic pages table (BASELINE.json input_hint)."""

import pyarrow as pa
import pytest

from omni_ray.functions.clean import (
    basic_clean,
    clean_batch,
    clean_content,
    clean_text,
    extract_domain,
    is_valid_content,
)

# The reference's own embedded problematic fixture
# (/root/reference/test_content_quality_fix.py:96-117)
PROBLEMATIC_HTML = """
    <div class="article">
        <script>var ad = "ADVERTISEMENT";</script>
        <style>.ad { display: none; }</style>
        <nav>Menu items here</nav>
        <header>Site header</header>
        <div class="content">
            <p>This is real article content that should be extracted.</p>
            <p>It contains meaningful sentences and paragraphs.</p>
            <div class="advertisement">Buy our product!</div>
            <p>More real content continues here.</p>
            <iframe src="https://player.npr.org"></iframe>
            <p>Download Embed Transcript</p>
        </div>
        <footer>Site footer</footer>
    </div>
"""

LONG_P = (
    "More real content continues here with many additional words that extend "
    "this paragraph well past the length threshold needed for the combined "
    "gate to trigger properly in the generic extraction path of the cleaner."
)


def test_reference_fixture_too_short_returns_empty():
    # traced against content_cleaner.py semantics: combined '.content p'
    # text is 163 chars (< the 200-char gate), all-<p> fallback keeps only the
    # one 50..1000-char paragraph, < 100 chars ⇒ invalid ⇒ ""
    assert clean_content(PROBLEMATIC_HTML, "") == ""


def test_reference_fixture_long_strips_noise():
    html = PROBLEMATIC_HTML.replace("More real content continues here.", LONG_P)
    out = clean_content(html, "")
    assert out.startswith("This is real article content that should be extracted.")
    for bad in ["ADVERTISEMENT", "Buy our product", "Menu items", "Site header",
                "Site footer", "iframe", "Transcript", "display: none"]:
        assert bad not in out
    assert LONG_P in out


def test_domain_selector_bbc():
    paras = [
        "The committee approved additional funding for several infrastructure projects across the region today officials said. "
        "Local residents welcomed the decision after months of consultation and debate in the chamber.",
        "Scientists meanwhile reported measurable progress in renewable energy research, and markets responded with cautious optimism across several sectors.",
    ]
    html = "<html><body>" + "".join(
        f'<div data-component="text-block"><p>{p}</p></div>' for p in paras
    ) + "</body></html>"
    out = clean_content(html, "https://www.bbc.com/news/article-1")
    assert out == " ".join(paras)


def test_npr_storytext_selector():
    paras = [
        "Government officials announced new measures on trade policy while residents gathered to discuss the impact of rising costs.",
        "Experts warned that climate patterns continue shifting, affecting agriculture and water supplies in several provinces this year.",
    ]
    # note: bs4/our get_text concatenates with NO separator — the newline
    # between <p> elements (pretty-printed HTML) is what separates paragraphs
    html = '<div class="storytext">\n' + "\n".join(f"<p>{p}</p>" for p in paras) + "\n</div>"
    out = clean_content(html, "https://npr.org/2023/story")
    assert out == " ".join(paras)


def test_error_page_rejected():
    p = ("Error 404. The page you requested could not be located on this server. "
         "Page not found. Please check the address and try again later today, thanks.")
    html = f"<article><p>{p}</p><p>{p}</p></article>"
    assert clean_content(html, "") == ""


def test_entity_double_unescape():
    # parser unescapes once; _clean_text unescapes again (content_cleaner.py:227)
    assert clean_text("Fish &amp; Chips") == "Fish & Chips"
    filler = ("Extra sentence words to pass the validity length gate easily here. "
              "Another sentence with plenty of words follows right after it today.")
    html = f"<article>\n<p>Fish &amp;amp; Chips are popular in Britain, {filler}</p>\n<p>{filler}</p>\n</article>"
    out = clean_content(html, "")
    assert "Fish & Chips" in out  # double-unescaped end to end


def test_unwanted_pattern_regexes():
    t = clean_text("Read this. ADVERTISEMENT Sign up for our daily newsletter now. Done.")
    assert "ADVERTISEMENT" not in t
    assert "Sign up" not in t


def test_is_valid_content_bounds():
    good = ("The quick brown fox jumps over the lazy dog near the river bank today. "
            "Another sentence follows with enough words to be plausible and clear. "
            "And one more for good measure in this block of text.")
    assert is_valid_content(good)
    assert not is_valid_content("short")
    assert not is_valid_content("word " * 60)  # one giant sentence, no '. '


def test_basic_clean():
    assert basic_clean("<p>a &amp; b</p>\n<p>c</p>") == "a & b c"


def test_extract_domain():
    assert extract_domain("https://www.bbc.com/news/x") == "bbc.com"
    assert extract_domain("https://npr.org/a") == "npr.org"
    assert extract_domain("") == ""


def test_empty_and_malformed():
    assert clean_content("", "u") == ""
    assert clean_content("   ", "u") == ""
    # malformed HTML must not raise
    clean_content("<div><p>unclosed <b>everything" * 10, "u")


@pytest.mark.usefixtures("ray_session")
def test_byte_identical_invariant_ray(pages_dir):
    """The invariant from BASELINE.json input_hint: the distributed Ray
    pipeline's extracted text is byte-identical to the oracle ``text`` column,
    for every url."""
    import ray.data

    ds = ray.data.read_parquet(f"{pages_dir}/pages")
    out = ds.map_batches(clean_batch, batch_format="pyarrow", batch_size=128)
    mismatches = out.map_batches(
        lambda t: t.filter(
            pa.compute.not_equal(t.column("extracted_text"), t.column("text"))
        ).select(["url"]),
        batch_format="pyarrow",
    )
    bad = mismatches.take_all()
    assert bad == [], f"byte-identical invariant violated for {len(bad)} urls: {bad[:5]}"

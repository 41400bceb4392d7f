"""HTML extraction + link extraction: local semantics and UDF equivalence.

The byte-identical invariant (BASELINE.md correctness gate 1): the pandas-UDF
extractor must produce exactly the `text` column the in-repo oracle extractor
produced at corpus-generation time, byte for byte, per url.
"""

from pyspark.sql import functions as F

from apollo_service_spark.functions.html import (
    extract_links,
    extract_text,
    extract_text_only,
)
from apollo_service_spark.functions.udfs import extract_links_udf, extract_text_udf


def test_title_from_title_tag():
    md, clean, title = extract_text(
        "<html><head><title> My Page! </title></head><body><p>hi</p></body></html>"
    )
    assert title == "My Page!"
    assert clean == "My-Page"
    assert md == "hi"


def test_title_fallback_h1_then_untitled():
    _, clean, title = extract_text("<html><body><h1>Header One</h1></body></html>")
    assert title == "Header One"
    assert clean == "Header-One"
    _, clean2, title2 = extract_text("<html><body><p>no title</p></body></html>")
    assert title2 == "untitled"
    assert clean2 == "untitled"


def test_strip_classes_removed():
    html = (
        "<html><body>"
        '<nav class="top-bar">NAVTEXT</nav>'
        '<div class="footer-wrapper">FOOTERTEXT</div>'
        '<div class="main-content"><p>keep me</p></div>'
        "</body></html>"
    )
    md, _, _ = extract_text(html)
    assert "NAVTEXT" not in md
    assert "FOOTERTEXT" not in md
    assert "keep me" in md


def test_img_figure_svg_removed_and_image_markdown_stripped():
    html = (
        "<html><body><div class='content'>"
        "<img src='x.png'/><figure><figcaption>cap</figcaption></figure>"
        "<svg><circle/></svg>"
        "<p>text with https://cdn.example.com/pic.jpg link</p>"
        "</div></body></html>"
    )
    md, _, _ = extract_text(html)
    assert "cap" not in md
    assert ".jpg" not in md
    assert "text with" in md


def test_apply_now_section_removed():
    html = (
        "<html><body><div class='content'><p>real content</p></div>"
        "<div><section><h3>Apply Now</h3><form><input/></form>"
        "<p>form help text</p></section></div></body></html>"
    )
    md, _, _ = extract_text(html)
    assert "real content" in md
    assert "form help text" not in md
    assert "Apply Now" not in md


def test_content_selection_fallback_to_body():
    html = "<html><body><p>plain body text</p></body></html>"
    md, _, _ = extract_text(html)
    assert md == "plain body text"


def test_empty_and_invalid():
    assert extract_text("") == ("", "", "")
    assert extract_text_only(None) == ""
    assert extract_text_only(b"<html><body><p>bytes ok</p></body></html>") == "bytes ok"


def test_atx_headings_and_lists():
    html = (
        "<html><body><div class='content'>"
        "<h2>Section</h2><ul><li>alpha</li><li>beta</li></ul>"
        "<ol><li>one</li></ol>"
        "</div></body></html>"
    )
    md, _, _ = extract_text(html)
    assert "## Section" in md
    assert "* alpha" in md
    assert "* beta" in md
    assert "1. one" in md


def test_extract_links_semantics():
    html = (
        "<html><body>"
        '<a href="/a/b">rel</a>'
        '<a href="https://other.com/x#frag">abs</a>'
        '<a href="javascript:void(0)">js</a>'
        '<a href="mailto:x@y.z">mail</a>'
        '<a href="tel:+1">tel</a>'
        '<a href="/a/b">dup</a>'
        "</body></html>"
    )
    links = extract_links(html, "https://base.com/page/here")
    assert links == ["https://base.com/a/b", "https://other.com/x"]


def test_extract_links_entity_decoded_once():
    """Attribute values are entity-decoded exactly once (HTMLParser does it
    during parsing, same as the reference's bs4, apollo.py:359-371); a literal
    '&amp;amp;' in the source is one decode → '&amp;', not '&'."""
    html = (
        '<a href="/p?a=1&amp;b=2">one</a>'
        '<a href="/q?x=&amp;amp;y">double-escaped</a>'
    )
    links = extract_links(html, "https://base.com/")
    assert "https://base.com/p?a=1&b=2" in links
    assert "https://base.com/q?x=&amp;y" in links


def test_udf_equivalence_byte_identical(spark, small_corpus):
    """Arrow-batched UDF output == precomputed oracle text, byte for byte."""
    from apollo_service_spark.sources.corpus import PAGES_SCHEMA

    pages = spark.createDataFrame(small_corpus["pages"], schema=PAGES_SCHEMA)
    checked = pages.filter(F.col("html").isNotNull()).select(
        "url",
        "text",
        extract_text_udf(F.col("html")).alias("udf_text"),
    )
    mismatches = checked.filter(
        F.col("text").cast("binary") != F.col("udf_text").cast("binary")
    ).count()
    assert mismatches == 0
    assert checked.count() > 50


def test_links_udf_matches_local(spark, small_corpus):
    from apollo_service_spark.sources.corpus import PAGES_SCHEMA

    pages_pd = small_corpus["pages"]
    pages = spark.createDataFrame(pages_pd, schema=PAGES_SCHEMA)
    got = (
        pages.filter(F.col("html").isNotNull())
        .select("url", extract_links_udf(F.col("html"), F.col("url")).alias("links"))
        .collect()
    )
    local = {
        row["url"]: extract_links(row["html"], row["url"])
        for _, row in pages_pd.iterrows()
        if row["html"] is not None
    }
    assert len(got) == len(local)
    for row in got:
        assert list(row["links"]) == local[row["url"]]

"""Sitemap parsing: urlset / sitemapindex XML → seed URLs, pure Catalyst.

The reference has no sitemap support (its only discovery channel is link
extraction, apollo.py:359-371); sitemaps are the web's OTHER standard
discovery channel (sitemaps.org protocol, referenced from robots.txt
``Sitemap:`` lines), so a crawl engine over Common-Crawl-style tables needs
them to seed and refresh frontiers at scale.

Parsing contract (de-facto, not a full XML parser — sitemap files in the
wild are machine-generated and regular):

* every ``<loc>…</loc>`` text is a candidate URL — this covers BOTH
  document shapes: a ``<urlset>``'s locs are page urls, a
  ``<sitemapindex>``'s locs are sub-sitemap urls (the caller feeds those
  back through the fetch join and parses again — one extra superstep, the
  same dataflow as any frontier expansion; no recursion in the operator);
* values are whitespace-trimmed and the five XML entities the protocol
  requires escaped (``&amp; &apos; &quot; &gt; &lt;``) are unescaped,
  ``&amp;`` last so ``&amp;lt;`` round-trips to the literal ``&lt;`` the
  author wrote; CDATA sections are out of scope (vanishingly rare in
  sitemaps) and documented here rather than half-supported;
* only http(s) locs survive — the protocol requires absolute URLs.

Everything is regexp_extract_all + explode + replace chains — JVM-side,
one scan, zero shuffles until the caller's own dedup.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (escaped, literal) — &amp; LAST so author-escaped entity text survives
_XML_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&apos;", "'"),
    ("&amp;", "&"),
]

_LOC_RE = r"<loc>([^<]*)</loc>"


def _unescape(col: Column) -> Column:
    for esc, lit in _XML_ENTITIES:
        col = F.replace(col, F.lit(esc), F.lit(lit))
    return col


def parse_sitemap_locs(
    bodies: DataFrame, host_col: str = "host", body_col: str = "body"
) -> DataFrame:
    """(host, body) → DISTINCT ``(host, url)`` of every ``<loc>`` entry."""
    locs = F.explode(
        F.regexp_extract_all(F.col(body_col), F.lit(_LOC_RE), 1)
    ).alias("raw")
    url = _unescape(
        F.regexp_replace(F.col("raw"), r"^\s+|\s+$", "")
    ).alias("url")
    return (
        bodies.select(F.col(host_col).alias("host"), locs)
        .select("host", url)
        .filter(F.col("url").startswith("http://") | F.col("url").startswith("https://"))
        .distinct()
    )


def parse_sitemap_locs_py(body: str) -> list:
    """Python mirror of the contract for tests."""
    import re

    out = set()
    for raw in re.findall(_LOC_RE, body or ""):
        u = raw.strip()
        for esc, lit in _XML_ENTITIES:
            u = u.replace(esc, lit)
        if u.startswith(("http://", "https://")):
            out.add(u)
    return sorted(out)

"""Deterministic synthetic crawl corpus (FIXTURES.md §B, seed=42, no network).

Generates the four crawl-domain tables in the BASELINE.json ``input_hint``
shape:

* ``pages``      (url string, warc_ts timestamp, html binary, text string,
                  lang string) — HTML realizes a known link graph per host
                  (tree of depth ≤ 5 + cross links + noise links that the
                  filters must drop), with the elements the reference
                  extractor strips; ``text`` is the byte-exact output of the
                  in-repo extractor applied to ``html``.
* ``seeds``      (url string, priority long)
* ``robots``     (host string, disallow_prefix string)
* ``politeness`` (host string, budget int)

Hosts are Zipf-skewed — host 0 is the mega-host carrying roughly half the
corpus — so the frontier engine's salted-host partitioning and AQE skew
handling are actually exercised. Everything is a pure function of
(seed, n_hosts, n_pages); timestamps derive from a url hash against a fixed
epoch (no wall clock).
"""

from __future__ import annotations

import hashlib
import random
from datetime import datetime, timedelta, timezone

import pandas as pd

from ..functions.html import extract_text_only

_EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)

_LANGS = ["en", "en", "en", "ur", "de"]  # en-weighted

_NOISE_LINKS = [
    "/admin/login",
    "/user/logout",
    "/assets/banner.jpg",
    "/media/clip.mp4",
    "/broken/404",
    "https://facebook.com/somebank",
    "https://www.instagram.com/somebank",
    "javascript:void(0)",
    "mailto:info@example.com",
    "tel:+920000000",
]


def _stable_hash(s: str) -> int:
    return int.from_bytes(hashlib.sha256(s.encode()).digest()[:8], "big")


def _warc_ts(url: str) -> datetime:
    return _EPOCH + timedelta(seconds=_stable_hash(url) % (30 * 24 * 3600))


def _zipf_host(rng: random.Random, n_hosts: int) -> int:
    # crude Zipf: P(host k) ∝ 1/(k+1)
    weights = [1.0 / (k + 1) for k in range(n_hosts)]
    return rng.choices(range(n_hosts), weights=weights, k=1)[0]


def _page_html(
    url: str,
    title: str,
    body_words: list,
    out_links: list,
    rng: random.Random,
) -> str:
    noise = rng.sample(_NOISE_LINKS, k=min(3, len(_NOISE_LINKS)))
    link_html = "\n".join(
        f'<li><a href="{href}">link {i}</a></li>' for i, href in enumerate(out_links)
    )
    noise_html = "\n".join(f'<a href="{href}">noise</a>' for href in noise)
    strip_block = (
        '<header class="header-main-subpages"><a href="/hidden/by/header">x</a></header>'
        '<nav class="top-bar">navigation text</nav>'
        '<div class="footer-wrapper">footer text</div>'
        '<img src="/assets/banner.jpg"/>'
        "<figure><img src='/assets/fig.png'/><figcaption>cap</figcaption></figure>"
        "<svg><circle r='1'/></svg>"
    )
    apply_now = (
        "<div><section><h3>Apply Now</h3><form><input name='x'/></form></section></div>"
        if rng.random() < 0.25
        else ""
    )
    paragraphs = " ".join(body_words)
    return (
        "<html><head><title>{title}</title></head><body>"
        "{strip}"
        '<div class="main-content"><h1>{title}</h1>'
        "<p>{para}</p>"
        "<ul>{links}</ul>"
        "</div>"
        "{apply_now}"
        "<div>{noise}</div>"
        "</body></html>"
    ).format(
        title=title,
        strip=strip_block,
        para=paragraphs,
        links=link_html,
        apply_now=apply_now,
        noise=noise_html,
    )


_WORDS = (
    "frontier crawl spark shuffle partition broadcast window politeness "
    "robots budget anti join bloom filter host cluster path prefix year "
    "document markdown extract vectorized arrow batch lineage snapshot"
).split()


def gen_corpus(
    n_hosts: int = 5,
    n_pages: int = 200,
    seed: int = 42,
    max_depth: int = 5,
    branching: int = 4,
) -> dict:
    """Return dict of pandas DataFrames: pages, seeds, robots, politeness."""
    rng = random.Random(seed)
    hosts = [f"host{k}.example.com" for k in range(n_hosts)]

    # assign page counts per host, Zipf-skewed, each host ≥ 2 pages
    counts = {h: 2 for h in hosts}
    for _ in range(max(0, n_pages - 2 * n_hosts)):
        counts[hosts[_zipf_host(rng, n_hosts)]] += 1

    # per-host page tree: page 0 is the root, page i hangs off (i-1)//branching
    urls_by_host: dict = {}
    paths_by_host: dict = {}
    for host in hosts:
        n = counts[host]
        paths = ["/"]
        for i in range(1, n):
            parent = (i - 1) // branching
            parent_path = paths[parent]
            depth = parent_path.count("/") if parent_path != "/" else 0
            seg = f"sec{i % 7}" if depth < max_depth - 1 else f"page{i}"
            if depth >= max_depth - 1 or rng.random() < 0.4:
                child = (parent_path.rstrip("/") + f"/page{i}.html")
            else:
                child = (parent_path.rstrip("/") + f"/{seg}/p{i}")
            paths.append(child)
        paths_by_host[host] = paths
        urls_by_host[host] = [
            f"https://{host}{p if p != '/' else '/'}" for p in paths
        ]

    # document links: a few per host, some with year-bearing names/queries
    doc_urls: dict = {}
    for host in hosts:
        docs = []
        n_docs = max(1, counts[host] // 10)
        for d in range(n_docs):
            year = 1990 + (rng.randrange(40))
            style = rng.randrange(3)
            if style == 0:
                docs.append(f"https://{host}/reports/annual-report-{year}.pdf")
            elif style == 1:
                docs.append(f"https://{host}/files/statement.xlsx?year={year}")
            else:
                docs.append(f"https://{host}/docs/{year}/overview.docx")
        doc_urls[host] = docs

    pages_rows = []
    for host in hosts:
        urls = urls_by_host[host]
        n = len(urls)
        for i, url in enumerate(urls):
            # children in the tree
            children = [
                urls[j] for j in range(1, n) if (j - 1) // branching == i
            ]
            # a couple of deterministic cross links within the host
            cross = [urls[rng.randrange(n)] for _ in range(2)]
            # occasionally a cross-host link (dropped by domain restriction)
            foreign = (
                [urls_by_host[hosts[rng.randrange(len(hosts))]][0]]
                if rng.random() < 0.2
                else []
            )
            docs = (
                rng.sample(doc_urls[host], k=1) if rng.random() < 0.3 else []
            )
            # mix relative and absolute forms + a fragment variant
            out_links = []
            for link in children + cross + foreign + docs:
                if link.startswith(f"https://{host}") and rng.random() < 0.5:
                    out_links.append(link[len(f"https://{host}"):] or "/")
                elif rng.random() < 0.2:
                    out_links.append(link + "#section-2")
                else:
                    out_links.append(link)
            title = f"Page {i} of {host.split('.')[0]}"
            words = [ _WORDS[rng.randrange(len(_WORDS))] for _ in range(30) ]
            html = _page_html(url, title, words, out_links, rng)
            lang = _LANGS[_stable_hash(url) % len(_LANGS)]
            pages_rows.append(
                {
                    "url": url,
                    "warc_ts": _warc_ts(url),
                    "html": html.encode("utf-8"),
                    "text": extract_text_only(html),
                    "lang": lang,
                }
            )
        # document pages exist as non-HTML rows (fetched, never expanded)
        for doc in doc_urls[host]:
            pages_rows.append(
                {
                    "url": doc,
                    "warc_ts": _warc_ts(doc),
                    "html": None,
                    "text": None,
                    "lang": None,
                }
            )

    pages = pd.DataFrame(pages_rows).drop_duplicates(subset=["url"])

    seeds = pd.DataFrame(
        {"url": [urls_by_host[h][0] for h in hosts], "priority": [0] * n_hosts}
    )

    robots_rows = []
    for k, host in enumerate(hosts):
        if k % 2 == 0:
            robots_rows.append({"host": host, "disallow_prefix": "/admin"})
        if k % 3 == 0:
            robots_rows.append({"host": host, "disallow_prefix": "/sec3"})
    robots = pd.DataFrame(robots_rows, columns=["host", "disallow_prefix"])

    politeness = pd.DataFrame(
        {
            "host": hosts,
            "budget": [8 if k == 0 else 4 for k in range(n_hosts)],
        }
    )

    return {
        "pages": pages,
        "seeds": seeds,
        "robots": robots,
        "politeness": politeness,
    }


PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"
SEEDS_SCHEMA = "url string, priority long"
ROBOTS_SCHEMA = "host string, disallow_prefix string"
POLITENESS_SCHEMA = "host string, budget int"


def corpus_to_spark(spark, corpus: dict) -> dict:
    """Materialize the pandas corpus as Spark DataFrames."""
    return {
        "pages": spark.createDataFrame(corpus["pages"], schema=PAGES_SCHEMA),
        "seeds": spark.createDataFrame(corpus["seeds"], schema=SEEDS_SCHEMA),
        "robots": spark.createDataFrame(corpus["robots"], schema=ROBOTS_SCHEMA),
        "politeness": spark.createDataFrame(
            corpus["politeness"], schema=POLITENESS_SCHEMA
        ),
    }


def write_corpus(spark, corpus: dict, out_dir: str) -> dict:
    """Write the corpus as parquet under out_dir/{name}; pages partitioned-ready."""
    import os

    dfs = corpus_to_spark(spark, corpus)
    paths = {}
    for name, df in dfs.items():
        path = os.path.join(out_dir, name)
        df.write.mode("overwrite").parquet(path)
        paths[name] = path
    return paths

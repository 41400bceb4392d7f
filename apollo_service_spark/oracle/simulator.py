"""Single-process reference simulator for crawl-equivalence tests.

Implements the reference crawler's BFS semantics (`apollo.py`: dedup
`:442-452`, exclusion filters `:220-266`, depth expansion `:586-604`,
politeness as per-host budgets) under the *canonical deterministic ordering*
the Spark engine pins (SURVEY.md §7): per-host batches ordered by
(depth, url), within-iteration fetch rank by global (depth, url).

It deliberately shares the same predicate code as the engine
(``urlkit.*_py`` mirrors and ``html.extract_links``), so any divergence the
equivalence tests catch comes from the distributed plan, never from predicate
drift (FIXTURES.md determinism rules).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from urllib.parse import urlparse

from ..functions import urlkit
from ..functions.html import extract_links
from ..operators.robots import robots_allow_py


@dataclass
class SimConfig:
    base_host: str | None = None
    depth_limit: int | None = None
    max_pages: int | None = None
    max_links: int | None = None
    default_budget: int = 4
    extra_ignore_patterns: list = field(default_factory=list)
    respect_robots: bool = True
    max_iterations: int = 1000


@dataclass
class SimResult:
    crawl_log: list          # rows: (url, host, depth, iteration, rank, status, is_document)
    seen: set
    iterations: int
    pages_fetched: int
    links_processed: int
    stopped_reason: str


def simulate(
    pages: dict,
    seeds: list,
    config: SimConfig | None = None,
    robots: dict | None = None,
    politeness: dict | None = None,
) -> SimResult:
    """pages: url → html (str|bytes|None, None = non-HTML row);
    robots: host → [disallow_prefix]; politeness: host → budget."""
    cfg = config or SimConfig()
    robots = robots or {}
    politeness = politeness or {}

    frontier: dict = {}  # url → depth (min)
    for seed in seeds:
        canon = urlkit.canonicalize_py(seed)
        frontier.setdefault(canon, 0)

    seen: set = set()
    crawl_log: list = []
    pages_fetched = 0
    links_processed = 0
    reason = "frontier_exhausted"
    iteration = -1

    for iteration in range(cfg.max_iterations):
        if not frontier:
            reason = "frontier_exhausted"
            iteration -= 1
            break
        if cfg.max_pages is not None and pages_fetched >= cfg.max_pages:
            reason = "max_pages"
            iteration -= 1
            break
        if cfg.max_links is not None and links_processed >= cfg.max_links:
            reason = "max_links"
            iteration -= 1
            break

        # -- batch select: per-host budget, order (depth, url) --------------
        by_host: dict = {}
        for url, depth in frontier.items():
            by_host.setdefault(urlparse(url).netloc, []).append((depth, url))
        selected: list = []
        carryover: dict = {}
        for host, items in by_host.items():
            items.sort()
            budget = politeness.get(host, cfg.default_budget)
            for depth, url in items[:budget]:
                selected.append((depth, url))
            for depth, url in items[budget:]:
                carryover[url] = depth

        selected.sort()
        if cfg.max_pages is not None:
            remaining = cfg.max_pages - pages_fetched
            for depth, url in selected[remaining:]:
                carryover[url] = depth
            selected = selected[:remaining]

        scheduled_urls = {url for _d, url in selected}
        seen |= scheduled_urls

        # -- fetch + log ------------------------------------------------------
        batch_links: dict = {}  # url → min depth of candidate
        for rank, (depth, url) in enumerate(selected, start=1):
            in_table = url in pages
            html = pages.get(url)
            status = (
                "error" if not in_table else ("non_html" if html is None else "fetched")
            )
            crawl_log.append(
                {
                    "url": url,
                    "host": urlparse(url).netloc,
                    "depth": depth,
                    "iteration": iteration,
                    "rank": rank,
                    "status": status,
                    "is_document": urlkit.is_document_url_py(url),
                }
            )
            if status != "error":
                pages_fetched += 1
            if status != "fetched":
                continue
            if cfg.depth_limit is not None and depth >= cfg.depth_limit:
                continue

            links = extract_links(html, url)
            filtered = []
            for link in links:
                canon = urlkit.canonicalize_py(link)
                if urlkit.is_ignored_py(canon, cfg.extra_ignore_patterns):
                    continue
                parsed = urlparse(canon)
                if cfg.base_host is not None and parsed.netloc != cfg.base_host:
                    continue
                if cfg.respect_robots and not robots_allow_py(
                    parsed.path, robots.get(parsed.netloc)
                ):
                    continue
                filtered.append(canon)
            links_processed += len(filtered)
            for link in filtered:
                nd = depth + 1
                if link not in batch_links or nd < batch_links[link]:
                    batch_links[link] = nd

        # -- dedup + next frontier -------------------------------------------
        next_frontier = dict(carryover)
        for link, depth in batch_links.items():
            if link in seen or link in carryover or link in scheduled_urls:
                continue
            if link not in next_frontier or depth < next_frontier[link]:
                next_frontier[link] = depth
        frontier = next_frontier
    else:
        reason = "max_iterations"

    return SimResult(
        crawl_log=crawl_log,
        seen=seen,
        iterations=iteration + 1,
        pages_fetched=pages_fetched,
        links_processed=links_processed,
        stopped_reason=reason,
    )

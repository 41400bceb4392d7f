"""The distributed URL-frontier + fetch scheduler (the engine core).

Reimplements the reference's 20-thread BFS crawler
(`apollo.py:393-652`, `:724-801`) as deterministic Spark supersteps. One
iteration of the driver loop is one Spark job:

1. **batch select** — per-host politeness budget via window ranking
   (politeness.py); carryover stays in the frontier.
2. **fetch** — ``batch LEFT JOIN pages ON url`` (the table-driven analog of
   the HTTP GET at `apollo.py:493`); a missing row is a fetch error, a row
   with NULL html is non-HTML content (no link expansion, `apollo.py:549-555`).
3. **expand** — ``extract_links_udf`` (Arrow) → ``explode`` → canonicalize →
   ignore-pattern / domain / document filters (urlkit, Catalyst-native) →
   robots broadcast gate (robots.py).
4. **dedup** — bloom pre-filter (bloom.py) then exact
   ``LEFT ANTI JOIN`` against the accumulated seen set, then against the
   carryover frontier (reference double-check under lock, `apollo.py:592-604`).
5. **commit** — frontier, seen delta, crawl log, per-partition lineage and
   iteration metrics land in one SnapshotStore commit; a crawl resumes
   mid-frontier from the latest committed iteration.

Determinism: every ordering in the loop is a total order (depth, url), so
given the same seeds + politeness budgets the engine reproduces the canonical
crawl ordering exactly (verified against oracle/simulator.py). Every
DataFrame crossing iterations round-trips through parquet, which truncates
lineage — no logical-plan growth across supersteps (SURVEY.md §7 risk 3).

Scale notes: the frontier and seen tables are hash-partitioned by salted
host PLUS a per-url spread offset (`host_salted_partition(url=...)`) so one
mega-host cannot pin a storage/dedup partition; the politeness budget bounds
any host's per-iteration BATCH, and the opt-in two-phase selection
(`CrawlConfig.politeness_prune` → politeness.select_batch) bounds the
per-host WINDOW straggler a mega-host frontier would otherwise create;
robots and politeness dims are broadcast; AQE handles residual skew in the
anti-join.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..functions import urlkit
from ..functions.udfs import extract_links_udf
from ..sources.storage import SnapshotStore
from . import politeness as politeness_ops
from . import robots as robots_ops
from .bloom import build_bloom, split_by_bloom


@dataclass
class CrawlConfig:
    base_host: str | None = None          # None ⇒ no domain restriction
    depth_limit: int | None = None        # None ⇒ unlimited (ref float('inf'))
    max_pages: int | None = None
    max_links: int | None = None
    default_budget: int = 4
    extra_ignore_patterns: list = field(default_factory=list)
    respect_robots: bool = True
    n_partitions: int = 32
    salt: int = 42
    bloom_fpp: float = 0.01
    use_bloom: bool = True
    bloom_min_seen: int = 10_000          # below this the exact join is cheap
    max_iterations: int = 1000
    # "partitioned" (default) maintains per-partition bloom bitmaps + exact
    # url sets incrementally — the 10^10-scale path (operators/seen.py): cost
    # per superstep is proportional to the delta and nothing bloom-shaped
    # crosses the driver. "broadcast" rebuilds+broadcasts one bloom per
    # iteration (only sane to ~10^8 seen urls; kept for A/B benchmarking).
    seen_backend: str = "partitioned"
    expected_urls: int = 1_000_000        # bloom sizing for "partitioned"
    # opt-in two-phase batch selection: bounds the per-host window straggler
    # when one mega-host dominates the frontier (politeness.select_batch);
    # None = single exact window (right for skew-free frontiers)
    politeness_prune: int | None = None
    # frontiers at or below this size fetch via a broadcast semi-join probe
    # over the RAW pages scan (no corpus shuffle, no cache materialization)
    # instead of the repartitioned+cached join — the small-superstep fast
    # path (seed iterations, crawl tail). The cached layout is built lazily
    # by the first BIG superstep, where it amortizes against real work.
    small_batch_threshold: int = 10_000
    # opt-in: when set (seconds of wall time one superstep represents) and
    # robots_bodies were given WITHOUT an explicit politeness table, derive
    # per-host budgets from the bodies' Crawl-delay directives
    # (robots.parse_crawl_delays → politeness.budgets_from_delays, clamped
    # to [1, default_budget]); hosts with no valid delay keep default_budget
    delay_budget_seconds: float | None = None


@dataclass
class CrawlResultState:
    iterations: int
    pages_fetched: int
    links_processed: int
    stopped_reason: str


_FRONTIER_SCHEMA = ["url", "host", "depth"]


def _obs_metrics(obs: Observation, fallback) -> dict:
    """Observation values, or ``fallback()`` when the observed node was
    optimized away before running (AQE empty-relation propagation on sessions
    not built by session.py — build_session excludes that rule)."""
    try:
        return obs.get
    except Exception:
        return fallback()


class FrontierEngine:
    def __init__(
        self,
        spark: SparkSession,
        pages: DataFrame,
        store: SnapshotStore,
        config: CrawlConfig | None = None,
        robots: DataFrame | None = None,
        robots_bodies: DataFrame | None = None,
        politeness: DataFrame | None = None,
        sitemap_bodies: DataFrame | None = None,
    ):
        self.spark = spark
        self.config = config or CrawlConfig()
        self.store = store
        # pages is joined on url EVERY superstep; repartition once on the
        # join key and persist (disk-backed) so supersteps pay a cached-read
        # + small-side shuffle instead of re-scanning AND re-shuffling the
        # whole corpus per iteration — the round-4 probe measured the pages
        # reshuffle as the superstep's dominant fixed cost (~19 s/iteration
        # at 50k pages). Scale honesty: executor storage bounds what this
        # buys — when the fetch table exceeds cache it degrades to the
        # re-scan behavior, never worse; on a real crawl the pages "table"
        # is the fetch layer (network), and this join is its stand-in.
        # run() unpersists on completion.
        self.pages_raw = pages
        self.pages = pages.repartition(self.config.n_partitions, "url").persist(
            StorageLevel.MEMORY_AND_DISK
        )
        # robots rules arrive either pre-parsed (host, disallow_prefix) or
        # as raw fetched bodies (host, body) — the latter run through the
        # reference-exact line scan (robots_ops.parse_robots) first, i.e.
        # /robots.txt is just another fetched page whose parse is part of
        # the dataflow (apollo.py:239-264's fetch+cache, minus the network)
        if robots_bodies is not None and self.config.respect_robots:
            parsed = robots_ops.parse_robots(robots_bodies)
            robots = parsed if robots is None else robots.unionByName(parsed)
        self.robots_agg = (
            robots_ops.aggregate_rules(robots)
            if (robots is not None and self.config.respect_robots)
            else None
        )
        if (
            politeness is None
            and robots_bodies is not None
            and self.config.delay_budget_seconds is not None
        ):
            politeness = politeness_ops.budgets_from_delays(
                robots_ops.parse_crawl_delays(robots_bodies),
                self.config.delay_budget_seconds,
                max_budget=self.config.default_budget,
            )
        self.politeness = politeness
        self.sitemap_bodies = sitemap_bodies
        if self.config.seen_backend == "partitioned":
            from .seen import PartitionedBloomSeenStore

            self.seen_store = PartitionedBloomSeenStore(
                store.root,
                n_partitions=self.config.n_partitions,
                expected_urls=self.config.expected_urls,
                fpp=self.config.bloom_fpp,
                salt=self.config.salt,
            )
        else:
            self.seen_store = None

    # ------------------------------------------------------------------ init

    def _init_frontier(self, seeds: DataFrame) -> DataFrame:
        # sitemap-discovered urls join the caller's seeds at depth 0 — a
        # sitemap IS a seed list the site publishes (sitemap.py); its urls
        # go through the same canonicalize + dedup as any other seed, and a
        # sitemapindex's .xml children simply 404 out of the fetch join the
        # way any unknown url does (or resolve, if the pages table carries
        # them, and get parsed on the next superstep)
        if self.sitemap_bodies is not None:
            from .sitemap import parse_sitemap_locs

            seeds = seeds.select("url").unionByName(
                parse_sitemap_locs(self.sitemap_bodies).select("url")
            )
        canon = urlkit.canonicalize(F.col("url"))
        return (
            seeds.select(canon.alias("url"))
            .withColumn("host", urlkit.url_host(F.col("url")))
            .withColumn("depth", F.lit(0))
            .dropDuplicates(["url"])
        )

    def _repartition_state(self, df: DataFrame) -> DataFrame:
        return df.repartition(
            self.config.n_partitions,
            urlkit.host_salted_partition(
                F.col("host"),
                self.config.n_partitions,
                self.config.salt,
                url=F.col("url"),
            ),
        )

    # ------------------------------------------------------------------ steps

    def _candidate_links(self, fetched: DataFrame) -> DataFrame:
        """Post-filter, PRE-dedup candidate links (url, host, depth) from this
        batch's pages — one row per surviving extracted link, duplicates kept
        so ``count()`` on it is the reference's total_links_processed
        increment (`apollo.py:573-574`)."""
        cfg = self.config
        expandable = fetched.filter(F.col("html").isNotNull())
        if cfg.depth_limit is not None:
            expandable = expandable.filter(F.col("depth") < F.lit(cfg.depth_limit))

        # canonicalize stays a JVM column expression (fast path), but the
        # ignore filter MUST be the single-reference fused regex here:
        # predicate pushdown substitutes the canonicalize tree into every
        # filter term, and the ~30-term contains/endswith decomposition blew
        # past janino's compile limits, silently dropping this stage to
        # interpreted execution (round-4 probe; guarded by the
        # codegen.fallback=false test in tests/test_plans.py)
        links = (
            expandable.select(
                F.col("depth"),
                F.explode(
                    extract_links_udf(F.col("html"), F.col("url"))
                ).alias("raw_link"),
            )
            .select(
                urlkit.canonicalize(F.col("raw_link")).alias("url"),
                (F.col("depth") + 1).alias("depth"),
            )
            .withColumn("host", urlkit.url_host(F.col("url")))
        )

        links = links.filter(
            ~urlkit.is_ignored_fused(F.col("url"), cfg.extra_ignore_patterns)
        )
        if cfg.base_host is not None:
            links = links.filter(F.col("host") == F.lit(cfg.base_host))
        links = links.withColumn("path", urlkit.url_path(F.col("url")))
        return robots_ops.robots_allow(links, self.robots_agg).drop("path")

    def _dedup(
        self,
        links: DataFrame,
        seen: DataFrame | None,
        exclude: DataFrame,
        seen_count: int,
    ) -> DataFrame:
        """Dedup candidates vs the seen set and vs in-flight/carryover urls.

        Partitioned backend: one partition-local pass (bloom probe + exact
        pid-local url set inside the task, seen.py:filter_new) — the
        accumulated seen set never shuffles. Broadcast backend: bloom
        pre-filter + exact anti-join against the accumulated seen table.

        ``exclude`` is the union of the carryover frontier and this
        iteration's scheduled batch — the reference's visited-set membership
        includes in-flight URLs (`apollo.py:442-452`), so links back to a
        just-fetched page must not re-enter the frontier.
        """
        cfg = self.config
        # dedup on url alone — host is a pure function of the url, so it is
        # recomputed AFTER the aggregate instead of riding the shuffle as a
        # grouping key (narrower shuffle rows, one fewer key column)
        links = (
            links.groupBy("url")
            .agg(F.min("depth").alias("depth"))
            .withColumn("host", urlkit.url_host(F.col("url")))
        )
        # exclusion anti-join FIRST, while links are hash-partitioned by url
        # straight out of the groupBy — ENSURE_REQUIREMENTS reuses that
        # layout for the join's left side (only the much smaller exclude
        # side shuffles), and the batch shrinks before the seen-store's
        # Python pass. Order vs the seen check is semantically free (both
        # are row filters).
        links = links.join(exclude.select("url"), "url", "left_anti")
        if self.seen_store is not None:
            new = self.seen_store.filter_new(links)
        elif cfg.use_bloom and seen_count >= cfg.bloom_min_seen:
            bloom = build_bloom(
                seen, "url", n_items=max(seen_count, 1), fpp=cfg.bloom_fpp
            )
            definitely_new, maybe_seen = split_by_bloom(
                self.spark, links, "url", bloom
            )
            checked = maybe_seen.join(seen.select("url"), "url", "left_anti")
            new = definitely_new.unionByName(checked)
        else:
            new = links.join(seen.select("url"), "url", "left_anti")
        return new.select(*_FRONTIER_SCHEMA)

    # ------------------------------------------------------------------ loop

    def run(self, seeds: DataFrame | None = None, resume: bool = False) -> CrawlResultState:
        cfg = self.config
        store = self.store
        spark = self.spark
        # re-mark the pages cache (no-op on first run; restores the mark a
        # previous run()'s completion unpersist removed on engine reuse)
        self.pages.persist(StorageLevel.MEMORY_AND_DISK)

        if resume and store.latest_iteration() >= 0:
            start_iter = store.latest_iteration() + 1
            frontier = store.read_latest(spark, "frontier")
            metrics = store.iteration_metrics()
            pages_fetched = sum(m.get("pages_fetched", 0) for m in metrics)
            links_processed = sum(m.get("links_found", 0) for m in metrics)
            # seen deltas are disjoint (a url is scheduled at most once), so
            # the cumulative scheduled count IS the seen-set size — no
            # per-iteration count() job on the accumulated table
            seen_count = sum(m.get("scheduled", 0) for m in metrics)
        else:
            if seeds is None:
                raise ValueError("seeds required for a fresh crawl")
            if self.seen_store is not None:
                self.seen_store.reset()
            start_iter = 0
            frontier = self._init_frontier(seeds)
            pages_fetched = 0
            links_processed = 0
            seen_count = 0
        # one count per RUN (not per iteration): every subsequent frontier
        # size is observed for free during the previous commit's write
        frontier = frontier.persist()
        frontier_size = frontier.count()

        seen = None
        if self.seen_store is None:
            seen = (
                store.read_accumulated(spark, "seen_delta")
                if resume and store.latest_iteration() >= 0
                else None
            ) or spark.createDataFrame([], "url string")

        reason = "frontier_exhausted"
        iteration = start_iter - 1
        for iteration in range(start_iter, cfg.max_iterations + start_iter):
            # stop checks on driver-side counters only — the frontier size of
            # iteration k is observed during iteration k-1's commit write, so
            # the loop top runs zero Spark jobs (first iteration: size unknown,
            # the superstep itself resolves an empty frontier to zero work)
            if frontier_size == 0:
                reason = "frontier_exhausted"
                iteration -= 1
                frontier.unpersist()
                break
            if cfg.max_pages is not None and pages_fetched >= cfg.max_pages:
                reason = "max_pages"
                iteration -= 1
                frontier.unpersist()
                break
            if cfg.max_links is not None and links_processed >= cfg.max_links:
                reason = "max_links"
                iteration -= 1
                frontier.unpersist()
                break

            t0 = time.monotonic()

            selected, carryover = politeness_ops.select_batch(
                frontier,
                self.politeness,
                cfg.default_budget,
                prune_partitions=cfg.politeness_prune,
            )
            # deterministic truncation at the page limit (canonical rule for
            # the reference's racy max_pages stop, apollo.py:538-547). The
            # within-iteration rank is DERIVED data — (iteration, depth, url)
            # totally orders the crawl — so the hot loop only materializes it
            # when the truncation can actually bind (remaining < batch bound);
            # readers get ranks from crawl_log_df, recomputed distributed.
            rank_cache: list = []
            if cfg.max_pages is not None:
                remaining = cfg.max_pages - pages_fetched
                if remaining < frontier_size:
                    ranked_all = politeness_ops.rank_within_iteration(
                        selected, cfg.n_partitions, cleanup=rank_cache
                    )
                    overflow = ranked_all.filter(
                        F.col("rank") > remaining
                    ).drop("rank")
                    ranked = ranked_all.filter(
                        F.col("rank") <= remaining
                    ).drop("rank")
                    carryover = carryover.unionByName(
                        overflow.select(*_FRONTIER_SCHEMA)
                    )
                else:
                    ranked = selected
            else:
                ranked = selected
            ranked = ranked.select(*_FRONTIER_SCHEMA).persist()
            carryover = carryover.select(*_FRONTIER_SCHEMA)

            # batch stats ride the commit writes as observed metrics — no
            # dedicated .collect()/.count() jobs in the superstep
            # fetch join: small supersteps probe the raw pages scan with a
            # broadcast semi-join (scan-only, zero corpus shuffle) and join
            # the pruned hits; big supersteps use the cached url-partitioned
            # layout. The gate uses the tightest driver-known bound on the
            # BATCH size (zero jobs): frontier_size always bounds it, and
            # when the page limit binds the truncation above caps the batch
            # at `remaining` — the deep-crawl tail regime (small page budget
            # against a large residual frontier) takes the fast path.
            batch_bound = frontier_size
            if cfg.max_pages is not None:
                batch_bound = min(
                    batch_bound, max(cfg.max_pages - pages_fetched, 0)
                )
            if batch_bound <= cfg.small_batch_threshold:
                fetch_src = self.pages_raw.join(
                    F.broadcast(ranked.select("url")), "url", "left_semi"
                )
            else:
                fetch_src = self.pages
            obs_batch = Observation()
            fetched = (
                ranked.join(fetch_src, "url", "left")
                .withColumn(
                    "status",
                    F.when(F.col("warc_ts").isNull(), F.lit("error"))
                    .when(F.col("html").isNull(), F.lit("non_html"))
                    .otherwise(F.lit("fetched")),
                )
                .withColumn("is_document", urlkit.is_document_url(F.col("url")))
                .observe(
                    obs_batch,
                    F.count(F.lit(1)).alias("n_selected"),
                    F.sum(
                        F.when(F.col("status") != "error", 1).otherwise(0)
                    ).alias("n_ok"),
                )
                .persist()
            )

            obs_links = Observation()
            links = self._candidate_links(fetched).observe(
                obs_links, F.count(F.lit(1)).alias("links_found")
            )
            exclude = carryover.select("url").unionByName(ranked.select("url"))
            new_links = self._dedup(links, seen, exclude, seen_count)

            obs_next = Observation()
            # plain union, no merge aggregate: the two sides are provably
            # disjoint and internally unique — carryover ⊂ frontier (unique
            # by url; the page-limit overflow moved into carryover BEFORE
            # exclude was built), and new_links was grouped by url then
            # anti-joined against exclude = carryover ∪ ranked. A
            # groupBy(url).min(depth) here was a full shuffle of the next
            # frontier that could never change a row.
            next_frontier = carryover.unionByName(new_links)
            next_frontier = (
                self._repartition_state(next_frontier)
                .observe(obs_next, F.count(F.lit(1)).alias("next_size"))
                .persist()
            )

            crawl_log = fetched.select(
                "url",
                "host",
                "depth",
                F.lit(iteration).alias("iteration"),
                "status",
                "is_document",
            )
            lineage = next_frontier.groupBy(
                F.spark_partition_id().alias("partition_id")
            ).agg(F.count("*").alias("rows")).withColumn(
                "iteration", F.lit(iteration)
            )

            # seen-store blobs/url files are updated BEFORE the manifest
            # commit so the store is always a superset of the committed seen
            # set (crash-safe: supersets only cause extra exclusions of urls
            # the crawl already scheduled, never lost urls)
            store_update_s = 0.0
            if self.seen_store is not None:
                t_upd = time.monotonic()
                self.seen_store.update(ranked.select("url", "host"))
                store_update_s = round(time.monotonic() - t_upd, 4)

            def _metrics() -> dict:
                # evaluated by the store AFTER the table writes — the writes
                # are the actions that populate the observations
                batch = _obs_metrics(
                    obs_batch,
                    lambda: fetched.agg(
                        F.count(F.lit(1)).alias("n_selected"),
                        F.sum(
                            F.when(F.col("status") != "error", 1).otherwise(0)
                        ).alias("n_ok"),
                    ).collect()[0].asDict(),
                )
                link_m = _obs_metrics(
                    obs_links, lambda: {"links_found": links.count()}
                )
                return {
                    "scheduled": int(batch["n_selected"] or 0),
                    "pages_fetched": int(batch["n_ok"] or 0),
                    "links_found": int(link_m["links_found"] or 0),
                    "frontier_size": frontier_size,
                    "wall_s": round(time.monotonic() - t0, 4),
                    # fixed-cost breakdown (VERDICT r3 task #2): the store
                    # update's wall; commit adds per-table write_walls_s
                    "store_update_s": store_update_s,
                }

            m = store.commit(
                iteration,
                {
                    "frontier": next_frontier,
                    "seen_delta": ranked.select("url"),
                    "crawl_log": crawl_log,
                    "lineage": lineage,
                },
                metrics=_metrics,
            )

            pages_fetched += m["pages_fetched"]
            links_processed += m["links_found"]
            seen_count += m["scheduled"]
            frontier_size = int(
                _obs_metrics(
                    obs_next, lambda: {"next_size": next_frontier.count()}
                )["next_size"]
                or 0
            )

            frontier.unpersist()
            ranked.unpersist()
            fetched.unpersist()
            next_frontier.unpersist()
            # ranking's range-partitioned intermediate (when the page-limit
            # truncation bound this iteration) — safe to drop now that the
            # commit actions have materialized everything derived from it
            for cached in rank_cache:
                cached.unpersist()

            # read state back from the committed snapshot: truncates lineage
            # (persisted here, once — the loop top never re-persists)
            frontier = store.read(spark, "frontier", iteration).persist()
            if self.seen_store is None:
                seen = store.read_accumulated(spark, "seen_delta")
        else:
            reason = "max_iterations"
            frontier.unpersist()

        # every exit path converges here: release the cached pages layout
        # (run() re-marks it on entry, so engine reuse stays cached)
        self.pages.unpersist()
        return CrawlResultState(
            iterations=iteration - start_iter + 1 if iteration >= start_iter else 0,
            pages_fetched=pages_fetched,
            links_processed=links_processed,
            stopped_reason=reason,
        )

def crawl_log_df(
    spark: SparkSession, store: SnapshotStore, cleanup: list | None = None
) -> DataFrame | None:
    """The accumulated canonical crawl log: (url, iteration, rank, ...).

    ``rank`` (the canonical within-iteration fetch order) is derived on read
    rather than stored: (iteration, depth, url) totally orders the crawl, so
    the superstep never pays a global ranking pass. Derivation is
    distributed — one global row_number over (iteration, depth, url) (no
    single-partition exchange) minus broadcast per-iteration offsets.
    """
    log = store.read_accumulated(spark, "crawl_log")
    if log is None:
        return None
    from .ranking import global_row_number

    ranked = global_row_number(
        log, ["iteration", "depth", "url"], rank_col="_grn", cleanup=cleanup
    )
    offsets = (
        ranked.groupBy("iteration")
        .agg(F.min("_grn").alias("_base"))
    )
    return (
        ranked.join(F.broadcast(offsets), "iteration")
        .withColumn("rank", (F.col("_grn") - F.col("_base") + 1).cast("int"))
        .drop("_grn", "_base")
    )

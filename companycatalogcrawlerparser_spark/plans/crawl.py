"""The flagship pipeline — email-harvest crawl as a round-based DataFrame
loop (SURVEY.md §3.2 "Spark shape"; reference ``Program.fs:492-567`` +
``Crawler.fs:316-392``).

Round 0 (seeds): F9 filter → A2 site_url dedup → cap → politeness schedule
→ fetch join → extract → mailto/email bag → per-company branch (mailto>1
short-circuit / contact anchors / contact hrefs) → flags + next frontier.
Round 1 (contact pages): extractor-scope dedup → schedule → fetch → email
regex only (the reference's ``asyncEmailExtractor`` never expands further).
Finalize: F10 post-filter → K5 global email dedup + junction.

Every round commits one atomic snapshot (trace, bag, url_seen delta, next
frontier, flags, counters) — a killed job resumes at the last committed
round without refetching (C7).

Scale shape per round: one big shuffle (fetch join, AQE-skew-handled), one
narrow Arrow UDF (extract), window dedups keyed by (company, page) and
host. No collect() except tiny control counts and manifest counters.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import admission as admission_mod
from ..functions.canon import base_url as base_url_expr
from ..functions.canon import canonicalize_url
from ..functions.emails import finalize_emails
from ..functions.predicates import (
    is_contacts_page,
    is_not_image_script_css_ext,
    not_social_network,
    seed_filter,
)
from ..operators import extract as X
from ..operators import frontier as FR
from ..operators import robots as RB
from ..operators.urlseen import UrlSeen, seen_key
from ..sources.pages import fetch_join, redirect_map
from ..storage.snapshots import SnapshotStore

_TIMING = os.environ.get("SPARK_GRAFT_TIMING", "") == "1"
_t_last = [time.monotonic()]


def _mark(label: str) -> None:
    """Phase-timing telemetry, enabled via SPARK_GRAFT_TIMING=1."""
    if _TIMING:
        now = time.monotonic()
        print(f"@@@ {label}: {now - _t_last[0]:.1f}s", flush=True)
        _t_last[0] = now


FRONTIER_COLS = ["company_id", "url", "priority", "seq", "base_url"]

EMPTY_SEEN_SCHEMA = "seen_key long, scope string, canonical_url string, round int"


@dataclass
class CrawlConfig:
    max_depth: int = 2          # seed round + contact round (reference depth)
    take_limit: int = 100000    # Program.fs:535
    delay_ms: int = 1000        # smallest reference Thread.Sleep
    num_partitions: int = 32
    n_buckets: int = 64         # url_seen filter buckets (power of two)
    use_bloom: bool = True
    url_seen_filter: str = "bloom"  # or "cuckoo" (deletable fingerprints)
    collect_counters: bool = True  # manifest counters cost extra actions;
    #                                bench runs disable them
    respect_robots: bool = True  # robots.txt gating + Crawl-delay
    #   politeness (north_rule); no-op when the corpus carries no
    #   robots.txt rows, so reference-parity corpora are unaffected
    robots_agent: str = "ccc-spark"
    native_extract: bool = True  # JVM regex extraction (no Arrow/Python
    #   transfer of html); False = Arrow UDTF sharing the refsem regexes.
    #   Both are oracle-verified; native is ~2x crawl throughput
    broadcast_frontier: bool = True  # per-round frontier ≤ take_limit rows
    #   → broadcast it and STREAM the corpus (html never shuffles/sorts);
    #   disable only for frontier batches beyond broadcast size, where the
    #   pages table should be bucketed by url_hash instead
    compact_every: int = 0  # ENGINE-NEW (opt-in, 0 = off): every K
    #   committed rounds, rewrite the append-style tables (bag/trace/
    #   flags) into one compacted base snapshot and prune the covered
    #   per-round data dirs (manifests kept). At thousand-round scale
    #   finalize() otherwise unions thousands of tiny scan legs — see
    #   SnapshotStore.compact. Reader-invisible: finalize reads through
    #   read_union; pytest pins crawl-output hash equality on/off.
    use_sitemaps: bool = False  # ENGINE-NEW (opt-in, default off so the
    #   reference-parity traces are untouched): after the seed round,
    #   enrich the contact round's frontier with same-host contact-like
    #   URLs from each company's /sitemap.xml in the corpus — sites whose
    #   homepage hides the contact link still get their contact page
    #   fetched. See _sitemap_contact_frontier.


def _empty_seen(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame([], EMPTY_SEEN_SCHEMA)


def select_companies(seeds: DataFrame, take_limit: int) -> DataFrame:
    """F9 ∘ A2 ∘ O3 — crawl-set selection (``Program.fs:525-535``).
    A2 is the reference's own ROW_NUMBER formulation (UsefulSQLQuery.sql:33-36)."""
    f = seeds.filter(
        seed_filter(
            F.col("site_url"),
            F.col("bad_url"),
            F.col("email_processed"),
            F.col("email_finded"),
        )
    )
    w = Window.partitionBy("site_url").orderBy("company_id")
    dedup = (
        f.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")
    )
    # TakeOrderedAndProject — top-K without a global sort
    return dedup.orderBy("company_id").limit(take_limit)


def run_crawl(
    spark: SparkSession,
    pages: DataFrame,
    seeds: DataFrame,
    out_dir: str,
    config: CrawlConfig | None = None,
) -> dict:
    """Runs (or resumes) the crawl; returns the final tables as DataFrames:
    emails, company_email, flags, trace, url_seen."""
    cfg = config or CrawlConfig()
    store = SnapshotStore(spark, out_dir)
    useen = UrlSeen(spark, n_buckets=cfg.n_buckets, filter_kind=cfg.url_seen_filter)

    last = store.last_round()
    start_round = 0 if last is None else last + 1

    # redirect closure depends only on the corpus — compute once, cache
    # (small: the 3xx subset), reuse across rounds
    _mark("run_crawl entered")
    restore_split = _tune_input_splits(spark, pages)

    # robots rules parsed ONCE per run from the corpus's own robots.txt
    # rows ("the corpus is the web"); empty → gating short-circuits so the
    # reference-parity corpora pay one pruned scan, nothing more. Denied
    # URLs are dropped BEFORE scheduling/fetching: no trace row, no
    # url_seen entry (they were never attempted).
    robots_rules_df = None
    robots_politeness = None
    if cfg.respect_robots and start_round < cfg.max_depth:
        rr = RB.robots_rules(pages, agent=cfg.robots_agent).cache()
        if not rr.isEmpty():
            robots_rules_df = rr
            delays = RB.crawl_delays(rr)
            robots_politeness = delays if not delays.isEmpty() else None
    _mark("robots rules built")
    rmap = redirect_map(pages).cache() if start_round < cfg.max_depth else None
    _mark("redirect_map built (lazy+cache)")

    for round_id in range(start_round, cfg.max_depth):
        if round_id == 0:
            companies = select_companies(seeds, cfg.take_limit)
            frontier = companies.select(
                "company_id",
                F.col("site_url").alias("url"),
                F.lit(FR.PRIO_SEED).alias("priority"),
                F.lit(0).alias("seq"),
                base_url_expr(F.col("site_url")).alias("base_url"),
            )
            seen = _empty_seen(spark)
            # global scope G anti-join (no-op on a fresh store, real on reruns)
            cand = (
                frontier.withColumn("canonical_url", canonicalize_url(F.col("url")))
                .withColumn("scope", F.lit("G"))
                .withColumn("seen_key", seen_key(F.col("scope"), F.col("canonical_url")))
            )
            frontier = useen.filter_unseen(cand, seen).drop(
                "seen_key", "scope", "canonical_url"
            )
        else:
            frontier = store.read(round_id - 1, "frontier_next")
            seen = store.read(round_id - 1, "url_seen")
            if cfg.use_bloom:
                # reuse the blooms committed with the previous snapshot —
                # built distributed (applyInPandas per bucket); rebuild only
                # if restoring from an older store without a blooms table
                if store.has_table(round_id - 1, "blooms"):
                    useen.set_blooms(store.read(round_id - 1, "blooms"))
                else:
                    useen.build_blooms(seen)
                _mark(f"round {round_id} load/build blooms")
            cand = (
                frontier.withColumn("canonical_url", canonicalize_url(F.col("url")))
                .withColumn("scope", F.col("company_id").cast("string"))
                .withColumn("seen_key", seen_key(F.col("scope"), F.col("canonical_url")))
            )
            # within-round first-occurrence dedup (the sequential seen.Add)
            w = Window.partitionBy("company_id", "url").orderBy("priority", "seq")
            cand = (
                cand.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1)
                .drop("__rn")
            )
            frontier = useen.filter_unseen(cand, seen).drop(
                "seen_key", "scope", "canonical_url"
            )
            # extractor gate: non-empty ∧ F2 (Crawler.fs:241)
            frontier = frontier.filter(
                (F.col("url") != "") & is_not_image_script_css_ext(F.col("url"))
            )

        # robots gate (north_rule): drop disallowed URLs pre-schedule
        if robots_rules_df is not None:
            frontier = RB.gate_frontier(frontier, robots_rules_df)

        # politeness stamps over full host, then salted spread (W2/C2/C3);
        # per-host Crawl-delay rows override the default budget
        sched = FR.schedule(
            frontier,
            politeness=robots_politeness,
            default_delay_ms=cfg.delay_ms,
        )
        sched = FR.salted(sched, cfg.num_partitions)

        _mark(f"round {round_id} plan: frontier+schedule built")
        # the fetch join stays LAZY: html streams from the corpus scan
        # straight through ONE Arrow pass that emits fetch metadata +
        # per-page token arrays; only that metadata-sized frame is
        # checkpointed (html never hits the block manager — materializing
        # 30 KB × frontier of html was the dominant core-count-independent
        # cost at bench scale)
        fetched = fetch_join(
            sched, pages, rmap=rmap, broadcast_frontier=cfg.broadcast_frontier
        )
        # EAGER: the broadcast-join plan has no upstream shuffle stages, so
        # a lazy checkpoint would defer the scan+extract to the first
        # consumer — and CONCURRENT consumers (the parallel seed
        # checkpoints) would then race to compute the same unmaterialized
        # RDD, duplicating the extract. Materialize once, here.
        extract = (
            X.extract_tokens_native if cfg.native_extract else X.extract_tokens_meta
        )
        tokens = extract(fetched).localCheckpoint(eager=True)
        _mark(f"round {round_id} plan: fetch+extract materialized (eager)")

        trace = tokens.select(
            F.lit(round_id).alias("round"),
            "company_id",
            "priority",
            "seq",
            F.col("page_url").alias("url"),
            F.when(F.col("fetch_ok"), F.lit("fetched"))
            .otherwise(F.lit("error"))
            .alias("action"),
            "host",
            "host_rank",
            "not_before",
            "fetch_error",
        )

        # IsNullOrWhiteSpace gate on the fetched body (Crawler.fs:326)
        ok_tokens = tokens.filter(F.col("fetch_ok") & F.col("has_html"))

        if round_id == 0:
            result = _seed_round(spark, cfg, tokens, ok_tokens)
            if cfg.use_sitemaps:
                result["frontier_next"] = result["frontier_next"].unionByName(
                    _sitemap_contact_frontier(
                        pages, ok_tokens, result["frontier_next"]
                    )
                )
            _mark(f"round {round_id} plan: seed_round built")
        else:
            bag = X.regex_emails(ok_tokens).select("company_id", "email")
            result = {
                "bag": bag,
                "flags": spark.createDataFrame(
                    [], "company_id long, bad_url boolean, email_processed boolean, email_finded boolean"
                ),
                "frontier_next": spark.createDataFrame([], ", ".join(
                    f"{c} {t}" for c, t in [
                        ("company_id", "long"), ("url", "string"), ("priority", "int"),
                        ("seq", "int"), ("base_url", "string"),
                    ]
                )),
            }

        # url_seen delta: everything this round actually attempted
        if round_id == 0:
            delta = tokens.select(
                seen_key(F.lit("G"), canonicalize_url(F.col("page_url"))).alias("seen_key"),
                F.lit("G").alias("scope"),
                canonicalize_url(F.col("page_url")).alias("canonical_url"),
                F.lit(round_id).alias("round"),
            )
            url_seen = delta
        else:
            delta = tokens.select(
                seen_key(F.col("company_id").cast("string"), canonicalize_url(F.col("page_url"))).alias("seen_key"),
                F.col("company_id").cast("string").alias("scope"),
                canonicalize_url(F.col("page_url")).alias("canonical_url"),
                F.lit(round_id).alias("round"),
            )
            url_seen = seen.unionByName(delta)

        if cfg.collect_counters:
            agg = trace.agg(
                F.sum(F.when(F.col("action") == "fetched", 1).otherwise(0)).alias("ok"),
                F.sum(F.when(F.col("action") == "error", 1).otherwise(0)).alias("err"),
            ).first()
            counters = {
                "pages_fetched": int(agg["ok"] or 0),
                "fetch_errors": int(agg["err"] or 0),
                "urls_enqueued": result["frontier_next"].count(),
                "emails_bagged": result["bag"].count(),
            }
            # per-partition lineage (north_rule): rows per salt bucket
            counters["partition_rows"] = {
                int(r["host_salt"]): r["n"]
                for r in sched.groupBy("host_salt").agg(F.count("*").alias("n")).collect()
            }
        else:
            counters = {}

        _mark(f"round {round_id} pre-commit")
        tables = {
            "trace": trace,
            "bag": result["bag"],
            "flags": result["flags"],
            "frontier_next": result["frontier_next"],
            "url_seen": url_seen,
        }
        if cfg.use_bloom and round_id + 1 < cfg.max_depth:
            # persist next round's blooms with the snapshot (distributed
            # applyInPandas build — seen keys never reach the driver)
            tables["blooms"] = useen.bloom_table(url_seen)
        store.commit(round_id, tables, counters=counters)
        if cfg.compact_every and (round_id + 1) % cfg.compact_every == 0:
            store.compact(["bag", "trace", "flags"], upto=round_id)
            store.prune_compacted(round_id)
            _mark(f"round {round_id} compacted")

    _mark("rounds done")
    out = finalize(spark, store, cfg)
    _mark("finalize built")
    restore_split()
    return out


def _tune_input_splits(spark, pages: DataFrame):
    """Size ``spark.sql.files.maxPartitionBytes`` to the ACTUAL corpus:
    html compresses ~30:1 in parquet, so Spark's 128 MB default split can
    carry ~4 GB of decompressed payload and the scan+extract stage ends up
    with fewer tasks than cores (measured: core-count-independent wall).
    Target ≈ total_bytes / (3 × cores), clamped to [8 MB, 128 MB].
    Returns a restore callable for the previous value."""
    try:
        files = pages.inputFiles()
        total = 0
        for f in files:
            p = f[len("file:"):] if f.startswith("file:") else f
            if os.path.exists(p):
                total += os.path.getsize(p)
    except Exception:
        return lambda: None
    if total <= 0:
        return lambda: None
    cores = spark.sparkContext.defaultParallelism
    target = max(8 << 20, min(128 << 20, total // max(1, cores * 3)))
    prev = spark.conf.get("spark.sql.files.maxPartitionBytes", None)
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(target))

    def restore():
        if prev is not None:
            spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
        else:
            # not explicitly set before: unset so the corpus-tuned split
            # size doesn't leak into unrelated queries on this session
            spark.conf.unset("spark.sql.files.maxPartitionBytes")

    return restore


def _checkpoint_parallel(dfs) -> list:
    """``localCheckpoint(eager=False)`` under AQE still EXECUTES every
    upstream query stage at CALL time (toRdd materializes the stages), so
    checkpointing several independent subtrees in sequence serializes
    their execution. Issue the checkpoint calls from concurrent driver
    threads instead — Spark schedules the jobs in parallel and the
    per-stage materialization latency overlaps. Inputs must not depend on
    each other (shared ancestors should already be checkpointed)."""
    from concurrent.futures import ThreadPoolExecutor

    if len(dfs) == 1:
        return [dfs[0].localCheckpoint(eager=False)]
    with ThreadPoolExecutor(max_workers=len(dfs)) as ex:
        return list(ex.map(lambda d: d.localCheckpoint(eager=False), dfs))


def _sitemap_contact_frontier(
    pages: DataFrame, ok_tokens: DataFrame, frontier_next: DataFrame
) -> DataFrame:
    """ENGINE-NEW (CrawlConfig.use_sitemaps): same-host contact-like URLs
    from each company's ``<base_url>/sitemap.xml`` in the corpus, shaped
    as extra contact-round frontier rows. Gates mirror the crawl's own
    admission surface: F2/F3/F4 + F7 same-host containment + the
    reference's mailto>1 expansion block (Crawler.fs:343-344). Intra-round
    duplicates drop via an anti-join on (company_id, url); cross-round
    refetches are prevented by the normal url_seen scopes. ``seq`` offsets
    by 1_000_000 so sitemap finds order AFTER document-extracted links —
    supplementary, never reordering the reference's trace."""
    from ..functions.canon import canonical_host, host_token
    from ..operators import sitemap as SM

    bases = ok_tokens.select("company_id", "base_url").distinct()
    # roots = the conventional <base>/sitemap.xml guess ∪ the sitemaps
    # the company's own robots.txt DECLARES (Sitemap: directive — the
    # standard discovery mechanism; finds nonstandard paths the guess
    # misses). Declared roots join per company by canonical host.
    guessed = bases.withColumn(
        "root_url", F.concat(F.col("base_url"), F.lit("/sitemap.xml"))
    ).select("company_id", "base_url", "root_url")
    declared = bases.withColumn(
        "__host", canonical_host(F.col("base_url"))
    ).join(
        RB.robots_sitemaps(pages).select(
            F.col("host").alias("__host"),
            F.col("sitemap_url").alias("root_url"),
        ),
        "__host",
    ).select("company_id", "base_url", "root_url")
    roots = guessed.unionByName(declared).distinct()
    entries = SM.sitemap_urls(
        pages, roots.select(F.col("root_url").alias("url")).distinct()
    )
    mailto_counts = (
        X.mailto_emails(ok_tokens)
        .groupBy("company_id")
        .agg(F.count("*").alias("__n_mailto"))
    )
    expandable = (
        bases.join(mailto_counts, "company_id", "left")
        .filter(F.coalesce(F.col("__n_mailto"), F.lit(0)) <= 1)
        .select("company_id")
    )
    cand = (
        entries.join(roots, "root_url")
        .join(expandable, "company_id")
        .filter(
            is_contacts_page(F.col("url"))
            & is_not_image_script_css_ext(F.col("url"))
            & not_social_network(F.col("url"))
            & F.col("url").contains(host_token(F.col("base_url")))
        )
        .select(
            "company_id",
            "url",
            F.lit(FR.PRIO_CONTACT_HREF).alias("priority"),
            # seq stays LONG: sitemap_urls emits ord as long because one
            # index root legitimately expands to ~2.5B entries — an int
            # cast would wrap negative there and reorder sitemap finds
            # BEFORE document links. The unionByName at the call site
            # widens the document frontier's int seq to long (set-op type
            # coercion); downstream only ever orders by seq.
            (F.lit(1_000_000) + F.col("ord")).alias("seq"),
            "base_url",
        )
    )
    return cand.join(
        frontier_next.select("company_id", "url"), ["company_id", "url"], "left_anti"
    )


def _seed_round(spark, cfg, tokens, ok_tokens) -> dict:
    """Per-company branch logic of round 0 (``Crawler.fs:326-379``)."""
    # each of these subtrees feeds bag + flags + frontier_next — checkpoint
    # so the three commit writes don't recompute the window chains. The
    # checkpoint CALLS execute under AQE, so independent subtrees are
    # checkpointed from concurrent threads (tokens, their shared ancestor,
    # is already checkpointed by the caller).
    _mark("seed: plans built (tokens checkpoint executed)")
    # contact-like hrefs (F8 ∘ F4): the expensive admission chain is
    # independent of data_link, so it checkpoints in the SAME parallel
    # group; the cheap per-company anti-join ("only companies with no
    # contact ANCHOR expand via hrefs", Crawler.fs:357-358) stays lazy on
    # top of the two checkpoints.
    href_cand = X.href_candidates(ok_tokens)
    admitted = admission_mod.admit_frontier(
        href_cand, scope_cols=("company_id", "page_url")
    )
    mailto, emails0, data_link, contact_all = _checkpoint_parallel(
        [
            X.mailto_emails(ok_tokens),
            X.regex_emails(ok_tokens),
            X.contact_anchor_links(ok_tokens),  # priority 1
            admitted.filter(F.col("is_contact")),
        ]
    )
    _mark("seed: mailto/emails/anchors/F8-chain checkpointed (parallel)")

    # error / empty-html companies → (true, true, false); the
    # IsNullOrWhiteSpace gate lives in has_html (extract_tokens_meta)
    bad = tokens.filter(~F.col("fetch_ok") | ~F.col("has_html")).select("company_id")

    dl_companies = data_link.select("company_id").distinct()
    contact_hrefs = contact_all.join(dl_companies, "company_id", "left_anti")

    # per-company stats in ONE shuffle: tag-union the five company streams
    # and pivot by tag in a single aggregation (was: five separate
    # aggregate+join chains — measured as pure AQE stage overhead)
    tagged = (
        mailto.select("company_id", F.lit("m").alias("__t"))
        .unionByName(emails0.select("company_id", F.lit("e").alias("__t")))
        .unionByName(bad.select("company_id", F.lit("b").alias("__t")))
        .unionByName(dl_companies.select("company_id", F.lit("d").alias("__t")))
        .unionByName(contact_hrefs.select("company_id", F.lit("c").alias("__t")))
    )
    counts = tagged.groupBy("company_id").agg(
        F.sum(F.when(F.col("__t") == "m", 1).otherwise(0)).alias("n_mailto"),
        F.sum(F.when(F.col("__t") == "e", 1).otherwise(0)).alias("n_emails"),
        F.max(F.col("__t") == "b").alias("__bad"),
        F.max(F.col("__t") == "d").alias("__dl"),
        F.max(F.col("__t") == "c").alias("__ch"),
    )
    stats = (
        tokens.select("company_id")
        .distinct()
        .join(counts, "company_id", "left")
        .fillna(0, ["n_mailto", "n_emails"])
        .fillna(False, ["__bad", "__dl", "__ch"])
        .localCheckpoint(eager=False)
    )

    flags = stats.select(
        "company_id",
        F.col("__bad").alias("bad_url"),
        F.lit(True).alias("email_processed"),
        F.when(F.col("__bad"), F.lit(False))
        .when(F.col("n_mailto") > 1, F.lit(True))
        .otherwise(
            F.col("__dl") | F.col("__ch") | (F.col("n_mailto") > 0) | (F.col("n_emails") > 0)
        )
        .alias("email_finded"),
    )

    # frontier expansion blocked for mailto>1 companies (Crawler.fs:343-344)
    expandable = stats.filter(F.col("n_mailto") <= 1).select("company_id")

    base_urls = ok_tokens.select("company_id", "base_url").distinct()
    fr_dl = (
        data_link.join(expandable, "company_id")
        .join(base_urls, "company_id")
        .select(
            "company_id",
            "url",
            F.lit(FR.PRIO_CONTACT_ANCHOR).alias("priority"),
            F.col("seq").cast("int").alias("seq"),
            "base_url",
        )
    )
    fr_ch = (
        contact_hrefs.join(expandable, "company_id")
        .join(base_urls, "company_id")
        .select(
            "company_id",
            "url",
            F.lit(FR.PRIO_CONTACT_HREF).alias("priority"),
            F.col("seq").cast("int").alias("seq"),
            "base_url",
        )
    )
    frontier_next = fr_dl.unionByName(fr_ch)

    bag = (
        mailto.select("company_id", "email")
        .unionByName(emails0.select("company_id", "email"))
    )
    return {"bag": bag, "flags": flags, "frontier_next": frontier_next}


def finalize(spark: SparkSession, store: SnapshotStore, cfg: CrawlConfig) -> dict:
    """F10 post-filter + K5 global dedup over all committed rounds."""
    rounds = store.committed_rounds()
    # compaction-aware: newest compacted base + tail rounds (row-equal to
    # the raw per-round union, but at scale this is the difference between
    # 3 scan legs and thousands — see SnapshotStore.compact)
    bag = store.read_union("bag")
    trace = store.read_union("trace")
    flags = store.read_union("flags")
    url_seen = store.read(rounds[-1], "url_seen")

    filtered = finalize_emails(bag)  # F10
    # K5: global email dedup — deterministic surrogate ids by email text,
    # assigned distributed (range-partition + local rank + offsets); a
    # global Window.orderBy here would single-task ALL distinct emails
    from ..operators.merge import assign_dense_ids

    emails_dim = assign_dense_ids(
        filtered.select("email").distinct(), "email", "email_id"
    ).withColumn("bad_ignore_email", F.lit(False))
    junction = (
        filtered.join(emails_dim, "email")
        .select("company_id", "email_id")
        .distinct()
    )
    return {
        "emails": emails_dim,
        "company_email": junction,
        "email_pairs": filtered,
        "flags": flags,
        "trace": trace,
        "url_seen": url_seen,
    }

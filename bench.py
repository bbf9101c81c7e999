"""Benchmark harness.

Default mode: runs the headline suite on local[$SPARK_GRAFT_CPUS] at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) and prints ONE JSON
line: {"metric": ..., "value": <total sec>, "unit": "sec",
"queries": {name: sec}, "sf": ..., "throughput": {...}}.

Measurement discipline (round-4): the suite runs --reps times
($SPARK_GRAFT_BENCH_REPS, default 2) and reports per-query BEST-of-N
("queries") with every raw sample in "all_runs" — this VM's wall-time
swing between identical runs is ±45%, so a single shot is not a
measurement. A fixed JVM-regex ceiling control (zero engine code) runs
first and lands in "control": compare it across rounds before reading
meaning into engine deltas.

Headline components:
- crawl:  end-to-end crawl (webgen corpus → frontier rounds → emails) —
  throughput reported as pages fetched+extracted/sec and frontier URLs
  dequeued/sec (BASELINE.json metric).
- heavy queries: the big join+agg, minhash LSH dedup, brute-force ANN,
  exact dedup, hourly events rollup.

Scaling mode (``--scaling``): runs the crawl job in two subprocesses at
local[8] and local[32] on the SAME generated corpus and writes
BENCH/BASELINE.md with both throughputs and efficiency = (T32/T8)/4
(sandbox proxy for the N→4N-executor rule).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
DEFAULT_COMPANIES = int(os.environ.get("SPARK_GRAFT_CRAWL_COMPANIES", "8000"))


def _spark(cores: int, master: str | None = None):
    from companycatalogcrawlerparser_spark.session import get_spark

    extra = {}
    if master and master.startswith("local-cluster"):
        # separate executor JVMs: per-executor heap instead of one shared
        # local-mode heap; driver shrinks accordingly (host = 128 GiB)
        extra = {"spark.executor.memory": "14g"}
        os.environ.setdefault("SPARK_DRIVER_MEMORY", "16g")
    spark = get_spark(
        app_name=f"bench_{cores}",
        master=master or f"local[{cores}]",
        shuffle_partitions=max(cores, 8),
        extra_conf=extra,
    )
    if master and master.startswith("local-cluster"):
        # executors are separate processes with their own cwd: ship the
        # package the same way a real cluster run does (spark-submit
        # --py-files dist/ccc_spark.zip)
        zip_path = os.path.join(REPO, "dist", "ccc_spark.zip")
        _build_zip(zip_path)
        spark.sparkContext.addPyFile(zip_path)
    return spark


def _build_zip(zip_path: str) -> None:
    """(Re)build the --py-files artifact from the current source tree."""
    import zipfile

    os.makedirs(os.path.dirname(zip_path), exist_ok=True)
    pkg = os.path.join(REPO, "companycatalogcrawlerparser_spark")
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    zf.write(full, os.path.relpath(full, REPO))


def gen_corpus(spark, n_companies: int, corpus_dir: str, filler_kb: int = 0):
    """Generate + persist the synthetic web once (not counted in timings)."""
    from companycatalogcrawlerparser_spark.sources.webgen import build_corpus_spark

    pages, seeds = build_corpus_spark(spark, n_companies, num_partitions=32, filler_kb=filler_kb)
    pages.write.mode("overwrite").parquet(f"{corpus_dir}/pages")
    seeds.write.mode("overwrite").parquet(f"{corpus_dir}/seeds")


def run_crawl_bench(
    spark, corpus_dir: str, out_dir: str, cores: int, take_limit: int = 100000,
    audit_politeness: bool = False,
) -> dict:
    from companycatalogcrawlerparser_spark.plans.crawl import CrawlConfig, run_crawl
    from pyspark.sql import functions as F

    pages = spark.read.parquet(f"{corpus_dir}/pages")
    seeds = spark.read.parquet(f"{corpus_dir}/seeds")
    cfg = CrawlConfig(
        num_partitions=max(cores, 8),
        n_buckets=64,
        collect_counters=False,
        take_limit=take_limit,
    )
    t0 = time.monotonic()
    res = run_crawl(spark, pages, seeds, out_dir, cfg)
    trace = res["trace"]
    agg = trace.agg(
        F.count("*").alias("dequeued"),
        F.sum(F.when(F.col("action") == "fetched", 1).otherwise(0)).alias("fetched"),
    ).first()
    n_emails = res["email_pairs"].count()
    elapsed = time.monotonic() - t0
    out = {
        "elapsed_sec": round(elapsed, 2),
        "pages_fetched": int(agg["fetched"]),
        "frontier_dequeued": int(agg["dequeued"]),
        "emails_found": n_emails,
        "pages_per_sec": round(int(agg["fetched"]) / elapsed, 1),
        "urls_dequeued_per_sec": round(int(agg["dequeued"]) / elapsed, 1),
        "cores": cores,
    }
    if audit_politeness:
        # distributed (untimed) twin of tests/test_crawl_equality.py::
        # test_politeness_budget, runnable at XL scale: per (round, host)
        # the dequeue ranks must be dense 0..n-1 and every not_before
        # stamp exactly rank×delay — checked per FULL host (the salted
        # fan-out must not fragment a host's politeness sequence), no
        # driver collect. Also reports the skew head (top host's share
        # of fetched pages) so the record shows what distribution the
        # run survived.
        delay = cfg.delay_ms
        viol = (
            trace.groupBy("round", "host")
            .agg(
                F.count("*").alias("n"),
                F.countDistinct("host_rank").alias("d"),
                F.max("host_rank").alias("mx"),
                F.sum(
                    F.when(
                        F.col("not_before") != F.col("host_rank") * delay, 1
                    ).otherwise(0)
                ).alias("w"),
            )
            .filter(
                (F.col("d") != F.col("n"))
                | (F.col("mx") != F.col("n") - 1)
                | (F.col("w") > 0)
            )
            .count()
        )
        top = (
            trace.filter(F.col("action") == "fetched")
            .groupBy("host").count()
            .orderBy(F.col("count").desc())
            .first()
        )
        out["politeness_violating_host_rounds"] = int(viol)
        out["top_host"] = top["host"]
        out["top_host_pages"] = int(top["count"])
        out["top_host_share"] = round(
            int(top["count"]) / max(int(agg["fetched"]), 1), 4
        )
    return out


# kinds of the labeled-union ("folded") driver rows — timed separately
# so the next round can read added-surface vs regression straight from
# the JSON (r5 verdict "what's wrong" #3) instead of re-deriving why a
# folded row moved. Catalyst prunes the other union branches under a
# kind= filter (constant-folded to empty relations), so each filtered
# write measures ONLY that branch; "build" is the eager part of the
# builder itself (e.g. events_windows runs the real 3-micro-batch
# streaming auditor while CONSTRUCTING the frame — that cost belongs to
# the audit kind but is paid before any action).
FOLDED_KINDS = {
    "ann_lsh": ["lsh", "ivf", "ivf_arrow", "semdup"],
    "events_windows": ["window", "audit"],
    "warc_ingest": ["whole", "ranged", "indexed"],
    "corpus_curation": ["sample", "pack", "order", "cap", "chunk", "packseq",
                        "mask", "up", "quant",
                        "bpe_merge", "bpe_word", "bpe_doc"],
    "dedup_groups": ["exact", "simhash", "spans", "excised", "lines",
                     "incr"],
    "minhash": ["sig", "pairs"],
    "graph_ops": ["cc", "pr"],
}


def run_query_bench(spark, sf_dir: str, per_kind: bool = False) -> dict:
    import __spark_entry__ as entrymod

    from pyspark.sql import functions as F

    heavy = [
        "j4_big_join_agg",
        # r6 registry fold (driver records only the first 50 rows —
        # tests/test_properties.py::TestDriverRegistryContract):
        # dedup_exact+simhash_groups -> dedup_groups,
        # minhash_signature+minhash_lsh_pairs -> minhash,
        # dup_clusters+host_pagerank -> graph_ops
        "dedup_groups",
        "minhash",
        # minhash_lsh_stream is deliberately NOT here: at sf0.1 its
        # memory-sink fold carries ~288k pairs (~1.2M pre-distinct rows to
        # the driver) — a verification surface, not a headline operator.
        # Its measured-performance story is the XL stream_dedup task
        # (tools/bench_dedup_xl.py: parquet sink, 250k docs, 8 vs 32c).
        #
        # graph_ops: CC clustering runs its star-contraction fixpoint and
        # the PageRank kind its 3 power rounds while CONSTRUCTING the
        # frame (eager localCheckpoints) — their cost shows as build time
        "graph_ops",
        "corpus_curation",
        "ann_bruteforce",
        "ann_lsh",
        "text_metrics",
        "events_windows",
        "f10_email_postfilter",
        "canonicalize",
    ]
    qs = entrymod.queries()
    out = {}
    kinds_out = {}
    for name in heavy:
        t0 = time.monotonic()
        df = qs[name](spark, sf_dir)
        t_build = time.monotonic() - t0
        df.write.format("noop").mode("overwrite").save()
        out[name] = round(time.monotonic() - t0, 3)
        if per_kind and name in FOLDED_KINDS:
            kd = {"build": round(t_build, 3)}
            for kv in FOLDED_KINDS[name]:
                t1 = time.monotonic()
                df.filter(F.col("kind") == kv).write.format("noop").mode(
                    "overwrite"
                ).save()
                kd[kv] = round(time.monotonic() - t1, 3)
            kinds_out[name] = kd
    if per_kind:
        out["__kinds"] = kinds_out
    return out


def run_ceiling_control(spark, cores: int) -> dict:
    """Fixed JVM-regex workload (regexp_extract_all over 100k synthetic
    pages — the crawl extract's work class, zero engine code): a
    machine-state probe that makes each round's bench self-normalizing.
    Compare ``control.elapsed`` across BENCH_r{N}.json files before
    reading meaning into engine wall-time deltas — this VM's measured
    swing on the IDENTICAL control is 0.29×-0.99× across sessions."""
    from pyspark.sql import functions as F

    base = spark.range(100_000).withColumn(
        "html",
        F.concat(
            F.lit("<html><body>"),
            F.repeat(
                F.concat(
                    F.lit('<a href="http://h'),
                    (F.col("id") % 97).cast("string"),
                    F.lit('.ru/p">x</a> filler filler filler '),
                ),
                600,
            ),
            F.lit("</body></html>"),
        ),
    ).persist()
    base.count()  # resident before timing
    t0 = time.monotonic()
    n = (
        base.select(
            F.size(
                F.regexp_extract_all(
                    "html", F.lit("(?:href)=[\"|']?(.*?)[\"|'|>]+"), 1
                )
            ).alias("k")
        )
        .agg(F.sum("k"))
        .first()[0]
    )
    dt = time.monotonic() - t0
    base.unpersist()
    return {"elapsed_sec": round(dt, 2), "matches": int(n), "cores": cores}


def main_default(args):
    spark = _spark(args.cores)
    corpus_dir = args.corpus_dir or tempfile.mkdtemp(prefix="bench_corpus_")
    own_corpus = args.corpus_dir is None
    if own_corpus or not os.path.exists(f"{corpus_dir}/pages"):
        gen_corpus(spark, args.companies, corpus_dir, args.filler_kb)

    # control first: normalizes the round's numbers against VM state and
    # doubles as JVM/codegen warmup so rep 1 isn't JIT-skewed
    control = run_ceiling_control(spark, args.cores)

    # best-of-N (VM wall-time swings are ±45% between identical runs —
    # the MIN is the capability estimate, the spread is the noise bar)
    crawl_runs, query_runs = [], []
    kinds = {}
    for _rep in range(max(1, args.reps)):
        last = _rep == max(1, args.reps) - 1
        crawl_out = tempfile.mkdtemp(prefix="bench_crawl_")
        crawl_runs.append(run_crawl_bench(spark, corpus_dir, crawl_out, args.cores))
        # per-kind timings once, on the warmed last rep (the extra
        # filtered writes would otherwise double the folded rows' cost
        # in every rep)
        qr = run_query_bench(spark, args.sf_dir, per_kind=last)
        kinds = qr.pop("__kinds", kinds)
        query_runs.append(qr)
        shutil.rmtree(crawl_out, ignore_errors=True)
    if own_corpus:
        shutil.rmtree(corpus_dir, ignore_errors=True)

    crawl = min(crawl_runs, key=lambda r: r["elapsed_sec"])
    queries = {
        name: min(run[name] for run in query_runs) for name in query_runs[0]
    }
    total = round(crawl["elapsed_sec"] + sum(queries.values()), 2)
    queries = {"crawl_e2e": crawl["elapsed_sec"], **queries}
    all_runs = {"crawl_e2e": [r["elapsed_sec"] for r in crawl_runs]}
    for name in query_runs[0]:
        all_runs[name] = [run[name] for run in query_runs]
    print(
        json.dumps(
            {
                "metric": "headline suite wall time (crawl e2e + heavy queries)",
                "value": total,
                "unit": "sec",
                "queries": queries,
                "sf": args.sf_dir.rstrip("/").split("sf")[-1],
                "reps": max(1, args.reps),
                "all_runs": all_runs,
                "kinds": kinds,
                "control": control,
                "throughput": {
                    "pages_fetched_extracted_per_sec": crawl["pages_per_sec"],
                    "frontier_urls_dequeued_per_sec": crawl["urls_dequeued_per_sec"],
                    "pages_fetched": crawl["pages_fetched"],
                    "frontier_dequeued": crawl["frontier_dequeued"],
                    "emails_found": crawl["emails_found"],
                    "crawl_companies": args.companies,
                    "cores": args.cores,
                },
            }
        )
    )
    spark.stop()


def main_crawl_only(args):
    """Subprocess entry for scaling runs: JSON result to --json-out."""
    spark = _spark(args.cores, master=args.master)
    if not os.path.exists(f"{args.corpus_dir}/pages"):
        gen_corpus(spark, args.companies, args.corpus_dir, args.filler_kb)
    out_dir = tempfile.mkdtemp(prefix=f"bench_crawl_{args.cores}_")
    res = run_crawl_bench(
        spark, args.corpus_dir, out_dir, args.cores,
        take_limit=args.take_limit, audit_politeness=args.audit_politeness,
    )
    shutil.rmtree(out_dir, ignore_errors=True)
    with open(args.json_out, "w") as f:
        json.dump(res, f)
    spark.stop()


def main_scaling(args):
    corpus_dir = args.corpus_dir or tempfile.mkdtemp(prefix="bench_corpus_")
    results = {}
    for cores in (8, 32):
        json_out = os.path.join(corpus_dir, f"crawl_{cores}.json")
        cmd = [
            sys.executable, __file__, "--crawl-only",
            "--cores", str(cores), "--companies", str(args.companies),
            "--corpus-dir", corpus_dir, "--json-out", json_out,
            "--filler-kb", str(args.filler_kb),
            "--take-limit", str(args.take_limit),
        ]
        subprocess.run(cmd, check=True, cwd=REPO)
        with open(json_out) as f:
            results[cores] = json.load(f)

    t8, t32 = results[8], results[32]
    speedup = t32["pages_per_sec"] / t8["pages_per_sec"]
    efficiency = speedup / 4.0
    md = f"""# BENCH/BASELINE.md — scaling evidence (N vs 4N cores)

Sandbox proxy for the north_rule's two-cluster-size criterion: the SAME
crawl job + input corpus ({args.companies} companies,
{t8['frontier_dequeued']} frontier URLs, {t8['pages_fetched']} pages
fetched+extracted) run at local[8] and local[32] on one 32-core host.

| cores | wall (s) | pages fetched+extracted/s | frontier URLs dequeued/s |
|---|---|---|---|
| 8  | {t8['elapsed_sec']} | {t8['pages_per_sec']} | {t8['urls_dequeued_per_sec']} |
| 32 | {t32['elapsed_sec']} | {t32['pages_per_sec']} | {t32['urls_dequeued_per_sec']} |

- speedup 8→32 cores (4×): **{speedup:.2f}×**
- scaling efficiency = speedup/4 = **{efficiency:.2f}** (target ≥ 0.8)

Method notes: throughput = pages fetched+extracted / end-to-end crawl
wall (both rounds, including snapshot commits and the finalize MERGE —
no stage cherry-picking). Corpus generation is excluded (shared input).
Emails found: {t8['emails_found']} (identical across runs — the crawl is
deterministic by construction).
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(json.dumps({
        "metric": "scaling efficiency (local[8] -> local[32])",
        "value": round(efficiency, 3),
        "unit": "ratio",
        "throughput_8": t8["pages_per_sec"],
        "throughput_32": t32["pages_per_sec"],
    }))
    if args.corpus_dir is None:
        shutil.rmtree(corpus_dir, ignore_errors=True)


def main_scaling_cluster(args):
    """North-rule scaling pair on SEPARATE EXECUTOR JVMs (VERDICT r02 #5):
    ``local-cluster[1,8,m]`` (N=1 executor × 8 cores) vs
    ``local-cluster[4,8,m]`` (4N) — each executor is its own OS process
    with its own heap/GC/code cache, factoring out the single-shared-JVM
    pathology the r02 controls identified. Same generated corpus, same
    job; efficiency = (pages_per_sec_4N / pages_per_sec_N) / 4. Appends a
    section to BENCH/BASELINE.md."""
    corpus_dir = args.corpus_dir or tempfile.mkdtemp(prefix="bench_corpus_")
    mem_mb = 14336
    results = {}
    for n_exec in (1, 4):
        cores = 8 * n_exec
        json_out = os.path.join(corpus_dir, f"crawl_lc_{n_exec}.json")
        cmd = [
            sys.executable, __file__, "--crawl-only",
            "--cores", str(cores), "--companies", str(args.companies),
            "--corpus-dir", corpus_dir, "--json-out", json_out,
            "--filler-kb", str(args.filler_kb),
            "--take-limit", str(args.take_limit),
            "--master", f"local-cluster[{n_exec},8,{mem_mb}]",
        ]
        subprocess.run(cmd, check=True, cwd=REPO)
        with open(json_out) as f:
            results[n_exec] = json.load(f)

    t1, t4 = results[1], results[4]
    speedup = t4["pages_per_sec"] / t1["pages_per_sec"]
    efficiency = speedup / 4.0
    md = f"""

## Separate-JVM pair — local-cluster[1,8,{mem_mb}] vs local-cluster[4,8,{mem_mb}]

The same crawl job + corpus ({args.companies} companies,
{t1['frontier_dequeued']} frontier URLs, {t1['pages_fetched']} pages) run
with one vs four EXECUTOR PROCESSES (8 cores, {mem_mb} MB heap each) —
real multi-JVM executors, the closest sandbox proxy to N vs 4N executors
on a cluster; per-executor heaps remove shared-heap GC/lock contention
from the comparison.

| executors | total cores | wall (s) | pages/s | frontier URLs/s |
|---|---|---|---|---|
| 1 | 8  | {t1['elapsed_sec']} | {t1['pages_per_sec']} | {t1['urls_dequeued_per_sec']} |
| 4 | 32 | {t4['elapsed_sec']} | {t4['pages_per_sec']} | {t4['urls_dequeued_per_sec']} |

- speedup 1→4 executors (4× cores): **{speedup:.2f}×**
- scaling efficiency = speedup/4 = **{efficiency:.2f}** (target ≥ 0.8)
- emails found: {t1['emails_found']} == {t4['emails_found']} (deterministic)
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write(md)
    print(json.dumps({
        "metric": "scaling efficiency (local-cluster 1x8 -> 4x8 executors)",
        "value": round(efficiency, 3),
        "unit": "ratio",
        "throughput_1x8": t1["pages_per_sec"],
        "throughput_4x8": t4["pages_per_sec"],
    }))
    if args.corpus_dir is None:
        shutil.rmtree(corpus_dir, ignore_errors=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--scaling-cluster", action="store_true")
    ap.add_argument("--crawl-only", action="store_true")
    ap.add_argument("--master", default=None)
    ap.add_argument("--cores", type=int, default=DEFAULT_CPUS)
    ap.add_argument("--companies", type=int, default=DEFAULT_COMPANIES)
    ap.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    ap.add_argument("--corpus-dir", default=None)
    ap.add_argument("--filler-kb", type=int, default=int(os.environ.get("SPARK_GRAFT_FILLER_KB", "0")))
    ap.add_argument("--take-limit", type=int, default=100000)
    ap.add_argument("--json-out", default=None)
    ap.add_argument("--audit-politeness", action="store_true")
    ap.add_argument(
        "--reps", type=int,
        default=int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2")),
    )
    args = ap.parse_args()
    if args.crawl_only:
        main_crawl_only(args)
    elif args.scaling_cluster:
        main_scaling_cluster(args)
    elif args.scaling:
        main_scaling(args)
    else:
        main_default(args)

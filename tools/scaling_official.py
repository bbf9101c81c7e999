"""Official north-rule scaling evidence runner (round 3).

Runs, SEQUENTIALLY on a quiet machine (VM wall-clock noise is ±30%
between identical runs — see BENCH/BASELINE.md controls):

1. XL corpus generation (once, excluded from timings);
2. the crawl pair on a shared local-mode JVM: local[8] vs local[32];
3. the crawl pair on SEPARATE EXECUTOR JVMs: local-cluster[1,8,m] vs
   local-cluster[4,8,m] (VERDICT r02 #5 — per-executor heaps factor the
   single-shared-JVM pathology out of the comparison);
4. the JVM-regex work-class ceiling control (regexp_extract_all over
   resident 30 KB strings, no engine code, no Python, no shuffle) at 8
   and 32 cores — the sandbox's own scaling ceiling for the extract
   stage's work class.

Usage: python tools/scaling_official.py [--companies 400000] [--out FILE]
Writes one JSON with every result; BENCH/BASELINE.md is written by hand
from it (the narrative needs the controls + analysis, not just numbers).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def gen_corpus(corpus_dir: str, companies: int, filler_kb: int) -> float:
    from companycatalogcrawlerparser_spark.session import get_spark
    from companycatalogcrawlerparser_spark.sources.webgen import build_corpus_spark

    t0 = time.monotonic()
    spark = get_spark("gen_xl", master="local[32]", shuffle_partitions=32)
    pages, seeds = build_corpus_spark(
        spark, companies, num_partitions=32, filler_kb=filler_kb
    )
    pages.write.mode("overwrite").parquet(f"{corpus_dir}/pages")
    seeds.write.mode("overwrite").parquet(f"{corpus_dir}/seeds")
    spark.stop()
    return round(time.monotonic() - t0, 1)


def run_crawl(corpus_dir: str, companies: int, take_limit: int,
              cores: int, master: str | None, tag: str,
              audit_politeness: bool = False) -> dict:
    json_out = os.path.join(corpus_dir, f"crawl_{tag}.json")
    cmd = [
        sys.executable, os.path.join(REPO, "bench.py"), "--crawl-only",
        "--cores", str(cores), "--companies", str(companies),
        "--corpus-dir", corpus_dir, "--json-out", json_out,
        "--take-limit", str(take_limit),
    ]
    if audit_politeness:
        cmd += ["--audit-politeness"]
    if master:
        cmd += ["--master", master]
    subprocess.run(cmd, check=True, cwd=REPO)
    with open(json_out) as f:
        res = json.load(f)
    res["master"] = master or f"local[{cores}]"
    return res


CONTROL_SNIPPET = r"""
import sys, time, json
sys.path.insert(0, {repo!r})
from companycatalogcrawlerparser_spark.session import get_spark
from pyspark.sql import functions as F
spark = get_spark("ctl", master="local[{cores}]", shuffle_partitions={cores})
base = spark.range(100_000).withColumn(
    "html",
    F.concat(
        F.lit("<html><body>"),
        F.repeat(F.concat(F.lit('<a href="http://h'), (F.col("id") % 97).cast("string"),
                          F.lit('.ru/p">x</a> filler filler filler ')), 600),
        F.lit("</body></html>"),
    ),
).persist()
base.count()  # resident
t0 = time.monotonic()
n = base.select(F.size(F.regexp_extract_all("html", F.lit('(?:href)=["|\']?(.*?)["|\'|>]+'), 1)).alias("k")).agg(F.sum("k")).first()[0]
dt = time.monotonic() - t0
print(json.dumps({{"cores": {cores}, "elapsed": round(dt, 2), "matches": int(n)}}))
spark.stop()
"""


def run_control(cores: int) -> dict:
    code = CONTROL_SNIPPET.format(repo=REPO, cores=cores)
    out = subprocess.run(
        [sys.executable, "-c", code], check=True, cwd=REPO,
        capture_output=True, text=True,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--companies", type=int, default=400000)
    ap.add_argument("--hot-pct", type=int, default=None,
                    help="override webgen HOT_HOST_PCT for corpus gen")
    ap.add_argument("--audit-politeness", action="store_true")
    ap.add_argument("--take-limit", type=int, default=400000)
    ap.add_argument("--filler-kb", type=int, default=30)
    ap.add_argument("--corpus-dir", default=None)
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH", "scaling_r3.json"))
    ap.add_argument("--skip-local", action="store_true")
    ap.add_argument("--skip-cluster", action="store_true")
    ap.add_argument("--skip-controls", action="store_true")
    args = ap.parse_args()

    if args.hot_pct is not None:
        os.environ["SPARK_GRAFT_HOT_PCT"] = str(args.hot_pct)
    corpus_dir = args.corpus_dir or tempfile.mkdtemp(prefix="scaling_corpus_")
    results: dict = {"workload": {
        "companies": args.companies, "take_limit": args.take_limit,
        "filler_kb": args.filler_kb, "corpus_dir": corpus_dir,
        "hot_host_pct": args.hot_pct if args.hot_pct is not None else int(
            os.environ.get("SPARK_GRAFT_HOT_PCT", "20")),
    }}
    if not os.path.exists(f"{corpus_dir}/pages"):
        results["gen_sec"] = gen_corpus(corpus_dir, args.companies, args.filler_kb)
        print(json.dumps({"gen_sec": results["gen_sec"]}))

    mem = 14336
    runs = []
    if not args.skip_local:
        runs += [(8, None, "local8"), (32, None, "local32")]
    if not args.skip_cluster:
        runs += [
            (8, f"local-cluster[1,8,{mem}]", "lc1x8"),
            (32, f"local-cluster[4,8,{mem}]", "lc4x8"),
        ]
    for cores, master, tag in runs:
        res = run_crawl(
            corpus_dir, args.companies, args.take_limit, cores, master, tag,
            audit_politeness=args.audit_politeness,
        )
        results[tag] = res
        print(json.dumps({tag: res}))
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)

    if not args.skip_controls:
        results["control_regex"] = {
            "c8": run_control(8), "c32": run_control(32),
        }

    for pair, a, b in (("local", "local8", "local32"),
                       ("cluster", "lc1x8", "lc4x8")):
        if a in results and b in results:
            sp = results[b]["pages_per_sec"] / results[a]["pages_per_sec"]
            results[f"efficiency_{pair}"] = round(sp / 4.0, 3)
    if "control_regex" in results:
        cr = results["control_regex"]
        results["efficiency_control"] = round(
            (cr["c8"]["elapsed"] / cr["c32"]["elapsed"]) / 4.0, 3
        )

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({k: v for k, v in results.items()
                      if k.startswith("efficiency")}))


if __name__ == "__main__":
    main()

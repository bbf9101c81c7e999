"""XL-scale WARC ingestion bench — throughput + two-parallelism evidence
for the sources family (completes the r4→r5 "bench what you claim"
program: the crawl and the dedup/ANN family have XL tables; the WARC
read paths had memory-shape tests and bit-identity pytest but no
measured scale numbers).

Workload: a deterministic synthetic archive — N_FILES plain ``.warc``
segments (HTML-bearing response records, realistic ~mixed sizes) plus
the same content as per-record-gzip ``.warc.gz`` segments with a CDXJ
index (built once by ``build_cdx_lines`` — the cost CC pays at
archive-build time). Three tasks, each counting pages + bytes:

- ``warc_whole``    — ``read_warc`` one-file-per-task over plain files
- ``warc_ranged``   — ``read_warc_ranged`` record-aligned range splits
- ``warc_indexed``  — ``read_warc_indexed`` CDX record-level gzip reads

Each (task, cores) runs in its own subprocess JVM, best-of-N; the
page-count equality across all three tasks is asserted in-run (the
bit-identity contract at scale, not just on fixtures).

Usage:
  python tools/bench_warc_xl.py [--files 32] [--pages-per-file 4000]
      [--cores 8,32] [--best-of 2] [--data-dir DIR]
      [--out BENCH/warc_xl_r5.json]
"""

from __future__ import annotations

import argparse
import gzip
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _record(url: str, ts: str, body: bytes) -> bytes:
    http = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
    )
    head = (
        f"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: {url}\r\n"
        f"WARC-Date: {ts}\r\nContent-Length: {len(http)}\r\n\r\n"
    ).encode()
    return head + http + b"\r\n\r\n"


def gen_archive(data_dir: str, n_files: int, pages_per_file: int) -> dict:
    """Writes plain/ and gz/ segment dirs + cdx/ index; returns stats.
    Driver-side generation (one pass, deterministic): fine at bench scale
    — a real archive is built by the crawler itself."""
    import hashlib

    from companycatalogcrawlerparser_spark.sources.warc import build_cdx_lines

    t0 = time.monotonic()
    plain_dir = os.path.join(data_dir, "plain")
    gz_dir = os.path.join(data_dir, "gz")
    cdx_dir = os.path.join(data_dir, "cdx")
    for d in (plain_dir, gz_dir, cdx_dir):
        os.makedirs(d, exist_ok=True)
    total_bytes = 0
    total_pages = 0
    for f in range(n_files):
        recs = []
        for p in range(pages_per_file):
            # size-varied bodies (~0.5-8 KB) from a cheap deterministic
            # expansion — md5-seeded so content is incompressible enough
            seed = hashlib.md5(f"{f}|{p}".encode()).hexdigest()
            rep = 16 + (int(seed[:4], 16) % 240)
            body = (
                f"<html><body><h1>doc {f}-{p}</h1>"
                f"<a href='http://h{p % 97}.ru/x'>l</a>"
                + ("filler " + seed + " ") * rep
                + "mailto:c@h.ru</body></html>"
            ).encode()
            ts = f"2025-06-{(p % 27) + 1:02d}T10:{p % 60:02d}:{f % 60:02d}Z"
            recs.append(
                _record(f"http://h{f}.ru/p{p}", ts, body)
            )
        blob = b"".join(recs)
        with open(os.path.join(plain_dir, f"seg-{f:03d}.warc"), "wb") as fh:
            fh.write(blob)
        gz_blob = b"".join(
            gzip.compress(r, compresslevel=1) for r in recs
        )
        gz_name = f"seg-{f:03d}.warc.gz"
        with open(os.path.join(gz_dir, gz_name), "wb") as fh:
            fh.write(gz_blob)
        lines = build_cdx_lines(gz_blob, gz_name)
        with open(os.path.join(cdx_dir, f"seg-{f:03d}.cdx"), "w") as fh:
            fh.write("\n".join(lines) + "\n")
        total_bytes += len(blob)
        total_pages += pages_per_file
    return {
        "gen_sec": round(time.monotonic() - t0, 1),
        "plain_bytes": total_bytes,
        "pages": total_pages,
    }


def run_one(task: str, cores: int, data_dir: str, best_of: int) -> None:
    from pyspark.sql import functions as F

    from companycatalogcrawlerparser_spark.session import get_spark
    from companycatalogcrawlerparser_spark.sources import warc as W

    spark = get_spark(f"warcxl_{task}_{cores}", master=f"local[{cores}]",
                      shuffle_partitions=cores)

    def build():
        if task == "warc_whole":
            return W.read_warc(spark, os.path.join(data_dir, "plain"),
                               glob="*.warc")
        if task == "warc_ranged":
            return W.read_warc_ranged(
                spark, os.path.join(data_dir, "plain"), glob="*.warc",
                target_bytes=8 << 20,
            )
        if task == "warc_indexed":
            cdx = W.read_cdx(spark, os.path.join(data_dir, "cdx"))
            return W.read_warc_indexed(
                spark, cdx, os.path.join(data_dir, "gz")
            )
        raise SystemExit(f"unknown task {task}")

    samples = []
    info = {}
    for _ in range(best_of):
        t0 = time.monotonic()
        row = build().agg(
            F.count("*"), F.sum(F.length("html"))
        ).first()
        samples.append(round(time.monotonic() - t0, 2))
        info = {"pages": int(row[0]), "html_bytes": int(row[1])}
    print("RESULT " + json.dumps({
        "task": task, "cores": cores, "best_sec": min(samples),
        "samples": samples, **info,
    }), flush=True)
    spark.stop()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--files", type=int, default=32)
    ap.add_argument("--pages-per-file", type=int, default=4000)
    ap.add_argument("--cores", default="8,32")
    ap.add_argument("--best-of", type=int, default=2)
    ap.add_argument("--data-dir", default=None)
    ap.add_argument("--out",
                    default=os.path.join(REPO, "BENCH", "warc_xl_r5.json"))
    ap.add_argument("--run-one", default=None)
    ap.add_argument("--cores-one", type=int, default=None)
    args = ap.parse_args()

    if args.run_one:
        run_one(args.run_one, args.cores_one, args.data_dir, args.best_of)
        return

    data_dir = args.data_dir or tempfile.mkdtemp(prefix="warc_xl_")
    results: dict = {"workload": {
        "n_files": args.files, "pages_per_file": args.pages_per_file,
        "data_dir": data_dir,
    }, "runs": []}
    if not os.path.exists(os.path.join(data_dir, "plain")):
        results["workload"].update(
            gen_archive(data_dir, args.files, args.pages_per_file)
        )
        print(f"archive generated: {results['workload']}")

    cores_list = [int(c) for c in args.cores.split(",")]
    page_counts = set()
    for task in ("warc_whole", "warc_ranged", "warc_indexed"):
        for cores in cores_list:
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--run-one", task, "--cores-one", str(cores),
                 "--data-dir", data_dir, "--best-of", str(args.best_of)],
                cwd=REPO, capture_output=True, text=True,
            )
            if p.returncode != 0:
                print(p.stdout[-2000:] + p.stderr[-2000:])
                results["runs"].append(
                    {"task": task, "cores": cores, "error": "failed"}
                )
                continue
            line = [l for l in p.stdout.splitlines()
                    if l.startswith("RESULT ")][-1]
            res = json.loads(line[len("RESULT "):])
            print("   " + json.dumps(res), flush=True)
            results["runs"].append(res)
            page_counts.add((res["pages"], res["html_bytes"]))
    # bit-identity across read paths AT SCALE: same pages, same bytes
    results["paths_agree"] = len(page_counts) == 1
    if len(cores_list) >= 2:
        lo, hi = cores_list[0], cores_list[-1]
        eff = {}
        for task in ("warc_whole", "warc_ranged", "warc_indexed"):
            tl = next((r for r in results["runs"]
                       if r["task"] == task and r["cores"] == lo
                       and "best_sec" in r), None)
            th = next((r for r in results["runs"]
                       if r["task"] == task and r["cores"] == hi
                       and "best_sec" in r), None)
            if tl and th:
                eff[task] = round(
                    tl["best_sec"] / (th["best_sec"] * (hi / lo)), 3)
        results["scaling_efficiency"] = {"cores": [lo, hi],
                                         "per_task": eff}
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {args.out}  paths_agree={results['paths_agree']}")


if __name__ == "__main__":
    main()

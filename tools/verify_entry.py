"""Local stand-in for the driver's correctness harness: runs every
queries() entry at sf0.01 against its oracle_sql() twin via DuckDB and
compares row count, column names, and order-insensitive values.

Usage: python tools/verify_entry.py [sf_dir] [only_query_substr]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time  # noqa: E402

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from companycatalogcrawlerparser_spark.session import get_spark  # noqa: E402


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, bool):
        return bool(v)
    return v


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2] if len(sys.argv) > 2 else None

    spark = get_spark("verify_entry", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in entrymod.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    t_start = time.monotonic()
    for name, fn in qs.items():
        if only and not any(tok in name for tok in only.split(",")):
            continue
        t_row = time.monotonic()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(norm(v) for v in r) for r in sdf.collect()]
        except Exception as ex:
            failures.append((name, f"SPARK ERROR: {ex}"))
            print(f"FAIL {name}: spark error {str(ex)[:200]}")
            continue
        if name not in oracles:
            print(f"SKIP {name}: rows-only ({len(srows)} rows)")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = [tuple(norm(v) for v in r) for r in res.fetchall()]
        except Exception as ex:
            failures.append((name, f"DUCKDB ERROR: {ex}"))
            print(f"FAIL {name}: duckdb error {str(ex)[:200]}")
            continue
        if scols != ocols:
            # driver sorts columns by name; mimic
            if sorted(scols) != sorted(ocols):
                failures.append((name, f"COLS spark={scols} duck={ocols}"))
                print(f"FAIL {name}: columns differ {scols} vs {ocols}")
                continue
            sidx = [scols.index(c) for c in sorted(scols)]
            oidx = [ocols.index(c) for c in sorted(ocols)]
            srows = [tuple(r[i] for i in sidx) for r in srows]
            orows = [tuple(r[i] for i in oidx) for r in orows]
        if len(srows) != len(orows):
            failures.append((name, f"ROWS {len(srows)} vs {len(orows)}"))
            print(f"FAIL {name}: rowcount {len(srows)} vs {len(orows)}")
            continue
        if sorted(map(repr, srows)) != sorted(map(repr, orows)):
            sset = sorted(map(repr, srows))
            oset = sorted(map(repr, orows))
            diff = [(a, b) for a, b in zip(sset, oset) if a != b][:3]
            failures.append((name, f"VALUES diff {diff}"))
            print(f"FAIL {name}: values differ, first diffs {diff}")
            continue
        dt = time.monotonic() - t_row
        print(f"OK   {name} ({len(srows)} rows) [{dt:.1f}s]")

    total = time.monotonic() - t_start
    print(f"\n{len(failures)} failures in {total:.1f}s")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()

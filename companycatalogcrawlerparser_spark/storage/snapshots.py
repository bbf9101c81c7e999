"""Atomic snapshot store — Iceberg-style commit semantics on plain parquet.

The production target is Iceberg (one snapshot per fetch batch, state MERGE
in the same commit — SURVEY.md C7); this sandbox has no Iceberg runtime, so
we reproduce the property that matters for resume correctness: a crawl
round's outputs become visible ATOMICALLY or not at all.

Layout:
    root/data/round=K/<table>/*.parquet     (written first)
    root/manifests/round-K.json             (os.rename = the commit point)

A manifest lists its tables + row counts + per-partition lineage counters
(north_rule). A killed job leaves at most an orphan data dir that the next
run ignores (no manifest) and overwrites.
"""

from __future__ import annotations

import json
import os
import re
from typing import Dict, Optional

from pyspark.sql import DataFrame, SparkSession


class SnapshotStore:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(os.path.join(root, "manifests"), exist_ok=True)
        os.makedirs(os.path.join(root, "data"), exist_ok=True)

    # -- commit --------------------------------------------------------------

    def commit(
        self,
        round_id: int,
        tables: Dict[str, DataFrame],
        counters: Optional[Dict[str, int]] = None,
    ) -> dict:
        data_dir = os.path.join(self.root, "data", f"round={round_id}")
        manifest: dict = {"round": round_id, "tables": {}, "counters": counters or {}}

        # write the tables from concurrent driver threads: the writes are
        # independent jobs over (mostly) already-checkpointed inputs, so the
        # per-job stage latency overlaps; atomicity still comes solely from
        # the manifest rename below.
        #
        # Output sizing (r8, guide §6): the committed tables are METADATA
        # rows (trace/bag/flags/frontier/url_seen keys — never html), but
        # they inherit the corpus scan's split count (~3× cores via
        # _tune_input_splits), so each round wrote #tables × ~3×cores
        # tiny files and the union readers re-opened all of them every
        # later round. Cap write fan-out at defaultParallelism/4 —
        # cluster-proportional, not a constant: a bigger cluster writes
        # more files, and a narrow coalesce over checkpointed/metadata
        # inputs merges cached blocks without a shuffle or recompute.
        n_write = max(2, self.spark.sparkContext.defaultParallelism // 4)

        def _write(item):
            name, df = item
            path = os.path.join(data_dir, name)
            # coalesce never increases partition count — smaller frames
            # pass through untouched
            df.coalesce(n_write).write.mode("overwrite").parquet(path)
            return name, path

        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=max(1, len(tables))) as ex:
            for name, path in ex.map(_write, list(tables.items())):
                manifest["tables"][name] = {"path": path}
        tmp = os.path.join(self.root, "manifests", f".round-{round_id}.json.tmp")
        final = os.path.join(self.root, "manifests", f"round-{round_id}.json")
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, final)  # the atomic commit point
        return manifest

    # -- trainer shard handoff -------------------------------------------------

    def commit_shards(
        self,
        round_id: int,
        df: DataFrame,
        *,
        shard_col: str = "shard_id",
        order_col: Optional[str] = None,
        table: str = "shards",
        counters: Optional[Dict[str, int]] = None,
    ) -> dict:
        """Write the packed training shards (``pack_shards`` /
        ``global_order_index`` output) as ONE directory per shard —
        ``data/round=K/<table>/<shard_col>=N/`` — under the same atomic
        manifest-rename commit as a crawl round, so kill/resume semantics
        cover the trainer's final artifact too: a killed write leaves an
        orphan dir the next run ignores (no manifest) and overwrites.

        Scale shape: ONE Spark job for any number of shards — hash
        repartition on ``shard_col`` (each shard's rows land on one task;
        shards are ~budget-token sized by construction, so tasks are
        bounded and skew-free) + ``sortWithinPartitions`` (rows inside
        each shard file are in ``order_col`` order — the trainer streams
        a shard without sorting) + dynamic ``partitionBy`` (one file per
        shard per task — and each shard lives in exactly one task, so one
        file per shard). Never a per-shard driver loop of write jobs.
        """
        from pyspark.sql import functions as F

        data_dir = os.path.join(self.root, "data", f"round={round_id}")
        path = os.path.join(data_dir, table)
        sort_cols = [shard_col] + ([order_col] if order_col else [])
        (
            df.repartition(F.col(shard_col))
            .sortWithinPartitions(*sort_cols)
            .write.mode("overwrite")
            .partitionBy(shard_col)
            .parquet(path)
        )
        shard_ids = sorted(
            int(fn.split("=", 1)[1])
            for fn in os.listdir(path)
            if fn.startswith(f"{shard_col}=")
        )
        manifest: dict = {
            "round": round_id,
            "tables": {
                table: {
                    "path": path,
                    "partitioned_by": shard_col,
                    "n_shards": len(shard_ids),
                }
            },
            "counters": counters or {},
        }
        tmp = os.path.join(
            self.root, "manifests", f".round-{round_id}.json.tmp"
        )
        final = os.path.join(self.root, "manifests", f"round-{round_id}.json")
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, final)  # the atomic commit point
        return manifest

    def shard_ids(self, round_id: int, table: str = "shards") -> list:
        """Committed shard ids in ascending (= train) order. Listing goes
        through the manifest, so orphan dirs from killed writes are
        invisible until their round commits."""
        entry = self.manifest(round_id)["tables"][table]
        pref = entry["partitioned_by"] + "="
        return sorted(
            int(fn.split("=", 1)[1])
            for fn in os.listdir(entry["path"])
            if fn.startswith(pref)
        )

    def read_shard(
        self, round_id: int, shard_id: int, table: str = "shards"
    ) -> DataFrame:
        """One shard's rows, in written (``order_col``) order when read
        single-file — the trainer's per-shard stream."""
        entry = self.manifest(round_id)["tables"][table]
        return self.spark.read.parquet(
            os.path.join(entry["path"], f"{entry['partitioned_by']}={shard_id}")
        )

    # -- restore ---------------------------------------------------------------

    def committed_rounds(self) -> list:
        out = []
        for fn in os.listdir(os.path.join(self.root, "manifests")):
            m = re.fullmatch(r"round-(\d+)\.json", fn)
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    def last_round(self) -> Optional[int]:
        rounds = self.committed_rounds()
        return rounds[-1] if rounds else None

    def manifest(self, round_id: int) -> dict:
        with open(os.path.join(self.root, "manifests", f"round-{round_id}.json")) as f:
            return json.load(f)

    def read(self, round_id: int, table: str) -> DataFrame:
        return self.spark.read.parquet(self.manifest(round_id)["tables"][table]["path"])

    def has_table(self, round_id: int, table: str) -> bool:
        return table in self.manifest(round_id)["tables"]

    # -- compaction ------------------------------------------------------------
    #
    # The small-file problem at 100 TB: a crawl that commits per-round bag/
    # trace/flags tables accumulates rounds × partitions parquet files, and
    # every finalize() re-unions ALL of them — thousands of rounds means a
    # listing+footer-read storm per run and a plan with thousands of scan
    # legs. Compaction is the Iceberg `rewrite_data_files` analogue on this
    # store: rewrite rounds ≤ K of the append-style tables into ONE base
    # snapshot, committed by the same tmp-write + os.rename protocol as a
    # round (crash before the rename leaves an orphan data dir readers
    # ignore). Readers use read_union(): newest compacted base + tail
    # rounds — bit-identical rows to the raw union (pytest-pinned), just
    # fewer files. Covered rounds' data stays for time travel unless
    # prune_compacted() is called (manifests are NEVER deleted — lineage
    # counters survive pruning).

    def compact(
        self,
        tables: list,
        upto: Optional[int] = None,
        target_partitions: int = 8,
    ) -> dict:
        upto = self.last_round() if upto is None else upto
        rounds = [r for r in self.committed_rounds() if r <= upto]
        data_dir = os.path.join(self.root, "data", f"compact={upto}")
        manifest: dict = {"compact_upto": upto, "tables": {}, "rounds": rounds}
        for name in tables:
            df = self.read_union(name, upto)
            path = os.path.join(data_dir, name)
            # coalesce, not repartition: file-count reduction needs no
            # shuffle — each output file just concatenates input splits
            df.coalesce(target_partitions).write.mode("overwrite").parquet(path)
            manifest["tables"][name] = {"path": path}
        tmp = os.path.join(self.root, "manifests", f".compact-{upto}.json.tmp")
        final = os.path.join(self.root, "manifests", f"compact-{upto}.json")
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, final)  # atomic, same commit point protocol as rounds
        return manifest

    def committed_compactions(self) -> list:
        out = []
        for fn in os.listdir(os.path.join(self.root, "manifests")):
            m = re.fullmatch(r"compact-(\d+)\.json", fn)
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    def compaction_manifest(self, upto: int) -> dict:
        with open(os.path.join(self.root, "manifests", f"compact-{upto}.json")) as f:
            return json.load(f)

    def read_union(self, table: str, upto: Optional[int] = None) -> DataFrame:
        """All rows of an append-style table across rounds ≤ ``upto``:
        newest covering compacted base (if any) + the tail rounds after
        it. Row-equal to unioning every round's table directly."""
        upto = self.last_round() if upto is None else upto
        base = None
        start_after = -1
        for c in reversed(self.committed_compactions()):
            if c <= upto and table in self.compaction_manifest(c)["tables"]:
                base = self.spark.read.parquet(
                    self.compaction_manifest(c)["tables"][table]["path"]
                )
                start_after = c
                break
        out = base
        for r in self.committed_rounds():
            if r <= start_after or r > upto or not self.has_table(r, table):
                continue
            df = self.read(r, table)
            out = df if out is None else out.unionByName(df)
        if out is None:
            raise KeyError(f"table {table!r} has no committed data ≤ round {upto}")
        return out

    def prune_compacted(self, upto: int) -> list:
        """Delete covered rounds' data dirs for the tables a committed
        compaction rewrote (storage reclaim; idempotent — a crash mid-way
        just leaves fewer dirs for the next call). Round MANIFESTS are
        kept: counters/lineage stay queryable, and read_union never
        touches the pruned dirs because the compacted base shadows them."""
        import shutil

        man = self.compaction_manifest(upto)  # raises if not committed
        removed = []
        for r in man["rounds"]:
            for name in man["tables"]:
                if not self.has_table(r, name):
                    continue
                path = self.manifest(r)["tables"][name]["path"]
                if os.path.exists(path):
                    shutil.rmtree(path)
                    removed.append(path)
        return removed

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
        # the manifest rename below
        def _write(item):
            name, df = item
            path = os.path.join(data_dir, name)
            df.write.mode("overwrite").parquet(path)
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

"""SparkSession factory tuned for the crawl engine.

Local-mode defaults match the sandbox (local[N], single JVM); the same
settings minus master/driver-memory are what we'd ship to a real cluster
via spark-submit. AQE stays on everywhere: it handles skew-join splitting
for the fetch join and post-shuffle coalescing for small rounds.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "ccc_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    # local[N]: shuffle partitions sized to cores, not the 200 default —
    # at cluster scale this is set to ~2-3x total executor cores instead.
    if shuffle_partitions is None:
        n = master[master.index("[") + 1 : master.index("]")] if "[" in master else "32"
        shuffle_partitions = cpus if n == "*" else int(n)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # post-shuffle coalescing at the default 64 MB advisory collapsed
        # regex-heavy window stages to half the cores; 16 MB keeps CPU-bound
        # stages wide while still batching tiny rounds
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
        # NB input-split sizing for the heavy corpus scan is tuned at
        # runtime by plans.crawl (html compresses ~30:1, so the 128 MB
        # default can starve the scan+extract stage of tasks) — the
        # session keeps Spark's defaults so small auxiliary scans don't
        # fragment into per-file tasks
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # pages are heavy rows (10-100 KB html each): the default 10k-row
        # Arrow batch would put GBs in every Python worker — cap it so a
        # batch stays ~tens of MB
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "512")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        # regex extraction allocates transient String copies of each page;
        # ParallelGC handles that allocation profile at least as well as G1
        # in the local-mode shared heap (measured: within run noise either
        # way — the sandbox's sys/steal overhead dominates, see
        # BENCH/BASELINE.md controls)
        .config(
            "spark.driver.extraJavaOptions",
            os.environ.get("SPARK_GC_OPTS", "-XX:+UseParallelGC"),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # degraded-host resilience: under heavy sys/steal contention the
        # default 10s executor heartbeat can miss the 120s network-timeout
        # window even in local mode, and the app kills itself mid-stage
        # (observed on the sandbox VM: ~40-min XL legs dying inside a
        # TableCacheQueryStage with the shutdown hook's blockmgr cleanup
        # racing still-running tasks — temp_shuffle ENOENT). There is no
        # real network in local mode, and on a cluster these are the same
        # values we'd run on preemptible fleets: nothing legitimate
        # expires in 600s that 120s would have caught.
        .config("spark.executor.heartbeatInterval", "60s")
        .config("spark.network.timeout", "600s")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark

"""SparkSession factory with scale-oriented defaults.

Designed for a multi-executor cluster at 100 TB; tested on local[N].
All knobs are env-overridable so bench.py can run the identical job at
two parallelism levels (local[8] vs local[32]) for the scaling-
efficiency measurement.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "kg-construct",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    # Rule of thumb: shuffle partitions ~ cores on local mode; on a real
    # cluster this is set to 2-3x total executor cores (or left to AQE
    # coalescing from a high initial value).
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", str(max(cpus, 8)))
        )

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # AQE: runtime partition coalescing, skew-join splitting, and
        # dynamic join-strategy switching. Replaces the reference's
        # hand-tuned cardinality model (HistoryEvaluationStatistics.java).
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow for all pandas UDF / toPandas paths (north rule: batched
        # Arrow transfer, no per-row Python). Bigger batches amortize
        # the JVM↔python handoff; env-tunable for the scaling bench.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            os.environ.get("SPARK_GRAFT_ARROW_BATCH", "10000"),
        )
        # Every mapInPandas task = 1 JVM thread + 1 python worker; on a
        # fully-loaded host, accounting 2 cpus per task stops the 2x
        # oversubscription that stalled 8→32 scaling of the pandas path
        # (the all-JVM path should keep the default 1).
        .config(
            "spark.task.cpus", os.environ.get("SPARK_GRAFT_TASK_CPUS", "1")
        )
        # pin worker reuse explicitly (default true, but the scaling
        # measurement depends on it: rep N must not respawn workers)
        .config("spark.python.worker.reuse", "true")
        # Parquet scan tuning: 128 MB splits keep ~100k tasks for 100 TB.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.parquet.compression.codec", "zstd")
        # Keep driver UI off in the sandbox.
        .config("spark.ui.enabled", "false")
        # UTC so timestamp literals round-trip identically vs the
        # DuckDB oracle (naive timestamps).
        .config("spark.sql.session.timeZone", "UTC")
        # local[N] = one JVM: driver memory IS executor memory. Size it
        # so 11M-row shuffles sort in memory instead of spilling
        # (UnsafeExternalSorter spills were the 8→32 scaling wall).
        .config(
            "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g")
        )
    )
    # shuffle/spill scratch on tmpfs when available: /tmp here is
    # ext4-on-virtio and its bandwidth flat-lines multi-core shuffles
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if local_dir is None and os.path.isdir("/dev/shm"):
        local_dir = "/dev/shm/spark-local"
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark

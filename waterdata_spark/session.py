"""SparkSession factory for the waterdata-spark engine.

Local-mode defaults tuned for the driver environment (local[32],
single JVM, 128 GiB host). The same settings are the right *shape*
for a real cluster: AQE on (runtime re-planning, skew-join handling,
partition coalescing), shuffle partitions sized to parallelism, UTC
session timezone (oracle comparisons against DuckDB's naive
timestamps), and Arrow for any pandas-UDF path.

At 100 TB the only knobs that change are sizes, not structure:
``spark.sql.shuffle.partitions`` scales with cluster cores,
``spark.sql.files.maxPartitionBytes`` stays at 128-256 MB so scan
tasks fit executor memory, and AQE coalesces the rest at runtime.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark", "default_parallelism"]


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "waterdata-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    Declarative-first engine: every knob here exists so Catalyst/AQE
    can do the physical planning — we never hand-schedule.
    """
    cpus = default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # Auto-broadcast threshold: dims in this workload are KB-MB;
        # 64 MB keeps every dim join a broadcast-hash join.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # r12: disable InferWindowGroupLimit (partial top-k below the
        # window exchange). The rule pays a FULL extra local sort of
        # the window input before the shuffle and only wins when a key
        # has many rows per MAP TASK. Every rank-filtered window in
        # this engine is high-cardinality (dedup keys ~ rows: q06
        # ~4 rows/orderkey, x01 ~unique digests, q07 ~15 orders over
        # hundreds of tasks), so per (task, key) there is ~1 row and
        # the partial limit removes nothing. Interleaved A/B on the
        # committed decades (plans/r12, OPTIMIZATION_r12.md): q06@sf10
        # 11.35s -> 7.58s min-of-6 ("off" won all 6 rounds), q07@sf10
        # 2.23 -> 1.91s (all 5 rounds), x01@sf1 a wash. The shape
        # argument is scale-independent — more data means more map
        # tasks at the same rows-per-key, so co-location never
        # improves; a LOW-cardinality ranking (top-k per country)
        # should re-enable via extra_conf.
        .config("spark.sql.optimizer.windowGroupLimitThreshold", "-1")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark

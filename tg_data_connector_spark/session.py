"""SparkSession factory.

Replaces the reference engine bootstrap (``Engine.start``,
``core/src/main/java/com/alibaba/datax/core/Engine.java:39-94``: bind ColumnCast,
plugin classloaders, container start) with a single declarative session builder.
The reference's channel-parallelism sizing (``JobContainer.adjustChannelNumber``,
``JobContainer.java:424-494``) maps to ``spark.sql.shuffle.partitions`` + AQE.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "tg_data_connector_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for the CDC-ingest workload.

    Scale notes (100 TB / 1000-executor design intent):
      * AQE on: runtime coalescing of post-shuffle partitions, skew-join splitting.
      * Arrow on: every pandas_udf crosses the JVM<->Python boundary in columnar
        batches (the north rule forbids per-row Python).
      * Timezone pinned UTC — the reference pins GMT+8 via ColumnCast
        (``ColumnCast.java:13-39``); we pin UTC and make all casts explicit.
    """
    cores = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or os.environ.get("SPARK_MASTER", f"local[{cores}]")
    sp = shuffle_partitions or int(
        os.environ.get("SPARK_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS)
    )
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(sp))
        .config("spark.default.parallelism", str(sp))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # keep post-shuffle parallelism at cluster width even for modest
        # shuffles (default 64 MB advisory size would coalesce a ~30 MB
        # exchange to one task); at production volumes this only means more,
        # still-large partitions
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "1m")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.parquet.compression.codec", "snappy")
        .config("spark.ui.enabled", os.environ.get("SPARK_UI", "false"))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark

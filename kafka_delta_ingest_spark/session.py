"""SparkSession factory with scale-oriented defaults.

Local mode is a stand-in for a multi-executor cluster: every knob here is
chosen so the same plan shapes (range shuffles sized to target-file bytes,
AQE skew splitting, Arrow-batched pandas UDFs) carry to 1000 executors.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "kafka_delta_ingest_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``cores``: parallelism for local mode (``local[cores]``); defaults to
    ``$SPARK_GRAFT_CPUS`` or ``*``. On a real cluster the master URL comes
    from spark-submit and this arg is ignored by Spark.
    """
    if cores is None:
        env = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{env}]" if env else "local[*]"
    else:
        master = f"local[{cores}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        # local mode: driver heap IS executor memory; 32 concurrent sorters
        # over token-heavy rows thrash spills below ~2 GB/task fair share
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "64g"))
        .config(
            "spark.driver.extraJavaOptions",
            os.environ.get("KDI_DRIVER_JAVA_OPTS", ""),
        )
        # parquet files written by maintenance carry full column stats for
        # manifest min/max pruning (ref src/writer.rs:655-707)
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark

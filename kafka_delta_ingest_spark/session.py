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
        # AQE coalescing floor kept at the Spark default (1 MiB): a
        # session-wide 64 KiB floor was A/B'd in r6 — it widened the
        # byte-small/compute-heavy dedup verify stages (~8% on that
        # subset) but multiplied the file fan-out of every partitioned
        # MERGE/DML write (tasks × partition values; merge_clauses_scan
        # 2.7 s → 5.8 s). The verify stages get explicit width at the
        # operator instead (operators/dedup.py candidate repartition),
        # which is also the only form that survives on a real cluster
        # where the same exchange is NOT small.
        .config(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize",
            os.environ.get("KDI_AQE_MIN_PARTITION_SIZE", "1m"),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        # Python Data Source filter pushdown (sources/table_batch.py):
        # dynamic SQL conf, off by default in Spark 4.1 — the kdi-table
        # format needs it to receive pushFilters for manifest pruning
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        # local mode: driver heap IS executor memory; 32 concurrent sorters
        # over token-heavy rows thrash spills below ~2 GB/task fair share
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "64g"))
        # ParallelGC: the batch-throughput collector. G1 on a 64 GB heap
        # with 32 threads allocating token arrays (humongous-object-heavy)
        # shows collapse-grade tails on this box (measured 146-324 s for a
        # partitioned write ParallelGC finishes in 10-15 s; G1's own best
        # matches PGC, its worst is 20x). Real clusters run ~4-8 GB
        # executors where G1 is fine — this default is for fat local JVMs.
        .config(
            "spark.driver.extraJavaOptions",
            os.environ.get("KDI_DRIVER_JAVA_OPTS", "-XX:+UseParallelGC"),
        )
        # concurrent-writers mode for partitioned writes: without it,
        # FileFormatWriter SORTS each task's rows by partition key first —
        # the single most memory-hungry op for token-heavy rows (round-1
        # finding); with table partition counts this low (~6 sources) a
        # small writer pool removes the sort entirely
        .config(
            "spark.sql.maxConcurrentOutputFileWriters",
            os.environ.get("KDI_MAX_CONCURRENT_WRITERS", "10"),
        )
        # default 4 MiB per-file open cost makes Spark schedule ~1 task
        # per 2 small files when scanning fragmented (pre-compaction)
        # tables; 1 MiB packs more files per task — right for local/SSD
        # and for object stores with request parallelism
        .config(
            "spark.sql.files.openCostInBytes",
            os.environ.get("KDI_OPEN_COST_BYTES", str(1024 * 1024)),
        )
        # parquet files written by maintenance carry full column stats for
        # manifest min/max pruning (ref src/writer.rs:655-707)
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        # survive multi-minute host stalls (noisy-neighbor virtio freezes
        # measured >130 s): in local mode the "executor" IS the driver, so
        # a heartbeat expiry can only ever be a false positive that kills
        # the job — make the timeouts generous
        .config("spark.network.timeout", os.environ.get("KDI_NETWORK_TIMEOUT", "600s"))
        .config("spark.executor.heartbeatInterval", "30s")
        # manifest scans pass EXPLICIT leaf-file paths (table/scan.py), and
        # with >32 paths Spark's default launches a parallel-partition-
        # discovery JOB with one ~14 ms task PER FILE — on a 2304-file
        # pre-compaction table that is two 2304-task pure-dispatch stages
        # (~8 s at local[8], measured; on a 1000-executor cluster the same
        # job serializes in the driver's scheduler loop). Local/posix stat
        # is cheap: list driver-side up to 100k files. On a high-latency
        # object store, lower the threshold back via env.
        .config(
            "spark.sql.sources.parallelPartitionDiscovery.threshold",
            os.environ.get("KDI_PARALLEL_DISCOVERY_THRESHOLD", "100000"),
        )
    )
    # shuffle/spill directory override — bench --scaling points this at
    # tmpfs to take the single shared virtio disk out of the measurement
    local_dir = os.environ.get("KDI_SPARK_LOCAL_DIR")
    if local_dir:
        b = b.config("spark.local.dir", local_dir)
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark

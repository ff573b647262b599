"""spark-submit entry point for stream/batch ingest — the CLI analogue of
``kafka-delta-ingest ingest <topic> <table>`` (/root/reference/src/main.rs:313-465).

The message source is a directory of JSON files with the Kafka-envelope
columns (``value string, _partition int, _offset long``) consumed either
once (--once) or as a Structured Streaming file source — swap in
``spark.readStream.format("kafka")`` on a real deployment for the same
pipeline.

Usage:
  spark-submit --py-files kafka_delta_ingest_spark.zip jobs/ingest.py \
      --source /data/incoming --table /data/events_table \
      --app-id ingest-1 \
      --transform "date: substr(epoch_micros_to_iso8601(unix_micros(ts)), 0, 10)" \
      --dlq-table /data/events_dlq --once
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_transforms(pairs: list[str]) -> dict[str, str]:
    out = {}
    for p in pairs:
        prop, _, src = p.partition(":")
        out[prop.strip()] = src.strip()
    return out


def main():
    p = argparse.ArgumentParser(description="kdi-spark ingest")
    p.add_argument("--source", required=True, help="dir of JSON message files")
    p.add_argument("--table", required=True)
    p.add_argument("--app-id", default="kdi-ingest")
    p.add_argument("--transform", action="append", default=[],
                   help="PROPERTY: SOURCE (repeatable; ref transforms.rs)")
    p.add_argument("--dlq-table", default=None)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--trigger-seconds", type=int, default=10,
                   help="allowed_latency analogue (ref src/lib.rs:309)")
    p.add_argument("--gzip", action="store_true", help="payloads are gzip JSON")
    p.add_argument("--once", action="store_true",
                   help="bounded run: process what exists and exit "
                        "(end_at_last_offsets analogue, ref src/lib.rs:526-592)")
    args = p.parse_args()

    from pyspark.sql import SparkSession

    from kafka_delta_ingest_spark.streaming.micro_batch import (
        IngestPipeline,
        start_stream_ingest,
    )
    from kafka_delta_ingest_spark.table.format import Table

    spark = SparkSession.builder.getOrCreate()
    table = Table(args.table)
    dlq = Table(args.dlq_table) if args.dlq_table else None
    pipe = IngestPipeline(
        table, app_id=args.app_id,
        transforms=parse_transforms(args.transform), dlq_table=dlq,
    )

    schema = "value string, _partition int, _offset long"
    if args.once:
        df = spark.read.schema(schema).json(args.source)
        if args.gzip:
            from pyspark.sql import functions as F

            from kafka_delta_ingest_spark.ingest.formats import gunzip_to_string

            df = df.withColumn("value", gunzip_to_string(F.col("value").cast("binary")))
        out = pipe.ingest_batch(spark, df)
        print(json.dumps(out))
        return

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "16")
        .json(args.source)
    )
    q = start_stream_ingest(
        spark, stream, pipe,
        checkpoint_dir=args.checkpoint or os.path.join(args.table, "_stream_ckpt"),
        trigger_seconds=args.trigger_seconds,
    )
    q.awaitTermination()


if __name__ == "__main__":
    main()

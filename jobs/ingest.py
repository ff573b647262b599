"""spark-submit entry point for stream/batch ingest — the CLI analogue of
``kafka-delta-ingest ingest <topic> <table>`` (/root/reference/src/main.rs:313-465).

The message source is either a real Kafka topic (``--topic`` +
``--kafka`` bootstrap servers + repeatable ``-K key=value`` librdkafka
settings, exactly the reference's CLI surface — wired through
sources/kafka.py; needs the spark-sql-kafka package on the classpath) or
a directory of JSON files with the Kafka-envelope columns
(``value string, _partition int, _offset long``), consumed once (--once)
or as a Structured Streaming file source.

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
    p.add_argument("--source", default=None, help="dir of JSON message files")
    p.add_argument("--topic", default=None, help="Kafka topic (real source)")
    p.add_argument("--kafka", default="localhost:9092",
                   help="bootstrap servers (ref main.rs --kafka)")
    p.add_argument("-K", "--kafka-setting", action="append", default=[],
                   help="librdkafka key=value passthrough (ref main.rs:424-431)")
    p.add_argument("--statsd-endpoint", default=None,
                   help="emit reference-named stats via UDP statsd")
    p.add_argument("--table", required=True)
    p.add_argument("--app-id", default="kdi-ingest")
    p.add_argument("--transform", action="append", default=[],
                   help="PROPERTY: SOURCE (repeatable; ref transforms.rs)")
    p.add_argument("--dlq-table", default=None)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--trigger-seconds", type=int, default=10,
                   help="allowed_latency analogue (ref src/lib.rs:309)")
    p.add_argument("--gzip", action="store_true", help="payloads are gzip JSON")
    fmt = p.add_mutually_exclusive_group()
    fmt.add_argument("--json", nargs="?", const="", default=None,
                     metavar="SCHEMA_SOURCE",
                     help="JSON format; optional schema registry endpoint "
                          "(ref main.rs:437-441: registry URL, local path, "
                          "or empty)")
    fmt.add_argument("--avro", nargs="?", const="", default=None,
                     metavar="SCHEMA_SOURCE",
                     help="Avro format; '' = container files w/ embedded "
                          "schema, path = schema file, http(s) URL = "
                          "Confluent registry (ref main.rs:442-446)")
    p.add_argument("--once", action="store_true",
                   help="bounded run: process what exists and exit "
                        "(end_at_last_offsets analogue, ref src/lib.rs:526-592)")
    p.add_argument("--upsert-key", action="append", default=[],
                   help="CDC mode: upsert each batch by these key columns "
                        "(equality deletes, latest Kafka offset wins; "
                        "repeatable for composite keys)")
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
    metrics = None
    if args.statsd_endpoint:
        from kafka_delta_ingest_spark.metrics import IngestMetrics, StatsdSink

        metrics = IngestMetrics(sink=StatsdSink(args.statsd_endpoint))
    pipe = IngestPipeline(
        table, app_id=args.app_id,
        transforms=parse_transforms(args.transform), dlq_table=dlq,
        metrics=metrics, upsert_key=args.upsert_key or None,
    )
    if not args.source and not args.topic:
        p.error("one of --source or --topic is required")

    # (format, schema source) -> deserializer, exactly the reference's
    # factory keying (serialization.rs:21-53); default plain JSON
    from kafka_delta_ingest_spark.ingest.formats import make_deserializer

    in_fmt = "avro" if args.avro is not None else "json"
    schema_source = args.avro if args.avro is not None else (args.json or None)
    deser, payload = make_deserializer(
        in_fmt, schema_source or None, gzip_payloads=args.gzip
    )

    if args.topic:
        from kafka_delta_ingest_spark.sources.kafka import kafka_batch, kafka_stream

        ksettings = dict(s.partition("=")[::2] for s in args.kafka_setting)
        seek = pipe.stored_offsets()  # resume from table txn offsets
        if args.once:
            df = kafka_batch(spark, args.topic, args.kafka, ksettings, seek,
                             payload=payload)
            if payload == "binary":
                df = deser(df).drop("bytes")
            out = pipe.ingest_batch(spark, df)
            print(json.dumps(out))
            return
        stream = kafka_stream(spark, args.topic, args.kafka, ksettings, seek,
                              payload=payload)
        if payload == "binary":
            stream = deser(stream).drop("bytes")
        q = start_stream_ingest(
            spark, stream, pipe,
            checkpoint_dir=args.checkpoint or os.path.join(args.table, "_stream_ckpt"),
            trigger_seconds=args.trigger_seconds,
        )
        q.awaitTermination()
        return

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

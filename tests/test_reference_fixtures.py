"""End-to-end replays of the reference's own integration fixtures
(/root/reference/tests/), read directly from the read-only reference tree:

- web_requests: the flagship ingest scenario (README.adoc:39-55) — 100
  JSON messages with nested meta struct, RFC-3339 timestamps with +00:00
  offsets, date partition derived via substr(meta.producer.timestamp,0,10);
- emails two-worker concurrency (tests/emails_s3_tests.rs:21-77): two
  pipelines with the same app id racing overlapping batches must produce
  no loss and no duplication;
- offset seek (tests/offset_tests.rs): explicit starting offsets written
  as app txns make the pipeline skip messages at-or-below them.
"""

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_delta_ingest_spark.ingest.coercions import coerce_json
from kafka_delta_ingest_spark.streaming.micro_batch import IngestPipeline
from kafka_delta_ingest_spark.table.format import Table, Transaction

REF_JSON = "/root/reference/tests/json/web_requests-100.json"

WEB_REQUESTS_SCHEMA = T.StructType(
    [
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField(
                        "producer",
                        T.StructType([T.StructField("timestamp", T.StringType())]),
                    )
                ]
            ),
        ),
        T.StructField("method", T.StringType()),
        T.StructField("session_id", T.StringType()),
        T.StructField("status", T.IntegerType()),
        T.StructField("url", T.StringType()),
        T.StructField("uuid", T.StringType()),
        T.StructField("date", T.StringType()),
    ]
)


@pytest.mark.skipif(not os.path.exists(REF_JSON), reason="reference tree absent")
def test_web_requests_flagship_replay(spark, tmp_path):
    """The reference README's example pipeline: ingest 100 web_requests
    with `date: substr(meta.producer.timestamp, 0, 10)` partitioning."""
    lines = [l.strip() for l in open(REF_JSON) if l.strip()]
    msgs = spark.createDataFrame(
        [(l, 0, i) for i, l in enumerate(lines)],
        "value string, _partition int, _offset long",
    )
    table = Table.create(str(tmp_path / "web_requests"), WEB_REQUESTS_SCHEMA, ["date"])
    pipe = IngestPipeline(
        table,
        app_id="web_requests",
        transforms={"date": "substr(meta.producer.timestamp, 0, 10)"},
    )
    m = pipe.ingest_batch(spark, msgs)
    assert m["rows"] == 100 and m["dead"] == 0
    snap = table.snapshot()
    scan = snap.scan(spark)
    assert scan.count() == 100
    # all fixture messages are from 2021-03-24; hive partition carries it
    dates = [r["date"] for r in scan.select("date").distinct().collect()]
    assert dates == ["2021-03-24"]
    assert {f.partition_values["date"] for f in snap.files} == {"2021-03-24"}
    # nested struct survived coercion; uuids unique and intact
    assert scan.where(F.col("meta.producer.timestamp").startswith("2021-03-24T")).count() == 100
    assert scan.select("uuid").distinct().count() == 100
    # stats carry nested leaf min/max (writer.rs:812-843 recursion)
    fe = snap.files[0]
    assert fe.stats["min"]["meta.producer.timestamp"].startswith("2021-03-24")
    # replay = no-op (offset txn guard)
    assert pipe.ingest_batch(spark, msgs).get("skipped_all")


def _email_msgs(spark, ids, partition):
    rows = [
        (
            json.dumps(
                {
                    "id": str(i),
                    "sender": f"sender-{i}@example.com",
                    "recipient": f"recipient-{i}@example.com",
                    "timestamp": f"2021-10-02T10:{i % 60:02d}:00Z",
                }
            ),
            partition,
            i,
        )
        for i in ids
    ]
    return spark.createDataFrame(rows, "value string, _partition int, _offset long")


EMAILS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("sender", T.StringType()),
        T.StructField("recipient", T.StringType()),
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("date", T.StringType()),
    ]
)


def test_emails_two_worker_concurrency(spark, tmp_path):
    """Two workers, same app id, overlapping batches per partition — the
    emails_s3 two-worker test's invariant: every id 0..199 lands exactly
    once (validated by reading all rows back, helpers/mod.rs:630-666)."""
    table = Table.create(str(tmp_path / "emails"), EMAILS_SCHEMA, ["date"])
    tf = {"date": "substr(epoch_micros_to_iso8601(unix_micros(timestamp)), 0, 10)"}
    w1 = IngestPipeline(table, app_id="emails", transforms=tf)
    w2 = IngestPipeline(table, app_id="emails", transforms=tf)

    # partition 0 -> ids 0..99, partition 1 -> ids 100..199; workers race
    # overlapping slices (retries/rebalances deliver duplicates)
    w1.ingest_batch(spark, _email_msgs(spark, range(0, 60), 0))
    w2.ingest_batch(spark, _email_msgs(spark, range(40, 100), 0))  # overlap 40-59
    w2.ingest_batch(spark, _email_msgs(spark, range(100, 160), 1))
    w1.ingest_batch(spark, _email_msgs(spark, range(120, 200), 1))  # overlap 120-159

    scan = table.snapshot().scan(spark)
    ids = sorted(int(r["id"]) for r in scan.select("id").collect())
    assert ids == list(range(200)), "no loss, no duplication"
    assert table.snapshot().app_txns["emails-0"] == 99
    assert table.snapshot().app_txns["emails-1"] == 199


def test_explicit_seek_offsets(spark, tmp_path):
    """offset_tests.rs explicit-seek scenario: bootstrap stored offsets so
    ingest starts AFTER them (written ids == 5..15 semantics)."""
    table = Table.create(str(tmp_path / "seek"), EMAILS_SCHEMA, ["date"])
    # bootstrap: partition 0 starts after offset 4 (write_offsets_to_delta)
    table.commit(Transaction(operation="seek-offsets", app_txns={"emails-0": 4}))
    pipe = IngestPipeline(
        table, app_id="emails",
        transforms={"date": "substr(epoch_micros_to_iso8601(unix_micros(timestamp)), 0, 10)"},
    )
    pipe.ingest_batch(spark, _email_msgs(spark, range(0, 15), 0))
    ids = sorted(int(r["id"]) for r in table.snapshot().scan(spark).collect())
    assert ids == list(range(5, 15))

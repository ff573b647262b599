"""Kafka source wiring (sources/kafka.py) — option mapping and envelope
normalization, unit-tested without a broker (the load() shim is the only
untestable line; ref consumer construction main.rs:313-465)."""

import datetime as dt
import json

from kafka_delta_ingest_spark.sources.kafka import envelope, kafka_options


def test_kafka_options_passthrough_and_seek():
    opts = kafka_options(
        "web_requests",
        "broker1:9092,broker2:9092",
        kafka_settings={
            "security.protocol": "SSL",
            "ssl.key.location": "kafka.key",
            "group.id": "should-be-dropped",
            "enable.auto.commit": "true",
            "bootstrap.servers": "evil:9092",
        },
        seek_offsets={0: 4, 2: 10},
        n_partitions=4,
    )
    assert opts["subscribe"] == "web_requests"
    assert opts["kafka.bootstrap.servers"] == "broker1:9092,broker2:9092"
    # -K passthrough gets the kafka. prefix (ref main.rs:424-431)
    assert opts["kafka.security.protocol"] == "SSL"
    assert opts["kafka.ssl.key.location"] == "kafka.key"
    # source-managed settings are not forwarded
    assert "kafka.group.id" not in opts
    assert "kafka.enable.auto.commit" not in opts
    assert opts["kafka.bootstrap.servers"] != "evil:9092"
    # seek = stored offset + 1 (ref src/offsets.rs:35-75); Spark's source
    # requires EVERY TopicPartition listed, unlisted ones resume earliest
    assert json.loads(opts["startingOffsets"]) == {
        "web_requests": {"0": 5, "1": -2, "2": 11, "3": -2}
    }
    assert "endingOffsets" not in opts

    # seek without the topic's partition count is a hard error (Spark would
    # reject the partial specific-offsets JSON at stream start)
    import pytest
    with pytest.raises(ValueError, match="n_partitions"):
        kafka_options("t", "b:9092", seek_offsets={0: 4})
    with pytest.raises(ValueError, match="out of range"):
        kafka_options("t", "b:9092", seek_offsets={5: 4}, n_partitions=4)

    bounded = kafka_options("t", "b:9092", end_at_last_offsets=True)
    assert bounded["endingOffsets"] == "latest"
    assert bounded["startingOffsets"] == "earliest"


def test_envelope_normalization(spark):
    rows = [
        (
            b"key1",
            json.dumps({"id": 1}).encode(),
            "web_requests",
            3,
            42,
            dt.datetime(2024, 1, 1, 0, 0, 0),
            0,
        )
    ]
    df = spark.createDataFrame(
        rows,
        "key binary, value binary, topic string, partition int, "
        "offset long, timestamp timestamp, timestampType int",
    )
    env = envelope(df).collect()[0]
    assert env["value"] == '{"id": 1}'
    assert env["_partition"] == 3 and env["_offset"] == 42
    assert env["_topic"] == "web_requests"
    assert env["_ts_type"] == 0 and env["_ts"] is not None

    raw = envelope(df, payload="binary").collect()[0]
    assert bytes(raw["bytes"]) == json.dumps({"id": 1}).encode()


def _kafka_source_available(spark) -> bool:
    """True when the spark-sql-kafka package is on the classpath."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:
        return False


def test_kafka_stream_load_smoke_when_package_present(spark):
    """Exercises kafka_stream().load() wiring automatically if the
    environment ever gains the spark-sql-kafka jar; skips cleanly here.
    (load() is the one line unit tests cannot reach without the package —
    everything around it is covered above.)"""
    import pytest

    from kafka_delta_ingest_spark.sources.kafka import kafka_stream

    if not _kafka_source_available(spark):
        pytest.skip("spark-sql-kafka package not on the classpath")
    # no broker needed: constructing the streaming DataFrame validates the
    # options (including the all-TopicPartitions startingOffsets JSON)
    df = kafka_stream(
        spark,
        "smoke_topic",
        "localhost:19092",
        seek_offsets={0: 4},
        n_partitions=2,
    )
    assert df.isStreaming
    assert set(df.columns) >= {"value", "_partition", "_offset", "_topic", "_ts"}

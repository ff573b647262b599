"""Format deserializers (ref serialization.rs), lag metrics (ref
lib.rs:671-712), schema-update detection (ref writer.rs:369-386)."""

import gzip
import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_delta_ingest_spark.ingest.buffers import consumer_lag
from kafka_delta_ingest_spark.ingest.formats import (
    confluent_wire_parts,
    deserialize_gzip_json,
    deserialize_json,
)


def test_json_and_gzip_json_deserialize(spark):
    plain = json.dumps({"id": 1}).encode()
    gz = gzip.compress(json.dumps({"id": 2}).encode())
    bad = b"\x1f\x8b\x00broken"
    df = spark.createDataFrame([(plain,), (gz,), (bad,)], "bytes binary")
    out = {r["value"] for r in deserialize_gzip_json(df).collect()}
    assert '{"id": 1}' in out and '{"id": 2}' in out and None in out
    out2 = deserialize_json(df.limit(1)).collect()[0]["value"]
    assert out2 == '{"id": 1}'


def test_confluent_wire_format_split(spark):
    payload = b"\x00" + (1234).to_bytes(4, "big") + b"avrobody"
    df = spark.createDataFrame([(payload,)], "bytes binary")
    parts = confluent_wire_parts()
    row = df.select(
        parts["magic"].alias("m"), parts["schema_id"].alias("sid"), parts["body"].alias("b")
    ).collect()[0]
    assert row["m"] == 0
    assert row["sid"] == 1234
    assert bytes(row["b"]) == b"avrobody"


def test_consumer_lag_rollups():
    lag = consumer_lag({0: 100, 1: 50, 2: 7}, {0: 89, 1: 49})
    assert lag["per_partition"] == {0: 10, 1: 0, 2: 7}
    assert lag["total"] == 17 and lag["max"] == 10 and lag["min"] == 0


def test_schema_update_detection(spark, tmp_table_root):
    """A commit built against a stale schema must fail once the table
    schema changed underneath (ref DeltaSchemaChanged)."""
    from kafka_delta_ingest_spark.datagen import TOKENS_SCHEMA
    from kafka_delta_ingest_spark.table.format import (
        SchemaChangedError,
        Table,
        Transaction,
    )

    t = Table.create(tmp_table_root, TOKENS_SCHEMA, ["source"])
    old_schema = t.snapshot().schema
    # external writer evolves the schema (new column) via a metadata commit
    new_schema = T.StructType(
        old_schema.fields + [T.StructField("quality", T.DoubleType(), True)]
    )
    c = {
        "version": 1,
        "operation": "schema-evolve",
        "metadata": {"schema": json.loads(new_schema.json()), "partition_cols": ["source"]},
        "add": [],
        "remove": [],
        "app_txns": {},
    }
    t._atomic_write_version(1, c)
    with pytest.raises(SchemaChangedError):
        t.commit(Transaction(operation="append"), expected_schema=old_schema)
    # re-reading the table (the reference's update_schema) unblocks
    assert t.commit(Transaction(operation="append"), expected_schema=t.snapshot().schema) == 2

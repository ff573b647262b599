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


_AVRO_SCHEMA = {
    "type": "record",
    "name": "WebRequest",
    "namespace": "com.example",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "path", "type": "string"},
        {"name": "status", "type": "int"},
        {"name": "session", "type": ["null", "string"]},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
    ],
}
_AVRO_RECS = [
    {"id": 1, "path": "/a", "status": 200, "session": None, "tags": ["x"]},
    {"id": -2, "path": "/b", "status": 404, "session": "s1", "tags": []},
]


def test_avro_container_deserialize(spark):
    """Container-file Avro decode end-to-end without spark-avro/fastavro
    (ref AvroSchemaDeserializer: first record per message,
    serialization.rs:169-186; fixtures generated in-test per round-2 plan)."""
    from kafka_delta_ingest_spark.ingest.avro_decode import encode_container
    from kafka_delta_ingest_spark.ingest.formats import deserialize_avro

    payloads = [(encode_container([r], _AVRO_SCHEMA),) for r in _AVRO_RECS]
    payloads.append((b"not-avro",))
    df = spark.createDataFrame(payloads, "bytes binary")
    vals = [r["value"] for r in deserialize_avro(df).collect()]
    parsed = [json.loads(v) if v else None for v in vals]
    assert _AVRO_RECS[0] in parsed and _AVRO_RECS[1] in parsed
    assert None in parsed  # malformed → null → DLQ


def test_avro_deflate_codec_roundtrip(spark):
    import zlib

    from kafka_delta_ingest_spark.ingest import avro_decode as av

    raw = av.encode_container([_AVRO_RECS[0]], _AVRO_SCHEMA)
    # hand-build a deflate-codec container around the same record
    schema_json = json.dumps(_AVRO_SCHEMA).encode()
    body = av._encode_datum(_AVRO_RECS[0], _AVRO_SCHEMA)
    sync = b"\x01" * 16
    comp = zlib.compressobj(wbits=-15)
    cblock = comp.compress(body) + comp.flush()
    payload = b"".join(
        [
            av.MAGIC,
            av._encode_long(2),
            av._encode_bytes(b"avro.schema"), av._encode_bytes(schema_json),
            av._encode_bytes(b"avro.codec"), av._encode_bytes(b"deflate"),
            av._encode_long(0),
            sync,
            av._encode_long(1),
            av._encode_long(len(cblock)),
            cblock,
            sync,
        ]
    )
    assert av.decode_container(payload) == _AVRO_RECS[0]
    assert av.decode_container(raw) == _AVRO_RECS[0]


def test_avro_datum_with_provided_schema(spark):
    """Provided-schema raw datums (ref schema-file deserializer,
    serialization.rs:280-289)."""
    from kafka_delta_ingest_spark.ingest import avro_decode as av
    from kafka_delta_ingest_spark.ingest.formats import deserialize_avro

    body = av._encode_datum(_AVRO_RECS[1], _AVRO_SCHEMA)
    df = spark.createDataFrame([(body,)], "bytes binary")
    out = deserialize_avro(df, json.dumps(_AVRO_SCHEMA), wire="datum").collect()
    assert json.loads(out[0]["value"]) == _AVRO_RECS[1]


def test_confluent_avro_end_to_end(spark):
    """Wire-format decode with an injected schema-id resolver (ref registry
    deserializers, serialization.rs:139-167 + 291-301; network lookup is
    one HTTP GET in real deployments)."""
    from kafka_delta_ingest_spark.ingest import avro_decode as av
    from kafka_delta_ingest_spark.ingest.formats import deserialize_confluent_avro

    body = av._encode_datum(_AVRO_RECS[0], _AVRO_SCHEMA)
    good = b"\x00" + (7).to_bytes(4, "big") + body
    unknown_id = b"\x00" + (9).to_bytes(4, "big") + body
    bad_magic = b"\x01" + (7).to_bytes(4, "big") + body
    df = spark.createDataFrame(
        [(good,), (unknown_id,), (bad_magic,)], "bytes binary"
    )
    resolver = {7: json.dumps(_AVRO_SCHEMA)}.__getitem__
    vals = [r["value"] for r in deserialize_confluent_avro(df, resolver).collect()]
    parsed = [json.loads(v) if v else None for v in vals]
    assert _AVRO_RECS[0] in parsed
    assert parsed.count(None) == 2  # unknown id + bad magic → DLQ


def test_confluent_json_end_to_end(spark):
    """JSON-via-schema-registry wire format (ref JsonDeserializer::
    from_schema_registry, serialization.rs:244-293): framed UTF-8 JSON
    body, registry id consulted per distinct id, bad magic / unknown id →
    null value → DLQ — mirroring the registry cases of the reference's
    tests/deserialization_tests.rs."""
    from kafka_delta_ingest_spark.ingest.formats import (
        deserialize_confluent_json,
    )

    body = json.dumps({"id": 1, "name": "alice"}).encode()
    good = b"\x00" + (7).to_bytes(4, "big") + body
    unknown_id = b"\x00" + (9).to_bytes(4, "big") + body
    bad_magic = b"\x01" + (7).to_bytes(4, "big") + body
    df = spark.createDataFrame(
        [(good,), (unknown_id,), (bad_magic,)], "bytes binary"
    )
    resolver = {7: json.dumps({"type": "object"})}.__getitem__
    vals = [
        r["value"] for r in deserialize_confluent_json(df, resolver).collect()
    ]
    parsed = [json.loads(v) if v else None for v in vals]
    assert {"id": 1, "name": "alice"} in parsed
    assert parsed.count(None) == 2  # unknown id + bad magic → DLQ
    # resolver-less mode: frame strip only, bad magic still dead-letters
    vals2 = [r["value"] for r in deserialize_confluent_json(df).collect()]
    assert [v is not None for v in vals2].count(True) == 2
    # the registry client itself plugs in as the resolver
    from kafka_delta_ingest_spark.ingest.formats import SchemaRegistryClient

    client = SchemaRegistryClient(
        "http://registry.example:8081",
        opener=lambda url, headers: json.dumps(
            {"schema": json.dumps({"type": "object"})}
        ).encode(),
    )
    out = deserialize_confluent_json(spark.createDataFrame(
        [(good,)], "bytes binary"), client).collect()
    assert json.loads(out[0]["value"]) == {"id": 1, "name": "alice"}


def test_make_deserializer_factory(spark, tmp_path):
    """(format, schema source) -> deserializer keying mirrors the
    reference factory (serialization.rs:21-53): plain/gzip JSON,
    registry JSON, container Avro, schema-file Avro, registry Avro —
    each round-trips one message through the returned transform."""
    import gzip as _gzip

    from kafka_delta_ingest_spark.ingest import avro_decode as av
    from kafka_delta_ingest_spark.ingest.formats import make_deserializer

    rec = {"id": 42, "name": "zed"}

    def run(deser_payload, raw: bytes):
        deser, payload = deser_payload
        col = "bytes" if payload == "binary" else "value"
        df = spark.createDataFrame([(raw,)], f"{col} binary")
        if payload == "string":
            df = df.select(F.col(col).cast("string").alias(col))
            out = deser(df, col).collect() if col == "bytes" else deser(
                df, "value").collect()
        else:
            out = deser(df).collect()
        return json.loads(out[0]["value"])

    # plain JSON (string payload — no transform beyond cast)
    d, payload = make_deserializer("json")
    assert payload == "string"
    # gzip JSON
    d, payload = make_deserializer("json", gzip_payloads=True)
    assert payload == "binary"
    assert run((d, payload), _gzip.compress(json.dumps(rec).encode())) == rec
    # registry JSON (framed)
    resolver = {7: json.dumps({"type": "object"})}.__getitem__
    d, payload = make_deserializer(
        "json", "http://reg:8081", resolver=resolver
    )
    framed = b"\x00" + (7).to_bytes(4, "big") + json.dumps(rec).encode()
    assert run((d, payload), framed) == rec
    # container Avro (embedded schema)
    from kafka_delta_ingest_spark.ingest.avro_decode import encode_container

    body = encode_container([_AVRO_RECS[0]], _AVRO_SCHEMA)
    d, payload = make_deserializer("avro")
    assert run((d, payload), body) == _AVRO_RECS[0]
    # schema-file Avro datums
    sf = tmp_path / "schema.avsc"
    sf.write_text(json.dumps(_AVRO_SCHEMA))
    datum = av._encode_datum(_AVRO_RECS[1], _AVRO_SCHEMA)
    d, payload = make_deserializer("avro", str(sf))
    assert run((d, payload), datum) == _AVRO_RECS[1]
    # registry Avro (Confluent wire)
    d, payload = make_deserializer(
        "avro", "http://reg:8081",
        resolver={7: json.dumps(_AVRO_SCHEMA)}.__getitem__,
    )
    wired = b"\x00" + (7).to_bytes(4, "big") + datum
    assert run((d, payload), wired) == _AVRO_RECS[1]
    with pytest.raises(ValueError):
        make_deserializer("protobuf")


def test_schema_registry_client_transport_and_cache():
    """Full REST client against a fake transport: URL shape, auth header,
    envelope parse, memoization, and rejection paths — everything but the
    socket (ref serialization.rs:229-294 → GET /schemas/ids/{id})."""
    import pytest as _pytest

    from kafka_delta_ingest_spark.ingest.formats import SchemaRegistryClient

    calls = []

    def opener(url, headers):
        calls.append((url, headers))
        if url.endswith("/99"):
            return json.dumps({"error_code": 40403, "message": "not found"}).encode()
        return json.dumps({"schema": json.dumps(_AVRO_SCHEMA)}).encode()

    c = SchemaRegistryClient(
        "http://registry.example:8081/", auth=("user", "pass"), opener=opener
    )
    s = c.schema_by_id(7)
    assert json.loads(s) == _AVRO_SCHEMA
    assert calls[0][0] == "http://registry.example:8081/schemas/ids/7"
    assert calls[0][1]["Authorization"].startswith("Basic ")
    # memoized: second lookup of the same id makes no HTTP call
    assert c(7) == s and len(calls) == 1
    with _pytest.raises(ValueError):
        c.schema_by_id(99)  # envelope without 'schema'
    with _pytest.raises(ValueError):
        c.schema_by_id(-1)


def test_confluent_avro_with_registry_client(spark):
    """deserialize_confluent_avro accepts the client itself as resolver —
    the production wiring, minus the socket."""
    from kafka_delta_ingest_spark.ingest import avro_decode as av
    from kafka_delta_ingest_spark.ingest.formats import (
        SchemaRegistryClient,
        deserialize_confluent_avro,
    )

    body = av._encode_datum(_AVRO_RECS[0], _AVRO_SCHEMA)
    msg = b"\x00" + (7).to_bytes(4, "big") + body
    df = spark.createDataFrame([(msg,)], "bytes binary")
    client = SchemaRegistryClient(
        "http://registry.example:8081",
        opener=lambda url, headers: json.dumps(
            {"schema": json.dumps(_AVRO_SCHEMA)}
        ).encode(),
    )
    vals = [r["value"] for r in deserialize_confluent_avro(df, client).collect()]
    assert json.loads(vals[0]) == _AVRO_RECS[0]


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

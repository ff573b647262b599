"""Minimal pure-Python Avro binary decoder.

Covers what the reference's deserializers consume
(/root/reference/src/serialization.rs:127-294, tested in
tests/deserialization_tests.rs:37-292): Object Container Files (embedded
writer schema, null/deflate codecs, first record — the reference's
``reader.next()`` takes one record per message) and raw datums with a
provided schema (the schema-file and schema-registry variants). This
container has neither the spark-avro jar nor fastavro, so the decoder is
hand-rolled against the public Avro 1.11 spec; it runs inside an
Arrow-batched pandas UDF (ingest/formats.py) — per-message CPU work that
would be Python-side under fastavro too.

Decoded values are JSON-shaped (dict/list/str/int/float/bool/None):
``bytes``/``fixed`` decode to a list of ints, matching apache_avro's
``Value -> serde_json::Value`` conversion the reference applies; enums
become their symbol string; unions collapse to the branch value.
"""

from __future__ import annotations

import json
import struct
import zlib
from typing import Any

_PRIMITIVES = {"null", "boolean", "int", "long", "float", "double", "bytes", "string"}

MAGIC = b"Obj\x01"


class AvroDecodeError(ValueError):
    pass


class _Reader:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes, pos: int = 0):
        self.buf = buf
        self.pos = pos

    def read(self, n: int) -> bytes:
        b = self.buf[self.pos : self.pos + n]
        if len(b) != n:
            raise AvroDecodeError(f"truncated: wanted {n} bytes at {self.pos}")
        self.pos += n
        return b

    def read_long(self) -> int:
        """Zigzag varint (Avro int and long share the encoding)."""
        n = shift = 0
        while True:
            b = self.buf[self.pos] if self.pos < len(self.buf) else None
            if b is None:
                raise AvroDecodeError("truncated varint")
            self.pos += 1
            n |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        return (n >> 1) ^ -(n & 1)

    def at_end(self) -> bool:
        return self.pos >= len(self.buf)


def _fullname(name: str, namespace: str | None) -> str:
    if "." in name or not namespace:
        return name
    return f"{namespace}.{name}"


def collect_names(schema: Any, namespace: str | None, names: dict[str, Any]) -> None:
    """Pre-register named types (record/enum/fixed) so later by-name
    references resolve."""
    if isinstance(schema, list):
        for s in schema:
            collect_names(s, namespace, names)
        return
    if not isinstance(schema, dict):
        return
    t = schema.get("type")
    ns = schema.get("namespace", namespace)
    if t in ("record", "error", "enum", "fixed") and "name" in schema:
        names[_fullname(schema["name"], ns)] = schema
        # bare name also resolves within the same document (common usage)
        names.setdefault(schema["name"], schema)
    if t in ("record", "error"):
        for f in schema.get("fields", []):
            collect_names(f.get("type"), ns, names)
    elif t == "array":
        collect_names(schema.get("items"), ns, names)
    elif t == "map":
        collect_names(schema.get("values"), ns, names)
    elif isinstance(t, (dict, list)):
        collect_names(t, ns, names)


def parse_schema(schema_json: str | dict | list) -> tuple[Any, dict[str, Any]]:
    schema = (
        json.loads(schema_json) if isinstance(schema_json, str) else schema_json
    )
    names: dict[str, Any] = {}
    collect_names(schema, None, names)
    return schema, names


def decode_datum(r: _Reader, schema: Any, names: dict[str, Any]) -> Any:
    # named-type / primitive references as bare strings
    if isinstance(schema, str):
        if schema in _PRIMITIVES:
            return _decode_primitive(r, schema)
        if schema in names:
            return decode_datum(r, names[schema], names)
        raise AvroDecodeError(f"unknown type reference: {schema}")
    if isinstance(schema, list):  # union: long index, then branch
        idx = r.read_long()
        if not 0 <= idx < len(schema):
            raise AvroDecodeError(f"union index {idx} out of range")
        return decode_datum(r, schema[idx], names)
    t = schema["type"]
    if isinstance(t, (dict, list)):  # e.g. {"type": {"type": "array", ...}}
        return decode_datum(r, t, names)
    if t in _PRIMITIVES:
        return _decode_primitive(r, t)
    if t in ("record", "error"):
        return {
            f["name"]: decode_datum(r, f["type"], names)
            for f in schema["fields"]
        }
    if t == "enum":
        idx = r.read_long()
        symbols = schema["symbols"]
        if not 0 <= idx < len(symbols):
            raise AvroDecodeError(f"enum index {idx} out of range")
        return symbols[idx]
    if t == "array":
        out = []
        while True:
            count = r.read_long()
            if count == 0:
                return out
            if count < 0:  # block with byte size prefix
                count = -count
                r.read_long()  # block size in bytes (skippable info)
            for _ in range(count):
                out.append(decode_datum(r, schema["items"], names))
    if t == "map":
        out: dict[str, Any] = {}
        while True:
            count = r.read_long()
            if count == 0:
                return out
            if count < 0:
                count = -count
                r.read_long()
            for _ in range(count):
                k = _decode_primitive(r, "string")
                out[k] = decode_datum(r, schema["values"], names)
    if t == "fixed":
        return list(r.read(schema["size"]))
    raise AvroDecodeError(f"unsupported avro type: {t}")


def _decode_primitive(r: _Reader, t: str) -> Any:
    if t == "null":
        return None
    if t == "boolean":
        return r.read(1) != b"\x00"
    if t in ("int", "long"):
        return r.read_long()
    if t == "float":
        return struct.unpack("<f", r.read(4))[0]
    if t == "double":
        return struct.unpack("<d", r.read(8))[0]
    if t == "bytes":
        return list(r.read(r.read_long()))
    if t == "string":
        return r.read(r.read_long()).decode("utf-8")
    raise AvroDecodeError(f"unknown primitive: {t}")


def decode_datum_bytes(payload: bytes, schema_json: str | dict) -> Any:
    """Decode one raw Avro datum (no container framing) — the body of a
    Confluent wire-format message, with the registry/provided schema."""
    schema, names = parse_schema(schema_json)
    return decode_datum(_Reader(bytes(payload)), schema, names)


def decode_container(payload: bytes) -> Any:
    """Decode the FIRST record of an Avro Object Container File using its
    embedded writer schema — the reference's one-record-per-message stance
    (serialization.rs:178-186: ``if let Some(r) = reader.next()``).
    Returns None for a container with zero records (EmptyPayload)."""
    r = _Reader(bytes(payload))
    if r.read(4) != MAGIC:
        raise AvroDecodeError("not an Avro object container file (bad magic)")
    meta_schema = {"type": "map", "values": "bytes"}
    meta = decode_datum(r, meta_schema, {})
    codec = bytes(meta.get("avro.codec", list(b"null"))).decode()
    schema, names = parse_schema(bytes(meta["avro.schema"]).decode("utf-8"))
    sync = r.read(16)
    while not r.at_end():
        n_records = r.read_long()
        block_len = r.read_long()
        block = r.read(block_len)
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        elif codec != "null":
            raise AvroDecodeError(f"unsupported codec: {codec}")
        if r.read(16) != sync:
            raise AvroDecodeError("sync marker mismatch")
        if n_records > 0:
            return decode_datum(_Reader(block), schema, names)
    return None


def encode_container(records: list[dict], schema_json: str | dict) -> bytes:
    """Tiny OCF encoder (null codec) — test fixture generation only; the
    engine never writes Avro."""
    schema = (
        json.loads(schema_json) if isinstance(schema_json, str) else schema_json
    )
    body = b"".join(_encode_datum(rec, schema) for rec in records)
    sync = b"\x00" * 16
    out = [MAGIC]
    meta = {"avro.schema": json.dumps(schema).encode(), "avro.codec": b"null"}
    out.append(_encode_long(len(meta)))
    for k, v in meta.items():
        out.append(_encode_bytes(k.encode()))
        out.append(_encode_bytes(v))
    out.append(_encode_long(0))  # end of map
    out.append(sync)
    out.append(_encode_long(len(records)))
    out.append(_encode_long(len(body)))
    out.append(body)
    out.append(sync)
    return b"".join(out)


def _encode_long(n: int) -> bytes:
    n = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _encode_bytes(b: bytes) -> bytes:
    return _encode_long(len(b)) + b


def _encode_datum(v: Any, schema: Any) -> bytes:
    """Encoder for the subset used in tests: records of primitives, arrays,
    maps, nullable unions, enums."""
    if isinstance(schema, str):
        t = schema
    elif isinstance(schema, list):
        for i, branch in enumerate(schema):
            bt = branch if isinstance(branch, str) else branch.get("type")
            if (v is None) == (bt == "null"):
                return _encode_long(i) + _encode_datum(v, branch)
        raise AvroDecodeError("no matching union branch")
    else:
        t = schema["type"]
    if t == "null":
        return b""
    if t == "boolean":
        return b"\x01" if v else b"\x00"
    if t in ("int", "long"):
        return _encode_long(int(v))
    if t == "float":
        return struct.pack("<f", float(v))
    if t == "double":
        return struct.pack("<d", float(v))
    if t == "string":
        return _encode_bytes(str(v).encode("utf-8"))
    if t == "bytes":
        return _encode_bytes(bytes(v))
    if t in ("record", "error"):
        return b"".join(_encode_datum(v[f["name"]], f["type"]) for f in schema["fields"])
    if t == "enum":
        return _encode_long(schema["symbols"].index(v))
    if t == "array":
        if not v:
            return _encode_long(0)
        return (
            _encode_long(len(v))
            + b"".join(_encode_datum(x, schema["items"]) for x in v)
            + _encode_long(0)
        )
    if t == "map":
        if not v:
            return _encode_long(0)
        return (
            _encode_long(len(v))
            + b"".join(
                _encode_bytes(k.encode()) + _encode_datum(x, schema["values"])
                for k, x in v.items()
            )
            + _encode_long(0)
        )
    if t == "fixed":
        return bytes(v)
    raise AvroDecodeError(f"encoder: unsupported type {t}")

"""Distributed scan-equality verification — the token-array-equality
invariant (BASELINE.json input_hint; reference idiom: read back *all* rows
and compare, /root/reference/tests/helpers/mod.rs:388-452).

At 10^12 rows you cannot collect-and-compare, so equality is checked with
an order-insensitive *commutative* content fingerprint: per-row
xxhash64(doc_id, order-sensitive token checksum, n_tok, source), reduced
with sum + count + xor-ish bit mix. Two scans are equal iff fingerprints
match (up to hash collision, ~2^-64). Fully distributed: one aggregation,
no shuffle beyond the final reduce."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_delta_ingest_spark.functions.scalars import token_checksum


def content_fingerprint(df: DataFrame, key_cols: list[str] | None = None) -> dict:
    """Commutative fingerprint over the whole DataFrame.

    For the tokens schema, hashes (doc_id, token_checksum, n_tok, source).
    For arbitrary schemas pass key_cols; arrays are checksummed, everything
    else hashed directly.
    """
    cols = []
    names = key_cols or [f.name for f in df.schema.fields]
    for f in df.schema.fields:
        if f.name not in names:
            continue
        if str(f.dataType).startswith("ArrayType(IntegerType") or str(
            f.dataType
        ).startswith("ArrayType(LongType"):
            cols.append(token_checksum(F.col(f.name)))
            cols.append(F.size(F.col(f.name)))
        else:
            cols.append(F.col(f.name))
    row_h = F.xxhash64(*cols)
    # decimal(38) sum never overflows below ~10^19 rows; bit_xor is exact
    agg = df.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(row_h.cast("decimal(38,0)")).alias("hsum"),
        F.bit_xor(row_h).alias("hxor"),
        F.min(row_h).alias("hmin"),
        F.max(row_h).alias("hmax"),
    ).collect()[0]
    return {
        "n": agg["n"] or 0,
        "hsum": str(agg["hsum"] or 0),
        "hxor": agg["hxor"],
        "hmin": agg["hmin"],
        "hmax": agg["hmax"],
    }


def scans_equal(a: DataFrame, b: DataFrame, key_cols: list[str] | None = None) -> bool:
    return content_fingerprint(a, key_cols) == content_fingerprint(b, key_cols)

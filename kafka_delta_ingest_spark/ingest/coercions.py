"""Schema-on-write type coercion — the CoercionTree recast on Spark's
VariantType (/root/reference/src/coercions.rs:30-142).

Reference semantics reproduced exactly (golden tests coercions.rs:314-447):

- **string fields**: non-string JSON values are serialized to JSON text
  (object → ``{"a":1}``, number → ``"5"``); strings pass through.
  Spark's ``try_variant_get(v, path, "string")`` has precisely this
  behavior (objects/arrays serialize, scalars stringify, strings pass).
- **timestamp fields**: only RFC-3339 strings coerce to epoch **micros**
  (``Z``, ``+00:00``, ``-00:00`` offsets); ``20211111T22115800Z`` (ISO
  not RFC), ``"2021-11-11 22:11:58"`` (Java style), numeric strings and
  garbage stay uncoerced (→ null in the typed column → dead letter).
  Numbers pass through as micros ("won't coerce it, but it will work
  anyway").
- the tree recurses through **structs**, **arrays of primitives** and
  **arrays of structs** (coercions.rs:49-63); unsupported types are left
  alone.

Everything is Catalyst expressions over one ``parse_json`` column — JVM
vectorized, zero per-row Python."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# chrono's DateTime::from_str = strict RFC 3339 (ref coercions.rs:125-142)
RFC3339_RE = (
    r"^\d{4}-\d{2}-\d{2}[Tt]\d{2}:\d{2}:\d{2}(\.\d+)?([Zz]|[+-]\d{2}:\d{2})$"
)

_SIMPLE_DDL = {
    T.IntegerType: "int",
    T.LongType: "long",
    T.ShortType: "short",
    T.ByteType: "tinyint",
    T.FloatType: "float",
    T.DoubleType: "double",
    T.BooleanType: "boolean",
}


def _ts_from_variant(v: Column) -> Column:
    """Variant → epoch-micros long under reference timestamp rules."""
    typ = F.schema_of_variant(v)
    s = F.try_variant_get(v, "$", "string")
    return (
        F.when(typ.isin("BIGINT", "INT", "SMALLINT", "TINYINT"), F.try_variant_get(v, "$", "long"))
        .when(
            (typ == "STRING") & s.rlike(RFC3339_RE),
            F.unix_micros(F.try_to_timestamp(s)),
        )
        .otherwise(F.lit(None).cast("long"))
    )


def _from_variant(v: Column, dtype: T.DataType) -> Column:
    if isinstance(dtype, T.StringType):
        return F.try_variant_get(v, "$", "string")
    if isinstance(dtype, T.TimestampType):
        return F.timestamp_micros(_ts_from_variant(v))
    if type(dtype) in _SIMPLE_DDL:
        return F.try_variant_get(v, "$", _SIMPLE_DDL[type(dtype)])
    if isinstance(dtype, T.StructType):
        fields = [
            _from_variant(F.try_variant_get(v, f"$.{f.name}", "variant"), f.dataType).alias(
                f.name
            )
            for f in dtype.fields
        ]
        return F.when(v.isNull(), F.lit(None).cast(dtype)).otherwise(F.struct(*fields))
    if isinstance(dtype, T.ArrayType):
        arr = F.try_variant_get(v, "$", "array<variant>")
        return F.transform(arr, lambda e: _from_variant(e, dtype.elementType))
    # unsupported (map/decimal/...) — reference returns None for these
    # (coercions.rs:64): leave as serialized JSON string cast attempt
    return F.try_variant_get(v, "$", "string").cast(dtype)


def coerce_json(
    df: DataFrame,
    schema: T.StructType,
    json_col: str = "value",
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Parse a JSON-string column and coerce to ``schema``.

    Output columns: one typed column per schema field, plus
    ``_coercion_errors: array<string>`` naming top-level fields that were
    present in the JSON but failed to produce a typed value (the rows the
    reference would quarantine at parquet-write time,
    src/writer.rs:617-637) and ``_raw`` (the original JSON for DLQ rows).
    """
    v = F.try_parse_json(F.col(json_col))
    out_cols = []
    err_entries = []
    for f in schema.fields:
        fv = F.try_variant_get(v, f"$.{f.name}", "variant")
        typed = _from_variant(fv, f.dataType).alias(f.name)
        out_cols.append(typed)
        err_entries.append(
            F.when(
                fv.isNotNull() & _from_variant(fv, f.dataType).isNull(),
                F.lit(f.name),
            )
        )
    undecodable = F.when(
        v.isNull() & F.col(json_col).isNotNull(), F.lit("deserialization")
    )
    errs = F.array_compact(F.array(*err_entries, undecodable)).alias("_coercion_errors")
    keep = [F.col(c) for c in (keep_cols or [])]
    return df.select(*keep, *out_cols, errs, F.col(json_col).alias("_raw"))

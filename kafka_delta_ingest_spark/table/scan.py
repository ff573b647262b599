"""Multi-commit-dir file reading.

Spark's hive partition *discovery* demands a single base directory, but a
snapshot's live files span many per-commit dirs (``data/<uuid>/source=X/``)
— exactly like Delta, we therefore never rely on discovery: data files are
read with the **data-only schema** and partition columns are reconstructed
from the ``k=v`` path segments recorded at write time (the inverse of the
reference's divide_by_partition_values path construction,
/root/reference/src/writer.rs:503-542, incl. the
``__HIVE_DEFAULT_PARTITION__`` null marker, src/writer.rs:43).

The extraction is a codegen'd ``regexp_extract(input_file_name())`` — no
Python, no join, works for any number of commit dirs."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_delta_ingest_spark.table.format import HIVE_DEFAULT_PARTITION


def read_files(
    spark: SparkSession,
    paths: list[str],
    schema: T.StructType,
    partition_cols: list[str],
    file_path_col: str | None = None,
    predicate=None,
    row_index_col: str | None = None,
) -> DataFrame:
    """Read explicit parquet leaf files as the full table schema.

    ``file_path_col``: optionally append the normalized source-file path
    (scheme stripped) — used by per-file stats and bin assignment.

    ``predicate`` (a Column over data columns) is applied *before* the
    partition-column reconstruction: ``input_file_name`` is nondeterministic,
    so a filter placed after it cannot push into the parquet scan — placed
    here it reaches PushedFilters. Predicates referencing partition columns
    fall back to post-reconstruction filtering (caller re-applies)."""
    if not paths:
        out = spark.createDataFrame([], schema)
        if file_path_col:
            out = out.withColumn(file_path_col, F.lit(None).cast("string"))
        if row_index_col:
            out = out.withColumn(row_index_col, F.lit(None).cast("long"))
        return out
    pset = set(partition_cols)
    data_schema = T.StructType([f for f in schema.fields if f.name not in pset])
    df = spark.read.schema(data_schema).parquet(*paths)
    if predicate is not None:
        try:
            df = df.filter(predicate)
        except Exception:  # noqa: BLE001 — references partition cols; skip
            pass
    for f in schema.fields:
        if f.name not in pset:
            continue
        seg = F.regexp_extract(F.input_file_name(), re.escape(f.name) + "=([^/]+)", 1)
        # protect literal '+' before url_decode (form-decoding maps + to space)
        raw = F.url_decode(F.regexp_replace(seg, r"\+", "%2B"))
        val = (
            F.when(raw == HIVE_DEFAULT_PARTITION, F.lit(None))
            .when(raw == "", F.lit(None))
            .otherwise(raw)
            .cast(f.dataType)
        )
        df = df.withColumn(f.name, val)
    cols = [f.name for f in schema.fields]
    if file_path_col:
        df = df.withColumn(file_path_col, _decoded_file_path())
        cols.append(file_path_col)
    if row_index_col:
        # row position within the source parquet file (stable under
        # predicate pushdown) — the anchor for position deletes
        df = df.withColumn(row_index_col, F.col("_metadata.row_index"))
        cols.append(row_index_col)
    return df.select(*cols)


def read_files_applying_deletes(
    spark: SparkSession,
    root: str,
    file_entries,
    delete_entries,
    schema: T.StructType,
    partition_cols: list[str],
    file_path_col: str | None = None,
    predicate=None,
    row_index_col: str | None = None,
) -> DataFrame:
    """Read live data files with position deletes (merge-on-read) applied.

    Files NOT covered by any delete entry take the plain path — zero cost
    on the hot path, which at 10^12 rows is almost every file. Covered
    files are read with their parquet row index and anti-joined against
    the (data_path, pos) delete rows; the delete side is broadcast when
    small (the common case: point deletes), otherwise a shuffled join —
    at which point ``rewrite_position_deletes`` is the cure, and the
    maintenance advisor recommends it."""
    covered_paths = {p for de in delete_entries for p in de.counts}
    covered = [fe for fe in file_entries if fe.path in covered_paths]
    plain = [fe for fe in file_entries if fe.path not in covered_paths]

    parts: list[DataFrame] = []
    if plain or not covered:
        parts.append(
            read_files(
                spark,
                [f"{root}/{fe.path}" for fe in plain],
                schema,
                partition_cols,
                file_path_col=file_path_col,
                predicate=predicate,
                row_index_col=row_index_col,
            )
        )
    if covered:
        cov_set = {fe.path for fe in covered}
        relevant = [de for de in delete_entries if cov_set & de.counts.keys()]
        df = read_files(
            spark,
            [f"{root}/{fe.path}" for fe in covered],
            schema,
            partition_cols,
            file_path_col="_kdi_abs",
            predicate=predicate,
            row_index_col="_kdi_pos",
        )
        dl = spark.read.schema("data_path string, pos long").parquet(
            *[f"{root}/{de.path}" for de in relevant]
        )
        n_del = sum(
            n for de in relevant for p, n in de.counts.items() if p in cov_set
        )
        if n_del <= 4_000_000:
            dl = F.broadcast(dl)
        # manifest paths are table-root-relative; strip "<root>/" from the
        # scan's absolute decoded path (fixed-width prefix, plain substring)
        rel = F.expr(f"substring(_kdi_abs, {len(root) + 2})")
        out = df.join(
            dl, (rel == dl["data_path"]) & (df["_kdi_pos"] == dl["pos"]),
            "left_anti",
        )
        if file_path_col:
            out = out.withColumnRenamed("_kdi_abs", file_path_col)
        else:
            out = out.drop("_kdi_abs")
        if row_index_col:
            out = out.withColumnRenamed("_kdi_pos", row_index_col)
        else:
            out = out.drop("_kdi_pos")
        parts.append(out)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _decoded_file_path():
    """``input_file_name()`` as a plain filesystem path: scheme stripped and
    percent-escapes decoded, so it joins cleanly against paths built with
    ``os.path.join(table.root, ...)`` even when the path contains characters
    Spark URL-encodes (spaces, '=', unicode). Literal '+' is protected first
    — ``url_decode`` is form-decoding and would turn it into a space."""
    raw = F.regexp_replace(F.input_file_name(), "^file:/+", "/")
    return F.url_decode(F.regexp_replace(raw, r"\+", "%2B"))

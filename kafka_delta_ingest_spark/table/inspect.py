"""Table inspection surfaces: incremental (CDC-style) append scan between
versions, and the ``files`` / ``history`` metadata tables as DataFrames.

Incremental scan semantics (Iceberg ``appendsBetween`` analogue, and the
batch form of the reference's resume-from-offset reads — a consumer that
has processed the table up to version ``v`` asks "what rows were appended
since?" exactly like a Kafka consumer seeking its stored offset,
/root/reference/src/lib.rs:1026-1046):

- Only commits with ``data_change=True`` contribute. Pure rewrites
  (compaction, clustering, manifest rewrite) reshuffle bytes without
  changing table contents, so they are *skipped* — the appended rows are
  read from the files of their ORIGINAL append commits, which stay on
  disk for pinned readers until snapshot expiry + GC.
- A ``data_change=True`` commit that also removes files (DELETE, UPDATE,
  MERGE) cannot be expressed as an append-only delta; the scan raises
  ``IncrementalScanError`` (same contract as Iceberg's incremental append
  scan rejecting overwrite snapshots).

Metadata tables are driver-assembled from the manifest (a few thousand
entries at most per million data files — the same scale every planner in
``maintenance/`` already handles) and returned as real DataFrames so
users can join/aggregate them with Spark, e.g. files-per-partition
skew reports or stats-coverage audits, without touching data bytes.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from kafka_delta_ingest_spark.table.format import (
    HIVE_DEFAULT_PARTITION,
    FileEntry,
    Table,
    TableError,
)


class IncrementalScanError(TableError):
    """The requested version range contains a non-append data change."""


def incremental_scan(
    spark: SparkSession,
    table: Table,
    from_version: int,
    to_version: int | None = None,
    columns: list[str] | None = None,
) -> DataFrame:
    """Rows appended in versions ``(from_version, to_version]``.

    Reads only the data files added by append commits in the range — a
    consumer processing the table incrementally never rescans history,
    and an interleaved compaction/cluster/manifest rewrite is invisible
    (data_change=False ⇒ contents unchanged). Raises
    ``IncrementalScanError`` on DELETE/UPDATE/MERGE commits in range.
    """
    head = table.latest_version()
    if to_version is None:
        to_version = head
    if not (0 <= from_version <= to_version <= head):
        raise ValueError(
            f"invalid range ({from_version}, {to_version}] for head {head}"
        )
    snap = table.snapshot(to_version)  # schema as of to_version
    paths: list[str] = []
    entries: list = []
    for v in range(from_version + 1, to_version + 1):
        c = table._read_commit(v)
        if not c.get("data_change", True):
            continue  # pure rewrite: no content delta
        if c.get("remove"):
            raise IncrementalScanError(
                f"version {v} ({c.get('operation')}) removes files; the "
                "range is not expressible as an append-only delta"
            )
        if c.get("add_delete"):
            raise IncrementalScanError(
                f"version {v} ({c.get('operation')}) adds position deletes "
                "(merge-on-read DELETE); the range is not expressible as "
                "an append-only delta"
            )
        for a in c.get("add", []):
            fe = FileEntry.from_json(a)
            if fe.seq is None:
                fe.seq = v
            entries.append(fe)
            paths.append(os.path.join(table.root, a["path"]))
    missing = [p for p in paths if not os.path.exists(p)]
    if missing:
        raise IncrementalScanError(
            f"{len(missing)} appended files already garbage-collected, "
            f"e.g. {missing[:3]} — lower retain window or scan from a later version"
        )
    if not paths:
        df = spark.createDataFrame([], snap.schema)
        return df.select(*columns) if columns else df
    from kafka_delta_ingest_spark.table.scan import read_entries

    df = read_entries(spark, table.root, entries, snap.schema,
                      snap.partition_cols,
                      column_mapping=snap.column_mapping,
                      file_defaults=snap.defaults)
    return df.select(*columns) if columns else df


_FILES_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("size_bytes", T.LongType()),
        T.StructField("num_records", T.LongType()),
        T.StructField("partition", T.MapType(T.StringType(), T.StringType())),
        T.StructField("min_values", T.MapType(T.StringType(), T.StringType())),
        T.StructField("max_values", T.MapType(T.StringType(), T.StringType())),
        T.StructField("null_counts", T.MapType(T.StringType(), T.LongType())),
    ]
)


def files_df(spark: SparkSession, table: Table, version: int | None = None) -> DataFrame:
    """The ``files`` metadata table: one row per live data file at the
    pinned version, with size/rows/partition values and per-column
    min/max/null-count stats (stringified for a uniform map type, the
    same shape Iceberg's readable_metrics flattens from)."""
    snap = table.snapshot(version)
    rows = [
        (
            f.path,
            int(f.size),
            int(f.num_records),
            dict(f.partition_values),
            {k: _stat_str(v) for k, v in (f.stats.get("min") or {}).items()},
            {k: _stat_str(v) for k, v in (f.stats.get("max") or {}).items()},
            {k: int(v) for k, v in (f.stats.get("null_count") or {}).items()},
        )
        for f in snap.files
    ]
    return spark.createDataFrame(rows, _FILES_SCHEMA)


def _stat_str(v) -> str | None:
    if v is None:
        return None
    if isinstance(v, (dict, list)):
        return json.dumps(v, sort_keys=True)
    return str(v)


_HISTORY_SCHEMA = T.StructType(
    [
        T.StructField("version", T.LongType()),
        T.StructField("timestamp_ms", T.LongType()),
        T.StructField("operation", T.StringType()),
        T.StructField("n_add", T.LongType()),
        T.StructField("n_remove", T.LongType()),
        T.StructField("data_change", T.BooleanType()),
    ]
)


def history_df(spark: SparkSession, table: Table) -> DataFrame:
    """The ``history`` metadata table: one row per retained commit."""
    rows = [
        (
            int(h["version"]),
            int(h["timestamp_ms"]) if h.get("timestamp_ms") is not None else None,
            h.get("operation"),
            int(h["n_add"]),
            int(h["n_remove"]),
            bool(h["data_change"]),
        )
        for h in table.history()
    ]
    return spark.createDataFrame(rows, _HISTORY_SCHEMA)


_PARTITIONS_SCHEMA = T.StructType(
    [
        T.StructField("partition", T.MapType(T.StringType(), T.StringType())),
        T.StructField("spec", T.StringType()),
        T.StructField("file_count", T.LongType()),
        T.StructField("row_count", T.LongType()),
        T.StructField("total_bytes", T.LongType()),
        T.StructField("avg_file_bytes", T.LongType()),
    ]
)


def partitions_df(
    spark: SparkSession, table: Table, version: int | None = None
) -> DataFrame:
    """The ``partitions`` metadata table: per-partition file/row/byte
    rollup from manifests alone (Iceberg's partitions table). The first
    thing an operator looks at before scoped maintenance — which
    partitions are fragmented (low avg_file_bytes, high file_count) and
    how big a scoped OPTIMIZE would be. ``spec`` is the sorted key set the
    file was written under, so mixed-spec tables (partition evolution)
    group correctly instead of colliding."""
    snap = table.snapshot(version)
    agg: dict[tuple, list] = {}
    for f in snap.files:
        pv = {
            k: (None if v == HIVE_DEFAULT_PARTITION else str(v))
            for k, v in f.partition_values.items()
        }
        key = tuple(sorted(pv.items()))
        a = agg.setdefault(key, [0, 0, 0])
        a[0] += 1
        a[1] += int(f.num_records)
        a[2] += int(f.size)
    rows = [
        (
            dict(key),
            ",".join(k for k, _ in key),
            n, r, b, b // max(n, 1),
        )
        for key, (n, r, b) in sorted(agg.items())
    ]
    return spark.createDataFrame(rows, _PARTITIONS_SCHEMA)


def metadata_aggregate(
    spark: SparkSession,
    table: Table,
    columns: list[str],
    scope: "list[tuple[str, str, object]] | None" = None,
    version: int | None = None,
) -> DataFrame:
    """``count(*)`` / ``min`` / ``max`` / ``count(col)`` answered from
    manifest stats — zero data bytes read for files provably inside the
    predicate.

    The manifest's per-file ``num_records`` + min/max/null_count (written
    per ref src/writer.rs:655-707) make these aggregates a pure metadata
    fold over files *fully contained* in ``scope`` (every row provably
    matches: partition value equal, or min/max inside the range with zero
    nulls). Files that *straddle* the predicate boundary are scanned with
    the predicate pushed down; provably-disjoint files are pruned. At
    10^12 rows a partition-aligned predicate (the common case: per-day,
    per-source) makes every file 'inside' and the whole query is O(files)
    driver metadata — the difference between milliseconds and a cluster
    scan.

    Returns a 1-row DataFrame: ``cnt`` (count(*)), then per requested
    column ``min_<c>``, ``max_<c>``, ``cnt_<c>`` (non-null count), typed
    per the table schema. Raises under live merge-on-read deletes (counts
    and extrema are unknowable without a read — fold with
    ``rewrite_deletes`` first).
    """
    from pyspark.sql import functions as F

    from kafka_delta_ingest_spark.maintenance.dml import predicate_column
    from kafka_delta_ingest_spark.plans.pruning import split_files_by_predicate
    from kafka_delta_ingest_spark.table.format import HIVE_DEFAULT_PARTITION

    snap = table.snapshot(version)
    if snap.delete_entries:
        raise TableError(
            "metadata aggregate is exact only without live delete files; "
            "run rewrite-deletes to fold them first"
        )
    types = {f.name: f.dataType for f in snap.schema.fields}
    for c in columns:
        dt = types.get(c)
        if dt is None:
            raise ValueError(f"unknown column: {c}")
        if isinstance(dt, (T.ArrayType, T.MapType, T.StructType, T.BinaryType)):
            raise ValueError(f"min/max undefined for column type of {c!r}")

    inside, straddling = split_files_by_predicate(
        snap.files, scope or [], snap.schema
    )

    def _bounds(f, c):
        """(min_str, max_str, nonnull) for one inside-file, or None if the
        manifest can't answer for this column (demotes the file to a scan)."""
        if c in f.partition_values:
            pv = f.partition_values[c]
            if pv == HIVE_DEFAULT_PARTITION:
                return (None, None, 0)
            return (pv, pv, f.num_records)
        if c in f.stats.get("inexact", []):
            # truncated bound (stats.py truncate_string_stats): valid for
            # pruning, NOT an exact extremum — demote to a pushdown scan
            return None
        nulls = f.stats.get("null_count", {}).get(c)
        if nulls is None:
            return None
        nulls = int(nulls)
        if nulls >= f.num_records:
            return (None, None, 0)
        lo = f.stats.get("min", {}).get(c)
        hi = f.stats.get("max", {}).get(c)
        if lo is None or hi is None:
            return None
        return (str(lo), str(hi), f.num_records - nulls)

    meta_rows, demoted = [], []
    for f in inside:
        per_col = [_bounds(f, c) for c in columns]
        if any(b is None for b in per_col):
            demoted.append(f)
            continue
        row = [f.num_records]
        for lo, hi, nn in per_col:
            row += [lo, hi, nn]
        meta_rows.append(tuple(row))
    straddling = straddling + demoted

    meta_schema = T.StructType(
        [T.StructField("cnt", T.LongType())]
        + [
            fld
            for c in columns
            for fld in (
                T.StructField(f"min_{c}", T.StringType()),
                T.StructField(f"max_{c}", T.StringType()),
                T.StructField(f"cnt_{c}", T.LongType()),
            )
        ]
    )
    # strings → column types via Spark casts (ISO timestamps/dates, numerics,
    # booleans all round-trip; the same rendering footer_stats writes)
    parts = []
    if meta_rows:
        mdf = spark.createDataFrame(meta_rows, meta_schema)
        parts.append(
            mdf.select(
                F.col("cnt"),
                *[
                    e
                    for c in columns
                    for e in (
                        F.col(f"min_{c}").cast(types[c]).alias(f"min_{c}"),
                        F.col(f"max_{c}").cast(types[c]).alias(f"max_{c}"),
                        F.col(f"cnt_{c}"),
                    )
                ],
            ).groupBy().agg(
                F.sum("cnt").alias("cnt"),
                *[
                    e
                    for c in columns
                    for e in (
                        F.min(f"min_{c}").alias(f"min_{c}"),
                        F.max(f"max_{c}").alias(f"max_{c}"),
                        F.sum(f"cnt_{c}").alias(f"cnt_{c}"),
                    )
                ],
            )
        )
    if straddling:
        pred = predicate_column(list(scope)) if scope else None
        df = snap.read(spark, straddling, predicate=pred)
        if pred is not None:
            df = df.filter(pred)
        parts.append(
            df.groupBy().agg(
                F.count(F.lit(1)).alias("cnt"),
                *[
                    e
                    for c in columns
                    for e in (
                        F.min(c).alias(f"min_{c}"),
                        F.max(c).alias(f"max_{c}"),
                        F.count(c).alias(f"cnt_{c}"),
                    )
                ],
            )
        )
    if not parts:
        empty_schema = T.StructType(
            [T.StructField("cnt", T.LongType())]
            + [
                fld
                for c in columns
                for fld in (
                    T.StructField(f"min_{c}", types[c]),
                    T.StructField(f"max_{c}", types[c]),
                    T.StructField(f"cnt_{c}", T.LongType()),
                )
            ]
        )
        row = [0] + [None, None, 0] * len(columns)
        return spark.createDataFrame([tuple(row)], empty_schema)
    combined = parts[0]
    for p in parts[1:]:
        combined = combined.unionByName(p)
    return combined.groupBy().agg(
        F.sum("cnt").cast("long").alias("cnt"),
        *[
            e
            for c in columns
            for e in (
                F.min(f"min_{c}").alias(f"min_{c}"),
                F.max(f"max_{c}").alias(f"max_{c}"),
                F.sum(f"cnt_{c}").cast("long").alias(f"cnt_{c}"),
            )
        ],
    )

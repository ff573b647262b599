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

from kafka_delta_ingest_spark.table.format import Table, TableError


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
        paths.extend(os.path.join(table.root, a["path"]) for a in c.get("add", []))
    missing = [p for p in paths if not os.path.exists(p)]
    if missing:
        raise IncrementalScanError(
            f"{len(missing)} appended files already garbage-collected, "
            f"e.g. {missing[:3]} — lower retain window or scan from a later version"
        )
    if not paths:
        df = spark.createDataFrame([], snap.schema)
        return df.select(*columns) if columns else df
    from kafka_delta_ingest_spark.table.scan import read_files

    df = read_files(spark, paths, snap.schema, snap.partition_cols)
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

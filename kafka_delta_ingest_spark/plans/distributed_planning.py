"""Distributed scan planning — the manifest as data.

``plans/pruning.py`` evaluates file pruning in a driver-side Python loop
over materialized ``FileEntry`` objects. That is the right call up to
~10^5 files, but a 10^12-row table has millions of manifest entries and
the driver loop (and the Python object materialization feeding it)
becomes the planning bottleneck — exactly the failure mode Iceberg avoids
with distributed planning over manifest files. This module provides that
path over the SAME persisted metadata:

- checkpoints are already parquet (``table/format.py _write_checkpoint``,
  the analogue of the reference's try_create_checkpoint,
  src/delta_helpers.rs:42-58), so Spark executors read the collapsed
  manifest directly — the driver never parses those rows;
- only the post-checkpoint log tail (bounded by CHECKPOINT_INTERVAL
  commits, each a small JSON) is applied driver-side as add/remove
  deltas;
- pruning conjuncts compile to Catalyst expressions over the manifest
  DataFrame (JSON-extracted per-column min/max + recorded partition
  values, try_cast back to the column's logical type), mirroring the
  driver-side semantics of ``plans.pruning._may_match`` including its
  conservative keeps (missing/uncastable bound ⇒ keep, NaN bound ⇒ keep);
- hidden-partitioning transforms map source-column conjuncts to
  partition-key conjuncts exactly as the driver path does
  (``table/transforms.derived_conjuncts``).

Parity with the driver path is pytest-asserted file-for-file
(tests/test_distributed_planning.py); the planner is therefore safe to
switch on by file count.
"""

from __future__ import annotations

import json
import os
from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_delta_ingest_spark.plans.pruning import lit_str as _lit_str
from kafka_delta_ingest_spark.table.format import (
    HIVE_DEFAULT_PARTITION,
    Table,
)

_MANIFEST_DDL = (
    "path string, size bigint, num_records bigint, "
    "partition_values string, stats string, seq bigint"
)


def manifest_df(
    spark: SparkSession, table: Table, version: int | None = None
) -> DataFrame:
    """Live data-file manifest at ``version`` as a DataFrame with columns
    (path, size, num_records, partition_values JSON, stats JSON, seq) —
    checkpoint rows are scanned by executors, never parsed on the driver.

    Falls back to building the frame from the replayed log when no
    checkpoint exists at or before the version (young/small tables, where
    driver planning is fine anyway)."""
    head = table.latest_version()
    v = head if version is None else version
    ckpt = table._latest_checkpoint_at_or_before(v)
    if ckpt is None:
        snap = table.snapshot(v)
        rows = [
            (
                f.path,
                int(f.size),
                int(f.num_records),
                json.dumps(f.partition_values),
                json.dumps(f.stats),
                int(f.seq or 0),
            )
            for f in snap.files
        ]
        return spark.createDataFrame(rows, _MANIFEST_DDL)

    mdf = spark.read.parquet(table._checkpoint_path(ckpt))
    if "seq" not in mdf.columns:  # pre-seq checkpoint
        mdf = mdf.withColumn("seq", F.lit(0).cast("long"))
    mdf = mdf.select(
        "path", "size", "num_records", "partition_values", "stats", "seq"
    )

    # log tail: ≤ CHECKPOINT_INTERVAL small JSON commits, driver-side
    removed: set[str] = set()
    adds: dict[str, tuple] = {}
    for i in range(ckpt + 1, v + 1):
        c = table._read_commit(i)
        for rp in c.get("remove", []):
            removed.add(rp)
            adds.pop(rp, None)
        for a in c.get("add", []):
            adds[a["path"]] = (
                a["path"],
                int(a["size"]),
                int(a["num_records"]),
                json.dumps(a.get("partition_values", {})),
                json.dumps(a.get("stats", {})),
                # stamp the commit version only when the Add carries no
                # seq at all — an explicit seq (incl. 0, e.g. files from a
                # pre-seq checkpoint re-added by rollback) must survive
                # verbatim, exactly as Table.snapshot's replay keeps it,
                # or equality-delete applicability (file.seq < delete.seq)
                # diverges between the two planners
                int(a["seq"]) if a.get("seq") is not None else i,
            )
    if removed:
        mdf = mdf.where(~F.col("path").isin(sorted(removed)))
    if adds:
        mdf = mdf.unionByName(
            spark.createDataFrame(sorted(adds.values()), _MANIFEST_DDL)
        )
    return mdf


def _keep_condition(
    col: str, op: str, lit: Any, dt: T.DataType | None
) -> Column:
    """Catalyst mirror of plans.pruning._may_match for one conjunct:
    TRUE ⇔ the file may contain matching rows."""
    pv = F.get_json_object("partition_values", f"$.{col}")
    lo = F.get_json_object("stats", f"$.min.{col}")
    hi = F.get_json_object("stats", f"$.max.{col}")
    tname = dt.simpleString() if dt is not None else "string"
    if dt is not None and not isinstance(
        dt,
        (T.StringType, T.BooleanType, T.DateType, T.TimestampType,
         T.TimestampNTZType, T.ByteType, T.ShortType, T.IntegerType,
         T.LongType, T.FloatType, T.DoubleType, T.DecimalType),
    ):
        # arrays/structs/binary: never prune (no comparable stats)
        return F.lit(True)
    # exact total order across int/float/string renderings, matching the
    # driver's Decimal canonicalization (floats in stats render with ≤17
    # significant digits — well inside 38,6? no: use a wide decimal with
    # enough fraction digits for stat strings; overflow ⇒ NULL ⇒ keep)
    if isinstance(dt, (T.FloatType, T.DoubleType, T.DecimalType,
                       T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        tname = "decimal(38,15)"

    lits = list(lit) if op == "in" else [lit]
    lit_cols = [F.lit(_lit_str(x)).try_cast(tname) for x in lits]
    lo_t, hi_t, pv_t = (c.try_cast(tname) for c in (lo, hi, pv))

    def rng(lo_c: Column, hi_c: Column) -> Column:
        if op in ("=", "=="):
            return (lo_c <= lit_cols[0]) & (lit_cols[0] <= hi_c)
        if op == "in":
            cond = F.lit(False)
            for lc in lit_cols:
                cond = cond | ((lo_c <= lc) & (lc <= hi_c))
            return cond
        if op == "<":
            return lo_c < lit_cols[0]
        if op == "<=":
            return lo_c <= lit_cols[0]
        if op == ">":
            return hi_c > lit_cols[0]
        if op == ">=":
            return hi_c >= lit_cols[0]
        raise ValueError(f"unsupported pruning op: {op}")

    # conservative keeps: uncastable literal, missing/uncastable bounds
    any_lit_null = F.lit(False)
    for lc in lit_cols:
        any_lit_null = any_lit_null | lc.isNull()

    if op in ("=", "=="):
        pv_cond = pv == F.lit(_lit_str(lit))
    elif op == "in":
        pv_cond = pv.isin([_lit_str(x) for x in lits])
    else:
        # range op on a recorded partition value: typed compare when
        # possible, keep otherwise
        pv_cond = F.when(
            pv_t.isNull() | any_lit_null, F.lit(True)
        ).otherwise(rng(pv_t, pv_t))

    stats_cond = F.when(
        lo_t.isNull() | hi_t.isNull() | any_lit_null, F.lit(True)
    ).otherwise(rng(lo_t, hi_t))
    # mirror plans.pruning._may_match exactly: no recorded value ⇒ fall to
    # stats; __HIVE_DEFAULT_PARTITION__ (all rows NULL in the column) ⇒
    # prune — NULL fails every comparison conjunct
    return (
        F.when(pv.isNull(), stats_cond)
        .when(pv == F.lit(HIVE_DEFAULT_PARTITION), F.lit(False))
        .otherwise(pv_cond)
    )


def prune_manifest(
    mdf: DataFrame,
    conjuncts: list[tuple[str, str, Any]],
    schema: T.StructType | None = None,
    spec: list[str] | None = None,
) -> DataFrame:
    """Filter the manifest DataFrame to files that may match every
    conjunct — the distributed twin of ``plans.pruning.prune_files``."""
    if spec:
        from kafka_delta_ingest_spark.table import transforms

        conjuncts = list(conjuncts) + transforms.derived_conjuncts(
            spec, list(conjuncts)
        )
    out = mdf
    for col, op, lit in conjuncts:
        dt = None
        if schema is not None and col in schema.fieldNames():
            dt = schema[col].dataType
        out = out.where(_keep_condition(col, op, lit, dt))
    return out


def schema_and_spec(
    table: Table, version: int | None = None
) -> tuple[T.StructType, list[str]]:
    """The table schema + partition spec at ``version`` WITHOUT replaying
    the file list: parquet footer metadata of the covering checkpoint
    (a metadata-only read) plus any schema-bearing tail commits."""
    schema, spec, _cmap = schema_spec_mapping(table, version)
    return schema, spec


def schema_spec_mapping(
    table: Table, version: int | None = None
) -> "tuple[T.StructType, list[str], dict]":
    """schema + spec + column mapping (logical → physical) at ``version``,
    from checkpoint footer metadata and tail commits only."""
    schema, spec, cmap, _d = schema_spec_mapping_defaults(table, version)
    return schema, spec, cmap


def schema_spec_mapping_defaults(
    table: Table, version: int | None = None
) -> "tuple[T.StructType, list[str], dict, dict]":
    """schema + spec + column mapping + column defaults at ``version``,
    from checkpoint footer metadata and tail commits only."""
    import pyarrow.parquet as pq

    head = table.latest_version()
    v = head if version is None else version
    ckpt = table._latest_checkpoint_at_or_before(v)
    schema: T.StructType | None = None
    spec: list[str] = []
    cmap: dict = {}
    defaults: dict = {}
    start = 0
    if ckpt is not None:
        meta = json.loads(
            pq.read_schema(table._checkpoint_path(ckpt))
            .metadata[b"kdi_meta"].decode()
        )
        schema = T.StructType.fromJson(meta["schema"])
        spec = meta["partition_cols"]
        cmap = dict(meta.get("column_mapping", {}).get("map", {}))
        defaults = dict(meta.get("column_defaults", {}))
        start = ckpt + 1
    for i in range(start, v + 1):
        c = table._read_commit(i)
        if "metadata" in c and c["metadata"].get("schema"):
            schema = T.StructType.fromJson(c["metadata"]["schema"])
            spec = c["metadata"].get("partition_cols", [])
        if "metadata" in c and "column_mapping" in c["metadata"]:
            cmap = dict(c["metadata"]["column_mapping"].get("map", {}))
        if "metadata" in c and "column_defaults" in c["metadata"]:
            defaults = dict(c["metadata"]["column_defaults"])
    if schema is None:
        raise ValueError(f"no schema found for version {v}")
    return schema, spec, cmap, defaults


def delete_entries_at(table: Table, version: int | None = None) -> list:
    """Delete entries (position + equality) at ``version`` reconstructed
    from checkpoint metadata + the log tail, without replaying the file
    list. CONSERVATIVE: the liveness prunes ``Table.snapshot`` performs
    (dropping entries whose covered/intersecting files are all gone) are
    skipped because they need the full live set — a retained dead entry is
    a no-op at read time (its anti-join matches nothing), never a
    correctness issue."""
    from kafka_delta_ingest_spark.table.format import DeleteEntry

    head = table.latest_version()
    v = head if version is None else version
    ckpt = table._latest_checkpoint_at_or_before(v)
    deletes: dict[str, Any] = {}
    start = 0
    if ckpt is not None:
        import pyarrow.parquet as pq

        meta = json.loads(
            pq.read_schema(table._checkpoint_path(ckpt))
            .metadata[b"kdi_meta"].decode()
        )
        for d in meta.get("delete_entries", []):
            de = DeleteEntry.from_json(d)
            deletes[de.path] = de
        start = ckpt + 1
    for i in range(start, v + 1):
        c = table._read_commit(i)
        rset = set(c.get("remove", []))
        if rset and deletes:
            for dp in list(deletes):
                de = deletes[dp]
                if de.kind == "position" and rset & de.counts.keys():
                    nc = {p: n for p, n in de.counts.items() if p not in rset}
                    if nc:
                        deletes[dp] = DeleteEntry(de.path, de.size, nc,
                                                  seq=de.seq)
                    else:
                        del deletes[dp]
        for dp in c.get("remove_delete", []):
            deletes.pop(dp, None)
        for d in c.get("add_delete", []):
            de = DeleteEntry.from_json(d)
            if de.seq is None:
                de.seq = i
            deletes[de.path] = de
    return list(deletes.values())


def scan_planned(
    spark: SparkSession,
    table: Table,
    conjuncts: list[tuple[str, str, Any]],
    version: int | None = None,
    predicate: Column | None = None,
) -> DataFrame:
    """Plan distributively, then read ONLY the surviving files — the full
    manifest is never materialized as driver objects. Deletes (position +
    equality) are applied through the same delete-aware reader every
    maintenance op uses. ``conjuncts`` prune at FILE granularity; pass the
    row-level ``predicate`` too for exact filtering."""
    from kafka_delta_ingest_spark.table import transforms
    from kafka_delta_ingest_spark.table.format import FileEntry
    from kafka_delta_ingest_spark.table.scan import read_files_applying_deletes

    schema, spec, cmap, defaults = schema_spec_mapping_defaults(table, version)
    mdf = manifest_df(spark, table, version)
    survivors = prune_manifest(mdf, conjuncts, schema, spec).collect()
    entries = [
        FileEntry(
            path=r["path"],
            size=r["size"],
            num_records=r["num_records"],
            partition_values=json.loads(r["partition_values"]),
            stats=json.loads(r["stats"]),
            seq=r["seq"],
        )
        for r in survivors
    ]
    entries.sort(key=lambda e: e.path)
    if not entries:
        return spark.createDataFrame([], schema)
    df = read_files_applying_deletes(
        spark,
        table.root,
        entries,
        delete_entries_at(table, version),
        schema,
        transforms.keys(spec),
        predicate=predicate,
        column_mapping=cmap,
        file_defaults=defaults,
    )
    if predicate is not None:
        # the reader only pushes data-column predicates into the parquet
        # scan (partition-column references are skipped there) — re-apply
        # after partition reconstruction, same as Snapshot.scan
        df = df.filter(predicate)
    return df


def plan_scan_paths(
    spark: SparkSession,
    table: Table,
    conjuncts: list[tuple[str, str, Any]],
    version: int | None = None,
) -> list[str]:
    """Distributed planning end-to-end: manifest scan → Catalyst prune →
    surviving relative paths (sorted). The full file list is never
    materialized on the driver — only the SURVIVORS are collected, and on
    a million-file table with a selective predicate that is the set the
    read must enumerate anyway."""
    schema, spec = schema_and_spec(table, version)
    mdf = manifest_df(spark, table, version)
    pruned = prune_manifest(mdf, conjuncts, schema, spec)
    return sorted(r["path"] for r in pruned.select("path").collect())

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
    column_mapping: "dict[str, str] | None" = None,
) -> DataFrame:
    """Read explicit parquet leaf files as the full table schema.

    ``file_path_col``: optionally append the normalized source-file path
    (scheme stripped) — used by per-file stats and bin assignment.

    ``predicate`` (a Column over data columns) is applied *before* the
    partition-column reconstruction: ``input_file_name`` is nondeterministic,
    so a filter placed after it cannot push into the parquet scan — placed
    here it reaches PushedFilters. Predicates referencing partition columns
    fall back to post-reconstruction filtering (caller re-applies).

    ``column_mapping`` (logical → PHYSICAL parquet name, renamed columns
    only): the data pages are read under their immutable physical names
    and aliased back to the logical schema — Delta column-mapping
    semantics, what makes ``Table.rename_column`` metadata-only. The
    rename is a projection, so predicates still reach PushedFilters."""
    if not paths:
        out = spark.createDataFrame([], schema)
        if file_path_col:
            out = out.withColumn(file_path_col, F.lit(None).cast("string"))
        if row_index_col:
            out = out.withColumn(row_index_col, F.lit(None).cast("long"))
        return out
    pset = set(partition_cols)
    cmap = {
        k: v
        for k, v in (column_mapping or {}).items()
        if k not in pset and v != k
    }
    data_schema = T.StructType(
        [
            T.StructField(cmap.get(f.name, f.name), f.dataType, f.nullable)
            for f in schema.fields
            if f.name not in pset
        ]
    )
    df = spark.read.schema(data_schema).parquet(*paths)
    for logical, physical in cmap.items():
        df = df.withColumnRenamed(physical, logical)
    if predicate is not None:
        try:
            df = df.filter(predicate)
        except Exception:  # noqa: BLE001 — references partition cols; skip
            pass
    for f in schema.fields:
        if f.name not in pset:
            continue
        seg = F.regexp_extract(F.input_file_name(), re.escape(f.name) + "=([^/]+)", 1)
        # TWO escape layers sit between us and the value: the directory
        # name itself is Hive-escaped by partitionBy (':' -> %3A,
        # '%' -> %25; measured), and input_file_name() returns a URI that
        # re-encodes the remaining specials (space -> %20, '%' -> %25).
        # Decode both, protecting literal '+' before each form-decode
        # (url_decode would turn it into a space).
        raw = F.url_decode(F.regexp_replace(seg, r"\+", "%2B"))
        raw = F.url_decode(F.regexp_replace(raw, r"\+", "%2B"))
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


def read_entries(
    spark: SparkSession,
    root: str,
    file_entries,
    schema: T.StructType,
    partition_cols: list[str],
    file_path_col: str | None = None,
    predicate=None,
    row_index_col: str | None = None,
    column_mapping: "dict[str, str] | None" = None,
    file_defaults: "dict | None" = None,
) -> DataFrame:
    """Read manifest entries, grouped by the partition spec each file was
    written under.

    ``file_defaults`` (``{col: {"value": lit, "added_seq": v}}``, Iceberg
    v3 initial defaults): files whose data sequence number predates a
    column's ``added_seq`` never contained it, so their rows read the
    recorded default instead of NULL. Applied per GROUP (files sharing
    the same missing-column set), as a literal projection — free in
    codegen, no data rewritten.

    A file's spec is its ``partition_values`` key set — recorded per file
    at write time, so after ``Table.evolve_partitioning`` old files keep
    their original layout (their partition columns live in the path, not
    the data pages) and new files use the new spec. Each spec group is
    read with its own data-schema/path-reconstruction split and the groups
    union — Iceberg's spec-id-per-manifest-entry semantics. Spec counts
    stay tiny (one per evolution), so this is one extra scan relation per
    historical spec, not per file; a rewrite (compaction/optimize)
    migrates files to the current spec lazily."""
    fd = file_defaults or {}
    groups: dict[tuple, list] = {}
    for fe in file_entries:
        missing = frozenset(
            c
            for c, d in fd.items()
            if (fe.seq if fe.seq is not None else 0) < d["added_seq"]
        )
        key = (frozenset(fe.partition_values.keys()), missing)
        groups.setdefault(key, []).append(fe)
    if not groups:
        groups[(frozenset(partition_cols), frozenset())] = []
    types = {f.name: f.dataType for f in schema.fields}
    parts = []
    for (pvkey, missing), fes in sorted(
        groups.items(), key=lambda kv: (sorted(kv[0][0]), sorted(kv[0][1]))
    ):
        df = read_files(
            spark,
            [f"{root}/{fe.path}" for fe in fes],
            schema,
            sorted(pvkey),
            file_path_col=file_path_col,
            predicate=predicate,
            row_index_col=row_index_col,
            column_mapping=column_mapping,
        )
        for c in sorted(missing):
            df = df.withColumn(c, F.lit(fd[c]["value"]).cast(types[c]))
        parts.append(df)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


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
    column_mapping: "dict[str, str] | None" = None,
    file_defaults: "dict | None" = None,
) -> DataFrame:
    """Read live data files with merge-on-read deletes applied.

    Files NOT covered by any delete entry take the plain path — zero cost
    on the hot path, which at 10^12 rows is almost every file (position
    deletes name their covered files; equality deletes are pruned by data
    sequence number AND manifest key-range intersection). Covered files
    are read once and anti-joined:

    - position deletes: on (file path, parquet row index) against the
      (data_path, pos) delete rows;
    - equality deletes: on the key columns, null-safe, with the Iceberg
      sequence rule ``delete.seq > file.seq`` (a per-file seq attached via
      a broadcast path→seq map) so rows appended WITH an equality delete
      in the same commit — the CDC upsert shape — survive their own
      delete.

    Delete sides broadcast when small (the common case); a shuffled join
    past that means ``rewrite_deletes`` is due, and the maintenance
    advisor recommends it."""
    pos_entries = [de for de in delete_entries if de.kind == "position"]
    eq_entries = [de for de in delete_entries if de.kind == "equality"]

    pos_covered = {p for de in pos_entries for p in de.counts}
    eq_files = {
        fe.path
        for fe in file_entries
        if any(de.applies_to(fe) for de in eq_entries)
    }
    covered = [
        fe
        for fe in file_entries
        if fe.path in pos_covered or fe.path in eq_files
    ]
    plain = [
        fe
        for fe in file_entries
        if fe.path not in pos_covered and fe.path not in eq_files
    ]

    parts: list[DataFrame] = []
    if plain or not covered:
        parts.append(
            read_entries(
                spark,
                root,
                plain,
                schema,
                partition_cols,
                file_path_col=file_path_col,
                predicate=predicate,
                row_index_col=row_index_col,
                column_mapping=column_mapping,
                file_defaults=file_defaults,
            )
        )
    if covered:
        cov_set = {fe.path for fe in covered}
        rel_pos = [de for de in pos_entries if cov_set & de.counts.keys()]
        need_pos = bool(rel_pos)
        df = read_entries(
            spark,
            root,
            covered,
            schema,
            partition_cols,
            file_path_col="_kdi_abs",
            column_mapping=column_mapping,
            file_defaults=file_defaults,
            predicate=predicate,
            # row index must come off the scan relation itself (metadata
            # columns do not survive joins), so request it whenever the
            # position anti-join OR the caller needs it
            row_index_col="_kdi_pos" if (need_pos or row_index_col) else None,
        )
        # manifest paths are table-root-relative; strip "<root>/" from the
        # scan's absolute decoded path (fixed-width prefix, plain substring)
        rel = F.expr(f"substring(_kdi_abs, {len(root) + 2})")

        if need_pos:
            dl = spark.read.schema("data_path string, pos long").parquet(
                *[f"{root}/{de.path}" for de in rel_pos]
            )
            n_del = sum(
                n
                for de in rel_pos
                for p, n in de.counts.items()
                if p in cov_set
            )
            if n_del <= 4_000_000:
                dl = F.broadcast(dl)
            df = df.join(
                dl,
                (rel == dl["data_path"]) & (df["_kdi_pos"] == dl["pos"]),
                "left_anti",
            )

        rel_eq = [
            de
            for de in eq_entries
            if any(de.applies_to(fe) for fe in covered)
        ]
        if rel_eq:
            # per-file data sequence numbers via a broadcast path->seq map
            seq_map = spark.createDataFrame(
                [(fe.path, int(fe.seq or 0)) for fe in covered],
                "_kdi_rel string, _kdi_seq long",
            )
            df = df.join(
                F.broadcast(seq_map), rel == F.col("_kdi_rel")
            ).drop("_kdi_rel")
            # one anti-join per distinct key set (normally exactly one)
            by_ids: dict[tuple, list] = {}
            for de in rel_eq:
                by_ids.setdefault(tuple(de.equality_ids), []).append(de)
            for ids, des in by_ids.items():
                eqd = None
                for de in des:
                    one = (
                        spark.read.parquet(f"{root}/{de.path}")
                        .select(
                            *[
                                F.col(c).alias(f"_kdi_eq_{c}")
                                for c in ids
                            ]
                        )
                        .withColumn("_kdi_dseq", F.lit(int(de.seq or 0)))
                    )
                    eqd = one if eqd is None else eqd.unionByName(one)
                if sum(de.num_rows for de in des) <= 4_000_000:
                    eqd = F.broadcast(eqd)
                cond = F.col("_kdi_dseq") > F.col("_kdi_seq")
                for c in ids:
                    cond = cond & F.col(c).eqNullSafe(
                        F.col(f"_kdi_eq_{c}")
                    )
                df = df.join(eqd, cond, "left_anti")
            df = df.drop("_kdi_seq")

        if file_path_col:
            df = df.withColumnRenamed("_kdi_abs", file_path_col)
        else:
            df = df.drop("_kdi_abs")
        if row_index_col:
            df = df.withColumnRenamed("_kdi_pos", row_index_col)
        elif need_pos:
            df = df.drop("_kdi_pos")
        parts.append(df)
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

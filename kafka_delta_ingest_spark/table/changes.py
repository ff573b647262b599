"""Row-level change feed between two versions (Iceberg changelog scan /
Delta CDF analogue, computed — not stored).

``row_changes(spark, table, v_from, v_to, key)`` emits the NET row-level
diff as a DataFrame of the v_to schema plus ``_change_type`` ∈
{insert, delete, update_preimage, update_postimage}. This is the batch
form of the reference's downstream-consumer contract (readers resume
from an offset and see exactly the delta, src/lib.rs:1026-1046),
generalized from append-only (`inspect.incremental_scan`) to ARBITRARY
history: UPDATE/DELETE/MERGE/upsert in range are fine, and maintenance
rewrites (compaction, clustering, delete folds — data_change=False)
produce NO spurious changes because identical rows cancel.

Scale shape: the diff never reads the whole table. Only files that
CHANGED between the versions participate — removed files, added files,
and surviving files whose applicable delete set drifted (a merge-on-read
delete landing between the versions deletes rows out of an unmoved
file). Rows from those files full-outer join on the key (ONE shuffle of
the changed slice); rows identical on both sides (same key, same
content) are compaction-moved rows and drop out. Unchanged files — at
10^12 rows, almost all of them — are never listed, never read.

Requires ``key`` to be unique per version (the upsert/MERGE invariant of
this engine); with duplicate keys the join semantics are undefined and
``verify=True`` asserts uniqueness with one count pass per side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_delta_ingest_spark.table.format import Snapshot, Table

CHANGE_TYPES = ("insert", "delete", "update_preimage", "update_postimage")


def _delete_cover(snap: Snapshot) -> dict[str, frozenset]:
    """path -> the set of delete files applicable to it (position deletes
    by covered path; equality deletes by seq + key-bound applicability) —
    drift in this set between versions means the file's VISIBLE rows
    changed even though the file itself didn't move."""
    cover: dict[str, set] = {}
    for de in snap.delete_entries:
        if de.kind == "position":
            for p in de.counts:
                cover.setdefault(p, set()).add(de.path)
        else:
            for fe in snap.files:
                if de.applies_to(fe):
                    cover.setdefault(fe.path, set()).add(de.path)
    return {p: frozenset(s) for p, s in cover.items()}


def row_changes(
    spark: SparkSession,
    table: Table,
    v_from: int,
    v_to: int | None = None,
    key: str = "doc_id",
    verify: bool = False,
) -> DataFrame:
    """Net row-level changes from ``v_from`` to ``v_to`` (default head)."""
    s0 = table.snapshot(v_from)
    s1 = table.snapshot(v_to)
    out_fields = [f.name for f in s1.schema.fields]
    if key not in out_fields or key not in {f.name for f in s0.schema.fields}:
        raise ValueError(f"key column {key!r} missing from a side's schema")

    p0 = {f.path for f in s0.files}
    p1 = {f.path for f in s1.files}
    c0, c1 = _delete_cover(s0), _delete_cover(s1)
    drifted = {
        p for p in (p0 & p1)
        if c0.get(p, frozenset()) != c1.get(p, frozenset())
    }
    old_paths = (p0 - p1) | drifted
    new_paths = (p1 - p0) | drifted

    old = s0.read(spark, [f for f in s0.files if f.path in old_paths])
    new = s1.read(spark, [f for f in s1.files if f.path in new_paths])
    # schema evolution alignment. Renamed columns are the SAME column
    # under a different logical name — identity is the immutable PHYSICAL
    # name (column mapping, table/format.py): align by physical identity
    # first, or a rename inside the range would NULL the old side's
    # pre-images and report a phantom update for every surviving row.
    # Genuinely new columns fill with NULL, exactly what a schema-pinned
    # scan yields; dropped columns fall out of the select.
    phys0 = {
        s0.column_mapping.get(f.name, f.name): f.name
        for f in s0.schema.fields
    }
    for f in s1.schema.fields:
        if f.name in old.columns:
            continue
        src = phys0.get(s1.column_mapping.get(f.name, f.name))
        if src is not None and src in old.columns:
            old = old.withColumnRenamed(src, f.name)
        else:
            old = old.withColumn(f.name, F.lit(None).cast(f.dataType))
    old = old.select(
        *[
            F.col(c).cast(s1.schema[c].dataType).alias(c)
            for c in out_fields
        ]
    )
    new = new.select(*out_fields)

    if verify:
        # opt-in full-table invariant check: key uniqueness must hold over
        # the WHOLE snapshot on both sides, not just the changed slice —
        # a duplicate key anywhere makes "the row for key K" ill-defined
        for side, snap in (("old", s0), ("new", s1)):
            dup = (
                snap.scan(spark).groupBy(key).count()
                .where(F.col("count") > 1).limit(1).collect()
            )
            if dup:
                raise ValueError(
                    f"duplicate key on the {side} side: {dup[0][key]!r}"
                )

    o = old.select(
        F.col(key).alias("_k"),
        F.struct(*[F.col(c) for c in out_fields]).alias("_old"),
    )
    n = new.select(
        F.col(key).alias("_k"),
        F.struct(*[F.col(c) for c in out_fields]).alias("_new"),
    )
    j = o.join(n, "_k", "full_outer")

    ins = j.where(F.col("_old").isNull()).select(
        *[F.col(f"_new.{c}").alias(c) for c in out_fields],
        F.lit("insert").alias("_change_type"),
    )
    del_ = j.where(F.col("_new").isNull()).select(
        *[F.col(f"_old.{c}").alias(c) for c in out_fields],
        F.lit("delete").alias("_change_type"),
    )
    changed = j.where(
        F.col("_old").isNotNull()
        & F.col("_new").isNotNull()
        & ~F.col("_old").eqNullSafe(F.col("_new"))
    )
    pre = changed.select(
        *[F.col(f"_old.{c}").alias(c) for c in out_fields],
        F.lit("update_preimage").alias("_change_type"),
    )
    post = changed.select(
        *[F.col(f"_new.{c}").alias(c) for c in out_fields],
        F.lit("update_postimage").alias("_change_type"),
    )
    return ins.unionByName(del_).unionByName(pre).unionByName(post)

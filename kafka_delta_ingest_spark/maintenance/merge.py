"""MERGE INTO (upsert) — north-rule op B5, copy-on-write.

Semantics inherited from the reference:
- the by-key dedupe guard of ValueBuffers (offset <= last_offset rejected,
  /root/reference/src/value_buffers.rs:26-30) generalizes to upsert-by-key:
  a source row replaces the target row with the same ``doc_id``;
- conflict stance of the commit loop (src/lib.rs:1148-1170): the replace
  commit re-validates that every file we rewrite is still live, so a
  concurrent writer can't be silently clobbered;
- rows failing schema validation go to the dead-letter side output instead
  of poisoning the commit (src/dead_letters.rs, src/writer.rs:617-637).

Plan shape (scale-first):
  1. **touched-file pruning**: join the *manifest* (path, min/max doc_id —
     metadata-sized) against source keys on range overlap; only overlapping
     files are rewritten. Manifest side is broadcast — it is thousands of
     rows per maintenance chunk even on huge tables.
  2. **salted hash join** of touched-file rows ⋈ source on doc_id with
     explicit hot-key splitting (plans.salting) — skew shows up when many
     source rows share a join key (e.g. merging by ``source`` partition) or
     when AQE is off; explicit split per north rule.
  3. untouched files stay as-is (no data movement);
     inserts = source keys matching no touched-file row.
  4. one atomic replace commit: Add(rewritten + inserts) + Remove(touched).
"""

from __future__ import annotations

import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_delta_ingest_spark.plans.salting import salted_join
from kafka_delta_ingest_spark.table.format import Table, Transaction
from kafka_delta_ingest_spark.table.stats import compute_add_entries


def _touched_files(spark: SparkSession, snap, source: DataFrame, key: str) -> list[str]:
    """Manifest ⋈ source-keys range join → distinct file paths that may
    contain a matching key. Metadata-side broadcast, data-side distinct on
    the key column only (column-pruned scan of the source).

    The manifest min/max (JSON scalars or ISO strings, depending on the
    stats path) are cast back to the key column's ACTUAL type before the
    range comparison — comparing stringified numerics lexicographically
    would silently skip files ('5' <= '19' is false) and corrupt the table
    with duplicate keys. A bound that fails ``try_cast`` degrades to
    "always touched" (prune conservatively, never lose matches)."""
    ktype = snap.schema[key].dataType
    manifest = [
        (
            f.path,
            _stat_str(f.stats.get("min", {}).get(key)),
            _stat_str(f.stats.get("max", {}).get(key)),
        )
        for f in snap.files
    ]
    # files without stats are always touched (can't prune)
    no_stats = [p for p, lo, hi in manifest if lo is None or hi is None]
    ranged = [(p, lo, hi) for p, lo, hi in manifest if lo is not None and hi is not None]
    if not ranged:
        return sorted(set(no_stats))
    mdf = spark.createDataFrame(ranged, "path string, lo string, hi string").select(
        "path",
        F.col("lo").try_cast(ktype).alias("lo"),
        F.col("hi").try_cast(ktype).alias("hi"),
    )
    keys = source.select(F.col(key).alias("k")).distinct()
    touched = (
        keys.join(
            F.broadcast(mdf),
            F.col("lo").isNull()
            | F.col("hi").isNull()
            | ((F.col("k") >= F.col("lo")) & (F.col("k") <= F.col("hi"))),
        )
        .select("path")
        .distinct()
        .collect()
    )
    return sorted({r["path"] for r in touched} | set(no_stats))


def _stat_str(v) -> str | None:
    """Render a manifest stat bound as a string Spark can cast back to the
    column type (bools via JSON rendering would be 'True'/'False' from
    Python — normalize to SQL-castable lowercase)."""
    if v is None:
        return None
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def merge_into(
    spark: SparkSession,
    table: Table,
    source: DataFrame,
    key: str = "doc_id",
    salt_factor: int = 16,
    hot_keys: list | None = None,
    auto_detect_skew: bool = False,
    job_id: str | None = None,
    when_matched: str = "update",  # update | delete
) -> dict:
    """Upsert ``source`` into the table by ``key``. Matched rows are
    replaced by the source row (or deleted); unmatched source rows are
    inserted. Returns metrics."""
    job_id = job_id or f"merge-{uuid.uuid4().hex[:8]}"
    t0 = time.time()
    snap = table.snapshot()
    # SQL MERGE forbids multiple source matches per target row; we keep the
    # last-wins stance of the reference's buffer dedupe (value_buffers.rs:26-30)
    source = source.select(*[f.name for f in snap.schema.fields]).dropDuplicates([key])

    touched = _touched_files(spark, snap, source, key)
    untouched = [f.path for f in snap.files if f.path not in set(touched)]

    tset = set(touched)
    # delete-aware read: MERGE over files carrying position deletes must
    # not resurrect deleted rows into the rewritten files
    tdf = snap.read(spark, [f for f in snap.files if f.path in tset])

    marked_src = source.withColumn("__is_src", F.lit(True))
    # salted left join: target rows keep or take the source version
    # merge keys are unique, so key-level skew only arises when merging by a
    # low-cardinality key (e.g. `source`): salting is explicit via hot_keys
    # or opt-in detection — a detection pass on a unique key is wasted work
    joined = salted_join(
        tdf,
        marked_src.select(key, "__is_src"),
        key,
        how="left",
        salt_factor=salt_factor,
        hot_keys=hot_keys,
        auto_detect=auto_detect_skew and hot_keys is None,
    )
    if when_matched == "delete":
        survivors = joined.where(F.col("__is_src").isNull()).drop("__is_src")
        out = survivors
        inserts = spark.createDataFrame([], snap.schema)
    else:
        # matched target rows are dropped; their replacement comes from source
        survivors = joined.where(F.col("__is_src").isNull()).drop("__is_src")
        inserts = source  # both updates and brand-new keys
        out = survivors.unionByName(inserts)

    absd, _ = table.new_data_dir()
    w = out.write.mode("overwrite")
    if snap.partition_cols:
        w = w.partitionBy(*snap.partition_cols)
    w.parquet(absd)
    adds = compute_add_entries(spark, table.root, absd, snap.schema, snap.partition_cols)

    v = table.commit(
        Transaction(
            operation="merge",
            adds=adds,
            removes=touched,
            data_change=True,
            metadata={"job_id": job_id, "key": key, "touched": len(touched)},
        ),
        expected_schema=snap.schema,
    )
    return {
        "job_id": job_id,
        "version": v,
        "touched_files": len(touched),
        "untouched_files": len(untouched),
        "files_written": len(adds),
        "rows_written": sum(a.num_records for a in adds),
        "duration_s": time.time() - t0,
    }

"""Adopt an existing parquet directory as a table — migrate-in-place.

Iceberg ships ``snapshot`` / ``migrate`` table procedures and Delta ships
``CONVERT TO DELTA`` because nobody's data starts life inside a table
format: at 10^12 rows the corpus already exists as plain (possibly
hive-partitioned) parquet, and re-writing it just to gain a manifest is a
multi-day copy. This op builds the table AROUND the existing bytes:

- **Zero-copy**: every source file is HARD-LINKED into the new table's
  data dir preserving its ``k=v`` partition path (same inode discipline
  as ``clone_table`` — the table is self-contained, so deleting the
  source dir afterwards cannot break it, and the source stays readable
  by whatever wrote it).
- **Stats at adoption**: per-file min/max/null-count/num_records come
  from the parquet FOOTERS (table/footer_stats.py — no data scan), so
  the very first post-adoption query already prunes on the manifest.
- **Hive partition discovery**: ``k=v`` path segments become identity
  partition columns; their types come from Spark's own discovery (the
  same inference a direct ``spark.read.parquet`` would apply), unless an
  explicit schema overrides it.
- **One atomic commit**: the table appears at version 1 fully formed;
  a crash mid-link leaves an uncommitted data dir for ``gc_orphans``.

Reference lineage: the reference assumes its destination Delta table
already exists (src/writer.rs:345-349 loads it at startup); this is the
missing bootstrap for tables whose data predates the format.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from kafka_delta_ingest_spark.table.format import Table, Transaction
from kafka_delta_ingest_spark.table.stats import compute_add_entries


def _leaf_parquets(source_dir: str) -> list[str]:
    out = []
    for dirpath, _d, files in os.walk(source_dir):
        for fn in files:
            if fn.endswith(".parquet") and not fn.startswith("."):
                out.append(os.path.join(dirpath, fn))
    return sorted(out)


def _partition_cols_from_paths(source_dir: str, paths: list[str]) -> list[str]:
    """Hive partition columns from the first file's ``k=v`` segments;
    every file must agree (mixed layouts are not one table)."""
    specs = set()
    for p in paths:
        rel = os.path.relpath(os.path.dirname(p), source_dir)
        cols = tuple(
            seg.split("=", 1)[0]
            for seg in rel.split(os.sep)
            if "=" in seg
        )
        specs.add(cols)
    if len(specs) > 1:
        raise ValueError(
            f"adopt: mixed partition layouts under {source_dir}: "
            f"{sorted(specs)}"
        )
    return list(specs.pop()) if specs else []


def adopt_parquet(
    spark: SparkSession,
    root: str,
    source_dir: str,
    schema: T.StructType | None = None,
    properties: dict | None = None,
    job_id: str = "adopt",
) -> Table:
    """Create a new table at ``root`` adopting every parquet file under
    ``source_dir`` by hard link. Returns the created Table (version 1).

    ``schema``: optional explicit schema (must cover the data + partition
    columns); default = Spark's own read-time inference over the source
    dir, so the adopted table scans exactly what a direct parquet read
    would have returned."""
    t0 = time.time()
    source_dir = os.path.abspath(source_dir)
    paths = _leaf_parquets(source_dir)
    if not paths:
        raise ValueError(f"adopt: no parquet files under {source_dir}")
    pcols = _partition_cols_from_paths(source_dir, paths)
    if schema is None:
        # Spark's discovery: data columns from footers, partition columns
        # typed by the same value inference a plain read applies
        schema = spark.read.parquet(source_dir).schema
    missing = [c for c in pcols if c not in {f.name for f in schema.fields}]
    if missing:
        raise ValueError(f"adopt: partition columns not in schema: {missing}")

    table = Table.create(root, schema, pcols, properties=properties)
    absd, _rel = table.new_data_dir()
    import errno
    import shutil

    for src in paths:
        rel = os.path.relpath(src, source_dir)
        dst = os.path.join(absd, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        try:
            os.link(src, dst)
        except OSError as e:
            if e.errno != errno.EXDEV:
                raise
            # cross-device: hard links impossible, pay the copy for these
            shutil.copy2(src, dst)

    adds = compute_add_entries(spark, table.root, absd, schema, pcols)
    table.commit(
        Transaction(
            operation="adopt",
            adds=adds,
            metadata={
                "job_id": job_id,
                "source_dir": source_dir,
                "files": len(adds),
                "duration_s": time.time() - t0,
            },
        )
    )
    return table

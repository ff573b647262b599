"""Symlink-manifest export (maintenance/export.py): the manifest pins
exactly the snapshot's files, an EXTERNAL engine (DuckDB) reading the
listed paths reproduces the Spark scan, regeneration tracks maintenance,
and live MOR deletes refuse the export."""

import os

import duckdb
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_delta_ingest_spark.maintenance.export import (
    LiveDeletesError,
    generate_symlink_manifest,
    read_manifest,
)
from kafka_delta_ingest_spark.table.format import Table
from kafka_delta_ingest_spark.table.writer import write_dataframe

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("n_tok", T.IntegerType()),
        T.StructField("source", T.StringType()),
    ]
)


def _table(spark, root, n=300):
    t = Table.create(root, SCHEMA, partition_cols=["source"])
    write_dataframe(
        spark,
        t,
        spark.range(n).select(
            F.concat(F.lit("d"), F.col("id").cast("string")).alias("doc_id"),
            (F.col("id") % 29).cast("int").alias("n_tok"),
            F.concat(F.lit("s"), (F.col("id") % 3).cast("string")).alias(
                "source"
            ),
        ).repartition(3),
    )
    return t


def test_manifest_lists_exactly_the_snapshot(spark, tmp_table_root):
    t = _table(spark, tmp_table_root)
    m = generate_symlink_manifest(t)
    snap = t.snapshot()
    assert m["files_listed"] == len(snap.files)
    listed = {p for ps in read_manifest(t).values() for p in ps}
    assert listed == set(snap.file_paths(absolute=True))
    # partition dirs mirror the hive layout
    assert set(read_manifest(t)) == {"source=s0", "source=s1", "source=s2"}


def test_external_engine_reads_the_same_rows(spark, tmp_table_root):
    """DuckDB consuming the manifest (partition value from the dir name,
    data from the listed parquet) reproduces the Spark scan exactly —
    the actual interop claim."""
    t = _table(spark, tmp_table_root)
    generate_symlink_manifest(t)

    got = set()
    for part, paths in read_manifest(t).items():
        src = part.split("=", 1)[1]
        rows = duckdb.sql(
            "SELECT doc_id, n_tok FROM read_parquet($paths)",
            params={"paths": paths},
        ).fetchall()
        got |= {(d, n, src) for d, n in rows}
    want = {
        (r["doc_id"], r["n_tok"], r["source"])
        for r in t.snapshot().scan(spark).collect()
    }
    assert got == want


def test_regeneration_tracks_maintenance_and_swaps_cleanly(
    spark, tmp_table_root
):
    from kafka_delta_ingest_spark.maintenance.optimize import optimize

    t = _table(spark, tmp_table_root)
    generate_symlink_manifest(t)
    before = {p for ps in read_manifest(t).values() for p in ps}

    optimize(spark, t, dims=["n_tok"], curve="zorder",
             target_file_bytes=64 * 1024 * 1024, job_id="exp-opt")
    m = generate_symlink_manifest(t)
    after = {p for ps in read_manifest(t).values() for p in ps}
    assert after == set(t.snapshot().file_paths(absolute=True))
    assert after.isdisjoint(before)  # optimize rewrote everything
    # partition discovery must still see ONLY hive partition segments —
    # optimize's internal _gbin=N layout dirs stay out of the manifest
    assert set(read_manifest(t)) == {"source=s0", "source=s1", "source=s2"}
    assert m["version"] == t.latest_version()
    assert not os.path.exists(
        os.path.join(t.root, "_symlink_format_manifest.old")
    )


def test_live_mor_deletes_refuse_export_until_folded(spark, tmp_table_root):
    from kafka_delta_ingest_spark.maintenance.dml import (
        delete_where,
        rewrite_deletes,
    )

    t = _table(spark, tmp_table_root)
    delete_where(
        spark, t, [("n_tok", ">", 20)], mode="merge_on_read"
    )
    with pytest.raises(LiveDeletesError):
        generate_symlink_manifest(t)

    rewrite_deletes(spark, t)
    m = generate_symlink_manifest(t)
    assert m["files_listed"] == len(t.snapshot().files)


def test_regeneration_is_incremental_per_partition(spark, tmp_table_root):
    """Scoped maintenance touches one partition; regeneration must
    rewrite ONLY that partition's manifest (object-store PUT economy),
    and an unchanged-table regeneration rewrites nothing."""
    from kafka_delta_ingest_spark.maintenance.compact import compact

    t = _table(spark, tmp_table_root)
    m = generate_symlink_manifest(t)
    assert m["manifests_rewritten"] == m["partitions"] == 3

    assert generate_symlink_manifest(t)["manifests_rewritten"] == 0

    compact(spark, t, target_file_bytes=64 * 1024 * 1024,
            job_id="exp-incr", scope=[("source", "=", "s1")])
    m2 = generate_symlink_manifest(t)
    assert m2["manifests_rewritten"] == 1
    listed = {p for ps in read_manifest(t).values() for p in ps}
    assert listed == set(t.snapshot().file_paths(absolute=True))

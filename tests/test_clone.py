"""Zero-copy clone (maintenance/clone.py): byte-identical scan, zero
data copied (shared inodes), independent evolution both ways, clone
survives source expiry+GC, time-travel clones, MOR-delete refusal."""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_delta_ingest_spark.maintenance.clone import CloneError, clone_table
from kafka_delta_ingest_spark.table.format import Table
from kafka_delta_ingest_spark.table.writer import write_dataframe

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("n_tok", T.IntegerType()),
        T.StructField("source", T.StringType()),
    ]
)


def _rows(spark, start, n):
    return spark.range(start, start + n).select(
        F.concat(F.lit("d"), F.col("id").cast("string")).alias("doc_id"),
        (F.col("id") % 23).cast("int").alias("n_tok"),
        F.concat(F.lit("s"), (F.col("id") % 2).cast("string")).alias(
            "source"
        ),
    )


def _table(spark, root, n=200):
    t = Table.create(root, SCHEMA, partition_cols=["source"])
    write_dataframe(spark, t, _rows(spark, 0, n).repartition(2))
    return t


def _state(spark, t, version=None):
    return {
        tuple(r)
        for r in t.snapshot(version).scan(spark)
        .select("doc_id", "n_tok", "source").collect()
    }


def test_clone_is_zero_copy_and_scan_identical(spark, tmp_path):
    src = _table(spark, str(tmp_path / "src"))
    dst = clone_table(src, str(tmp_path / "dst"))
    assert _state(spark, dst) == _state(spark, src)
    # zero copy: every data file shares its inode with the source
    s = src.snapshot()
    for f in s.files:
        a = os.stat(os.path.join(src.root, f.path))
        b = os.stat(os.path.join(dst.root, f.path))
        assert (a.st_ino, a.st_dev) == (b.st_ino, b.st_dev)
    # stats/manifest carried over verbatim
    assert {e.path: e.stats for e in dst.snapshot().files} == {
        e.path: e.stats for e in s.files
    }


def test_clone_evolves_independently_both_ways(spark, tmp_path):
    from kafka_delta_ingest_spark.maintenance.dml import delete_where
    from kafka_delta_ingest_spark.maintenance.optimize import optimize

    src = _table(spark, str(tmp_path / "src"))
    before = _state(spark, src)
    dst = clone_table(src, str(tmp_path / "dst"))

    # mutate the clone: source must not move
    delete_where(spark, dst, [("n_tok", ">", 10)])
    assert _state(spark, src) == before
    assert _state(spark, dst) == {r for r in before if r[1] <= 10}

    # rewrite the source (copy-on-write breaks the share): clone holds
    optimize(spark, src, dims=["n_tok"], curve="zorder",
             target_file_bytes=64 * 1024 * 1024, job_id="clone-opt")
    assert _state(spark, src) == before
    assert _state(spark, dst) == {r for r in before if r[1] <= 10}


def test_clone_survives_source_expiry_and_gc(spark, tmp_path):
    """The notorious shallow-clone failure: source VACUUM breaks the
    clone. Hard links don't — the clone keeps the content alive."""
    from kafka_delta_ingest_spark.maintenance.expire import (
        expire_snapshots,
        gc_orphans,
    )
    from kafka_delta_ingest_spark.maintenance.optimize import optimize

    src = _table(spark, str(tmp_path / "src"))
    before = _state(spark, src)
    dst = clone_table(src, str(tmp_path / "dst"))
    orig_paths = [f.path for f in src.snapshot().files]

    optimize(spark, src, dims=["n_tok"], curve="zorder",
             target_file_bytes=64 * 1024 * 1024, job_id="gc-opt")
    expire_snapshots(src, retain_last=1)
    gc_orphans(spark, src, grace_s=0.0)
    # the source really unlinked its old directory entries
    assert not any(
        os.path.exists(os.path.join(src.root, p)) for p in orig_paths
    )
    # ...and the clone still reads every row
    assert _state(spark, dst) == before


def test_time_travel_clone_and_refusals(spark, tmp_path):
    from kafka_delta_ingest_spark.maintenance.dml import delete_where

    src = _table(spark, str(tmp_path / "src"))
    v1 = src.latest_version()
    write_dataframe(spark, src, _rows(spark, 200, 50).repartition(1))

    dst = clone_table(src, str(tmp_path / "old"), version=v1)
    assert _state(spark, dst) == _state(spark, src, version=v1)
    assert len(_state(spark, dst)) == 200

    with pytest.raises(CloneError, match="not empty"):
        clone_table(src, str(tmp_path / "old"))

    delete_where(spark, src, [("n_tok", ">", 20)], mode="merge_on_read")
    with pytest.raises(CloneError, match="merge-on-read"):
        clone_table(src, str(tmp_path / "mor"))

"""Adopt-in-place (maintenance/adopt.py): build a table around existing
parquet bytes, zero-copy."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from kafka_delta_ingest_spark.datagen import tokens_df
from kafka_delta_ingest_spark.functions.verify import content_fingerprint
from kafka_delta_ingest_spark.maintenance.adopt import adopt_parquet


def _write_source(spark, path, partitioned=True, n=200):
    df = tokens_df(spark, n, max_tok=8).repartition(4)
    w = df.write.mode("overwrite")
    if partitioned:
        w = w.partitionBy("source")
    w.parquet(path)
    return df


def test_adopt_partitioned_dir_zero_copy(spark, tmp_path):
    src_dir = str(tmp_path / "src")
    df = _write_source(spark, src_dir, partitioned=True)
    fp = content_fingerprint(df)

    t = adopt_parquet(spark, str(tmp_path / "t"), src_dir)
    snap = t.snapshot()
    assert snap.partition_cols == ["source"]
    assert content_fingerprint(snap.scan(spark)) == fp

    # zero-copy: shared inodes between source and table
    f0 = snap.files[0]
    linked = os.path.join(t.root, f0.path)
    assert os.stat(linked).st_nlink >= 2
    # footer stats present at adoption -> manifest pruning works day one
    assert f0.stats["min"].get("n_tok") is not None
    pruned = snap.scan(spark, predicate_stats=[("source", "=", "web")])
    assert pruned.count() == df.where(F.col("source") == "web").count()

    # self-contained: deleting the source does not break the table
    shutil.rmtree(src_dir)
    assert content_fingerprint(t.snapshot().scan(spark)) == fp


def test_adopt_unpartitioned_and_then_maintain(spark, tmp_path):
    from kafka_delta_ingest_spark.maintenance.compact import compact

    src_dir = str(tmp_path / "flat")
    df = _write_source(spark, src_dir, partitioned=False)
    fp = content_fingerprint(df)
    t = adopt_parquet(spark, str(tmp_path / "t2"), src_dir)
    assert t.snapshot().partition_cols == []
    assert content_fingerprint(t.snapshot().scan(spark)) == fp
    # adopted tables are ordinary tables: compaction works immediately
    compact(spark, t, target_file_bytes=64 * 1024 * 1024, job_id="a-c")
    assert content_fingerprint(t.snapshot().scan(spark)) == fp


def test_adopt_errors(spark, tmp_path):
    with pytest.raises(ValueError, match="no parquet files"):
        adopt_parquet(spark, str(tmp_path / "x"), str(tmp_path / "empty"))

    # mixed layouts are not one table
    mix = tmp_path / "mix"
    _write_source(spark, str(mix / "a"), partitioned=True, n=20)
    _write_source(spark, str(mix / "b"), partitioned=False, n=20)
    with pytest.raises(ValueError, match="mixed partition layouts"):
        adopt_parquet(spark, str(tmp_path / "y"), str(mix))
"""Incremental derived-table refresh (pipelines/incremental.py): appends
fold in exactly once, replays no-op, interleaved compaction is invisible,
row-level source changes force a full rebuild."""

import pytest
from pyspark.sql import functions as F

from kafka_delta_ingest_spark.datagen import TOKENS_SCHEMA, tokens_df
from kafka_delta_ingest_spark.maintenance.compact import compact
from kafka_delta_ingest_spark.maintenance.dml import delete_where
from kafka_delta_ingest_spark.pipelines.incremental import (
    full_refresh,
    refresh_aggregate,
)
from kafka_delta_ingest_spark.table.format import Table
from kafka_delta_ingest_spark.table.inspect import IncrementalScanError
from kafka_delta_ingest_spark.table.writer import write_dataframe


def _expected(spark, src):
    return {
        r["source"]: (r["n_docs"], r["n_tokens"])
        for r in src.snapshot()
        .scan(spark)
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("n_tok").cast("long")).alias("n_tokens"),
        )
        .collect()
    }


def _got(spark, dest_root):
    return {
        r["source"]: (r["n_docs"], r["n_tokens"])
        for r in Table(dest_root).snapshot().scan(spark).collect()
    }


def test_refresh_folds_appends_exactly_once(spark, tmp_path):
    src_root, dest = str(tmp_path / "src"), str(tmp_path / "agg")
    src = Table.create(src_root, TOKENS_SCHEMA, ["source"])
    write_dataframe(spark, src, tokens_df(spark, 300, max_tok=32))
    m1 = refresh_aggregate(spark, src, dest)
    assert not m1["noop"] and _got(spark, dest) == _expected(spark, src)
    # replay with no new appends: no-op, no new dest version
    v_before = Table(dest).latest_version()
    m2 = refresh_aggregate(spark, src, dest)
    assert m2["noop"] and Table(dest).latest_version() == v_before
    # append more + an interleaved compaction (invisible to the delta)
    write_dataframe(
        spark, src,
        tokens_df(spark, 200, max_tok=32)
        .withColumn("doc_id", F.concat(F.lit("b-"), F.col("doc_id"))),
    )
    compact(spark, src, target_file_bytes=64 * 1024 * 1024, job_id="ir-c")
    m3 = refresh_aggregate(spark, src, dest)
    assert not m3["noop"]
    assert _got(spark, dest) == _expected(spark, src)


def test_row_level_change_breaks_incrementality_full_refresh_recovers(
    spark, tmp_path
):
    src_root, dest = str(tmp_path / "src"), str(tmp_path / "agg")
    src = Table.create(src_root, TOKENS_SCHEMA, ["source"])
    write_dataframe(spark, src, tokens_df(spark, 300, max_tok=32))
    refresh_aggregate(spark, src, dest)
    delete_where(spark, src, [("n_tok", ">=", 16)])
    with pytest.raises(IncrementalScanError):
        refresh_aggregate(spark, src, dest)
    full_refresh(spark, src, dest)
    assert _got(spark, dest) == _expected(spark, src)
    # incremental resumes cleanly after the rebuild
    write_dataframe(
        spark, src,
        tokens_df(spark, 100, max_tok=32)
        .withColumn("doc_id", F.concat(F.lit("c-"), F.col("doc_id"))),
    )
    refresh_aggregate(spark, src, dest)
    assert _got(spark, dest) == _expected(spark, src)

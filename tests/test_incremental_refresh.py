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


def test_cdc_refresh_survives_arbitrary_dml(spark, tmp_path):
    """refresh_aggregate_cdc stays incremental across UPDATE-like MERGE,
    MOR DELETE, appends, and a full OPTIMIZE — the signed change-feed
    fold equals a from-scratch aggregate after every step."""
    from kafka_delta_ingest_spark.maintenance.merge import merge_into
    from kafka_delta_ingest_spark.maintenance.optimize import optimize
    from kafka_delta_ingest_spark.pipelines.incremental import (
        _partial,
        refresh_aggregate_cdc,
    )

    src = Table.create(str(tmp_path / "src"), TOKENS_SCHEMA, ["source"])
    write_dataframe(spark, src, tokens_df(spark, 300, max_tok=16).repartition(4))
    dest_root = str(tmp_path / "agg")

    def check():
        got = {
            r["source"]: (r["n_docs"], r["n_tokens"])
            for r in Table(dest_root).snapshot().scan(spark).collect()
        }
        exp = {
            r["source"]: (r["n_docs"], r["n_tokens"])
            for r in _partial(src.snapshot().scan(spark), "source").collect()
        }
        assert got == exp

    m0 = refresh_aggregate_cdc(spark, src, dest_root)  # bootstrap
    assert not m0["noop"]
    check()
    # replay no-ops
    assert refresh_aggregate_cdc(spark, src, dest_root)["noop"]

    # MOR delete + group-moving MERGE (docs replaced with different n_tok
    # AND a different source: signed rows land on both groups)
    delete_where(spark, src, [("n_tok", "<=", 2)], mode="merge_on_read")
    batch = (
        tokens_df(spark, 20, max_tok=16, seed=9)
        .withColumn("source", F.lit("moved"))
    )
    merge_into(spark, src, batch, key="doc_id")
    refresh_aggregate_cdc(spark, src, dest_root)
    check()

    # appends + pure maintenance: OPTIMIZE must contribute nothing
    write_dataframe(
        spark, src,
        tokens_df(spark, 50, max_tok=16, seed=5).withColumn(
            "doc_id", F.concat(F.lit("n-"), "doc_id")
        ),
    )
    optimize(spark, src, dims=["n_tok", "doc_id"], curve="zorder",
             target_file_bytes=8 * 1024 * 1024)
    refresh_aggregate_cdc(spark, src, dest_root)
    check()

"""Incremental append scan + files/history metadata tables
(``table/inspect.py``) — the batch analogue of the reference's
resume-from-stored-offset consumption (/root/reference/src/lib.rs:1026-1046):
a reader that has processed up to version v asks only for what was
appended since, and interleaved maintenance rewrites are invisible."""

import pytest
from pyspark.sql import functions as F

from kafka_delta_ingest_spark.datagen import TOKENS_SCHEMA, tokens_df
from kafka_delta_ingest_spark.maintenance.compact import compact
from kafka_delta_ingest_spark.maintenance.dml import delete_where
from kafka_delta_ingest_spark.table.format import Table
from kafka_delta_ingest_spark.table.inspect import (
    IncrementalScanError,
    files_df,
    history_df,
    incremental_scan,
)
from kafka_delta_ingest_spark.table.writer import write_dataframe


def _build(spark, root, n_a=300, n_b=120):
    """v1 = append A, v2 = compaction (data_change=False), v3 = append B."""
    t = Table.create(root, TOKENS_SCHEMA, ["source"])
    a = tokens_df(spark, n_a, max_tok=32).repartition(8)
    write_dataframe(spark, t, a)  # v1
    compact(spark, t, target_file_bytes=64 * 1024 * 1024, job_id="inc-compact")  # v2
    b = (
        tokens_df(spark, n_b, max_tok=32)
        .withColumn("doc_id", F.concat(F.lit("b-"), F.col("doc_id")))
        .repartition(4)
    )
    write_dataframe(spark, t, b)  # v3
    return t


def test_incremental_scan_skips_rewrites_and_returns_only_appends(spark, tmp_table_root):
    t = _build(spark, tmp_table_root)
    assert t.latest_version() == 3
    inc = incremental_scan(spark, t, from_version=1)
    got = {r["doc_id"] for r in inc.select("doc_id").collect()}
    assert len(got) == 120 and all(d.startswith("b-") for d in got)
    # full range = whole table, arrays intact
    full = incremental_scan(spark, t, from_version=0)
    assert full.count() == 420
    assert (
        full.select(F.sum(F.size("tokens"))).first()[0]
        == t.snapshot().scan(spark).select(F.sum(F.size("tokens"))).first()[0]
    )


def test_incremental_scan_empty_range_and_bad_range(spark, tmp_table_root):
    t = _build(spark, tmp_table_root)
    # (1, 2] contains only the compaction — no content delta
    inc = incremental_scan(spark, t, from_version=1, to_version=2)
    assert inc.count() == 0
    assert [f.name for f in inc.schema.fields] == ["doc_id", "tokens", "n_tok", "source"]
    with pytest.raises(ValueError):
        incremental_scan(spark, t, from_version=2, to_version=1)
    with pytest.raises(ValueError):
        incremental_scan(spark, t, from_version=0, to_version=99)


def test_incremental_scan_rejects_row_level_changes(spark, tmp_table_root):
    t = _build(spark, tmp_table_root)
    delete_where(spark, t, [("n_tok", ">=", 1)])  # v4: data_change + removes
    with pytest.raises(IncrementalScanError):
        incremental_scan(spark, t, from_version=1)
    # a range ending before the delete still works
    assert incremental_scan(spark, t, from_version=1, to_version=3).count() == 120


def test_files_metadata_table_matches_manifest(spark, tmp_table_root):
    t = _build(spark, tmp_table_root)
    snap = t.snapshot()
    fdf = files_df(spark, t)
    assert fdf.count() == len(snap.files)
    agg = fdf.agg(
        F.sum("num_records").alias("rows"), F.sum("size_bytes").alias("bytes")
    ).first()
    assert agg["rows"] == snap.num_records()
    assert agg["bytes"] == snap.total_bytes()
    # stats maps usable with Spark SQL: global n_tok min from per-file mins
    mn = (
        fdf.select(F.element_at("min_values", "n_tok").cast("long").alias("mn"))
        .agg(F.min("mn"))
        .first()[0]
    )
    assert mn == t.snapshot().scan(spark).agg(F.min("n_tok")).first()[0]
    # partition values reconstructed per file
    srcs = {r[0] for r in fdf.select(F.element_at("partition", "source")).collect()}
    data_srcs = {r[0] for r in t.snapshot().scan(spark).select("source").distinct().collect()}
    assert srcs == data_srcs


def test_history_metadata_table(spark, tmp_table_root):
    t = _build(spark, tmp_table_root)
    h = history_df(spark, t).orderBy("version").collect()
    assert [r["version"] for r in h] == [0, 1, 2, 3]
    assert [r["data_change"] for r in h] == [False, True, False, True]
    assert h[2]["operation"] == "compact"
    assert h[3]["n_remove"] == 0 and h[3]["n_add"] > 0


def test_metadata_aggregate_matches_scan_and_reads_zero_bytes(spark, tmp_table_root):
    import os

    from kafka_delta_ingest_spark.table.inspect import metadata_aggregate

    t = _build(spark, tmp_table_root)
    full = t.snapshot().scan(spark)

    # whole table — answered entirely from manifests
    got = metadata_aggregate(spark, t, ["n_tok", "doc_id"]).collect()[0].asDict()
    exp = full.agg(
        F.count(F.lit(1)).alias("cnt"),
        F.min("n_tok").alias("min_n_tok"),
        F.max("n_tok").alias("max_n_tok"),
        F.count("n_tok").alias("cnt_n_tok"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
        F.count("doc_id").alias("cnt_doc_id"),
    ).collect()[0].asDict()
    assert got == exp

    # partition-aligned scope with the data directory RENAMED AWAY: the
    # answer must come from metadata alone (zero data bytes readable)
    src = sorted({f.partition_values["source"] for f in t.snapshot().files})[0]
    exp_src = (
        full.where(F.col("source") == src)
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.min("n_tok").alias("min_n_tok"),
            F.max("n_tok").alias("max_n_tok"),
            F.count("n_tok").alias("cnt_n_tok"),
        )
        .collect()[0]
        .asDict()
    )
    os.rename(t.data_dir, t.data_dir + ".hidden")
    try:
        got_src = (
            metadata_aggregate(spark, t, ["n_tok"], scope=[("source", "=", src)])
            .collect()[0]
            .asDict()
        )
    finally:
        os.rename(t.data_dir + ".hidden", t.data_dir)
    assert got_src == exp_src

    # straddling range scope: hybrid metadata + boundary-file scan
    got_rng = (
        metadata_aggregate(spark, t, ["n_tok"], scope=[("n_tok", ">=", 10)])
        .collect()[0]
        .asDict()
    )
    exp_rng = (
        full.where("n_tok >= 10")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.min("n_tok").alias("min_n_tok"),
            F.max("n_tok").alias("max_n_tok"),
            F.count("n_tok").alias("cnt_n_tok"),
        )
        .collect()[0]
        .asDict()
    )
    assert got_rng == exp_rng

    # empty scope → typed single row of zeros/nulls
    z = (
        metadata_aggregate(spark, t, ["n_tok"], scope=[("n_tok", ">", 10**9)])
        .collect()[0]
        .asDict()
    )
    assert z == {"cnt": 0, "min_n_tok": None, "max_n_tok": None, "cnt_n_tok": 0}


def test_metadata_aggregate_refuses_live_deletes_but_serves_pinned_version(
    spark, tmp_table_root
):
    import pytest as _pytest

    from kafka_delta_ingest_spark.table.format import TableError
    from kafka_delta_ingest_spark.table.inspect import metadata_aggregate

    t = _build(spark, tmp_table_root)
    before = metadata_aggregate(spark, t, ["n_tok"]).collect()[0].asDict()
    v = t.latest_version()
    delete_where(spark, t, [("n_tok", "=", 5)], mode="merge_on_read")
    with _pytest.raises(TableError):
        metadata_aggregate(spark, t, ["n_tok"])
    # the pre-delete snapshot still answers (snapshot isolation)
    pinned = metadata_aggregate(spark, t, ["n_tok"], version=v).collect()[0].asDict()
    assert pinned == before


def test_partitions_metadata_table(spark, tmp_path):
    from kafka_delta_ingest_spark.table.format import Transaction
    from kafka_delta_ingest_spark.table.inspect import partitions_df
    from kafka_delta_ingest_spark.table.writer import stage_dataframe

    t = Table.create(str(tmp_path / "t"), TOKENS_SCHEMA, ["source"])
    df = tokens_df(spark, 300, max_tok=8).repartition(4)
    write_dataframe(spark, t, df)
    snap = t.snapshot()
    got = {tuple(sorted(r["partition"].items())): r
           for r in partitions_df(spark, t).collect()}
    # one row per source partition, totals match the manifest exactly
    for key, r in got.items():
        src = dict(key)["source"]
        fs = [f for f in snap.files if f.partition_values["source"] == src]
        assert r["file_count"] == len(fs)
        assert r["row_count"] == sum(f.num_records for f in fs)
        assert r["total_bytes"] == sum(f.size for f in fs)
        assert r["spec"] == "source"
    assert sum(r["row_count"] for r in got.values()) == snap.num_records()

    # mixed-spec table (partition evolution): specs group separately
    t.evolve_partitioning([])
    add = tokens_df(spark, 50, max_tok=8, seed=9).withColumn(
        "doc_id", F.concat(F.lit("x"), "doc_id")
    )
    s2 = t.snapshot()
    _, adds = stage_dataframe(spark, t, add, s2.partition_cols, s2.schema)
    t.commit(Transaction(operation="append", adds=adds))
    rows = partitions_df(spark, t).collect()
    specs = {r["spec"] for r in rows}
    assert specs == {"source", ""}

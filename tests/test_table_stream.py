"""Streaming SOURCE over the table (sources/table_stream.py): table
versions as offsets, appends as micro-batches — the reference's
offset-checkpointed Kafka consumption (src/lib.rs:1026-1046) pointed
downstream. Real `readStream` queries against a real checkpoint."""

import os
import time

import pytest
from pyspark.sql import functions as F

from kafka_delta_ingest_spark.datagen import TOKENS_SCHEMA, tokens_df
from kafka_delta_ingest_spark.sources.table_stream import (
    TableAppendsDataSource,
)
from kafka_delta_ingest_spark.table.format import Table
from kafka_delta_ingest_spark.table.writer import write_dataframe


def _register(spark):
    try:
        spark.dataSource.register(TableAppendsDataSource)
    except Exception:  # noqa: BLE001 — already registered in this session
        pass


def _start(spark, root, checkpoint, name, starting="earliest"):
    _register(spark)
    return (
        spark.readStream.format("kdi-table-appends")
        .option("path", root)
        .option("startingVersion", starting)
        .load()
        .writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def _await_rows(spark, name, n, q, timeout=180):
    deadline = time.time() + timeout
    while time.time() < deadline:
        if q.exception() is not None:
            raise AssertionError(f"query failed: {q.exception()}")
        if spark.sql(f"select count(*) c from {name}").first()["c"] >= n:
            return
        time.sleep(0.5)
    raise AssertionError(f"timed out waiting for {n} rows in {name}")


def _rowset(df):
    return {
        (r["doc_id"], r["n_tok"], tuple(r["tokens"] or ()), r["source"])
        for r in df.collect()
    }


def test_stream_appends_bootstrap_live_and_restart(spark, tmp_path):
    """earliest-bootstrap sees every appended row exactly once with
    correct partition-column reconstruction and per-row _commit_version;
    an interleaved compaction (data_change=False) is invisible; a live
    append is picked up; a restart from the checkpoint emits ONLY rows
    committed after the stop — the exactly-once resume the reference
    gets from stored Kafka offsets. Sink = the fault-tolerant file sink
    (memory sink cannot recover from a checkpoint)."""
    from kafka_delta_ingest_spark.maintenance.compact import compact

    root = str(tmp_path / "t")
    t = Table.create(root, TOKENS_SCHEMA, ["source"])
    write_dataframe(spark, t, tokens_df(spark, 60, max_tok=16))  # v1
    write_dataframe(
        spark,
        t,
        tokens_df(spark, 40, seed=7, max_tok=16).withColumn(
            "doc_id", F.concat(F.lit("b-"), "doc_id")
        ),
    )  # v2
    compact(spark, t, target_file_bytes=64 * 1024 * 1024, job_id="c")  # v3

    ckpt, outd = str(tmp_path / "ckpt"), str(tmp_path / "out")
    _register(spark)

    def start_to_files():
        return (
            spark.readStream.format("kdi-table-appends")
            .option("path", root)
            .option("startingVersion", "earliest")
            .load()
            .writeStream.format("parquet")
            .option("path", outd)
            .option("checkpointLocation", ckpt)
            .start()
        )

    def out_df():
        return spark.read.parquet(outd)  # respects the sink's _spark_metadata

    def await_out(n, q, timeout=180):
        deadline = time.time() + timeout
        while time.time() < deadline:
            if q.exception() is not None:
                raise AssertionError(f"query failed: {q.exception()}")
            try:
                if out_df().count() >= n:
                    return
            except Exception:  # noqa: BLE001 — sink dir not created yet
                pass
            time.sleep(0.5)
        raise AssertionError(f"timed out waiting for {n} sink rows")

    q = start_to_files()
    try:
        await_out(100, q)
        # live append while the query runs
        write_dataframe(
            spark,
            t,
            tokens_df(spark, 30, seed=9, max_tok=16).withColumn(
                "doc_id", F.concat(F.lit("c-"), "doc_id")
            ),
        )  # v4
        await_out(130, q)
    finally:
        q.stop()
        q.awaitTermination()

    got = out_df()
    assert _rowset(got) == _rowset(t.snapshot().scan(spark))  # values + partition col
    vers = {
        r["v"]: r["c"]
        for r in got.groupBy(F.col("_commit_version").alias("v"))
        .agg(F.count("*").alias("c"))
        .collect()
    }
    assert vers == {1: 60, 2: 40, 4: 30}  # v3 (compaction) emitted nothing

    # restart from the checkpoint: only post-stop commits are added,
    # already-consumed versions are never re-emitted
    write_dataframe(
        spark,
        t,
        tokens_df(spark, 10, seed=11, max_tok=16).withColumn(
            "doc_id", F.concat(F.lit("d-"), "doc_id")
        ),
    )  # v5
    q2 = start_to_files()
    try:
        await_out(140, q2)
        time.sleep(1.0)
    finally:
        q2.stop()
        q2.awaitTermination()
    got2 = out_df()
    assert got2.count() == 140  # exactly once: no duplicates of v1-v4
    new = got2.where(F.col("_commit_version") == 5)
    assert new.count() == 10
    assert {r["doc_id"][:2] for r in new.collect()} == {"d-"}


def test_stream_rejects_dml_in_range(spark, tmp_path):
    """Row-level DML is not expressible as an append delta: the batch
    that would span it fails loudly (incremental_scan semantics)."""
    from kafka_delta_ingest_spark.maintenance.dml import delete_where

    root = str(tmp_path / "t")
    t = Table.create(root, TOKENS_SCHEMA, [])
    write_dataframe(spark, t, tokens_df(spark, 50, max_tok=16))  # v1
    delete_where(spark, t, [("n_tok", ">", 8)])  # v2: removes files

    q = _start(spark, root, str(tmp_path / "ckpt"), "sink_dml")
    try:
        deadline = time.time() + 120
        while time.time() < deadline and q.exception() is None:
            time.sleep(0.5)
        exc = q.exception()
        assert exc is not None and "append-only" in str(exc)
    finally:
        q.stop()


def test_stream_latest_skips_history(spark, tmp_path):
    """startingVersion=latest (default): history before query start is
    never emitted — the tail-consumer mode."""
    root = str(tmp_path / "t")
    t = Table.create(root, TOKENS_SCHEMA, [])
    write_dataframe(spark, t, tokens_df(spark, 50, max_tok=16))  # v1

    q = _start(spark, root, str(tmp_path / "ckpt"), "sink_l", starting="latest")
    try:
        time.sleep(2.0)
        write_dataframe(
            spark,
            t,
            tokens_df(spark, 20, seed=3, max_tok=16).withColumn(
                "doc_id", F.concat(F.lit("n-"), "doc_id")
            ),
        )  # v2
        _await_rows(spark, "sink_l", 20, q)
        time.sleep(1.0)
    finally:
        q.stop()
        q.awaitTermination()
    rows = spark.sql("select * from sink_l").collect()
    assert len(rows) == 20
    assert {r["_commit_version"] for r in rows} == {2}

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


# ----------------------------------------------------------------- sink


def test_stream_sink_table_to_table_pipeline(spark, tmp_path):
    """Source half + sink half composed: a table→table streaming
    pipeline. Each micro-batch lands in the destination as ONE atomic
    commit (buffer-then-commit, the reference's core loop); partition
    layout, write.sort.order, and app-txn batch bookkeeping all applied
    by the Spark-free arrow sink path."""
    import pyarrow.parquet as pq

    src_root, dst_root = str(tmp_path / "src"), str(tmp_path / "dst")
    a = Table.create(src_root, TOKENS_SCHEMA, ["source"])
    write_dataframe(spark, a, tokens_df(spark, 80, max_tok=16))  # v1
    b = Table.create(
        dst_root, TOKENS_SCHEMA, ["source"],
        properties={"write.sort.order": "n_tok ASC"},
    )

    _register(spark)
    q = (
        spark.readStream.format("kdi-table-appends")
        .option("path", src_root)
        .option("startingVersion", "earliest")
        .load()
        .select("doc_id", "tokens", "n_tok", "source")  # drop _commit_version
        .writeStream.format("kdi-table-appends")
        .option("path", dst_root)
        .option("txnAppId", "pipe-a-to-b")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )

    def await_dst(n, timeout=180):
        deadline = time.time() + timeout
        while time.time() < deadline:
            if q.exception() is not None:
                raise AssertionError(f"query failed: {q.exception()}")
            if Table(dst_root).latest_version() >= 1:
                if b.snapshot().num_records() >= n:
                    return
            time.sleep(0.5)
        raise AssertionError(f"timed out waiting for {n} rows in dst")

    try:
        await_dst(80)
        write_dataframe(
            spark,
            a,
            tokens_df(spark, 20, seed=5, max_tok=16).withColumn(
                "doc_id", F.concat(F.lit("x-"), "doc_id")
            ),
        )  # v2 on the source
        await_dst(100)
    finally:
        q.stop()
        q.awaitTermination()

    snap = b.snapshot()
    assert _rowset(snap.scan(spark)) == _rowset(a.snapshot().scan(spark))
    # partition layout is real (hive paths per source value)
    assert all("source=" in f.path for f in snap.files)
    # write.sort.order applied inside every sink-written file
    for f in snap.files:
        vals = pq.read_table(
            os.path.join(b.root, f.path), columns=["n_tok"]
        )["n_tok"].to_pylist()
        assert vals == sorted(vals), f"{f.path} not ASC-sorted"
    # app-txn bookkeeping: the destination records the source batch ids
    assert "pipe-a-to-b" in snap.app_txns


def test_stream_sink_replayed_batch_drops_duplicates(spark, tmp_path):
    """Crash-replay of a committed micro-batch: the app-txn
    refuse-to-regress guard rejects the second commit and the duplicate
    staged files are dropped — exactly-once without reading the table."""
    import pyarrow as pa

    from kafka_delta_ingest_spark.sources.table_stream import (
        TableStreamWriter,
    )

    root = str(tmp_path / "t")
    t = Table.create(root, TOKENS_SCHEMA, [])
    w = TableStreamWriter(root, TOKENS_SCHEMA, [], {}, "job-1")

    def batch(ids):
        return pa.RecordBatch.from_pydict(
            {
                "doc_id": [str(i) for i in ids],
                "tokens": [[i, i + 1] for i in ids],
                "n_tok": [2] * len(ids),
                "source": ["web"] * len(ids),
            },
            schema=pa.schema(
                [
                    ("doc_id", pa.string()),
                    ("tokens", pa.list_(pa.int32())),
                    ("n_tok", pa.int32()),
                    ("source", pa.string()),
                ]
            ),
        )

    m1 = w.write(iter([batch([1, 2, 3])]))
    w.commit([m1], batchId=0)
    assert t.snapshot().num_records() == 3

    # replay of batch 0 (same content re-staged by a restarted task)
    m1b = w.write(iter([batch([1, 2, 3])]))
    w.commit([m1b], batchId=0)
    assert t.latest_version() == 1  # no new commit
    assert t.snapshot().num_records() == 3
    for r in m1b.rel_paths:  # duplicate staging removed from disk
        assert not os.path.exists(os.path.join(root, r))

    # the NEXT batch commits normally
    m2 = w.write(iter([batch([4])]))
    w.commit([m2], batchId=1)
    assert t.snapshot().num_records() == 4
    assert t.snapshot().app_txns["job-1"] == 1

    # abort drops staged files
    m3 = w.write(iter([batch([9])]))
    w.abort([m3], batchId=2)
    assert all(
        not os.path.exists(os.path.join(root, r)) for r in m3.rel_paths
    )
    assert t.snapshot().num_records() == 4


def test_stream_sink_planning_rejections(spark, tmp_path):
    """Schema drift, transformed partition specs, and CHECK-constrained
    tables are rejected at PLANNING time, before any task runs."""
    from kafka_delta_ingest_spark.sources.table_stream import (
        TableAppendsDataSource,
    )

    root = str(tmp_path / "t")
    Table.create(root, TOKENS_SCHEMA, [])
    ds = TableAppendsDataSource({"path": root})
    import pyspark.sql.types as T

    bad = T.StructType([T.StructField("doc_id", T.StringType())])
    with pytest.raises(ValueError, match="stream schema"):
        ds.streamWriter(bad, overwrite=False)
    with pytest.raises(ValueError, match="append-only"):
        ds.streamWriter(TOKENS_SCHEMA, overwrite=True)

    root2 = str(tmp_path / "t2")
    Table.create(
        root2, TOKENS_SCHEMA, [],
        properties={"constraint.pos": "n_tok > 0"},
    )
    with pytest.raises(ValueError, match="CHECK constraints"):
        TableAppendsDataSource({"path": root2}).streamWriter(
            TOKENS_SCHEMA, overwrite=False
        )

    root3 = str(tmp_path / "t3")
    Table.create(root3, TOKENS_SCHEMA, ["bucket(4,doc_id)"])
    with pytest.raises(ValueError, match="identity partition"):
        TableAppendsDataSource({"path": root3}).streamWriter(
            TOKENS_SCHEMA, overwrite=False
        )


def test_max_versions_per_trigger_bounds_batches(spark, tmp_path):
    """Admission control (the Kafka maxOffsetsPerTrigger analogue): with
    maxVersionsPerTrigger=2 a 6-version backlog drains in >= 3 bounded
    micro-batches — each planned range spans at most 2 versions — and
    still delivers every row exactly once."""
    root = str(tmp_path / "t")
    t = Table.create(root, TOKENS_SCHEMA, ["source"])
    for s in range(6):
        write_dataframe(spark, t, tokens_df(spark, 10, seed=s, max_tok=8))
    _register(spark)
    q = (
        spark.readStream.format("kdi-table-appends")
        .option("path", root)
        .option("startingVersion", "earliest")
        .option("maxVersionsPerTrigger", "2")
        .load()
        .writeStream.format("memory")
        .queryName("mvpt")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        _await_rows(spark, "mvpt", 60, q)
        import ast

        def _ver(raw):
            # the python-datasource offset lands in progress as the
            # dict's repr (single quotes, 'None' for the stream start)
            v = ast.literal_eval(raw) if raw else None
            return v["version"] if v else -1

        spans = []
        for p in q.recentProgress:
            if p["numInputRows"] == 0:
                continue
            end = _ver(p["sources"][0]["endOffset"])
            start = _ver(p["sources"][0]["startOffset"])
            spans.append(end - start)
        assert len(spans) >= 3
        assert all(0 < s <= 2 for s in spans)
        got = {
            (r["doc_id"], r["_commit_version"])
            for r in spark.sql("select doc_id, _commit_version from mvpt").collect()
        }
        assert len(got) == 60  # every row exactly once, all versions
    finally:
        q.stop()


def test_max_versions_per_trigger_survives_checkpoint_restart(
    spark, tmp_path
):
    """The stall hazard the probe design exists for: a RESTARTED capped
    stream has no in-memory base (Spark calls latestOffset before
    initialOffset, and initialOffset not at all on restart) — the probe
    must hunt forward from the stale starting base past the checkpointed
    position and deliver post-stop appends in bounded batches, never
    re-emitting consumed versions and never stalling."""
    root = str(tmp_path / "t")
    t = Table.create(root, TOKENS_SCHEMA, ["source"])
    for s in range(4):
        write_dataframe(spark, t, tokens_df(spark, 10, seed=s, max_tok=8))
    ckpt, outd = str(tmp_path / "ckpt"), str(tmp_path / "out")
    _register(spark)

    def start_capped():
        return (
            spark.readStream.format("kdi-table-appends")
            .option("path", root)
            .option("startingVersion", "earliest")
            .option("maxVersionsPerTrigger", "2")
            .load()
            .writeStream.format("parquet")
            .option("path", outd)
            .option("checkpointLocation", ckpt)
            .start()
        )

    def await_out(n, q, timeout=120):
        deadline = time.time() + timeout
        while time.time() < deadline:
            if q.exception() is not None:
                raise AssertionError(f"query failed: {q.exception()}")
            try:
                if spark.read.parquet(outd).count() >= n:
                    return
            except Exception:  # noqa: BLE001 — sink dir not created yet
                pass
            time.sleep(0.5)
        raise AssertionError(f"timed out waiting for {n} sink rows")

    q = start_capped()
    try:
        await_out(40, q)
    finally:
        q.stop()
        q.awaitTermination()

    # three more appends while the stream is down
    for s in range(4, 7):
        write_dataframe(spark, t, tokens_df(spark, 10, seed=s, max_tok=8))

    q2 = start_capped()
    try:
        await_out(70, q2)  # would time out if the capped restart stalled
    finally:
        q2.stop()
        q2.awaitTermination()

    got = spark.read.parquet(outd)
    assert got.count() == 70  # exactly once across the restart
    vers = {
        r["_commit_version"]
        for r in got.select("_commit_version").distinct().collect()
    }
    assert vers == set(range(1, 8))

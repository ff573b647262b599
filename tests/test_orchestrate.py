"""Per-partition maintenance orchestration (maintenance/orchestrate.py):
candidate selection from the partitions rollup, one scoped OPTIMIZE +
atomic commit per partition, crash-resumable by reselection."""

from pyspark.sql import functions as F

from kafka_delta_ingest_spark.datagen import TOKENS_SCHEMA, tokens_df
from kafka_delta_ingest_spark.maintenance.orchestrate import (
    fragmented_partitions,
    optimize_partitions,
)
from kafka_delta_ingest_spark.table.format import Table
from kafka_delta_ingest_spark.table.writer import write_dataframe

TARGET = 64 * 1024 * 1024


def _rows(df):
    return {r["doc_id"]: (r["tokens"], r["source"]) for r in df.collect()}


def test_partition_sweep_optimizes_only_fragmented(spark, tmp_path):
    from kafka_delta_ingest_spark.maintenance.optimize import optimize

    t = Table.create(str(tmp_path / "t"), TOKENS_SCHEMA, ["source"])
    # many small commits -> every partition fragments
    df = tokens_df(spark, 400, max_tok=8)
    for i in range(6):
        write_dataframe(spark, t, df.where(
            F.substring("doc_id", 5, 12).cast("long") % 6 == i))
    before = _rows(t.snapshot().scan(spark))

    # pre-optimize ONE partition so it stops looking fragmented
    optimize(spark, t, dims=["n_tok", "doc_id"], curve="zorder",
             target_file_bytes=TARGET, scope=[("source", "=", "web")])
    frag_before = fragmented_partitions(spark, t, TARGET, min_files=4)
    frag_sources = {c["partition"]["source"] for c in frag_before}
    assert "web" not in frag_sources and len(frag_sources) >= 3

    m = optimize_partitions(
        spark, t, dims=["n_tok", "doc_id"], target_file_bytes=TARGET,
        min_files=4, job_id="sweep",
    )
    assert m["partitions_optimized"] == len(frag_before)
    # every optimized partition collapsed its files; one commit each
    for r in m["results"]:
        assert r["files_rewritten"] >= 4 and r["files_written"] >= 1
    # content untouched (token-array equality)
    assert _rows(t.snapshot().scan(spark)) == before
    # rerun: nothing fragmented remains (resume-by-reselection)
    m2 = optimize_partitions(
        spark, t, dims=["n_tok", "doc_id"], target_file_bytes=TARGET,
        min_files=4,
    )
    assert m2["partitions_optimized"] == 0


def test_sweep_respects_max_partitions(spark, tmp_path):
    t = Table.create(str(tmp_path / "t"), TOKENS_SCHEMA, ["source"])
    df = tokens_df(spark, 300, max_tok=8)
    for i in range(5):
        write_dataframe(spark, t, df.where(
            F.substring("doc_id", 5, 12).cast("long") % 5 == i))
    n_frag = len(fragmented_partitions(spark, t, TARGET, min_files=4))
    assert n_frag >= 2
    m = optimize_partitions(
        spark, t, dims=["n_tok", "doc_id"], target_file_bytes=TARGET,
        min_files=4, max_partitions=1,
    )
    assert m["partitions_optimized"] == 1
    assert len(fragmented_partitions(spark, t, TARGET, min_files=4)) == n_frag - 1


def test_sweep_on_hidden_partitioned_table(spark, tmp_path):
    """The sweep's scope conjuncts are on recorded partition KEYS —
    including transform-derived ones (doc_id_bucket_N) — so hidden-
    partitioned tables sweep per bucket."""
    t = Table.create(str(tmp_path / "t"), TOKENS_SCHEMA, ["bucket(3,doc_id)"])
    df = tokens_df(spark, 300, max_tok=8)
    for i in range(5):
        write_dataframe(spark, t, df.where(
            F.substring("doc_id", 5, 12).cast("long") % 5 == i))
    before = _rows(t.snapshot().scan(spark))
    frag = fragmented_partitions(spark, t, TARGET, min_files=4)
    assert frag and all(
        set(c["partition"]) == {"doc_id_bucket_3"} for c in frag
    )
    m = optimize_partitions(
        spark, t, dims=["n_tok", "doc_id"], target_file_bytes=TARGET,
        min_files=4,
    )
    assert m["partitions_optimized"] == len(frag)
    assert _rows(t.snapshot().scan(spark)) == before
    assert not fragmented_partitions(spark, t, TARGET, min_files=4)

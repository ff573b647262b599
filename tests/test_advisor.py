"""Maintenance advisor (metadata-only policy): recommends compact/optimize
on small-file pressure + clustering drift, expire/gc on log length."""

from kafka_delta_ingest_spark.datagen import TOKENS_SCHEMA, tokens_df
from kafka_delta_ingest_spark.maintenance.advisor import advise
from kafka_delta_ingest_spark.maintenance.optimize import optimize
from kafka_delta_ingest_spark.table.format import Table
from kafka_delta_ingest_spark.table.writer import write_dataframe


def _ops(recs):
    return [r.op for r in recs]


def test_fragmented_table_gets_compact_urgent(spark, tmp_table_root):
    t = Table.create(tmp_table_root, TOKENS_SCHEMA, ["source"])
    write_dataframe(spark, t, tokens_df(spark, 400, max_tok=16).repartition(10))
    recs = advise(t, target_file_bytes=8 * 1024 * 1024)
    assert _ops(recs)[0] == "compact"
    assert recs[0].severity == "urgent"  # every file is tiny


def test_cluster_drift_upgrades_to_optimize(spark, tmp_table_root):
    t = Table.create(tmp_table_root, TOKENS_SCHEMA, ["source"])
    write_dataframe(spark, t, tokens_df(spark, 400, max_tok=16).repartition(10))
    recs = advise(t, target_file_bytes=8 * 1024 * 1024, cluster_dims=["n_tok"])
    assert _ops(recs)[0] == "optimize"
    assert recs[0].kwargs["dims"] == ["n_tok"]


def test_healthy_table_needs_nothing(spark, tmp_table_root):
    t = Table.create(tmp_table_root, TOKENS_SCHEMA, ["source"])
    write_dataframe(spark, t, tokens_df(spark, 400, max_tok=16).repartition(10))
    optimize(spark, t, dims=["n_tok"], target_file_bytes=64 * 1024 * 1024)
    # post-optimize, files are few+large relative to a 2 KiB target and
    # one-per-partition (no neighbor pairs to overlap)
    recs = advise(t, target_file_bytes=2 * 1024, cluster_dims=["n_tok"])
    assert recs == []


def test_long_log_gets_expire_then_gc(spark, tmp_table_root):
    t = Table.create(tmp_table_root, TOKENS_SCHEMA, ["source"])
    for _ in range(6):
        write_dataframe(spark, t, tokens_df(spark, 20, max_tok=8))
    recs = advise(t, target_file_bytes=1, max_retained_versions=5)
    ops = _ops(recs)
    assert "expire" in ops and "gc" in ops
    assert ops.index("expire") < ops.index("gc")


def test_mor_delete_pressure_recommends_rewrite_deletes(spark, tmp_table_root):
    from kafka_delta_ingest_spark.maintenance.dml import delete_where

    t = Table.create(tmp_table_root, TOKENS_SCHEMA, ["source"])
    write_dataframe(spark, t, tokens_df(spark, 400, max_tok=16).repartition(2))
    # one delete file marking a material fraction of covered rows
    delete_where(spark, t, [("n_tok", ">=", 4)], mode="merge_on_read")
    recs = advise(t, target_file_bytes=2 * 1024)
    assert "rewrite-deletes" in _ops(recs)
    rd = next(r for r in recs if r.op == "rewrite-deletes")
    assert "delete file" in rd.reason

    # folding clears the recommendation
    from kafka_delta_ingest_spark.maintenance.dml import rewrite_position_deletes

    rewrite_position_deletes(spark, t)
    assert "rewrite-deletes" not in _ops(advise(t, target_file_bytes=2 * 1024))


def test_advisor_flags_stale_ndv_stats(spark, tmp_table_root):
    """Once >=25% of live files postdate the ANALYZE artifact the advisor
    recommends an incremental re-ANALYZE over the analyzed columns; a
    fresh artifact (or none at all) stays silent."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from kafka_delta_ingest_spark.maintenance.advisor import advise
    from kafka_delta_ingest_spark.maintenance.analyze import analyze
    from kafka_delta_ingest_spark.table.format import Table
    from kafka_delta_ingest_spark.table.writer import write_dataframe

    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("n_tok", T.IntegerType()),
        ]
    )

    def rows(a, n):
        return spark.range(a, a + n).select(
            F.col("id").cast("string").alias("doc_id"),
            (F.col("id") % 11).cast("int").alias("n_tok"),
        )

    t = Table.create(tmp_table_root, schema)
    write_dataframe(spark, t, rows(0, 100).repartition(2))
    assert not [r for r in advise(t) if r.op == "analyze"]  # no artifact

    analyze(spark, t, ["doc_id"])
    assert not [r for r in advise(t) if r.op == "analyze"]  # fresh

    write_dataframe(spark, t, rows(100, 100).repartition(4))
    recs = [r for r in advise(t) if r.op == "analyze"]
    assert recs and recs[0].kwargs["columns"] == ["doc_id"]


def test_delete_file_accumulation_prefers_minor_compaction(spark, tmp_table_root):
    """Many point-delete files with an immaterial deleted fraction get
    the cheap remedy (consolidate delete files) instead of the data
    rewrite; executing it clears the recommendation."""
    from kafka_delta_ingest_spark.maintenance.dml import (
        compact_position_deletes,
        delete_where,
    )

    t = Table.create(tmp_table_root, TOKENS_SCHEMA, [])
    write_dataframe(
        spark, t, tokens_df(spark, 2000, max_tok=16).repartition(2)
    )
    for n in range(8):
        delete_where(spark, t, [("doc_id", "=", f"doc-{n:012d}")],
                     mode="merge_on_read")
    recs = advise(t, target_file_bytes=2 * 1024)
    ops = _ops(recs)
    assert "compact-deletes" in ops and "rewrite-deletes" not in ops
    compact_position_deletes(spark, t)
    ops2 = _ops(advise(t, target_file_bytes=2 * 1024))
    assert "compact-deletes" not in ops2 and "rewrite-deletes" not in ops2


def test_suggest_cluster_dims_from_ndv(spark, tmp_path):
    """Stats-driven Z-order dim selection: high-NDV columns first,
    partition-source columns excluded, None without an artifact."""
    from kafka_delta_ingest_spark.datagen import make_small_file_table
    from kafka_delta_ingest_spark.maintenance.advisor import (
        advise,
        suggest_cluster_dims,
    )
    from kafka_delta_ingest_spark.maintenance.analyze import analyze

    t = make_small_file_table(spark, str(tmp_path / "p"), n_docs=300,
                              n_files=6, max_tok=32)  # partitioned by source
    assert suggest_cluster_dims(t) is None  # no artifact yet
    analyze(spark, t, ["doc_id", "n_tok", "source"])
    dims = suggest_cluster_dims(t)
    # source is a partition-spec source column -> excluded; doc_id has
    # the highest NDV (unique) -> first
    assert dims == ["doc_id", "n_tok"]
    # advise() with no prescribed dims uses the suggestion
    recs = advise(t)
    opt = [r for r in recs if r.op == "optimize"]
    assert opt and opt[0].kwargs["dims"] == ["doc_id", "n_tok"]

    t2 = make_small_file_table(spark, str(tmp_path / "u"), n_docs=300,
                               n_files=6, max_tok=32,
                               partition_by_source=False)
    analyze(spark, t2, ["doc_id", "n_tok", "source"])
    assert suggest_cluster_dims(t2) == ["doc_id", "n_tok", "source"]


def test_advisor_flags_stale_bloom_artifact(spark, tmp_table_root):
    """Once >=10% of live files postdate the bloom artifact the advisor
    recommends an incremental rebuild carrying the artifact's probe
    parameters; a fresh artifact (or none) stays silent. Stale blooms are
    still CORRECT (uncovered files stay touched) — the recommendation is
    about pruning effectiveness, hence the lower threshold than NDV."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from kafka_delta_ingest_spark.maintenance.advisor import advise
    from kafka_delta_ingest_spark.maintenance.bloom import build_bloom
    from kafka_delta_ingest_spark.table.format import Table
    from kafka_delta_ingest_spark.table.writer import write_dataframe

    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("n_tok", T.IntegerType()),
        ]
    )

    def rows(a, n):
        return spark.range(a, a + n).select(
            F.col("id").cast("string").alias("doc_id"),
            (F.col("id") % 11).cast("int").alias("n_tok"),
        )

    t = Table.create(tmp_table_root, schema)
    write_dataframe(spark, t, rows(0, 100).repartition(4))
    assert not [r for r in advise(t) if r.op == "bloom"]  # no artifact

    build_bloom(spark, t, ["doc_id"], bits_per_key=12, k=5)
    assert not [r for r in advise(t) if r.op == "bloom"]  # fresh

    write_dataframe(spark, t, rows(100, 50).repartition(2))
    recs = [r for r in advise(t) if r.op == "bloom"]
    assert recs
    kw = recs[0].kwargs
    assert kw["columns"] == ["doc_id"]
    assert (kw["bits_per_key"], kw["k"]) == (12, 5)
    # executing the recommendation restores silence
    build_bloom(spark, t, **kw)
    assert not [r for r in advise(t) if r.op == "bloom"]

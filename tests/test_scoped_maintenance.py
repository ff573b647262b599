"""Scoped (per-partition) maintenance: compact/cluster/optimize over a
metadata-pruned file subset — how maintenance actually runs at 10^12-row
scale (per partition/day, never whole-table). Files outside the scope must
be byte-untouched; whole-table contents preserved."""

from pyspark.sql import functions as F

from kafka_delta_ingest_spark.datagen import TOKENS_SCHEMA, tokens_df
from kafka_delta_ingest_spark.maintenance.compact import compact
from kafka_delta_ingest_spark.maintenance.optimize import optimize
from kafka_delta_ingest_spark.table.format import Table
from kafka_delta_ingest_spark.table.writer import write_dataframe


def _checksum(df):
    return (
        df.select(
            F.sum(
                F.xxhash64("doc_id", F.hash("tokens"), "n_tok").cast("decimal(38,0)")
            ).alias("h")
        ).first()["h"]
    )


def _fragmented(spark, root, n=600):
    t = Table.create(root, TOKENS_SCHEMA, ["source"])
    write_dataframe(spark, t, tokens_df(spark, n, max_tok=32).repartition(12))
    return t


def test_scoped_compact_touches_only_matching_partition(spark, tmp_table_root):
    t = _fragmented(spark, tmp_table_root)
    before = _checksum(t.snapshot().scan(spark))
    snap0 = t.snapshot()
    target_src = snap0.files[0].partition_values["source"]
    outside_before = {
        f.path for f in snap0.files if f.partition_values.get("source") != target_src
    }
    m = compact(
        spark, t, target_file_bytes=64 * 1024 * 1024,
        job_id="scoped", scope=[("source", "=", target_src)],
    )
    assert m["files_rewritten"] > 0
    snap1 = t.snapshot()
    outside_after = {
        f.path for f in snap1.files if f.partition_values.get("source") != target_src
    }
    assert outside_after == outside_before  # untouched files keep identity
    # scoped partition now one file
    inside = [f for f in snap1.files if f.partition_values.get("source") == target_src]
    assert len(inside) == 1
    assert _checksum(snap1.scan(spark)) == before


def test_scoped_optimize_preserves_contents_and_prunes_work(spark, tmp_table_root):
    t = _fragmented(spark, tmp_table_root)
    before = _checksum(t.snapshot().scan(spark))
    snap0 = t.snapshot()
    target_src = snap0.files[0].partition_values["source"]
    n_scoped = sum(
        1 for f in snap0.files if f.partition_values.get("source") == target_src
    )
    m = optimize(
        spark, t, dims=["source", "n_tok", "doc_id"], curve="zorder",
        target_file_bytes=64 * 1024 * 1024, verify=True,
        scope=[("source", "=", target_src)],
    )
    assert m["files_rewritten"] == n_scoped < len(snap0.files)
    assert _checksum(t.snapshot().scan(spark)) == before


def test_scope_matching_nothing_is_a_noop(spark, tmp_table_root):
    t = _fragmented(spark, tmp_table_root, n=100)
    v0 = t.latest_version()
    compact(spark, t, scope=[("source", "=", "no-such-source")], job_id="noop")
    assert t.latest_version() == v0  # nothing planned, nothing committed

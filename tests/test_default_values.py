"""Iceberg-v3 initial column defaults (table/format.py evolve_schema
defaults=): files that predate the column read the default instead of
NULL — metadata-only, decided by the data-sequence-number test."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_delta_ingest_spark.datagen import make_small_file_table, tokens_df
from kafka_delta_ingest_spark.functions.verify import content_fingerprint
from kafka_delta_ingest_spark.table.format import SchemaEvolutionError
from kafka_delta_ingest_spark.table.writer import write_dataframe


def _with_weight(schema, default_type=T.IntegerType()):
    return T.StructType(
        list(schema.fields) + [T.StructField("weight", default_type, True)]
    )


def test_old_files_read_default_new_rows_keep_explicit(spark, tmp_table_root):
    t = make_small_file_table(spark, tmp_table_root, n_docs=100, n_files=4,
                              max_tok=8)
    t.evolve_schema(_with_weight(t.snapshot().schema), defaults={"weight": 7})
    snap = t.snapshot()
    assert snap.defaults["weight"]["value"] == 7
    got = snap.scan(spark)
    assert got.where(F.col("weight") == 7).count() == 100  # every old row

    # appended rows keep what the writer supplied — including explicit NULL
    extra = (
        tokens_df(spark, 10, seed=3, max_tok=8)
        .withColumn("doc_id", F.concat(F.lit("n-"), F.col("doc_id")))
        .withColumn(
            "weight",
            F.when(F.col("doc_id") < "n-doc-000000000005", F.lit(42))
            .otherwise(F.lit(None))
            .cast("int"),
        )
    )
    write_dataframe(spark, t, extra)
    got = t.snapshot().scan(spark)
    assert got.where(F.col("weight") == 42).count() == 5
    assert got.where(F.col("weight").isNull()).count() == 5
    assert got.where(F.col("weight") == 7).count() == 100

    # time travel: pre-default snapshots have no weight column at all
    assert "weight" not in t.snapshot(1).scan(spark).columns


def test_rewrite_materializes_defaults(spark, tmp_table_root):
    from kafka_delta_ingest_spark.maintenance.compact import compact

    t = make_small_file_table(spark, tmp_table_root, n_docs=100, n_files=4,
                              max_tok=8)
    t.evolve_schema(_with_weight(t.snapshot().schema), defaults={"weight": 9})
    fp = content_fingerprint(t.snapshot().scan(spark))
    compact(spark, t, target_file_bytes=64 * 1024 * 1024, job_id="dv-c")
    # the rewrite read defaults through snap.read and wrote them as
    # concrete values — scan identical before/after
    assert content_fingerprint(t.snapshot().scan(spark)) == fp
    assert t.snapshot().scan(spark).where(F.col("weight") == 9).count() == 100


def test_defaults_validation_and_lifecycle(spark, tmp_table_root):
    from kafka_delta_ingest_spark.maintenance.rollback import rollback

    t = make_small_file_table(spark, tmp_table_root, n_docs=50, n_files=2,
                              max_tok=8, partition_by_source=False)
    schema = t.snapshot().schema
    with pytest.raises(SchemaEvolutionError, match="newly added"):
        t.evolve_schema(schema, defaults={"n_tok": 1})
    with pytest.raises(SchemaEvolutionError, match="primitive"):
        t.evolve_schema(_with_weight(schema), defaults={"weight": [1, 2]})

    v_pre = t.latest_version()
    t.evolve_schema(_with_weight(schema), defaults={"weight": 3})
    # rename carries the default; drop removes it
    t.rename_column("weight", "w2")
    snap = t.snapshot()
    assert "w2" in snap.defaults and "weight" not in snap.defaults
    assert snap.scan(spark).where(F.col("w2") == 3).count() == 50
    t.drop_column("w2")
    assert t.snapshot().defaults == {}
    # rollback to before the default-add restores a defaults-free table
    rollback(t, v_pre)
    assert t.snapshot().defaults == {}
    assert "weight" not in t.snapshot().scan(spark).columns


def test_defaults_survive_checkpointed_replay(spark, tmp_table_root):
    from kafka_delta_ingest_spark.table.format import Table

    t = make_small_file_table(spark, tmp_table_root, n_docs=40, n_files=2,
                              max_tok=8, partition_by_source=False)
    t.evolve_schema(_with_weight(t.snapshot().schema), defaults={"weight": 5})
    for i in range(10):
        t.set_properties({f"k{i}": str(i)})
    assert t._latest_checkpoint_at_or_before(t.latest_version()) is not None
    t2 = Table(t.root)
    snap = t2.snapshot()
    assert snap.defaults["weight"]["value"] == 5
    assert snap.scan(spark).where(F.col("weight") == 5).count() == 40


def test_incremental_scan_applies_defaults(spark, tmp_table_root):
    from kafka_delta_ingest_spark.table.inspect import incremental_scan

    t = make_small_file_table(spark, tmp_table_root, n_docs=40, n_files=2,
                              max_tok=8, partition_by_source=False)
    v0 = t.latest_version()
    extra = tokens_df(spark, 10, seed=8, max_tok=8).withColumn(
        "doc_id", F.concat(F.lit("z-"), F.col("doc_id"))
    )
    write_dataframe(spark, t, extra)  # appended BEFORE the default exists
    t.evolve_schema(_with_weight(t.snapshot().schema), defaults={"weight": 2})
    inc = incremental_scan(spark, t, from_version=v0)
    # the appended files predate the column -> default applies
    assert inc.count() == 10
    assert inc.where(F.col("weight") == 2).count() == 10

def test_manifest_rewrite_preserves_default_applicability(spark, tmp_table_root):
    """rewrite_manifests re-Adds entries; losing their data sequence
    numbers would silently end initial-default (and equality-delete)
    applicability for every refreshed file."""
    from kafka_delta_ingest_spark.maintenance.manifest import (
        rewrite_manifests,
    )

    t = make_small_file_table(spark, tmp_table_root, n_docs=60, n_files=2,
                              max_tok=8, partition_by_source=False)
    t.evolve_schema(_with_weight(t.snapshot().schema), defaults={"weight": 4})
    assert t.snapshot().scan(spark).where(
        F.col("weight") == 4
    ).count() == 60
    rewrite_manifests(spark, t)
    got = t.snapshot().scan(spark)
    assert got.where(F.col("weight") == 4).count() == 60  # still applies
    assert got.where(F.col("weight").isNull()).count() == 0

"""Rollback (restore-to-version) — metadata-only undo commit
(``maintenance/rollback.py``): history preserved, schema restored,
GC-horizon guarded."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_delta_ingest_spark.datagen import TOKENS_SCHEMA, tokens_df
from kafka_delta_ingest_spark.maintenance.dml import delete_where
from kafka_delta_ingest_spark.maintenance.expire import expire_snapshots, gc_orphans
from kafka_delta_ingest_spark.maintenance.rollback import rollback
from kafka_delta_ingest_spark.table.format import Table, TableError
from kafka_delta_ingest_spark.table.writer import write_dataframe


def _checksum(df):
    return (
        df.select(
            F.sum(
                F.xxhash64("doc_id", F.hash("tokens"), "n_tok").cast("decimal(38,0)")
            ).alias("h")
        )
        .first()["h"]
    )


def test_rollback_restores_contents_and_keeps_history(spark, tmp_table_root):
    t = Table.create(tmp_table_root, TOKENS_SCHEMA, ["source"])
    df = tokens_df(spark, 400, max_tok=32).repartition(6)
    write_dataframe(spark, t, df)  # v1
    before = _checksum(t.snapshot().scan(spark))
    delete_where(spark, t, [("n_tok", ">=", 8)])  # v2: destructive
    assert _checksum(t.snapshot().scan(spark)) != before
    m = rollback(t, 1)  # v3
    assert m["version"] == 3 and m["rows_after"] == 400
    assert _checksum(t.snapshot().scan(spark)) == before
    # history intact: the deleted state is still time-travelable
    assert t.snapshot(2).num_records() < 400
    ops = [h["operation"] for h in t.history()]
    assert ops == ["create", "append", "delete", "rollback"]


def test_rollback_to_head_is_noop_and_bad_version_raises(spark, tmp_table_root):
    t = Table.create(tmp_table_root, TOKENS_SCHEMA, ["source"])
    write_dataframe(spark, t, tokens_df(spark, 50, max_tok=8))
    m = rollback(t, t.latest_version())
    assert m["files_readded"] == 0 and t.latest_version() == 1
    with pytest.raises(ValueError):
        rollback(t, 99)


def test_rollback_restores_pre_evolution_schema(spark, tmp_table_root):
    t = Table.create(tmp_table_root, TOKENS_SCHEMA, ["source"])
    write_dataframe(spark, t, tokens_df(spark, 60, max_tok=8))  # v1
    wider = T.StructType(
        TOKENS_SCHEMA.fields + [T.StructField("lang", T.StringType(), True)]
    )
    t.evolve_schema(wider)  # v2
    assert "lang" in [f.name for f in t.snapshot().schema.fields]
    rollback(t, 1)  # v3
    assert [f.name for f in t.snapshot().schema.fields] == [
        f.name for f in TOKENS_SCHEMA.fields
    ]


def test_rollback_past_gc_horizon_raises(spark, tmp_table_root):
    t = Table.create(tmp_table_root, TOKENS_SCHEMA, ["source"])
    write_dataframe(spark, t, tokens_df(spark, 120, max_tok=8).repartition(3))  # v1
    delete_where(spark, t, [("n_tok", ">=", 1)])  # v2 removes every row/file
    expire_snapshots(t, retain_last=1)
    gc_orphans(spark, t, grace_s=0.0)
    with pytest.raises(TableError):
        rollback(t, 1)

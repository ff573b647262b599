"""Distributed scan planning (plans/distributed_planning.py): the
manifest as a Spark DataFrame straight off the parquet checkpoint, with
pruning compiled to Catalyst — file-for-file parity with the driver-side
``plans.pruning.prune_files`` across ops, types, partition layouts, and
log-tail adds/removes."""

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_delta_ingest_spark.datagen import TOKENS_SCHEMA, tokens_df
from kafka_delta_ingest_spark.plans.distributed_planning import (
    manifest_df,
    plan_scan_paths,
    prune_manifest,
    schema_and_spec,
)
from kafka_delta_ingest_spark.plans.pruning import prune_files
from kafka_delta_ingest_spark.table.format import Table, Transaction
from kafka_delta_ingest_spark.table.writer import stage_dataframe, write_dataframe


def _mk_table(spark, root, *, n_commits=12, partition=("source",)):
    """Table with enough commits to cross a checkpoint boundary (interval
    10) plus a post-checkpoint tail with adds AND removes."""
    t = Table.create(str(root), TOKENS_SCHEMA, list(partition))
    for i in range(n_commits):
        df = tokens_df(spark, 40, max_tok=8, seed=100 + i).withColumn(
            "doc_id", F.concat(F.lit(f"c{i:02d}-"), "doc_id")
        )
        write_dataframe(spark, t, df)
    # a tail remove: rewrite one file's worth via compaction of a scope
    from kafka_delta_ingest_spark.maintenance.compact import compact

    compact(spark, t, target_file_bytes=64 * 1024 * 1024, job_id="dp")
    return t


def _parity(spark, t, conjuncts):
    snap = t.snapshot()
    driver = {
        f.path
        for f in prune_files(
            snap.files, conjuncts, snap.schema, spec=snap.partition_cols
        )
    }
    dist = set(plan_scan_paths(spark, t, conjuncts))
    assert dist == driver, (conjuncts, dist ^ driver)
    return driver


def test_manifest_df_matches_snapshot_across_checkpoint(spark, tmp_path):
    t = _mk_table(spark, tmp_path / "t")
    assert t.latest_version() >= 11  # crossed the interval-10 checkpoint
    snap = t.snapshot()
    rows = {r["path"]: r for r in manifest_df(spark, t).collect()}
    assert set(rows) == {f.path for f in snap.files}
    for f in snap.files:
        assert rows[f.path]["size"] == f.size
        assert rows[f.path]["num_records"] == f.num_records
    sch, spec = schema_and_spec(t)
    assert sch == snap.schema and spec == snap.partition_cols
    # pinned pre-compaction version also reconstructs exactly
    old = t.snapshot(t.latest_version() - 1)
    old_rows = {r["path"] for r in manifest_df(
        spark, t, t.latest_version() - 1).collect()}
    assert old_rows == {f.path for f in old.files}


def test_prune_parity_ops_and_types(spark, tmp_path):
    t = _mk_table(spark, tmp_path / "t")
    some_doc = sorted(
        r["doc_id"] for r in t.snapshot().scan(spark).select("doc_id")
        .limit(5).collect()
    )
    cases = [
        [("source", "=", "src1")],
        [("source", "in", ["src0", "src2"])],
        [("n_tok", ">=", 5)],
        [("n_tok", "<", 3)],
        [("n_tok", ">", 2), ("source", "=", "src0")],
        [("doc_id", "=", some_doc[0])],
        [("doc_id", "in", some_doc)],
        [("n_tok", "<=", 0)],  # empty survivor set
    ]
    saw_nontrivial = False
    for conj in cases:
        kept = _parity(spark, t, conj)
        if 0 < len(kept) < len(t.snapshot().files):
            saw_nontrivial = True
    assert saw_nontrivial  # at least one case actually pruned


def test_prune_parity_hidden_partitioning(spark, tmp_path):
    t = Table.create(str(tmp_path / "t"), TOKENS_SCHEMA, ["bucket(4,doc_id)"])
    df = tokens_df(spark, 200, max_tok=8).repartition(4)
    write_dataframe(spark, t, df)
    target = df.limit(1).collect()[0]["doc_id"]
    kept = _parity(spark, t, [("doc_id", "=", target)])
    assert 0 < len(kept) < len(t.snapshot().files)


def test_prune_parity_timestamps(spark, tmp_path):
    schema = T.StructType([
        T.StructField("doc_id", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("v", T.LongType()),
    ])
    t = Table.create(str(tmp_path / "t"), schema, [])
    rows = [
        (f"d{i}", dt.datetime(2024, 3, 1 + i % 4, 6 + i % 12), i)
        for i in range(64)
    ]
    write_dataframe(spark, t, spark.createDataFrame(
        rows, schema).repartition(8))
    for conj in (
        [("ts", ">=", dt.datetime(2024, 3, 3))],
        [("ts", "<", dt.datetime(2024, 3, 2, 8))],
        [("ts", "=", dt.datetime(2024, 3, 2, 9))],
    ):
        _parity(spark, t, conj)


def test_scan_planned_parity_with_snapshot_scan(spark, tmp_path):
    """scan_planned ≡ snapshot().scan row-for-row, including across a
    checkpoint boundary with a tail, under live MOR position deletes AND
    equality deletes — the delete-aware read path is shared, only the
    planning differs."""
    from kafka_delta_ingest_spark.maintenance.dml import delete_where
    from kafka_delta_ingest_spark.maintenance.upsert import upsert
    from kafka_delta_ingest_spark.plans.distributed_planning import (
        scan_planned,
    )

    t = _mk_table(spark, tmp_path / "t")
    delete_where(spark, t, [("n_tok", "<=", 2)], mode="merge_on_read")
    batch = tokens_df(spark, 10, max_tok=8, seed=999).withColumn(
        "doc_id", F.concat(F.lit("c03-"), "doc_id")
    )
    upsert(spark, t, batch, key="doc_id")
    snap = t.snapshot()
    assert snap.delete_entries  # both kinds live

    def rows(df):
        return {r["doc_id"]: (r["tokens"], r["n_tok"], r["source"])
                for r in df.collect()}

    exp = rows(snap.scan(spark))
    got = rows(scan_planned(spark, t, []))
    assert got == exp
    # with a file-pruning conjunct + row predicate
    got2 = rows(
        scan_planned(spark, t, [("source", "=", "src1")],
                     predicate=F.col("source") == "src1")
    )
    assert got2 == {k: v for k, v in exp.items() if v[2] == "src1"}
    # partition-column predicate WITHOUT aligned file pruning: the reader
    # skips partition-col predicates at pushdown, so scan_planned must
    # re-apply after reconstruction (regression: silently dropped filter)
    got3 = rows(scan_planned(spark, t, [], predicate=F.col("source") == "src0"))
    assert got3 == {k: v for k, v in exp.items() if v[2] == "src0"}


def test_plan_never_loses_files_with_stray_stats(spark, tmp_path):
    """Un-castable bounds must degrade to keep on BOTH paths."""
    t = Table.create(str(tmp_path / "t"), TOKENS_SCHEMA, [])
    df = tokens_df(spark, 50, max_tok=8)
    snap0 = t  # just for symmetry
    _, adds = stage_dataframe(spark, t, df, [], TOKENS_SCHEMA)
    # corrupt one file's n_tok bounds to a non-numeric string
    adds[0].stats.setdefault("min", {})["n_tok"] = "not-a-number"
    adds[0].stats.setdefault("max", {})["n_tok"] = "also-not"
    t.commit(Transaction(operation="append", adds=adds))
    kept = _parity(spark, t, [("n_tok", ">=", 1)])
    assert adds[0].path in kept


def test_scan_planned_mixed_specs(spark, tmp_path):
    """scan_planned groups survivors by each file's RECORDED spec, so a
    table mid-partition-evolution (old files source-in-path, new files
    bucket-keyed) reads correctly through the distributed planner."""
    from kafka_delta_ingest_spark.plans.distributed_planning import (
        scan_planned,
    )
    from kafka_delta_ingest_spark.table.writer import write_dataframe as wdf

    t = Table.create(str(tmp_path / "t"), TOKENS_SCHEMA, ["source"])
    a = tokens_df(spark, 100, max_tok=8)
    wdf(spark, t, a)
    t.evolve_partitioning(["bucket(4,doc_id)"])
    b = tokens_df(spark, 100, max_tok=8, seed=77).withColumn(
        "doc_id", F.concat(F.lit("x"), "doc_id")
    )
    wdf(spark, t, b)
    snap = t.snapshot()
    assert {frozenset(f.partition_values) for f in snap.files} == {
        frozenset({"source"}), frozenset({"doc_id_bucket_4"})
    }
    exp = {(r["doc_id"], r["source"]) for r in snap.scan(spark).collect()}
    got = {(r["doc_id"], r["source"])
           for r in scan_planned(spark, t, []).collect()}
    assert got == exp and len(got) == 200


def test_prune_parity_temporal_transform(spark, tmp_path):
    """day(ts) hidden partitioning: equality AND range conjuncts on the
    source column map through the transform identically on both paths."""
    schema = T.StructType([
        T.StructField("doc_id", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("v", T.LongType()),
    ])
    t = Table.create(str(tmp_path / "t"), schema, ["day(ts)"])
    rows = [
        (f"d{i}", dt.datetime(2024, 3, 1 + i % 5, 6 + i % 12), i)
        for i in range(80)
    ]
    write_dataframe(spark, t, spark.createDataFrame(rows, schema))
    for conj in (
        [("ts", "=", dt.datetime(2024, 3, 2, 9))],
        [("ts", ">=", dt.datetime(2024, 3, 4))],
        [("ts", "<", dt.datetime(2024, 3, 2))],
    ):
        kept = _parity(spark, t, conj)
        assert 0 < len(kept) < len(t.snapshot().files)

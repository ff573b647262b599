"""Branches, tags, write-audit-publish (table/refs.py): staged commits
invisible to main until publish; fast-forward vs squash; tag-pinned time
travel; expire/GC protection of ref-pinned versions and staged files."""

import pytest
from pyspark.sql import functions as F

from kafka_delta_ingest_spark.datagen import make_small_file_table, tokens_df
from kafka_delta_ingest_spark.maintenance.expire import expire_snapshots, gc_orphans
from kafka_delta_ingest_spark.maintenance.optimize import optimize
from kafka_delta_ingest_spark.table.format import (
    ConcurrentDeleteError,
    Table,
    TableError,
    Transaction,
)
from kafka_delta_ingest_spark.table.writer import stage_dataframe


def _rows(df):
    return {r["doc_id"]: r["tokens"] for r in df.collect()}


def _append(spark, t, df):
    snap = t.snapshot()
    _, adds = stage_dataframe(spark, t, df, snap.partition_cols, snap.schema)
    return t.commit(Transaction(operation="append", adds=adds))


def _new_docs(spark, n, prefix="new-"):
    return tokens_df(spark, n, max_tok=8).withColumn(
        "doc_id", F.concat(F.lit(prefix), "doc_id")
    )


def test_branch_isolation_and_fast_forward(spark, tmp_path):
    t = make_small_file_table(spark, str(tmp_path / "t"), n_docs=80, n_files=3, max_tok=8)
    base = _rows(t.snapshot().scan(spark))
    head0 = t.latest_version()

    b = t.create_branch("audit")
    assert t.list_branches() == {"audit": head0}
    batch = _new_docs(spark, 15)
    bv = _append(spark, b, batch)
    assert bv == head0 + 1

    # staged commits invisible to main; branch sees fork + batch
    assert _rows(t.snapshot().scan(spark)) == base
    want = {**base, **_rows(batch)}
    assert _rows(b.snapshot().scan(spark)) == want

    # main unmoved -> fast-forward: identical version history published
    v = t.publish_branch("audit")
    assert v == bv
    assert t.list_branches() == {}
    assert _rows(t.snapshot().scan(spark)) == want
    assert t.history()[-1]["operation"] == "append"

    # duplicate branch names are CAS-rejected
    t.create_branch("audit")  # name free again after drop-on-publish
    with pytest.raises(FileExistsError):
        t.create_branch("audit")


def test_publish_squash_after_main_advanced(spark, tmp_path):
    t = make_small_file_table(spark, str(tmp_path / "t"), n_docs=80, n_files=4, max_tok=8)
    base = _rows(t.snapshot().scan(spark))

    b = t.create_branch("audit")
    batch = _new_docs(spark, 12)
    _append(spark, b, batch)

    # main advances: fused OPTIMIZE rewrites every file (contents equal)
    optimize(spark, t, dims=["source", "n_tok", "doc_id"], curve="zorder",
             target_file_bytes=4 * 1024 * 1024)
    assert t.latest_version() > b.fork_version

    v = t.publish_branch("audit")
    assert t.history()[-1]["operation"] == "publish"
    assert t.latest_version() == v
    assert _rows(t.snapshot().scan(spark)) == {**base, **_rows(batch)}


def test_publish_conflict_on_doubly_rewritten_file(spark, tmp_path):
    """Branch rewrote files that main ALSO rewrote after the fork: the
    squash commit's removes are no longer live -> ConcurrentDeleteError
    (never silent corruption)."""
    from kafka_delta_ingest_spark.maintenance.dml import update_where

    t = make_small_file_table(spark, str(tmp_path / "t"), n_docs=80, n_files=3, max_tok=8)
    b = t.create_branch("audit")
    update_where(spark, b, [("n_tok", ">=", 1)],
                 {"tokens": "transform(tokens, x -> x + 1)"})
    optimize(spark, t, dims=["source", "n_tok", "doc_id"], curve="zorder",
             target_file_bytes=4 * 1024 * 1024)
    with pytest.raises(ConcurrentDeleteError):
        t.publish_branch("audit")
    # audited-but-unpublishable work stays on the branch for inspection
    assert "audit" in t.list_branches()


def test_tags_time_travel_and_expire_protection(spark, tmp_path):
    t = make_small_file_table(spark, str(tmp_path / "t"), n_docs=60, n_files=2, max_tok=8)
    v1 = t.latest_version()
    base = _rows(t.snapshot().scan(spark))
    t.create_tag("v1.0")
    assert t.tag_version("v1.0") == v1
    with pytest.raises(FileExistsError):
        t.create_tag("v1.0")

    for i in range(6):
        _append(spark, t, _new_docs(spark, 3, prefix=f"b{i}-"))

    # expiry keeps the tag-pinned version readable
    m = expire_snapshots(t, retain_last=1)
    assert m.get("oldest_readable", 0) <= v1
    assert _rows(t.snapshot(version=t.tag_version("v1.0")).scan(spark)) == base

    # after the tag is dropped the version can expire
    t.delete_tag("v1.0")
    assert t.list_tags() == {}
    expire_snapshots(t, retain_last=1)
    with pytest.raises(TableError):
        t.snapshot(version=v1)


def test_gc_protects_staged_branch_files(spark, tmp_path):
    import os

    t = make_small_file_table(spark, str(tmp_path / "t"), n_docs=60, n_files=2, max_tok=8)
    b = t.create_branch("audit")
    _append(spark, b, _new_docs(spark, 10))
    n_branch = b.snapshot().num_records()
    branch_files = [
        os.path.join(t.root, f.path) for f in b.snapshot().files
    ]

    gc_orphans(spark, t, grace_s=0.0)  # may clear _SUCCESS/.crc sidecars
    assert all(os.path.exists(p) for p in branch_files)  # data protected
    assert b.snapshot().num_records() == n_branch
    assert b.snapshot().scan(spark).count() == n_branch

    # an abandoned (dropped, unpublished) branch's files become orphans
    staged_only = [
        p for p in branch_files
        if p not in {os.path.join(t.root, f.path) for f in t.snapshot().files}
    ]
    assert staged_only
    t.drop_branch("audit")
    gc_orphans(spark, t, grace_s=0.0)
    assert not any(os.path.exists(p) for p in staged_only)
    assert _rows(t.snapshot().scan(spark))  # main unaffected


def test_ref_name_validation(spark, tmp_path):
    t = make_small_file_table(spark, str(tmp_path / "t"), n_docs=20, n_files=1, max_tok=8)
    for bad in ("", "a/b", "a b", "../x"):
        with pytest.raises(ValueError):
            t.create_branch(bad)
        with pytest.raises(ValueError):
            t.create_tag(bad)
    with pytest.raises(TableError):
        t.branch("nope")
    with pytest.raises(TableError):
        t.tag_version("nope")

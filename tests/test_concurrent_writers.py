"""True multi-writer contention: N threads appending through the real
CAS commit loop simultaneously (the injected-backend races in
test_table_format exercise the protocol deterministically; this exercises
it under actual concurrency — the reference's two-worker
emails_s3_tests.rs:21-77 shape, no loss, no duplication)."""

from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import functions as F

from kafka_delta_ingest_spark.datagen import TOKENS_SCHEMA, tokens_df
from kafka_delta_ingest_spark.table.format import Table
from kafka_delta_ingest_spark.table.writer import write_dataframe


def test_threaded_appends_all_land_exactly_once(spark, tmp_table_root):
    Table.create(tmp_table_root, TOKENS_SCHEMA, [])
    n_threads, per_thread, rows_each = 4, 3, 20

    def work(i: int):
        tbl = Table(tmp_table_root)  # own handle, shared filesystem
        for j in range(per_thread):
            df = tokens_df(
                spark, rows_each, seed=1000 + i * per_thread + j, max_tok=8
            ).withColumn(
                "doc_id", F.concat(F.lit(f"w{i}-{j}-"), F.col("doc_id"))
            )
            write_dataframe(spark, tbl, df)
        return i

    with ThreadPoolExecutor(n_threads) as ex:
        assert sorted(ex.map(work, range(n_threads))) == list(range(n_threads))

    snap = Table(tmp_table_root).snapshot()
    # every commit landed at a distinct contiguous version (create = v0)
    assert snap.version == n_threads * per_thread
    total = n_threads * per_thread * rows_each
    got = snap.scan(spark)
    assert got.count() == total
    # exactly-once: no row lost, none duplicated
    assert got.select("doc_id").distinct().count() == total
    # per-writer accounting: each thread's rows all present
    for i in range(n_threads):
        assert got.where(
            F.col("doc_id").startswith(f"w{i}-")
        ).count() == per_thread * rows_each


def test_threaded_mixed_maintenance_and_appends(spark, tmp_table_root):
    """Appends racing a compaction: the rewrite commits against a moving
    head (its removes are validated against the live set), appenders
    retry through CAS collisions, and nothing is lost either way."""
    from kafka_delta_ingest_spark.datagen import make_small_file_table
    from kafka_delta_ingest_spark.maintenance.compact import compact

    t = make_small_file_table(spark, tmp_table_root, n_docs=200, n_files=8,
                              max_tok=8, partition_by_source=False)

    def appender(i: int):
        tbl = Table(tmp_table_root)
        df = tokens_df(spark, 15, seed=2000 + i, max_tok=8).withColumn(
            "doc_id", F.concat(F.lit(f"a{i}-"), F.col("doc_id"))
        )
        write_dataframe(spark, tbl, df)
        return "append"

    def compactor(_):
        compact(spark, Table(tmp_table_root),
                target_file_bytes=64 * 1024 * 1024, job_id="race-c")
        return "compact"

    with ThreadPoolExecutor(4) as ex:
        futs = [ex.submit(appender, i) for i in range(3)]
        futs.append(ex.submit(compactor, 0))
        results = [f.result() for f in futs]
    assert sorted(results) == ["append", "append", "append", "compact"]

    got = Table(tmp_table_root).snapshot().scan(spark)
    assert got.count() == 200 + 3 * 15
    assert got.select("doc_id").distinct().count() == 200 + 3 * 15
"""Regression tests for the round-1 advisor findings (ADVICE.md):

1. merge_into on a NUMERIC key must compare manifest min/max typed, not
   lexicographically ('5' <= '19' is false → silent duplicate-key rows).
2. A compact bin that stages no output is a hard error before any ledger
   entry or commit exists (previously: KeyError, then a retry committed
   Remove(inputs) with zero Adds — silent data loss).
3. Ledger.check_resume rejects entries with empty outputs.
4. data_change=False commits must conserve rows (manifest-metadata check).
5. Table paths are abspath-normalized so relative --table roots can't break
   the rewrite's path join.
6. Stats pruning compares typed values (timestamps, decimals) and keeps
   files conservatively on any mismatch.
"""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_delta_ingest_spark.maintenance.ledger import InconsistentLedgerError, Ledger
from kafka_delta_ingest_spark.maintenance.merge import merge_into
from kafka_delta_ingest_spark.table.format import FileEntry, Table, TableError, Transaction
from kafka_delta_ingest_spark.table.stats import compute_add_entries

LONG_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("val", T.StringType(), True),
    ]
)


def _long_key_table(spark, root: str) -> Table:
    """One file containing ids 0..19 (min=0, max=19) plus one with 100..119."""
    t = Table.create(root, LONG_SCHEMA, [])
    for lo in (0, 100):
        absd, _ = t.new_data_dir()
        df = spark.createDataFrame(
            [(i, "old") for i in range(lo, lo + 20)], LONG_SCHEMA
        ).coalesce(1)
        df.write.mode("overwrite").parquet(absd)
        adds = compute_add_entries(spark, t.root, absd, LONG_SCHEMA, [])
        t.commit(Transaction(operation="append", adds=adds))
    return t


def test_merge_long_key_no_duplicates(spark, tmp_path):
    """ADVICE #2: upserting id=5 must rewrite the file with range [0,19] —
    lexicographic '5' <= '19' would skip it and leave (5,'old') AND
    (5,'new') in the table."""
    t = _long_key_table(spark, str(tmp_path / "tbl"))
    src = spark.createDataFrame([(5, "new")], LONG_SCHEMA)
    m = merge_into(spark, t, src, key="id")
    assert m["touched_files"] == 1  # pruning still skips the [100,119] file
    rows = t.snapshot().scan(spark).where(F.col("id") == 5).collect()
    assert len(rows) == 1
    assert rows[0]["val"] == "new"
    assert t.snapshot().scan(spark).count() == 40


def test_merge_timestamp_key(spark, tmp_path):
    """Typed range pruning must also work for timestamp keys (stats render
    them as ISO strings)."""
    schema = T.StructType(
        [
            T.StructField("ts", T.TimestampType(), False),
            T.StructField("val", T.StringType(), True),
        ]
    )
    import datetime as dt

    t = Table.create(str(tmp_path / "ts_tbl"), schema, [])
    absd, _ = t.new_data_dir()
    base = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(base + dt.timedelta(hours=i), "old") for i in range(10)], schema
    ).coalesce(1)
    df.write.mode("overwrite").parquet(absd)
    t.commit(
        Transaction(
            operation="append", adds=compute_add_entries(spark, t.root, absd, schema, [])
        )
    )
    src = spark.createDataFrame([(base + dt.timedelta(hours=3), "new")], schema)
    merge_into(spark, t, src, key="ts")
    out = {r["ts"]: r["val"] for r in t.snapshot().scan(spark).collect()}
    assert len(out) == 10
    assert out[base + dt.timedelta(hours=3)] == "new"


def test_ledger_check_resume_rejects_empty_outputs(tmp_path):
    led = Ledger(str(tmp_path), "job1")
    led.record("k1", inputs=["a.parquet"], outputs=[], rows=0, bytes_=0, duration_s=0.0)
    with pytest.raises(InconsistentLedgerError):
        led.check_resume("k1", ["a.parquet"], str(tmp_path))


def test_data_change_false_must_conserve_rows(spark, tmp_path):
    from kafka_delta_ingest_spark.datagen import make_small_file_table

    t = make_small_file_table(spark, str(tmp_path / "t"), n_docs=100, n_files=2, max_tok=8)
    snap = t.snapshot()
    victim = snap.files[0]
    # a "rewrite" that Removes a file and Adds nothing = row loss
    with pytest.raises(TableError, match="conserve rows"):
        t.commit(
            Transaction(operation="compact", adds=[], removes=[victim.path], data_change=False)
        )
    # row-conserving rewrite is fine: re-add the same entry under its path
    t.commit(
        Transaction(
            operation="manifest-rewrite",
            adds=[victim],
            removes=[victim.path],
            data_change=False,
        )
    )


def test_relative_table_root_compacts_without_loss(spark, tmp_path, monkeypatch):
    """ADVICE #3: a relative --table path must not break the rewrite's
    path join (every bin would match zero rows)."""
    from kafka_delta_ingest_spark.datagen import make_small_file_table
    from kafka_delta_ingest_spark.functions.verify import content_fingerprint
    from kafka_delta_ingest_spark.maintenance.compact import compact

    monkeypatch.chdir(tmp_path)
    t = make_small_file_table(spark, "rel_tbl", n_docs=300, n_files=6, max_tok=16)
    assert os.path.isabs(t.root)
    fp = content_fingerprint(t.snapshot().scan(spark))
    m = compact(spark, t, target_file_bytes=64 * 1024 * 1024, job_id="rel-c")
    assert m["rows"] == 300
    assert content_fingerprint(t.snapshot().scan(spark)) == fp


def test_pruning_typed_values():
    from kafka_delta_ingest_spark.plans.pruning import prune_files

    schema = T.StructType(
        [
            T.StructField("n", T.LongType(), False),
            T.StructField("ts", T.TimestampType(), False),
            T.StructField("d", T.DecimalType(10, 2), False),
        ]
    )
    f = FileEntry(
        path="p",
        size=1,
        num_records=1,
        stats={
            "min": {"n": 0, "ts": "2024-01-01T00:00:00.000Z", "d": "10.50"},
            "max": {"n": 19, "ts": "2024-06-01T00:00:00.000Z", "d": "99.00"},
        },
    )
    import datetime as dt
    from decimal import Decimal

    # numeric: 5 is inside [0,19] even though '5' > '19' lexicographically
    assert prune_files([f], [("n", "=", 5)], schema) == [f]
    assert prune_files([f], [("n", "=", 25)], schema) == []
    # timestamp literal as datetime AND as string
    assert prune_files([f], [("ts", "=", dt.datetime(2024, 3, 1))], schema) == [f]
    assert prune_files([f], [("ts", "=", "2023-01-01 00:00:00")], schema) == []
    # decimal
    assert prune_files([f], [("d", ">=", Decimal("50"))], schema) == [f]
    assert prune_files([f], [("d", ">", Decimal("99"))], schema) == []
    # un-normalizable literal -> conservative keep, never a TypeError
    assert prune_files([f], [("ts", "=", object())], schema) == [f]


def test_pruning_nan_stat_bound_keeps_file():
    """A NaN min/max stat on a float column canonicalizes to Decimal('NaN'),
    whose ordered comparison raises InvalidOperation — the scan must keep
    the file conservatively, not crash (round-2 ADVICE)."""
    from kafka_delta_ingest_spark.plans.pruning import prune_files

    schema = T.StructType([T.StructField("x", T.DoubleType(), True)])
    f = FileEntry(
        path="p",
        size=1,
        num_records=1,
        stats={"min": {"x": float("nan")}, "max": {"x": float("nan")}},
    )
    for op in ("=", "<", "<=", ">", ">="):
        assert prune_files([f], [("x", op, 1.5)], schema) == [f]
    assert prune_files([f], [("x", "in", [1.5, 2.5])], schema) == [f]

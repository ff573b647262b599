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


# ---------------------------------------------------------------------------
# round-4 ADVICE regressions
# ---------------------------------------------------------------------------


def test_bucket_transform_rejects_unsound_source_types():
    """bucket() hashes the value's string rendering; boolean ('true' vs
    'True'), double ('1.5E16' vs '1.5e+16'), decimal and timestamp render
    differently JVM-side vs driver-side, so pruning on them would silently
    drop files containing matching rows. validate_spec must reject them
    (round-4 ADVICE, table/transforms.py)."""
    from kafka_delta_ingest_spark.table import transforms

    schema = T.StructType([
        T.StructField("s", T.StringType()),
        T.StructField("i", T.LongType()),
        T.StructField("b", T.BooleanType()),
        T.StructField("d", T.DoubleType()),
        T.StructField("dec", T.DecimalType(10, 2)),
        T.StructField("ts", T.TimestampType()),
    ])
    transforms.validate_spec(["bucket(8,s)"], schema)
    transforms.validate_spec(["bucket(8,i)"], schema)
    for bad in ("b", "d", "dec", "ts"):
        with pytest.raises(ValueError, match="bucket unsupported"):
            transforms.validate_spec([f"bucket(8,{bad})"], schema)


def test_partition_values_with_escapable_chars(spark, tmp_path):
    """Partition values containing ':' and '%' (Hive-escaped to %3A/%25 in
    the directory name, then URI-encoded again by input_file_name): the
    manifest must record the LOGICAL value, the scan must reconstruct it,
    and pruning/distributed-planning must keep the right files (round-4
    ADVICE, table/stats.py + table/scan.py)."""
    from kafka_delta_ingest_spark.plans.distributed_planning import (
        plan_scan_paths,
    )
    from kafka_delta_ingest_spark.plans.pruning import prune_files
    from kafka_delta_ingest_spark.table.writer import write_dataframe

    schema = T.StructType([
        T.StructField("doc_id", T.StringType()),
        T.StructField("k", T.StringType()),
    ])
    t = Table.create(str(tmp_path / "t"), schema, ["k"])
    vals = ["a:b c", "p%25q", "100%", "plain", None]
    df = spark.createDataFrame(
        [(f"d{i}{j}", v) for i, v in enumerate(vals) for j in range(3)],
        schema,
    )
    write_dataframe(spark, t, df)
    snap = t.snapshot()
    # 1. manifest records the logical (unescaped) value
    recorded = {f.partition_values["k"] for f in snap.files}
    assert recorded == {"a:b c", "p%25q", "100%", "plain",
                        "__HIVE_DEFAULT_PARTITION__"}
    # 2. scan reconstructs through both escape layers
    got = {(r["doc_id"], r["k"]) for r in snap.scan(spark).collect()}
    assert got == {(f"d{i}{j}", v) for i, v in enumerate(vals)
                   for j in range(3)}
    # 3. driver pruning on an escapable value keeps exactly its file(s)
    for v in ("a:b c", "p%25q", "100%"):
        kept = prune_files(snap.files, [("k", "=", v)], schema, spec=["k"])
        assert kept and all(f.partition_values["k"] == v for f in kept)
        # 4. distributed planner returns the identical file set
        assert set(plan_scan_paths(spark, t, [("k", "=", v)])) == {
            f.path for f in kept
        }


def test_prune_parity_boolean_and_null_partitions(spark, tmp_path):
    """Boolean partition values ('true' on disk, str(True)='True' in
    Python) and __HIVE_DEFAULT_PARTITION__ (all-NULL file) must prune
    identically on the driver and distributed paths — and correctly:
    flag=True keeps exactly the true-file, and the NULL file is pruned by
    every comparison conjunct (round-4 ADVICE, plans/pruning.py +
    plans/distributed_planning.py)."""
    from kafka_delta_ingest_spark.plans.distributed_planning import (
        plan_scan_paths,
    )
    from kafka_delta_ingest_spark.plans.pruning import prune_files
    from kafka_delta_ingest_spark.table.writer import write_dataframe

    schema = T.StructType([
        T.StructField("doc_id", T.StringType()),
        T.StructField("flag", T.BooleanType()),
        T.StructField("v", T.LongType()),
    ])
    t = Table.create(str(tmp_path / "t"), schema, ["flag"])
    df = spark.createDataFrame(
        [(f"d{i}", [True, False, None][i % 3], i) for i in range(30)],
        schema,
    )
    write_dataframe(spark, t, df)
    snap = t.snapshot()
    assert {f.partition_values["flag"] for f in snap.files} == {
        "true", "false", "__HIVE_DEFAULT_PARTITION__"
    }
    for conj in (
        [("flag", "=", True)],
        [("flag", "=", False)],
        [("flag", "in", [True])],
    ):
        driver = {f.path for f in prune_files(snap.files, conj, schema,
                                              spec=["flag"])}
        dist = set(plan_scan_paths(spark, t, conj))
        assert dist == driver, (conj, dist ^ driver)
        want = "true" if (conj[0][2] is True or conj[0][2] == [True]) \
            else "false"
        by_pv = {f.path for f in snap.files
                 if f.partition_values["flag"] == want}
        assert driver == by_pv  # matching file kept, NULL file pruned
    # scan returns the NULL rows themselves fine (pruning only applies
    # when a conjunct names the column)
    assert snap.scan(spark).where(F.col("flag").isNull()).count() == 10


def test_manifest_df_preserves_explicit_seq_zero(spark, tmp_path):
    """A log-tail Add carrying an explicit seq=0 (e.g. a pre-seq
    checkpoint file re-added by rollback) must keep seq 0 in manifest_df,
    not be stamped with the commit version — otherwise equality-delete
    applicability (file.seq < delete.seq) diverges from Table.snapshot
    (round-4 ADVICE, plans/distributed_planning.py)."""
    from kafka_delta_ingest_spark.datagen import TOKENS_SCHEMA, tokens_df
    from kafka_delta_ingest_spark.plans.distributed_planning import (
        manifest_df,
    )
    from kafka_delta_ingest_spark.table.writer import stage_dataframe

    t = Table.create(str(tmp_path / "t"), TOKENS_SCHEMA, [])
    # cross the checkpoint boundary so the tail path is exercised
    for i in range(11):
        _, adds = stage_dataframe(
            spark, t, tokens_df(spark, 10, max_tok=4, seed=i), [],
            TOKENS_SCHEMA,
        )
        t.commit(Transaction(operation="append", adds=adds))
    # tail commit: one add with explicit seq=0, one with seq=None
    _, adds = stage_dataframe(
        spark, t, tokens_df(spark, 10, max_tok=4, seed=99), [],
        TOKENS_SCHEMA,
    )
    assert len(adds) >= 1
    adds[0].seq = 0
    v = t.commit(Transaction(operation="append", adds=adds))
    snap = t.snapshot()
    driver_seq = {f.path: int(f.seq or 0) for f in snap.files}
    dist_seq = {r["path"]: r["seq"]
                for r in manifest_df(spark, t).collect()}
    assert dist_seq == driver_seq
    assert dist_seq[adds[0].path] == 0
    if len(adds) > 1:
        assert dist_seq[adds[1].path] == v

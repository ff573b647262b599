"""Iceberg-style string-stat bound truncation (table/stats.py): long
string min/max shrink to prefix bounds (lower: plain prefix; upper:
prefix with last code point incremented), recorded as inexact; pruning
stays conservative-correct and metadata aggregates demote inexact files
to a pushdown scan rather than serving truncated bounds as extrema."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_delta_ingest_spark.plans.pruning import prune_files
from kafka_delta_ingest_spark.table.format import Table
from kafka_delta_ingest_spark.table.stats import (
    STRING_STAT_TRUNCATE,
    _increment_string,
    truncate_string_stats,
)
from kafka_delta_ingest_spark.table.writer import write_dataframe

SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("text", T.StringType()),
    T.StructField("n", T.LongType()),
])


def test_increment_string():
    assert _increment_string("abc") == "abd"
    assert _increment_string("ab" + chr(0x10FFFF)) == "ac"
    assert _increment_string(chr(0x10FFFF) * 3) is None
    # increment lands in the surrogate gap -> skipped past it
    assert _increment_string(chr(0xD7FF)) == chr(0xE000)


def test_truncate_bounds_are_valid_and_flagged():
    lo = "prefix-" + "x" * 200
    hi = "prefix-" + "z" * 200
    stats = {"min": {"text": lo}, "max": {"text": hi}, "null_count": {"text": 0}}
    out = truncate_string_stats(stats, SCHEMA, limit=16)
    assert out["min"]["text"] == lo[:16]
    assert len(out["max"]["text"]) <= 16
    # bound validity: truncated min <= real min, truncated max > real max
    assert out["min"]["text"] <= lo
    assert out["max"]["text"] > hi
    assert out["inexact"] == ["text"]
    # short strings untouched, no flag
    s2 = {"min": {"text": "a"}, "max": {"text": "b"}, "null_count": {}}
    assert "inexact" not in truncate_string_stats(s2, SCHEMA, limit=16)


def test_written_table_truncates_and_prunes_correctly(spark, tmp_path):
    rows = [
        (f"d{i}", f"{'common-' * 12}tail-{i:04d}-" + "y" * 100, i)
        for i in range(40)
    ]
    t = Table.create(str(tmp_path / "t"), SCHEMA, [])
    df = spark.createDataFrame(rows, SCHEMA).repartition(4)
    write_dataframe(spark, t, df)
    snap = t.snapshot()
    for f in snap.files:
        assert len(f.stats["min"]["text"]) <= STRING_STAT_TRUNCATE
        assert len(f.stats["max"]["text"]) <= STRING_STAT_TRUNCATE
        assert f.stats["inexact"] == ["text"]
        # conservative bounds hold for every row in the file
    # equality predicate on a full (long) value never loses its file
    target = rows[7][1]
    kept = prune_files(snap.files, [("text", "=", target)], snap.schema)
    got = snap.scan(
        spark, predicate=F.col("text") == target,
        predicate_stats=[("text", "=", target)],
    ).collect()
    assert [r["doc_id"] for r in got] == ["d7"]
    assert kept  # and pruning kept at least the containing file


def test_metadata_aggregate_demotes_inexact_to_scan(spark, tmp_path):
    from kafka_delta_ingest_spark.table.inspect import metadata_aggregate

    rows = [
        (f"d{i}", f"{'p' * 100}-{i:04d}", i) for i in range(30)
    ]
    t = Table.create(str(tmp_path / "t"), SCHEMA, [])
    write_dataframe(spark, t, spark.createDataFrame(rows, SCHEMA).repartition(3))
    # min/max over the truncated column must still be EXACT (scan path)
    got = metadata_aggregate(spark, t, ["text", "n"]).collect()[0]
    assert got["min_text"] == rows[0][1]
    assert got["max_text"] == rows[-1][1]
    assert got["cnt"] == 30 and got["min_n"] == 0 and got["max_n"] == 29


def test_distributed_prune_parity_with_truncated_stats(spark, tmp_path):
    from kafka_delta_ingest_spark.plans.distributed_planning import (
        plan_scan_paths,
    )

    rows = [
        (f"d{i}", f"{'q' * 80}-{i % 5}-{i:04d}", i) for i in range(50)
    ]
    t = Table.create(str(tmp_path / "t"), SCHEMA, [])
    write_dataframe(spark, t, spark.createDataFrame(rows, SCHEMA).repartition(5))
    snap = t.snapshot()
    for conj in (
        [("text", "=", rows[3][1])],
        [("text", ">=", "q" * 80)],
        [("text", "<", "q")],
    ):
        driver = {f.path for f in prune_files(snap.files, conj, snap.schema)}
        assert set(plan_scan_paths(spark, t, conj)) == driver

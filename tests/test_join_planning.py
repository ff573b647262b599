"""Stats-driven MERGE join planning (plans/join_planning.py): strategy
and salt factor from the NDV artifact + manifest alone, and the
merge_into(salt_factor="stats") end-to-end path."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_delta_ingest_spark.maintenance.analyze import analyze
from kafka_delta_ingest_spark.plans.join_planning import (
    merge_join_plan,
    resolve_salt_factor,
)
from kafka_delta_ingest_spark.table.format import Table
from kafka_delta_ingest_spark.table.writer import write_dataframe

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("n_tok", T.IntegerType()),
        T.StructField("source", T.StringType()),
    ]
)


def _table(spark, root, n=2000):
    t = Table.create(root, SCHEMA, partition_cols=["source"])
    write_dataframe(
        spark,
        t,
        spark.range(n).select(
            F.concat(F.lit("d"), F.col("id").cast("string")).alias("doc_id"),
            (F.col("id") % 97).cast("int").alias("n_tok"),
            F.concat(F.lit("s"), (F.col("id") % 3).cast("string")).alias(
                "source"
            ),
        ),
    )
    return t


def test_plan_from_ndv_plain_vs_salted(spark, tmp_table_root):
    """Near-unique key -> plain; low-NDV key -> salted with a factor
    sized to avg multiplicity and clamped. No data read after ANALYZE."""
    t = _table(spark, tmp_table_root)
    analyze(spark, t, ["doc_id", "source"])

    plan = merge_join_plan(spark, t, "doc_id")
    assert plan["strategy"] == "plain" and plan["salt_factor"] == 1

    # 'source' has 3 values over 2000 rows: avg ~667 rows/key; with a
    # 100-row task budget the factor is ceil(667/100)=7
    plan = merge_join_plan(spark, t, "source", rows_per_task=100)
    assert plan["strategy"] == "salted"
    assert 2 <= plan["salt_factor"] <= 64
    assert plan["avg_rows_per_key"] > 100
    # clamping
    assert (
        merge_join_plan(spark, t, "source", rows_per_task=1)["salt_factor"]
        == 64
    )

    with pytest.raises(ValueError, match="no NDV stats"):
        merge_join_plan(spark, t, "n_tok")  # never analyzed


def test_resolve_salt_factor_contract(spark, tmp_table_root):
    """"stats" resolves; a plain plan disables salting AND sampling; an
    int passes through untouched."""
    t = _table(spark, tmp_table_root, n=500)
    analyze(spark, t, ["doc_id"])

    assert resolve_salt_factor(spark, t, "doc_id", 16, None, True) == (
        16,
        None,
        True,
    )
    sf, hk, ad = resolve_salt_factor(spark, t, "doc_id", "stats", None, True)
    assert (sf, hk, ad) == (1, [], False)


def test_merge_into_stats_mode_matches_plain_merge(spark, tmp_path):
    """merge_into(salt_factor="stats") produces the identical end state
    as a plain merge on a copy of the same table."""
    from kafka_delta_ingest_spark.maintenance.merge import merge_into

    roots = [str(tmp_path / "a"), str(tmp_path / "b")]
    tables = [_table(spark, r, n=600) for r in roots]
    analyze(spark, tables[0], ["doc_id"])

    src = spark.range(550, 650).select(
        F.concat(F.lit("d"), F.col("id").cast("string")).alias("doc_id"),
        F.lit(-1).cast("int").alias("n_tok"),
        F.lit("s0").alias("source"),
    )
    m_stats = merge_into(spark, tables[0], src, key="doc_id",
                         salt_factor="stats")
    m_plain = merge_into(spark, tables[1], src, key="doc_id")
    assert m_stats["rows_written"] == m_plain["rows_written"]

    def state(t):
        return {
            tuple(r)
            for r in t.snapshot().scan(spark)
            .select("doc_id", "n_tok", "source").collect()
        }

    assert state(tables[0]) == state(tables[1])

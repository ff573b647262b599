"""Type widening on evolve_schema (Iceberg promotion rules): parquet
pages keep the narrow physical type; Spark's reader up-casts at scan."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_delta_ingest_spark.datagen import make_small_file_table, tokens_df
from kafka_delta_ingest_spark.functions.verify import content_fingerprint
from kafka_delta_ingest_spark.table.format import SchemaEvolutionError
from kafka_delta_ingest_spark.table.writer import write_dataframe


def _widened(schema, name="n_tok", to=T.LongType()):
    return T.StructType(
        [
            T.StructField(name, to, f.nullable) if f.name == name else f
            for f in schema.fields
        ]
    )


def test_widen_int_to_long_reads_old_files(spark, tmp_table_root):
    t = make_small_file_table(spark, tmp_table_root, n_docs=100, n_files=4,
                              max_tok=8, partition_by_source=False)
    pre = {r["doc_id"]: r["n_tok"] for r in t.snapshot().scan(spark).collect()}
    pre_files = {f.path for f in t.snapshot().files}
    t.evolve_schema(_widened(t.snapshot().schema))
    snap = t.snapshot()
    assert isinstance(snap.schema["n_tok"].dataType, T.LongType)
    assert {f.path for f in snap.files} == pre_files  # metadata-only
    got = {r["doc_id"]: r["n_tok"] for r in snap.scan(spark).collect()}
    assert got == pre

    # append values that only fit the wide type
    big = tokens_df(spark, 5, seed=4, max_tok=4).select(
        F.concat(F.lit("w-"), F.col("doc_id")).alias("doc_id"),
        F.col("tokens"),
        (F.lit(2**31) + F.col("n_tok").cast("long")).alias("n_tok"),
        F.col("source"),
    )
    write_dataframe(spark, t, big)
    assert t.snapshot().scan(spark).where(
        F.col("n_tok") > 2**31
    ).count() == 5

    # maintenance across mixed narrow/wide files
    from kafka_delta_ingest_spark.maintenance.compact import compact

    fp = content_fingerprint(t.snapshot().scan(spark))
    compact(spark, t, target_file_bytes=64 * 1024 * 1024, job_id="tw-c")
    assert content_fingerprint(t.snapshot().scan(spark)) == fp

    # manifest pruning with a long literal still prunes correctly
    n = t.snapshot().scan(
        spark, predicate_stats=[("n_tok", ">", 2**31)]
    ).where(F.col("n_tok") > 2**31).count()
    assert n == 5


def test_widening_rejections_and_nullability(spark, tmp_table_root):
    t = make_small_file_table(spark, tmp_table_root, n_docs=20, n_files=1,
                              max_tok=4, partition_by_source=False)
    schema = t.snapshot().schema
    t.evolve_schema(_widened(schema))  # int -> long OK
    with pytest.raises(SchemaEvolutionError, match="widening"):
        t.evolve_schema(_widened(t.snapshot().schema, to=T.IntegerType()))
    with pytest.raises(SchemaEvolutionError, match="widening"):
        t.evolve_schema(_widened(t.snapshot().schema, to=T.StringType()))
    # NOT NULL -> nullable is allowed; the reverse is not
    relaxed = T.StructType(
        [
            T.StructField(f.name, f.dataType, True)
            for f in t.snapshot().schema.fields
        ]
    )
    t.evolve_schema(relaxed)
    with pytest.raises(SchemaEvolutionError, match="widening"):
        t.evolve_schema(
            T.StructType(
                [
                    T.StructField(f.name, f.dataType, False)
                    for f in t.snapshot().schema.fields
                ]
            )
        )


def test_datasource_reads_widened_table(spark, tmp_table_root):
    from kafka_delta_ingest_spark.sources.table_batch import register

    t = make_small_file_table(spark, tmp_table_root, n_docs=30, n_files=2,
                              max_tok=4, partition_by_source=False)
    t.evolve_schema(_widened(t.snapshot().schema))
    register(spark)
    df = spark.read.format("kdi-table").option("path", t.root).load()
    assert dict(df.dtypes)["n_tok"] == "bigint"
    assert df.count() == 30
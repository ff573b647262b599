"""Footer-based stats: struct-leaf recursion, ISO timestamp rendering,
array null-count-only — the writer.rs:655-786 rules read from parquet
footers without a data scan."""

import datetime as dt

from pyspark.sql import types as T

from kafka_delta_ingest_spark.table.format import Table, Transaction
from kafka_delta_ingest_spark.table.writer import stage_dataframe

NESTED_SCHEMA = T.StructType(
    [
        T.StructField("id", T.IntegerType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("ts", T.TimestampType(), True),
                    T.StructField("tag", T.StringType(), True),
                ]
            ),
            True,
        ),
        T.StructField("vals", T.ArrayType(T.IntegerType()), True),
        T.StructField("part", T.StringType(), True),
    ]
)


def test_footer_stats_nested_struct_and_arrays(spark, tmp_table_root):
    t = Table.create(tmp_table_root, NESTED_SCHEMA, ["part"])
    rows = [
        (1, (dt.datetime(2021, 3, 24, 11, 22, 33, 123000), "aa"), [1, 2], "x"),
        (2, (dt.datetime(2021, 3, 25, 0, 0, 0), "zz"), None, "x"),
        (3, (None, None), [7], "y"),
    ]
    df = spark.createDataFrame(rows, NESTED_SCHEMA)
    _, adds = stage_dataframe(spark, t, df.coalesce(1), ["part"], NESTED_SCHEMA)
    t.commit(Transaction(operation="append", adds=adds))

    by_part = {f.partition_values["part"]: f for f in t.snapshot().files}
    fx = by_part["x"].stats
    # struct leaves carry dotted-name min/max (writer.rs:812-843)
    assert fx["min"]["meta.ts"] == "2021-03-24T11:22:33.123Z"  # ISO ms render
    assert fx["max"]["meta.ts"] == "2021-03-25T00:00:00.000Z"
    assert fx["min"]["meta.tag"] == "aa" and fx["max"]["meta.tag"] == "zz"
    assert fx["min"]["id"] == 1 and fx["max"]["id"] == 2
    # arrays: null count only, no min/max (writer.rs:676-681)
    assert "vals" not in fx["min"] and "vals" not in fx["max"]
    assert fx["null_count"]["vals"] == 1  # one null array
    # partition col excluded from stats entirely
    assert "part" not in fx["min"] and "part" not in fx["null_count"]

    fy = by_part["y"].stats
    assert fy["null_count"]["meta.ts"] == 1
    assert fy["num_records"] if hasattr(fy, "num_records") else by_part["y"].num_records == 1

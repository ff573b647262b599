"""Row-level change feed (table/changes.py): net diff between versions
across UPDATE / MOR delete / upsert / append / compaction, with
maintenance rewrites producing zero spurious changes."""

import pytest
from pyspark.sql import functions as F

from kafka_delta_ingest_spark.datagen import TOKENS_SCHEMA, tokens_df
from kafka_delta_ingest_spark.table.changes import row_changes
from kafka_delta_ingest_spark.table.format import Table
from kafka_delta_ingest_spark.table.writer import write_dataframe


def _by_type(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["_change_type"], {})[r["doc_id"]] = (
            r["tokens"], r["n_tok"], r["source"]
        )
    return out


@pytest.fixture()
def table(spark, tmp_path):
    t = Table.create(str(tmp_path / "t"), TOKENS_SCHEMA, ["source"])
    write_dataframe(spark, t, tokens_df(spark, 300, max_tok=8).repartition(6))
    return t


def test_changes_across_dml_and_maintenance(spark, table):
    from kafka_delta_ingest_spark.maintenance.dml import (
        delete_where,
        update_where,
    )
    from kafka_delta_ingest_spark.maintenance.optimize import optimize
    from kafka_delta_ingest_spark.maintenance.upsert import upsert

    t = table
    v1 = t.latest_version()
    base = {r["doc_id"]: (r["tokens"], r["n_tok"], r["source"])
            for r in t.snapshot().scan(spark).collect()}

    update_where(spark, t, [("n_tok", ">=", 6)],
                 {"tokens": "transform(tokens, x -> x + 2)"})
    delete_where(spark, t, [("n_tok", "<=", 1)], mode="merge_on_read")
    ins = tokens_df(spark, 5, max_tok=8, seed=777).withColumn(
        "doc_id", F.concat(F.lit("new-"), "doc_id")
    )
    upsert(spark, t, ins, key="doc_id")
    optimize(spark, t, dims=["n_tok", "doc_id"], curve="zorder",
             target_file_bytes=8 * 1024 * 1024)

    ch = _by_type(row_changes(spark, t, v1, key="doc_id", verify=True))
    upd = {k for k, v in base.items() if v[1] >= 6}
    dele = {k for k, v in base.items() if v[1] <= 1}
    assert set(ch.get("delete", {})) == dele
    assert set(ch.get("update_preimage", {})) == upd
    assert set(ch.get("update_postimage", {})) == upd
    assert set(ch.get("insert", {})) == {r["doc_id"] for r in ins.collect()}
    for k in upd:
        assert ch["update_preimage"][k][0] == base[k][0]
        assert ch["update_postimage"][k][0] == [x + 2 for x in base[k][0]]
    for k in dele:
        assert ch["delete"][k] == base[k]


def test_pure_maintenance_emits_no_changes(spark, table):
    from kafka_delta_ingest_spark.maintenance.optimize import optimize

    t = table
    v1 = t.latest_version()
    optimize(spark, t, dims=["n_tok", "doc_id"], curve="zorder",
             target_file_bytes=4 * 1024 * 1024)
    assert row_changes(spark, t, v1, key="doc_id").count() == 0


def test_changes_span_schema_evolution(spark, table):
    from pyspark.sql import types as T

    t = table
    v1 = t.latest_version()
    new_schema = T.StructType(
        list(TOKENS_SCHEMA.fields) + [T.StructField("lang", T.StringType())]
    )
    t.evolve_schema(new_schema)
    add = (
        tokens_df(spark, 3, max_tok=8, seed=555)
        .withColumn("doc_id", F.concat(F.lit("x-"), "doc_id"))
        .withColumn("lang", F.lit("en"))
    )
    write_dataframe(spark, t, add)
    ch = row_changes(spark, t, v1, key="doc_id")
    rows = {r["doc_id"]: r for r in ch.collect()}
    assert set(rows) == {r["doc_id"] for r in add.collect()}
    assert all(r["_change_type"] == "insert" and r["lang"] == "en"
               for r in rows.values())


def test_duplicate_key_detected(spark, tmp_path):
    t = Table.create(str(tmp_path / "t"), TOKENS_SCHEMA, [])
    df = tokens_df(spark, 10, max_tok=4)
    write_dataframe(spark, t, df)
    v1 = t.latest_version()
    write_dataframe(spark, t, df.withColumn(
        "tokens", F.transform("tokens", lambda x: x + F.lit(9))
    ))  # same doc_ids appended again -> duplicates on the new side
    with pytest.raises(ValueError, match="duplicate key"):
        row_changes(spark, t, v1, key="doc_id", verify=True).collect()

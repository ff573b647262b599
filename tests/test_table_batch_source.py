"""Batch Python Data Source over the table (sources/table_batch.py):
``spark.read.format("kdi-table")`` must equal the native snapshot scan —
including merge-on-read deletes and time travel; the explicit ``where``
option must prune planned file tasks via the manifest AND filter
row-level; plan/view reuse must never lose rows (the Spark 4.1
cached-scan hazard that makes pushFilters opt-in)."""

from pyspark.sql import functions as F
from pyspark.sql.datasource import EqualTo, GreaterThanOrEqual

from kafka_delta_ingest_spark.datagen import TOKENS_SCHEMA, tokens_df
from kafka_delta_ingest_spark.maintenance.dml import delete_where
from kafka_delta_ingest_spark.maintenance.upsert import upsert
from kafka_delta_ingest_spark.plans.pruning import prune_files
from kafka_delta_ingest_spark.sources.table_batch import (
    KdiTableBatchReader,
    KdiTablePruningReader,
    parse_where,
    register,
    to_conjuncts,
)
from kafka_delta_ingest_spark.table.format import Table
from kafka_delta_ingest_spark.table.writer import write_dataframe


def _load(spark, root, **opts):
    register(spark)
    r = spark.read.format("kdi-table").option("path", root)
    for k, v in opts.items():
        r = r.option(k, str(v))
    return r.load()


def _rowset(df):
    return {
        (r["doc_id"], r["n_tok"], tuple(r["tokens"] or ()), r["source"])
        for r in df.collect()
    }


def test_batch_source_equals_snapshot_scan_through_mor_deletes(
    spark, tmp_table_root
):
    """Full lifecycle: appends + compaction + MOR position delete +
    equality-delete upsert — the datasource read must stay row-identical
    to Snapshot.scan at head AND at a pinned earlier version."""
    t = Table.create(tmp_table_root, TOKENS_SCHEMA, ["source"])
    write_dataframe(spark, t, tokens_df(spark, 80, max_tok=16))  # v1
    write_dataframe(
        spark,
        t,
        tokens_df(spark, 50, seed=7, max_tok=16).withColumn(
            "doc_id", F.concat(F.lit("b-"), "doc_id")
        ),
    )  # v2
    v2 = t.latest_version()
    from kafka_delta_ingest_spark.maintenance.compact import compact

    compact(spark, t, target_file_bytes=64 * 1024 * 1024, job_id="c")
    delete_where(spark, t, [("n_tok", "<=", 3)], mode="merge_on_read")
    batch = (
        tokens_df(spark, 12, seed=9, max_tok=16)
        .withColumn("source", F.lit("src1"))
        .withColumn("n_tok", F.lit(5))
        .withColumn("tokens", F.expr("array(1,2,3,4,5)"))
    )
    upsert(spark, t, batch, key="doc_id")  # equality delete + append

    got = _rowset(_load(spark, tmp_table_root))
    want = _rowset(t.snapshot().scan(spark))
    assert got == want and len(want) > 0

    pinned = _rowset(_load(spark, tmp_table_root, versionAsOf=v2))
    assert pinned == _rowset(t.snapshot(v2).scan(spark))
    assert pinned != got


def test_where_option_prunes_files_and_filters_rows(spark, tmp_table_root):
    """The explicit where option: planned partitions file-for-file equal
    to the driver pruner, returned rows exactly the WHERE-matching set —
    and because the conjuncts live in the load's options, nothing about
    the plan is mutable state."""
    t = Table.create(tmp_table_root, TOKENS_SCHEMA, ["source"])
    for s in range(4):
        write_dataframe(spark, t, tokens_df(spark, 40, seed=s, max_tok=16))
    snap = t.snapshot()

    where = "source = 'books' AND n_tok >= 2"
    conj = parse_where(where)
    assert conj == [("source", "=", "books"), ("n_tok", ">=", 2)]
    rdr = KdiTableBatchReader(t.root, snap.schema, None, conjuncts=conj)
    planned = {p.rel_path for p in rdr.partitions()}
    want = {
        f.path
        for f in prune_files(
            snap.files, conj, snap.schema, spec=snap.partition_cols
        )
    }
    assert planned == want
    assert 0 < len(planned) < len(snap.files)

    got = _rowset(_load(spark, tmp_table_root, where=where))
    want_rows = _rowset(
        snap.scan(spark).where("source = 'books' AND n_tok >= 2")
    )
    assert got == want_rows and len(got) > 0


def test_where_option_prunes_through_hidden_partitioning(
    spark, tmp_table_root
):
    """A doc_id equality conjunct prunes bucket(N, doc_id) partitions via
    the transform mapping, and an empty survivor set still returns an
    empty DataFrame with the table schema."""
    t = Table.create(tmp_table_root, TOKENS_SCHEMA, ["bucket(4,doc_id)"])
    write_dataframe(spark, t, tokens_df(spark, 120, max_tok=12))
    snap = t.snapshot()
    some_id = snap.scan(spark).select("doc_id").first()["doc_id"]

    rdr = KdiTableBatchReader(
        t.root, snap.schema, None, conjuncts=[("doc_id", "=", some_id)]
    )
    planned = {p.rel_path for p in rdr.partitions()}
    assert 0 < len(planned) < len(snap.files)

    df = _load(spark, tmp_table_root, where=f"doc_id = '{some_id}'")
    assert df.count() == 1

    gone = _load(spark, tmp_table_root, where="doc_id = 'no-such-doc-id'")
    assert gone.count() == 0
    assert [f.name for f in gone.schema.fields] == [
        f.name for f in snap.schema.fields
    ]


def test_optin_pushdown_prunes_single_use_load(spark, tmp_table_root):
    """pushdown=true: Catalyst filters reach pushFilters, prune planned
    tasks, and the (single-use) query stays exact because every filter is
    yielded back for row-level re-application."""
    t = Table.create(tmp_table_root, TOKENS_SCHEMA, ["source"])
    for s in range(4):
        write_dataframe(spark, t, tokens_df(spark, 40, seed=s, max_tok=16))
    snap = t.snapshot()

    rdr = KdiTablePruningReader(t.root, snap.schema, None)
    filters = [EqualTo(("source",), "books"), GreaterThanOrEqual(("n_tok",), 2)]
    returned = list(rdr.pushFilters(filters))
    assert returned == filters  # all yielded back -> Spark re-applies
    assert to_conjuncts(filters) == [
        ("source", "=", "books"),
        ("n_tok", ">=", 2),
    ]
    assert 0 < len(rdr.partitions()) < len(snap.files)

    got = _rowset(
        _load(spark, tmp_table_root, pushdown="true").where(
            "source = 'books' AND n_tok >= 2"
        )
    )
    want_rows = _rowset(
        snap.scan(spark).where("source = 'books' AND n_tok >= 2")
    )
    assert got == want_rows and len(got) > 0


def test_plan_reuse_never_loses_rows_with_default_reader(
    spark, tmp_table_root
):
    """The hazard that made pushFilters opt-in, exercised both ways:
    (a) one load reused by two union branches with different filters;
    (b) a temp view queried filtered-then-full. Spark 4.1 caches the
    planned Python scan in the relation, so a pruning pushFilters reader
    silently dropped the unfiltered branch's rows (measured). The
    default reader implements no pushFilters — both patterns must stay
    exact."""
    t = Table.create(tmp_table_root, TOKENS_SCHEMA, ["source"])
    write_dataframe(spark, t, tokens_df(spark, 100, max_tok=12))
    total = t.snapshot().scan(spark).count()

    df = _load(spark, tmp_table_root)
    u = df.withColumn("stage", F.lit("full")).unionByName(
        df.where("source = 'books'").withColumn("stage", F.lit("pruned"))
    )
    counts = {r["stage"]: r["count"] for r in u.groupBy("stage").count().collect()}
    assert counts["full"] == total
    assert 0 < counts["pruned"] < total

    df.createOrReplaceTempView("kdi_reuse_v")
    few = spark.sql(
        "SELECT COUNT(*) c FROM kdi_reuse_v WHERE source = 'books'"
    ).first()["c"]
    again = spark.sql("SELECT COUNT(*) c FROM kdi_reuse_v").first()["c"]
    assert few == counts["pruned"]
    assert again == total  # the filtered query must not poison the view


def test_sql_over_registered_datasource(spark, tmp_table_root):
    """The whole point of the format string: plain SQL tooling reads the
    table via a temp view with no engine imports in the query path."""
    t = Table.create(tmp_table_root, TOKENS_SCHEMA, ["source"])
    write_dataframe(spark, t, tokens_df(spark, 60, max_tok=16))
    _load(spark, tmp_table_root).createOrReplaceTempView("kdi_docs")
    n = spark.sql("SELECT COUNT(*) AS c FROM kdi_docs").first()["c"]
    assert n == t.snapshot().scan(spark).count()


def test_where_option_in_membership(spark, tmp_table_root):
    """`col IN (a, b)` conjuncts prune partitions and row-filter via the
    Arrow isin path, equal to the native scan's isin filter."""
    t = Table.create(tmp_table_root, TOKENS_SCHEMA, ["source"])
    write_dataframe(spark, t, tokens_df(spark, 120, max_tok=12))
    snap = t.snapshot()

    conj = parse_where("source IN ('web', 'books')")
    assert conj == [("source", "in", ["web", "books"])]
    rdr = KdiTableBatchReader(t.root, snap.schema, None, conjuncts=conj)
    planned = {p.rel_path for p in rdr.partitions()}
    assert 0 < len(planned) < len(snap.files)

    got = _rowset(
        _load(spark, tmp_table_root, where="source IN ('web', 'books')")
    )
    want = _rowset(
        snap.scan(spark).where(F.col("source").isin("web", "books"))
    )
    assert got == want and len(got) > 0


def test_batch_write_append_and_overwrite(spark, tmp_table_root):
    """Write half of the format: append stages Arrow-side and lands one
    atomic commit (stats + hive layout identical to the engine's own
    writer); overwrite replaces the live file set in the same commit;
    planning rejections mirror the streaming sink."""
    import pytest

    t = Table.create(tmp_table_root, TOKENS_SCHEMA, ["source"])
    write_dataframe(spark, t, tokens_df(spark, 40, max_tok=12))
    base = _rowset(t.snapshot().scan(spark))

    batch = tokens_df(spark, 25, seed=5, max_tok=12).withColumn(
        "doc_id", F.concat(F.lit("w-"), "doc_id")
    )
    register(spark)
    (
        batch.write.format("kdi-table")
        .option("path", tmp_table_root)
        .mode("append")
        .save()
    )
    t2 = Table(tmp_table_root)
    assert _rowset(t2.snapshot().scan(spark)) == base | _rowset(batch)
    # stats present on the new files (manifest parity with the engine)
    v_append = t2.latest_version()
    newest = t2._read_commit(v_append)
    assert newest["operation"] == "append"
    assert all("min" in a["stats"] for a in newest["add"])

    over = tokens_df(spark, 10, seed=9, max_tok=12).withColumn(
        "doc_id", F.concat(F.lit("o-"), "doc_id")
    )
    (
        over.write.format("kdi-table")
        .option("path", tmp_table_root)
        .mode("overwrite")
        .save()
    )
    t3 = Table(tmp_table_root)
    assert _rowset(t3.snapshot().scan(spark)) == _rowset(over)
    # history intact: the pre-overwrite version still scans (time travel)
    assert _rowset(t3.snapshot(v_append).scan(spark)) == base | _rowset(batch)

    # planning rejections
    from kafka_delta_ingest_spark.sources.table_batch import (
        KdiTableDataSource,
    )
    import pyspark.sql.types as T

    bad = T.StructType([T.StructField("doc_id", T.StringType())])
    with pytest.raises(ValueError, match="write schema"):
        KdiTableDataSource({"path": tmp_table_root}).writer(bad, False)

    root2 = str(tmp_table_root) + "_c"
    Table.create(
        root2, TOKENS_SCHEMA, [], properties={"constraint.pos": "n_tok > 0"}
    )
    with pytest.raises(ValueError, match="CHECK constraints"):
        KdiTableDataSource({"path": root2}).writer(TOKENS_SCHEMA, False)


def test_eq_delete_on_partition_key_and_fully_masked_file(
    spark, tmp_table_root
):
    """Review regressions: (a) equality-delete keys that include a
    partition column must work — identity partition values are
    reconstructed BEFORE the eq anti-join (staged parquets don't carry
    them); (b) a file fully masked by position deletes that also has an
    applicable equality delete must not crash on the (empty) boolean
    mask."""
    t = Table.create(tmp_table_root, TOKENS_SCHEMA, ["source"])
    write_dataframe(spark, t, tokens_df(spark, 60, max_tok=12))
    # (b) position-delete EVERY row of the books partition's files
    delete_where(
        spark, t, [("source", "=", "books")], mode="merge_on_read"
    )
    # (a) upsert keyed by (doc_id, source) -> equality_ids include the
    # partition column; key ranges overlap the fully-masked files too
    batch = (
        tokens_df(spark, 8, seed=3, max_tok=12)
        .withColumn("n_tok", F.lit(4))
        .withColumn("tokens", F.expr("array(9,9,9,9)"))
    )
    upsert(spark, t, batch, key=["doc_id", "source"])

    got = _rowset(_load(spark, tmp_table_root))
    want = _rowset(t.snapshot().scan(spark))
    assert got == want and len(want) > 0


def test_empty_overwrite_truncates(spark, tmp_table_root):
    """INSERT OVERWRITE with an empty input must still commit the
    removes (a truncate), not silently keep the old rows; overwriting an
    already-empty table commits nothing."""
    t = Table.create(tmp_table_root, TOKENS_SCHEMA, ["source"])
    write_dataframe(spark, t, tokens_df(spark, 20, max_tok=8))
    register(spark)
    empty = tokens_df(spark, 20, max_tok=8).where("n_tok < 0")
    (
        empty.write.format("kdi-table")
        .option("path", tmp_table_root)
        .mode("overwrite")
        .save()
    )
    t2 = Table(tmp_table_root)
    assert t2.snapshot().scan(spark).count() == 0
    v = t2.latest_version()
    # second empty overwrite of the now-empty table: no new version
    (
        empty.write.format("kdi-table")
        .option("path", tmp_table_root)
        .mode("overwrite")
        .save()
    )
    assert Table(tmp_table_root).latest_version() == v

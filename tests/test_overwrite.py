"""INSERT OVERWRITE (maintenance/overwrite.py): predicate-scoped
replaceWhere and dynamic partition overwrite."""

import pytest
from pyspark.sql import functions as F

from kafka_delta_ingest_spark.datagen import make_small_file_table, tokens_df
from kafka_delta_ingest_spark.functions.verify import content_fingerprint
from kafka_delta_ingest_spark.maintenance.overwrite import (
    overwrite_dynamic,
    overwrite_where,
)


def _books_replacement(spark, n_docs=400, max_tok=16):
    """New content for partition books: same keys, every token shifted +7."""
    base = tokens_df(spark, n_docs, max_tok=max_tok)
    return base.where(F.col("source") == "books").withColumn(
        "tokens", F.transform("tokens", lambda x: x + F.lit(7))
    )


def test_partition_aligned_overwrite_is_metadata_only(spark, tmp_table_root):
    t = make_small_file_table(spark, tmp_table_root, n_docs=400, n_files=8,
                              max_tok=16)
    pre = t.snapshot()
    before_other = {
        f.path for f in pre.files if f.partition_values.get("source") != "books"
    }
    new = _books_replacement(spark)
    m = overwrite_where(spark, t, new, [("source", "=", "books")])

    # partition alignment: every matching file was removed WITHOUT a read
    assert m["files_removed_metadata_only"] > 0
    assert m["files_rewritten"] == 0
    post = t.snapshot()
    # untouched partitions keep byte-identical files
    assert before_other <= {f.path for f in post.files}

    # content: books rows replaced (tokens+7), everything else unchanged
    got = post.scan(spark)
    exp = tokens_df(spark, 400, max_tok=16).where(
        F.col("source") != "books"
    ).unionByName(new)
    assert content_fingerprint(got) == content_fingerprint(exp)

    # snapshot isolation: the pre-overwrite version still reads old rows
    assert content_fingerprint(t.snapshot(pre.version).scan(spark)) == \
        content_fingerprint(tokens_df(spark, 400, max_tok=16))


def test_straddling_predicate_rewrites_keeping_nonmatching(spark, tmp_table_root):
    t = make_small_file_table(spark, tmp_table_root, n_docs=400, n_files=8,
                              max_tok=16, partition_by_source=False)
    base = tokens_df(spark, 400, max_tok=16)
    new = base.where(F.col("n_tok") >= 9).withColumn(
        "tokens", F.transform("tokens", lambda x: x * F.lit(2))
    )
    m = overwrite_where(spark, t, new, [("n_tok", ">=", 9)])
    # n_tok straddles every hashed file: all touched files are rewritten
    assert m["files_removed_metadata_only"] == 0
    assert m["files_rewritten"] > 0

    exp = base.where(F.col("n_tok") < 9).unionByName(new)
    assert content_fingerprint(t.snapshot().scan(spark)) == \
        content_fingerprint(exp)


def test_new_rows_must_satisfy_predicate(spark, tmp_table_root):
    t = make_small_file_table(spark, tmp_table_root, n_docs=100, n_files=2,
                              max_tok=8)
    rogue = tokens_df(spark, 100, max_tok=8).where(F.col("source") == "web")
    pre = t.latest_version()
    with pytest.raises(ValueError, match="do not satisfy"):
        overwrite_where(spark, t, rogue, [("source", "=", "books")])
    assert t.latest_version() == pre  # nothing committed


def test_overwrite_empty_region_inserts(spark, tmp_table_root):
    """replaceWhere over a predicate matching nothing = validated insert."""
    t = make_small_file_table(spark, tmp_table_root, n_docs=100, n_files=2,
                              max_tok=8)
    new = tokens_df(spark, 100, max_tok=8).where(
        F.col("source") == "web"
    ).withColumn("doc_id", F.concat(F.lit("new-"), F.col("doc_id")))
    before = t.snapshot().scan(spark).count()
    m = overwrite_where(
        spark, t, new, [("doc_id", ">=", "new-")],
    )
    assert m["files_removed_metadata_only"] == 0
    assert t.snapshot().scan(spark).count() == before + new.count()


def test_dynamic_overwrite_replaces_only_present_partitions(spark, tmp_table_root):
    t = make_small_file_table(spark, tmp_table_root, n_docs=400, n_files=8,
                              max_tok=16)
    pre = t.snapshot()
    other_files = {
        f.path for f in pre.files if f.partition_values.get("source") != "books"
    }
    new = _books_replacement(spark)
    m = overwrite_dynamic(spark, t, new)
    assert m["partitions_replaced"] == 1
    post = t.snapshot()
    assert other_files <= {f.path for f in post.files}

    exp = tokens_df(spark, 400, max_tok=16).where(
        F.col("source") != "books"
    ).unionByName(new)
    assert content_fingerprint(post.scan(spark)) == content_fingerprint(exp)


def test_dynamic_overwrite_unpartitioned_is_full_replace(spark, tmp_table_root):
    t = make_small_file_table(spark, tmp_table_root, n_docs=100, n_files=4,
                              max_tok=8, partition_by_source=False)
    new = tokens_df(spark, 10, seed=9, max_tok=8)
    m = overwrite_dynamic(spark, t, new)
    assert m["files_removed"] == 4
    assert content_fingerprint(t.snapshot().scan(spark)) == \
        content_fingerprint(new)


def test_point_overwrite_narrows_through_bloom(spark, tmp_table_root):
    from kafka_delta_ingest_spark.maintenance.bloom import build_bloom

    t = make_small_file_table(spark, tmp_table_root, n_docs=400, n_files=8,
                              max_tok=8, partition_by_source=False)
    build_bloom(spark, t, ["doc_id"], bits_per_key=16)
    key = f"doc-{123:012d}"
    new = tokens_df(spark, 400, max_tok=8).where(F.col("doc_id") == key)
    m = overwrite_where(spark, t, new, [("doc_id", "=", key)])
    # min/max overlaps everywhere; the bloom cuts the rewrite set
    assert m["files_rewritten"] < 8
    assert t.snapshot().scan(spark).count() == 400
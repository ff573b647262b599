"""End-to-end curation pipeline tests (pipelines/curate.py)."""

import pytest
from pyspark.sql import functions as F

from kafka_delta_ingest_spark.pipelines.curate import (
    curate,
    curate_flags,
    curate_to_table,
    release,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the patient owl "
    "watches from the old oak tree and the river runs slowly past the "
    "quiet village where the children play near the stone bridge every "
    "single afternoon in the warm golden light of the setting sun"
)
EVAL_SNIPPET = "glaciers carve deep valleys through ancient mountains"


@pytest.fixture()
def corpus(spark):
    rows = [
        (1, BASE, "web"),
        (2, BASE, "web"),  # exact dup of 1
        (3, BASE.replace("golden", "silver"), "web"),  # near dup of 1
        (4, "yesterday the scientists said " + EVAL_SNIPPET + " and the "
            "seas keep rising while the towns along the coast prepare",
            "books"),  # contaminated (shares 5-grams with the eval set)
        (5, "!!!! #### $$$$ %%%%", "web"),  # low quality
        (6, "the gentle baker wakes before dawn and the warm bread fills "
            "the narrow street with a smell the neighbours love", "books"),
        (7, "the engineers tested the new bridge design and the results "
            "showed the structure could hold the heaviest trains", "web"),
    ]
    return spark.createDataFrame(rows, "doc_id int, text string, source string")


@pytest.fixture()
def eval_docs(spark):
    return spark.createDataFrame(
        [(100, "reports note that " + EVAL_SNIPPET + " over many centuries")],
        "doc_id int, text string",
    )


def test_curate_flags_and_precedence(spark, corpus, eval_docs):
    flags = curate_flags(
        corpus, eval_docs, quality_min=0.3, decontam_n=5
    )
    rows = {r["doc_id"]: r for r in flags.collect()}
    assert not rows[1]["exact_dup"] and rows[2]["exact_dup"]
    assert rows[3]["near_dup"] and not rows[6]["near_dup"]
    assert rows[4]["contaminated"] and not rows[1]["contaminated"]
    assert rows[5]["low_quality"] and not rows[7]["low_quality"]


def test_curate_funnel_and_mix(spark, corpus, eval_docs):
    kept, report = curate(
        corpus,
        eval_docs,
        quality_min=0.3,
        decontam_n=5,
        mix_weights={"web": 1.0, "books": 1.0},
    )
    ids = {r["doc_id"] for r in kept.collect()}
    release(kept)
    assert report["n_input"] == 7
    assert report["n_exact_dup"] == 1  # doc 2 (precedence over near_dup)
    assert report["n_near_dup"] == 1  # doc 3
    assert report["n_contaminated"] == 1  # doc 4
    assert report["n_low_quality"] == 1  # doc 5
    # survivors: 1 (web), 6 (books), 7 (web) -> bottleneck books=1 keeps
    # one web doc in expectation; whatever the hash draw, accounting holds
    assert ids <= {1, 6, 7}
    assert report["n_kept"] == len(ids)
    assert report["n_sampled_out"] == 3 - len(ids)
    assert set(report["mix_rates"]) == {"web", "books"}
    assert report["mix_rates"]["books"] == 1.0


def test_curate_without_eval_or_mix(spark, corpus):
    kept, report = curate(corpus, quality_min=0.3)
    ids = {r["doc_id"] for r in kept.collect()}
    release(kept)
    assert ids == {1, 4, 6, 7}
    assert report["n_contaminated"] == 0
    assert report["n_kept"] == 4 and report["n_sampled_out"] == 0


def test_curate_to_table(spark, corpus, eval_docs, tmp_path):
    from kafka_delta_ingest_spark.table.format import Table

    root = str(tmp_path / "curated")
    report = curate_to_table(
        spark, corpus, root, eval_docs, quality_min=0.3
    )
    assert report["table_version"] == 1
    got = Table(root).snapshot().scan(spark)
    ids = {r["doc_id"] for r in got.collect()}
    assert ids == {1, 6, 7}
    assert report["n_kept"] == 3

"""Physical-plan lint for the document/embedding queries.

Catalyst silently degrades plans in ways wall-clock tests at toy scale
don't catch: min/max over STRING falls from HashAggregate to
SortAggregate (immutable aggregation buffer — a full sort of every gram
row; measured 51 s vs 6.5 s at sf0.1 before round 2 parsed hex slices to
longs), and a join that loses its equi-condition becomes a cartesian
product. This test asserts the executed-plan string of every
documents/embeddings query stays free of those operators, so the
degradation class can never ship silently again.

Maintenance queries are excluded only because explaining them requires
building a table first; their plans are audited in tools/explain_plans.py.
"""

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"

# queries over raw parquet tables (no table build needed to plan them)
PLANNED = [
    "exact_dedup_docs",
    "doc_fingerprints",
    "lang_id",
    "token_counts",
    "quality_scores",
    "repetition_scores",
    "stratified_sample",
    "token_histogram",
    "length_percentiles",
    "minhash_near_dups",
    "minhash_near_dups_fast",
    "simhash_near_dups",
    "simhash_near_dups_fast",
    "ngram_jaccard",
    "winnow_fingerprints",
    "ann_topk",
    "ivf_topk",
    "embedding_near_dups",
    "embedding_near_dups_exact",
    "pii_scrub",
    "event_props_rollup",
    "decontam",
    "mix_resample",
    "curation_verdicts",
    "rollup_pricing",
    "asof_join_events",
    "bm25_scores",
    "pivot_event_values",
    # bucket decomposition must keep this a hash equi-join — the whole
    # point is that the naive plan would be BroadcastNestedLoopJoin
    "range_join_value_bands",
    "unigram_freq",
    "bigram_lm",
    "ccnet_buckets",
    "dsir_weights",
    "token_pair_counts",
    # HLL sketch: register build + estimate must stay HashAggregate
    # (bucket/rho are ints, the harmonic sum is a long), and the
    # sketch-to-exact join is an equi-join on the group column
    "hll_distinct",
    "pq_topk",
    "cms_word_counts",
    # KMV/theta + bottom-k sample: two-phase top-k must stay hash
    # aggregated (ObjectHashAggregate for the collect_list shard phase);
    # the estimate joins are equi-joins on the group column
    "kmv_distinct",
    "sampled_quantiles",
    # IVF-PQ: the ONLY join is the broadcast equi-join on the cell id —
    # a lost equi-condition would explode into queries x corpus
    "ivf_pq_topk",
]

# ann/exact pair scoring is an intentional broadcast nested-loop (queries
# or one self-join side broadcast, corpus never shuffles); everything else
# must keep equi-join conditions
NESTED_LOOP_OK = {
    "ann_topk",
    "embedding_near_dups_exact",
    "ann_lsh_selfhit",
    # 1-row corpus-stats broadcast cross join (the two-pass BM25 shape)
    "bm25_scores",
    "unigram_freq",
    "bigram_lm",
    # inherits bigram_lm's 1-row corpus-total broadcast cross join
    "ccnet_buckets",
    # 1-row totals broadcast cross join feeding the bucket log-ratios
    "dsir_weights",
    # PQ ADC scoring broadcasts the (small) query side over the codes
    "pq_topk",
}


@pytest.mark.parametrize("name", PLANNED)
def test_no_degraded_operators(spark, name):
    df = entrymod.queries()[name](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortAggregate" not in plan, f"{name}: SortAggregate in plan"
    assert "CartesianProduct" not in plan, f"{name}: cartesian product"
    if name not in NESTED_LOOP_OK:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name}: non-equi join fell back to nested loop"
        )


def test_decontam_broadcasts_eval_grams(spark):
    """The eval gram set must reach the train-gram join as a broadcast —
    the corpus-side gram rows must never shuffle for the contamination
    check."""
    from kafka_delta_ingest_spark.operators.dedup import decontaminate

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    ev = d.where(F.col("doc_id") % 97 == 0)
    df = decontaminate(d, ev, n=5, materialize=False)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_span_dedup_plan_stays_hash_aggregated(spark):
    """Winner election (min over the long occurrence code) and the totals
    count must stay HashAggregate; reassembly's collect_list is
    ObjectHashAggregate by design. No cartesian/nested-loop fallback —
    every join is an equi-join on a hash or (doc, pos)."""
    from kafka_delta_ingest_spark.operators.dedup import span_dedup

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    df = span_dedup(d, k=8, materialize=False)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortAggregate" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "ObjectHashAggregate" in plan  # reassembly path


def test_pack_sequences_plan_is_range_partitioned(spark):
    """The prefix sum must ride ONE range exchange (stream order ==
    partition order); the per-partition window must not collapse to a
    single global sort partition."""
    from kafka_delta_ingest_spark.operators.packing import pack_sequences
    from kafka_delta_ingest_spark.operators.text import token_count

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    toks = d.select("doc_id", token_count("text").alias("n_tok"))
    df = pack_sequences(toks, budget=512, materialize=False)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan
    assert "SinglePartition" not in plan
    assert "SortAggregate" not in plan


def test_mix_resample_filter_is_row_local(spark):
    """After the driver-side rate computation, membership is a pure filter:
    no exchange in the surviving plan (scan -> filter -> project only)."""
    df = entrymod.queries()["mix_resample"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan

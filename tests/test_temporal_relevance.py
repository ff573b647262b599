"""Semantic unit tests for asof_join and bm25_scores — the edge cases the
full-table oracle parity check can't isolate (equal-ts inclusivity,
no-preceding-match NULLs, tie determinism, zero-tf scores)."""

import datetime as dt

from pyspark.sql import functions as F

from kafka_delta_ingest_spark.operators.relevance import bm25_scores
from kafka_delta_ingest_spark.operators.temporal import asof_join

EPOCH = dt.datetime(2024, 1, 1)


def _ts(seconds):
    return EPOCH + dt.timedelta(seconds=seconds)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (100, 1, _ts(10)),  # matches right@10 (equal ts inclusive)
            (101, 1, _ts(5)),   # no right row at or before -> NULL
            (102, 1, _ts(30)),  # matches right@20 (most recent, not @10)
            (103, 2, _ts(50)),  # user 2: matches tie-broken right@50
            (104, 3, _ts(9)),   # user 3 has no right rows at all
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (200, 1, _ts(10)),
            (201, 1, _ts(20)),
            (202, 2, _ts(50)),  # equal-ts tie: max event_id wins
            (203, 2, _ts(50)),
        ],
        "event_id long, user_id long, ts timestamp",
    )
    return left, right


def test_asof_semantics(spark):
    left, right = _frames(spark)
    out = asof_join(
        left, right, on="user_id", ts="ts", left_id="event_id",
        right_id="event_id",
    )
    rows = {r["event_id"]: r for r in out.collect()}
    assert set(rows) == {100, 101, 102, 103, 104}
    assert rows[100]["matched_event_id"] == 200  # ts == right ts counts
    assert rows[100]["gap_us"] == 0
    assert rows[101]["matched_event_id"] is None
    assert rows[101]["gap_us"] is None
    assert rows[102]["matched_event_id"] == 201  # most recent, not first
    assert rows[102]["gap_us"] == 10_000_000
    assert rows[103]["matched_event_id"] == 203  # deterministic tie-break
    assert rows[104]["matched_event_id"] is None


def test_asof_single_shuffle(spark):
    """One exchange total: the union sorts once per key partition —
    no range-join or per-left-row argmax shuffle may appear."""
    left, right = _frames(spark)
    out = asof_join(
        left, right, on="user_id", ts="ts", left_id="event_id",
        right_id="event_id",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") <= 2  # right-dedup agg + window
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bm25_scores_semantics(spark):
    docs = spark.createDataFrame(
        [
            (1, "spark spark spark merge"),
            (2, "spark only once here yes"),
            (3, "nothing relevant at all"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in bm25_scores(docs, ["spark", "merge"]).collect()}
    assert out[1]["tf_spark"] == 3 and out[1]["tf_merge"] == 1
    assert out[2]["tf_spark"] == 1 and out[2]["tf_merge"] == 0
    assert out[3]["score"] == 0.0
    # more term occurrences -> strictly higher score (same doc lengths
    # would be ideal; doc 1 is shorter AND higher-tf, so strictly above)
    assert out[1]["score"] > out[2]["score"] > 0.0
    assert out[1]["dl"] == 4 and out[2]["dl"] == 5

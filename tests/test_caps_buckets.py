"""Per-domain caps + sequence-length bucketing (training-pipeline ops)."""

from pyspark.sql import functions as F

from kafka_delta_ingest_spark.operators.packing import length_buckets
from kafka_delta_ingest_spark.operators.sampling import domain_cap


def _docs(spark, n=400):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("d"), (F.col("id") % 5).cast("string")).alias("domain"),
        ((F.col("id") * 37) % 600 + 1).cast("long").alias("n_tok"),
    )


def test_domain_cap_bounds_and_determinism(spark):
    d = _docs(spark)
    out = domain_cap(d, "domain", cap=20, key_cols=["doc_id"], caps={"d0": 5})
    counts = {r["domain"]: r["c"] for r in out.groupBy("domain").agg(F.count("*").alias("c")).collect()}
    assert counts["d0"] == 5
    assert all(v == 20 for k, v in counts.items() if k != "d0")
    # deterministic: same call, same survivors
    again = domain_cap(d, "domain", cap=20, key_cols=["doc_id"], caps={"d0": 5})
    assert {r["doc_id"] for r in out.collect()} == {r["doc_id"] for r in again.collect()}


def test_domain_cap_under_cap_group_kept_whole(spark):
    d = _docs(spark, n=30)  # 6 docs per domain < cap
    out = domain_cap(d, "domain", cap=20, key_cols=["doc_id"])
    assert out.count() == 30


def test_domain_cap_prefilter_matches_exact(spark):
    """Two-phase (pre-filter + window) must equal the exact plan when the
    margin holds — the production path at O(domains*cap) shuffle size."""
    d = _docs(spark)
    counts = {r["domain"]: r["c"] for r in d.groupBy("domain").agg(F.count("*").alias("c")).collect()}
    exact = domain_cap(d, "domain", cap=10, key_cols=["doc_id"], salt="pf")
    two_phase = domain_cap(
        d, "domain", cap=10, key_cols=["doc_id"], salt="pf",
        prefilter_counts=counts, prefilter_margin=4.0,
    )
    assert {r["doc_id"] for r in exact.collect()} == {
        r["doc_id"] for r in two_phase.collect()
    }


def test_length_buckets_exact_accounting(spark):
    d = _docs(spark, n=200)
    out = length_buckets(d, "n_tok", [64, 256, 512]).collect()
    rows = {r["bucket"]: r for r in out}
    assert set(rows) <= {64, 256, 512}
    # every doc lands somewhere; totals conserve
    assert sum(r["n_docs"] for r in out) == 200
    raw = d.agg(F.sum("n_tok")).first()[0]
    assert sum(r["sum_tokens"] for r in out) == raw
    for r in out:
        assert r["capacity_tokens"] == r["bucket"] * r["n_docs"]
        assert r["padding_tokens"] == r["capacity_tokens"] - r["kept_tokens"]
        assert r["trunc_tokens"] == r["sum_tokens"] - r["kept_tokens"]
        if r["bucket"] != 512:
            assert r["trunc_tokens"] == 0  # only the max bucket truncates
    # docs longer than 512 were truncated into the 512 bucket
    assert rows[512]["trunc_tokens"] == (
        d.where(F.col("n_tok") > 512)
        .agg(F.sum(F.col("n_tok") - 512))
        .first()[0]
    )

"""Corpus relevance scoring (BM25 family) for training-data curation —
rank documents against a query term set for retrieval-based filtering or
dedup triage.

Log-free BM25 variant: the classic BM25 idf is ``ln((N-df+0.5)/(df+0.5))``;
transcendentals are libm-dependent (JVM StrictMath vs DuckDB's C libm can
differ in the last ulp), which breaks cross-engine value-hash parity. We
use the RATIONAL odds form ``(N-df+0.5)/(df+0.5)`` directly — the same
monotone ranking, exact IEEE-754 arithmetic (+,-,*,/ are single correctly
rounded ops), so Spark and DuckDB produce bit-identical doubles when the
expression tree matches. The arithmetic is therefore emitted from ONE
shared SQL template (`SCORE_TEMPLATE`) instantiated for both engines.

Scale shape: per-doc term frequencies are row-local array ops (JVM
codegen, no shuffle); corpus stats (N, df_t, Σdl) are one partial-agg
reduce to a single row, broadcast back with a crossJoin — the standard
two-pass TF-IDF/BM25 shape. At 100 TB the stats row is bytes; the only
shuffle is the 1-row aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_delta_ingest_spark.operators.spread import (
    MIN_BYTES_MILD,
    spread_small_input,
)

__all__ = ["bm25_scores", "SCORE_TEMPLATE", "K1", "B"]

K1 = "1.2"
B = "0.75"

# Shared Spark-SQL/DuckDB arithmetic for one term's score. All inputs are
# pre-cast to DOUBLE; literal-identical text on both engines guarantees
# the same IEEE evaluation order.
SCORE_TEMPLATE = (
    "(((({N} - {df}) + 0.5) / ({df} + 0.5)) * "
    "(({tf} * ({k1} + 1.0)) / "
    "({tf} + {k1} * ((1.0 - {b}) + {b} * ({dl} / {avgdl})))))"
)


def _tf_expr(term: str) -> str:
    """Exact term frequency over single-space word splits (Spark SQL)."""
    return f"size(filter(split(lower(text), ' '), x -> x = '{term}'))"


def score_sql(n: str, df: str, tf: str, dl: str, avgdl: str) -> str:
    """Instantiate the shared per-term score arithmetic."""
    return SCORE_TEMPLATE.format(
        N=n, df=df, tf=tf, dl=dl, avgdl=avgdl, k1=K1, b=B
    )


def bm25_scores(docs: DataFrame, terms: list[str]) -> DataFrame:
    """Score every document against ``terms`` with rational-idf BM25.

    Returns (doc_id, tf_<term>..., dl, score) — tf/dl are exact ints, the
    score a deterministic double (fixed left-assoc sum over terms, no
    aggregation of floats anywhere).
    """
    # spread before the per-doc tf pass: one split+filter per term per row
    # on a one-split scan otherwise serializes the whole pass (r6 §1)
    docs = spread_small_input(docs, "doc_id", MIN_BYTES_MILD)
    # BIGINT casts: DuckDB's len() is BIGINT — keep integer widths aligned
    # so the gate's value normalization sees identical types.
    per_doc = docs.selectExpr(
        "doc_id",
        *[f"CAST({_tf_expr(t)} AS BIGINT) AS tf_{t}" for t in terms],
        "CAST(size(split(lower(text), ' ')) AS BIGINT) AS dl",
    )
    stats = per_doc.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        *[
            F.sum((F.col(f"tf_{t}") > 0).cast("long")).alias(f"df_{t}")
            for t in terms
        ],
        F.sum(F.col("dl").cast("long")).alias("sum_dl"),
    )
    scored = per_doc.crossJoin(F.broadcast(stats))
    avgdl = "(CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))"
    term_scores = [
        score_sql(
            n="CAST(n_docs AS DOUBLE)",
            df=f"CAST(df_{t} AS DOUBLE)",
            tf=f"CAST(tf_{t} AS DOUBLE)",
            dl="CAST(dl AS DOUBLE)",
            avgdl=avgdl,
        )
        for t in terms
    ]
    total = " + ".join(term_scores)
    return scored.selectExpr(
        "doc_id",
        *[f"tf_{t}" for t in terms],
        "dl",
        f"({total}) AS score",
    )

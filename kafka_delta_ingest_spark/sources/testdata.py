"""Driver testdata access (TESTDATA.md): the TPC-H-ish star schema plus
documents/embeddings, read straight from parquet. Also deterministic
derivation of the primary `tokens` table from `documents` — the same
derivation is expressed in ANSI SQL for the DuckDB oracle, so maintenance
ops over the tokens table are oracle-checkable end-to-end."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


def tokens_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic tokens table derived from `documents`:
      doc_id  = cast(doc_id as string)
      n_tok   = (n_chars % 509) + 1
      tokens  = [ (doc_id*7 + i) % 50021 : i in 0..n_tok-1 ]
      source  = source
    Mirrored in SQL by ``TOKENS_FROM_DOCUMENTS_SQL`` (DuckDB dialect uses
    list comprehension; values are identical)."""
    d = load_table(spark, sf_dir, "documents")
    n_tok = ((F.col("n_chars") % F.lit(509)) + F.lit(1)).cast("int")
    base = F.col("doc_id") * F.lit(7)
    tokens = F.transform(
        F.sequence(F.lit(0), n_tok - F.lit(1)),
        lambda i: F.pmod(base + i.cast("long"), F.lit(50021)).cast("int"),
    )
    return d.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        tokens.alias("tokens"),
        n_tok.alias("n_tok"),
        F.col("source").alias("source"),
    )


# DuckDB mirror of tokens_from_documents (list_transform + range)
TOKENS_FROM_DOCUMENTS_SQL = """
SELECT CAST(doc_id AS VARCHAR) AS doc_id,
       list_transform(range(0, ((n_chars % 509) + 1)),
                      i -> CAST((doc_id * 7 + i) % 50021 AS INTEGER)) AS tokens,
       CAST((n_chars % 509) + 1 AS INTEGER) AS n_tok,
       source
FROM documents
"""

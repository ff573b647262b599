"""spark-submit entry point for sequence packing — curated documents
parquet in, per-document context-window assignments out (the hand-off
from curation to the training data loader).

Usage:
  spark-submit --py-files kafka_delta_ingest_spark.zip jobs/pack.py \
      --input /data/curated/documents --output /data/packed/assignments \
      --budget 4096 [--weight-col n_tok | --text-col text]

If ``--weight-col`` names an existing column it is used as the token
weight; otherwise weights are computed from ``--text-col`` with the
whitespace token counter (swap in token_count_bpe upstream for a
BPE-shaped estimate).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser(description="kdi-spark sequence packing")
    p.add_argument("--input", required=True, help="documents parquet path")
    p.add_argument("--output", required=True, help="assignments parquet path")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--weight-col", default="n_tok")
    p.add_argument("--text-col", default="text")
    p.add_argument("--budget", type=int, default=2048)
    p.add_argument(
        "--materialize", action="store_true",
        help="emit the packed WINDOWS themselves (seq_id, tokens, n_tok, "
        "n_docs) via pack_tokens instead of per-document assignments; "
        "--input must carry a tokens array column",
    )
    p.add_argument("--tokens-col", default="tokens")
    p.add_argument("--eos", type=int, default=None,
                   help="EOS token id appended per document (materialize)")
    p.add_argument("--pad", type=int, default=None,
                   help="pad token id for the final short window (materialize)")
    args = p.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from kafka_delta_ingest_spark.operators.packing import pack_sequences
    from kafka_delta_ingest_spark.operators.text import token_count

    spark = SparkSession.builder.getOrCreate()
    docs = spark.read.parquet(args.input)
    if args.materialize:
        from kafka_delta_ingest_spark.operators.packing import pack_tokens

        wins = pack_tokens(
            docs, budget=args.budget, id_col=args.id_col,
            tokens_col=args.tokens_col, eos=args.eos, pad=args.pad,
        )
        wins.write.mode("overwrite").parquet(args.output)
        stats = spark.read.parquet(args.output).agg(
            F.count(F.lit(1)).alias("windows"),
            F.sum("n_tok").alias("tokens"),
        ).collect()[0]
        print(json.dumps({
            "windows": int(stats["windows"]),
            "tokens": int(stats["tokens"]),
            "budget": args.budget,
            "fill": round(
                int(stats["tokens"]) / (int(stats["windows"]) * args.budget), 4
            ),
        }))
        return
    if args.weight_col not in docs.columns:
        docs = docs.select(
            F.col(args.id_col), token_count(args.text_col).alias(args.weight_col)
        )
    out = pack_sequences(
        docs, id_col=args.id_col, weight_col=args.weight_col, budget=args.budget
    )
    out.write.mode("overwrite").parquet(args.output)
    stats = out.agg(
        F.count(F.lit(1)).alias("docs"),
        (F.max(F.col("seq_id")) + 1).alias("windows"),
        F.sum("n_tok").alias("tokens"),
    ).collect()[0]
    print(
        json.dumps(
            {
                "docs": stats["docs"],
                "windows": int(stats["windows"]),
                "tokens": int(stats["tokens"]),
                "budget": args.budget,
                "fill": round(
                    int(stats["tokens"]) / (int(stats["windows"]) * args.budget), 4
                ),
            }
        )
    )


if __name__ == "__main__":
    main()

"""spark-submit entry point for the training-data curation pipeline —
raw documents parquet in, curated table + funnel report out.

Usage:
  spark-submit --py-files kafka_delta_ingest_spark.zip jobs/curate.py \
      --input /data/raw/documents --output /data/curated/documents \
      --eval-set /data/benchmarks/eval_docs \
      --quality-min 0.3 --jaccard-threshold 0.8 \
      --mix web=0.6,books=0.3,code=0.1
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _parse_mix(s: str | None) -> dict[str, float] | None:
    if not s:
        return None
    out: dict[str, float] = {}
    for part in s.split(","):
        k, _, v = part.partition("=")
        out[k.strip()] = float(v)
    return out


def main() -> None:
    p = argparse.ArgumentParser(description="kdi-spark corpus curation")
    p.add_argument("--input", required=True, help="documents parquet path")
    p.add_argument("--output", required=True, help="curated table root")
    p.add_argument("--eval-set", default=None, help="benchmark docs parquet")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default="text")
    p.add_argument("--strata-col", default="source")
    p.add_argument("--ngram-n", type=int, default=3)
    p.add_argument("--jaccard-threshold", type=float, default=0.8)
    p.add_argument("--decontam-n", type=int, default=5)
    p.add_argument("--quality-min", type=float, default=0.0)
    p.add_argument("--mix", default=None, help="stratum=weight,... target")
    p.add_argument("--salt", default="curate")
    args = p.parse_args()

    from pyspark.sql import SparkSession

    from kafka_delta_ingest_spark.pipelines.curate import curate_to_table

    spark = SparkSession.builder.getOrCreate()
    docs = spark.read.parquet(args.input)
    eval_df = spark.read.parquet(args.eval_set) if args.eval_set else None
    report = curate_to_table(
        spark,
        docs,
        args.output,
        eval_df,
        strata_col=args.strata_col,
        id_col=args.id_col,
        text_col=args.text_col,
        ngram_n=args.ngram_n,
        jaccard_threshold=args.jaccard_threshold,
        decontam_n=args.decontam_n,
        quality_min=args.quality_min,
        mix_weights=_parse_mix(args.mix),
        salt=args.salt,
    )
    print(json.dumps(report, sort_keys=True))


if __name__ == "__main__":
    main()

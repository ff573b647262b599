"""Print the physical plans of the engine's key operators so plan shape
regressions are visible: filter pushdown into parquet scans, broadcast
joins for dims and metadata maps, range partitioning for clustering,
whole-stage codegen coverage.

Usage: python tools/explain_plans.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from kafka_delta_ingest_spark.session import get_spark


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="explain", cores=4, shuffle_partitions=4)

    import __spark_entry__ as entrymod
    from kafka_delta_ingest_spark.datagen import make_small_file_table
    from kafka_delta_ingest_spark.maintenance.zorder import cluster_keyed_df

    print("=" * 70)
    print("1. snapshot scan with predicate (expect PushedFilters + pruning)")
    root = "/tmp/kdi_explain_tbl"
    import shutil

    shutil.rmtree(root, ignore_errors=True)
    t = make_small_file_table(spark, root, n_docs=2000, n_files=8, max_tok=64)
    snap = t.snapshot()
    pred = [("n_tok", "<=", 16)]
    df = snap.scan(spark, predicate=F.col("n_tok") <= 16, predicate_stats=pred)
    kept = len(
        __import__(
            "kafka_delta_ingest_spark.plans.pruning", fromlist=["prune_files"]
        ).prune_files(snap.files, pred)
    )
    print(f"manifest pruning kept {kept}/{len(snap.files)} files")
    df.explain("formatted")

    print("=" * 70)
    print("2. revenue_by_nation (expect BroadcastHashJoin on dims)")
    entrymod.q_revenue_by_nation(spark, sf_dir).explain("formatted")

    print("=" * 70)
    print("3. salted_join (expect union of salted + plain join branches)")
    entrymod.q_salted_join(spark, sf_dir).explain()

    print("=" * 70)
    print("4. zorder keyed plan (expect ArrowEvalPython only for curve key)")
    keyed = cluster_keyed_df(
        snap.scan(spark), ["source", "n_tok", "doc_id"], "zorder",
        {"n_tok": (1, 64)},
    )
    out = keyed.repartitionByRange(4, F.col("_ckey")).sortWithinPartitions("_ckey")
    out.explain("formatted")

    print("=" * 70)
    print("5. per-file stats aggregation (expect single scan + hash agg)")
    from kafka_delta_ingest_spark.table.stats import file_stats_df

    file_stats_df(snap.scan(spark), snap.schema, snap.partition_cols).explain(
        "formatted"
    )

    print("=" * 70)
    print("6. ANALYZE register build (expect ONE scan reading only the")
    print("   requested columns — ReadSchema must exclude `tokens` — and")
    print("   one hash aggregation)")
    from kafka_delta_ingest_spark.maintenance.analyze import _register_rows
    from kafka_delta_ingest_spark.table.scan import read_entries

    df6 = read_entries(
        spark, t.root, snap.files, snap.schema, snap.partition_cols,
        file_path_col="_file",
    )
    regs = (
        _register_rows(df6, ["doc_id", "n_tok"], 8, "hll", "xxhash64")
        .groupBy("_file", "column", "bucket")
        .agg(F.max("rho").alias("rho"))
    )
    regs.explain("formatted")
    plan6 = regs._jdf.queryExecution().executedPlan().toString()
    assert "tokens" not in plan6.split("ReadSchema")[-1].split("\n")[0], (
        "ANALYZE scan reads the token arrays it doesn't need"
    )
    print("ReadSchema pruned: tokens column excluded ✔")
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()

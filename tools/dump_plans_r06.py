"""Dump .explain('formatted') for the r6-touched queries into plans/r06/.

Usage: python tools/dump_plans_r06.py <before|after> [query ...]

Captures the physical plan of each query's returned DataFrame (the same
object bench.py writes to the noop sink) so plan-shape claims in
OPTIMIZATION_r06.md are checkable offline. Maintenance queries execute
their table-building side effects during construction — this tool is a
real (if partial) run, not free.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_QUERIES = [
    "minhash_near_dups",
    "ingest_dedup",
    "near_dup_groups",
    "embedding_near_dups_exact",
    "simhash_near_dups",
    "ngram_jaccard",
    "dead_letters",
    "ingest_e2e",
    "table_stream_scan",
    "bpe_merges",
]


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "after"
    names = sys.argv[2:] or DEFAULT_QUERIES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r06")
    os.makedirs(out_dir, exist_ok=True)

    from kafka_delta_ingest_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark(app_name=f"plans-r06-{tag}")
    qs = entrymod.queries()
    for name in names:
        fn = qs[name]
        try:
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            path = os.path.join(out_dir, f"{name}_{tag}.txt")
            with open(path, "w") as f:
                f.write(buf.getvalue())
            print(f"wrote {path}")
        except Exception as e:  # noqa: BLE001
            print(f"ERROR {name}: {e}")


if __name__ == "__main__":
    main()

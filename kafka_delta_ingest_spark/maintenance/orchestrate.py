"""Per-partition maintenance orchestration.

At 10^12 rows nobody optimizes a table in one commit: the unit of work
is a PARTITION (a day, a source), selected by metadata, rewritten as its
own atomic commit, resumable if the driver dies between partitions.
This module is that loop, built from pieces that already exist:

- candidate selection from the ``partitions`` metadata rollup
  (table/inspect.partitions_df — pure manifest math, no data read);
- per-partition scoped OPTIMIZE (maintenance/optimize.py ``scope=`` —
  file eligibility pruned on recorded partition values, out-of-scope
  files keep byte identity);
- one atomic commit per partition: a crash mid-sweep leaves a table
  where some partitions are optimized and the rest untouched — every
  intermediate state is a valid snapshot, and re-running skips
  partitions the first sweep already fixed (they no longer look
  fragmented).

The reference's analogue is one-partition-at-a-time offset commits
(src/lib.rs:1148-1170): bounded work per transaction, restartable at
the transaction boundary.
"""

from __future__ import annotations

import time

from pyspark.sql import SparkSession

from kafka_delta_ingest_spark.table.format import Table


def fragmented_partitions(
    spark: SparkSession,
    table: Table,
    target_file_bytes: int,
    min_files: int = 4,
    small_file_ratio: float = 0.75,
) -> list[dict]:
    """Partitions worth compacting, by manifest math alone: at least
    ``min_files`` files and average file size under
    ``small_file_ratio * target``. Sorted most-fragmented first
    (most files, smallest average). Partitions containing NULL partition
    values are skipped (scope conjuncts are equality-on-value; a final
    unscoped pass picks them up)."""
    from kafka_delta_ingest_spark.table.inspect import partitions_df

    rows = partitions_df(spark, table).collect()
    out = []
    for r in rows:
        pv = dict(r["partition"])
        if any(v is None for v in pv.values()):
            continue
        if r["file_count"] >= min_files and (
            r["avg_file_bytes"] < small_file_ratio * target_file_bytes
        ):
            out.append(
                {
                    "partition": pv,
                    "file_count": r["file_count"],
                    "row_count": r["row_count"],
                    "total_bytes": r["total_bytes"],
                }
            )
    out.sort(key=lambda d: (-d["file_count"], d["total_bytes"]))
    return out


def optimize_partitions(
    spark: SparkSession,
    table: Table,
    dims: list[str],
    target_file_bytes: int,
    curve: str = "zorder",
    min_files: int = 4,
    max_partitions: int | None = None,
    job_id: str | None = None,
) -> dict:
    """Sweep fragmented partitions with one scoped fused OPTIMIZE (and
    one atomic commit) each. Returns per-partition metrics; rerunning
    after a crash re-selects candidates, so finished partitions are
    skipped for free."""
    from kafka_delta_ingest_spark.maintenance.optimize import optimize

    t0 = time.time()
    cands = fragmented_partitions(
        spark, table, target_file_bytes, min_files=min_files
    )
    if max_partitions is not None:
        cands = cands[:max_partitions]
    done = []
    for i, c in enumerate(cands):
        scope = [(k, "=", v) for k, v in sorted(c["partition"].items())]
        jid = f"{job_id or 'opt-sweep'}-{i:04d}"
        m = optimize(
            spark, table, dims=dims, curve=curve,
            target_file_bytes=target_file_bytes, scope=scope, job_id=jid,
        )
        done.append({"partition": c["partition"], **{
            k: m.get(k) for k in (
                "version", "files_rewritten", "files_written", "rows",
                "duration_s",
            )
        }})
    return {
        "partitions_considered": len(cands),
        "partitions_optimized": len(done),
        "results": done,
        "duration_s": round(time.time() - t0, 3),
    }

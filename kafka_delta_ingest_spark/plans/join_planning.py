"""Stats-driven join planning for MERGE: pick the join strategy from the
NDV stats artifact and the manifest — ZERO data reads.

At 10^12 rows the question "is the merge key skewed enough to salt?" must
not cost a sampling scan of the target (``plans.salting.detect_hot_keys``
reads data; cheap once, not per CDC batch every few minutes). The ANALYZE
artifact (maintenance/analyze.py) already knows the key's NDV and the
manifest knows the live row count, so average key multiplicity — the
skew first-order signal — is a driver-side division:

    avg_rows_per_key = live_rows / NDV(key)

- near-unique key (multiplicity ≲ a task's comfortable row count): plain
  shuffle join, and the per-batch hot-key sampling job is SKIPPED
  entirely — the common CDC case (doc_id upserts) pays nothing;
- low-NDV key: salted join, salt_factor sized so a single key's expected
  rows spread into ~rows_per_task chunks (clamped; hot-key *identities*
  are still detected or caller-supplied at join time — NDV bounds how
  bad skew CAN be, the identities need a look at the batch).

This is the classic cost-based-optimizer use of NDV statistics (Selinger
1979; Iceberg publishes NDV in Puffin for engines to make exactly this
call) applied to the one join this engine runs constantly: MERGE INTO's
target ⋈ source.
"""

from __future__ import annotations

import math

from pyspark.sql import SparkSession

from kafka_delta_ingest_spark.table.format import Table

DEFAULT_ROWS_PER_TASK = 4_000_000


def merge_join_plan(
    spark: SparkSession,
    table: Table,
    key: str | list[str],
    rows_per_task: int = DEFAULT_ROWS_PER_TASK,
    min_salt: int = 2,
    max_salt: int = 64,
) -> dict:
    """Strategy for MERGE's target ⋈ source join, from metadata alone.

    Returns ``{"strategy": "plain"|"salted", "salt_factor", "ndv",
    "live_rows", "avg_rows_per_key"}``. Composite keys use the MAX of the
    per-column NDVs as the (conservative) lower bound on the composite
    NDV. Raises if the key columns were never ANALYZEd — the caller
    should fall back to sampling (``merge_into(auto_detect_skew=True)``)."""
    from kafka_delta_ingest_spark.maintenance.analyze import ndv_estimates

    keys = [key] if isinstance(key, str) else list(key)
    est = ndv_estimates(spark, table)
    missing = [k for k in keys if k not in est]
    if missing:
        raise ValueError(
            f"merge_join_plan: no NDV stats for {missing}; run "
            f"maintenance.analyze.analyze(spark, table, {keys}) first"
        )
    ndv = max(est[k] for k in keys)
    # live rows: position-deleted rows don't participate in the join
    # (snap.read anti-joins them out), so they must not inflate the
    # multiplicity signal on a heavily-MOR-deleted table
    live_rows = table.snapshot().num_live_records()
    avg = live_rows / max(ndv, 1.0)
    if avg <= rows_per_task:
        return {
            "strategy": "plain",
            "salt_factor": 1,
            "ndv": ndv,
            "live_rows": live_rows,
            "avg_rows_per_key": avg,
        }
    salt = min(max(int(math.ceil(avg / rows_per_task)), min_salt), max_salt)
    return {
        "strategy": "salted",
        "salt_factor": salt,
        "ndv": ndv,
        "live_rows": live_rows,
        "avg_rows_per_key": avg,
    }


def resolve_salt_factor(
    spark: SparkSession,
    table: Table,
    key: str | list[str],
    salt_factor: "int | str",
    hot_keys: list | None,
    auto_detect: bool,
) -> tuple[int, list | None, bool]:
    """Resolve ``salt_factor="stats"`` for merge_into: returns the
    effective (salt_factor, hot_keys, auto_detect) triple. A "plain"
    plan pins hot_keys=[] so the join skips BOTH salting and the
    sampling job; a "salted" plan keeps hot-key detection (or the
    caller's explicit list) and applies the stats-sized factor."""
    if salt_factor != "stats":
        return int(salt_factor), hot_keys, auto_detect
    plan = merge_join_plan(spark, table, key)
    if plan["strategy"] == "plain":
        return 1, [], False
    # salted: identities come from the caller's list or, failing that,
    # detection — a salted plan with no hot keys would silently degrade
    # to a plain join
    return plan["salt_factor"], hot_keys, (hot_keys is None) or auto_detect

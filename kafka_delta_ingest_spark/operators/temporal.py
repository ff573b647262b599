"""Temporal join operators Spark's DataFrame API lacks as built-ins.

``asof_join`` — for each left row, the single most recent right row with
``right.ts <= left.ts`` within the same key group (the "previous quote
for every trade" shape). Spark has no ASOF JOIN; the naive recast is an
inequality join + per-left-row argmax, which Catalyst plans as a range
join (O(n·m) per key worst-case) plus a second shuffle for the argmax.

Scale-correct recast: **union + running last_value**. Tag both sides,
union, and run one window per key ordered by (ts, side) where right rows
sort BEFORE left rows at equal ts (so `<=` matches). A running
``last(..., ignorenulls=True)`` carries each right row's payload forward
to every following left row. Cost: ONE shuffle on the key, one linear
in-partition sort — the same cost as the sessionization window, with no
quadratic candidate blow-up. This is how kdb/Flink implement as-of
semantics over a merged stream; at 100 TB the key (user/symbol) is the
partition axis and AQE handles skewed keys.

Right rows are first deduplicated to one per (key, ts) — keeping the max
payload id — so the match is deterministic even when timestamps collide
(DuckDB's native ASOF JOIN, used as the oracle, leaves equal-ts winners
unspecified otherwise).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    left_id: str,
    right_id: str,
) -> DataFrame:
    """Most-recent-at-or-before join of ``right`` onto ``left``.

    Parameters
    ----------
    left, right : event frames, each with columns [`on`, `ts`, *_id]
    on : equality key (e.g. user_id, symbol)
    ts : event-time column (timestamp or numeric; compared with <=)
    left_id / right_id : payload id column carried from each side

    Returns one row per left row: (left_id, on, matched_<right_id>,
    gap_us) where gap_us = left.ts - right.ts in microseconds (NULL when
    no right row precedes the left row). The output carries epoch-micros
    arithmetic only — no raw timestamps/doubles — so results are
    hash-stable across engines.
    """
    matched_col = f"matched_{right_id}"
    # Deterministic right side: one row per (key, ts).
    r = (
        right.groupBy(on, ts)
        .agg(F.max(right_id).alias(matched_col))
        .select(
            F.col(on),
            F.unix_micros(F.col(ts).cast("timestamp")).alias("_ts_us"),
            F.lit(0).alias("_side"),
            F.col(matched_col),
            F.lit(None).cast("long").alias(left_id),
        )
    )
    l = left.select(
        F.col(on),
        F.unix_micros(F.col(ts).cast("timestamp")).alias("_ts_us"),
        F.lit(1).alias("_side"),
        F.lit(None).cast("long").alias(matched_col),
        F.col(left_id),
    )
    w = (
        Window.partitionBy(on)
        .orderBy("_ts_us", "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    merged = r.unionByName(l).select(
        F.col(on),
        F.col("_ts_us"),
        F.col("_side"),
        F.col(left_id),
        F.last(matched_col, ignorenulls=True).over(w).alias(matched_col),
        F.last(
            F.when(F.col("_side") == 0, F.col("_ts_us")), ignorenulls=True
        )
        .over(w)
        .alias("_r_ts_us"),
    )
    return merged.filter(F.col("_side") == 1).select(
        F.col(left_id),
        F.col(on),
        F.col(matched_col),
        (F.col("_ts_us") - F.col("_r_ts_us")).cast("long").alias("gap_us"),
    )

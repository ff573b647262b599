"""Input-width guard for explode- and pair-amplifying operators.

The dedup/similarity operators multiply their input hundreds-to-thousands
of times before the first exchange (gram explosion: one row per n-gram;
pair scoring: one row per candidate pair). Spark sizes the FIRST stage by
the *input* split count, so a narrow source — one parquet file at small
scale factors, a single-partition upstream, a coalesced filter — serializes
the whole hash/score pipeline on a handful of cores while the rest of the
cluster idles: the amplified rows never cross an exchange that could
re-balance them (guide §2.5 "input skew": repartition immediately after
the read). Measured at sf0.1/local[32]: the md5 MinHash pipeline ran 68 s
on the 1-split documents scan and 8.8 s after spreading the 5000 doc rows
— identical output.

``spread_small_input`` hash-repartitions the *pre-amplification* rows (each
doc/vector moves ONCE — tiny next to the gram/pair rows it unlocks) to the
session's parallelism, and ONLY when the input is narrower than that:
a production scan with hundreds of splits passes through untouched, so at
100 TB this is a no-op and no full-table shuffle sneaks in. Partitioning
by the id column (not round-robin) keeps the placement deterministic under
task retry and lets per-id aggregations downstream (MinHash signatures,
shingle sets) reuse the exchange instead of adding their own.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# bytes floor for MILDLY amplifying operators (word explodes ~50x with
# cheap hashes, per-vector K×d math): below this plan-stat size the whole
# operator is sub-CPU-second and the spread exchange + 32-task scheduling
# cost more than the width saves (r6 A/B at sf0.1: semdedup +3.3 s, ~+0.3 s
# per word query). The HEAVILY amplifying call sites (char/word gram
# explodes feeding 16-md5-per-gram pipelines, pair scoring) keep the
# default 0 = spread always — their single-task cost dwarfs any exchange
# at every input size (r6: 64 s -> 9 s on a 0.6 MB scan).
MIN_BYTES_MILD = 1 << 20


def spread_small_input(
    df: DataFrame, key: str | Column, min_bytes: int = 0
) -> DataFrame:
    """Hash-repartition ``df`` by ``key`` (a column name or deterministic
    key expression) up to the session's default parallelism when (and
    only when) its physical plan yields fewer partitions than that. The
    explicit partition count pins the width: AQE's coalescer would
    otherwise fold the few-MB pre-explosion rows back into one
    partition, which is exactly the state being fixed.

    ``min_bytes``: optional Catalyst-stat size floor — when the
    optimized plan's ``sizeInBytes`` estimate is below it, the input is
    left alone (see ``MIN_BYTES_MILD``). An unknown/huge estimate fails
    open to spreading: a genuinely large scan has many splits and is
    already short-circuited by the partition-count guard."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    # stats first: it needs only the optimized plan, while the partition
    # count forces a full physical plan + RDD conversion — under the floor
    # (every small-sf bench input) the guard exits on the cheap check
    if min_bytes:
        try:
            stat = int(
                df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
            )
        except Exception:  # noqa: BLE001 - stats unavailable: spread
            stat = None
        if stat is not None and stat < min_bytes:
            return df
    try:
        cur = df.rdd.getNumPartitions()
    except Exception:  # noqa: BLE001 - planning quirk: leave input alone
        return df
    if cur >= target:
        return df
    return df.repartition(target, F.col(key) if isinstance(key, str) else key)

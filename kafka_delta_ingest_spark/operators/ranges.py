"""Range (interval) join — the no-equality-key join class.

Joining points to intervals (``lo <= p < hi``) has no equi-key, so
Catalyst's only built-in plans are BroadcastNestedLoopJoin (O(n·m) work,
fine only for tiny interval sets) or a cartesian product. The scale-
correct recast is **bucket decomposition** (the same trick Databricks'
range-join optimization and postGIS bin joins use):

1. pick a bucket width W;
2. explode every interval into the W-aligned buckets it spans
   (``sequence(floor(lo/W), floor((hi-ε)/W))`` — interval rows multiply
   by their span/W, which is bounded and tunable);
3. compute each point's single bucket ``floor(p/W)``;
4. equi-join on the bucket (ONE hash shuffle, AQE-skew-aware), then
   re-apply the exact predicate as a cheap post-filter.

Each (point, interval) match survives exactly once — the join key is the
point's unique bucket, and the interval contributes that bucket once —
so no dedup pass is needed. W trades interval-row duplication against
per-bucket candidate density; for uniform data, W ≈ median interval
width is near-optimal.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["point_in_interval_join"]


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
) -> DataFrame:
    """Inner-join ``points`` to every interval with lo <= point < hi.

    Returns points columns + intervals columns (callers project). Both
    inputs keep all their columns; name collisions must be resolved by
    the caller beforehand.
    """
    w = F.lit(float(bucket_width))

    def bucket(c: Column) -> Column:
        return F.floor(c / w).cast("long")

    pts = points.withColumn("_bkt", bucket(F.col(point_col)))
    # hi is exclusive: an interval [10, 15) with W=5 spans only bucket 2,
    # so explode to floor(lo/W) .. floor((hi - tiny)/W). Using hi-exclusive
    # arithmetic directly: last bucket = floor(hi/W) when hi % W != 0 else
    # floor(hi/W) - 1; sequence() is inclusive on both ends.
    last_bkt = F.when(
        F.col(hi_col) % w == 0, bucket(F.col(hi_col)) - 1
    ).otherwise(bucket(F.col(hi_col)))
    # empty intervals (hi <= lo) match nothing and would flip sequence()
    # into descending mode — drop them before the explode
    ivs = intervals.filter(F.col(hi_col) > F.col(lo_col)).withColumn(
        "_bkt",
        F.explode(F.sequence(bucket(F.col(lo_col)), last_bkt)),
    )
    joined = pts.join(ivs, on="_bkt", how="inner").filter(
        (F.col(point_col) >= F.col(lo_col))
        & (F.col(point_col) < F.col(hi_col))
    )
    return joined.drop("_bkt")

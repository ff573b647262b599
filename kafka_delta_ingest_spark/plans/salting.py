"""Explicit skew handling: salted hash join with hot-key splitting.

The north rule requires *explicit* skew splitting (AQE skew-join stays on
as a backstop, session.py). Mechanism — the classic two-path plan:

  hot keys  : big side gets a deterministic salt in [0, salt_factor);
              small side is **replicated** salt_factor times (explode);
              join on (key, salt) → hot key fans out over salt_factor tasks
  cold keys : plain shuffle hash/sort-merge join
  result    : unionByName of both paths (identical schema)

Hot keys are detected with a bounded sample count — metadata-scale driver
work, one cheap job — or supplied explicitly by the caller (e.g. the known
hot ``source`` values of the tokens table: `web` holds ~60% of rows).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALT_FACTOR = 16
_SALT = "__salt"


def detect_hot_keys(
    df: DataFrame,
    key: str | list[str],
    threshold_frac: float = 0.05,
    sample_frac: float | None = 0.05,
    max_keys: int = 64,
) -> list:
    """Keys holding more than ``threshold_frac`` of (sampled) rows."""
    keys = [key] if isinstance(key, str) else list(key)
    s = df.select(*keys)
    if sample_frac and sample_frac < 1.0:
        s = s.sample(fraction=sample_frac, seed=7)
    counts = s.groupBy(*keys).count()
    total = s.count()
    if total == 0:
        return []
    hot = (
        counts.where(F.col("count") >= total * threshold_frac)
        .orderBy(F.desc("count"))
        .limit(max_keys)
        .collect()
    )
    if len(keys) == 1:
        return [r[keys[0]] for r in hot]
    return [tuple(r[k] for k in keys) for r in hot]


def _key_cols(key: str | list[str]) -> list[str]:
    return [key] if isinstance(key, str) else list(key)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str | list[str],
    how: str = "inner",
    salt_factor: int = DEFAULT_SALT_FACTOR,
    hot_keys: list | None = None,
    auto_detect: bool = True,
) -> DataFrame:
    """Join ``big ⋈ small`` on ``key`` with explicit hot-key salting.

    ``how`` supports inner/left (left = big side preserved) and full
    (both sides preserved: an unmatched replicated small-side row would
    surface once per salt, so the hot path keeps only its salt-0 copy).
    The salt on the big side is a *deterministic* hash of the whole row
    (not rand()), so retried tasks re-produce identical salts — required
    for exactly-once semantics under task retry (the engine-wide
    idempotency stance inherited from the reference's rebalance-safe
    design, /root/reference/src/lib.rs:599-656)."""
    keys = _key_cols(key)
    if hot_keys is None and auto_detect:
        hot_keys = detect_hot_keys(big, key)
    hot_keys = hot_keys or []
    if not hot_keys:
        return big.join(small, keys, how)

    if isinstance(key, str):
        hot_pred_big = F.col(keys[0]).isin(hot_keys)
        hot_pred_small = F.col(keys[0]).isin(hot_keys)
    else:
        tup = F.struct(*[F.col(k) for k in keys])
        lits = F.array(*[F.struct(*[F.lit(v).alias(k) for k, v in zip(keys, hk)]) for hk in hot_keys])
        hot_pred_big = F.array_contains(lits, tup)
        hot_pred_small = F.array_contains(lits, tup)

    big_cols = [F.col(c) for c in big.columns]
    salt_col = F.pmod(F.xxhash64(*big_cols), F.lit(salt_factor)).cast("int")

    big_hot = big.where(hot_pred_big).withColumn(_SALT, salt_col)
    big_cold = big.where(~hot_pred_big)

    small_hot = (
        small.where(hot_pred_small)
        .withColumn(_SALT, F.explode(F.sequence(F.lit(0), F.lit(salt_factor - 1))))
        .withColumn(_SALT, F.col(_SALT).cast("int"))
    )
    small_cold = small.where(~hot_pred_small)

    if how == "full":
        # full outer can't run directly on (key, salt): a MATCHED small
        # row still leaves unmatched replicas at salts no big row of its
        # key landed on. Decompose: big-preserved left join + small-only
        # rows whose key has NO big row at all (anti join against the
        # distinct big hot keys — ≤ len(hot_keys) values, broadcast-cheap).
        joined_hot = big_hot.join(small_hot, keys + [_SALT], "left").drop(_SALT)
        small_only = small.where(hot_pred_small).join(
            F.broadcast(big.where(hot_pred_big).select(*keys).distinct()),
            keys,
            "left_anti",
        )
        joined_hot = joined_hot.unionByName(small_only, allowMissingColumns=True)
    else:
        joined_hot = big_hot.join(small_hot, keys + [_SALT], how).drop(_SALT)
    joined_cold = big_cold.join(small_cold, keys, how)
    return joined_hot.unionByName(joined_cold)

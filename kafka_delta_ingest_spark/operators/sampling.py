"""Deterministic hash-based sampling for reproducible training-data splits.

Random sampling (``df.sample``) is seed- and partitioning-dependent: the
same row can land in different samples across runs, cluster sizes, or
retries. Web-scale pipelines sample by KEY HASH instead — membership is a
pure function of the row key, so samples are reproducible, resumable, and
joinable across runs/tables (e.g. a doc sampled into eval stays in eval
forever).

Two hash families, same shape as the near-dup operators:
- ``xxhash64`` (production): one JVM long hash, uniform in [0, 1).
- ``md5`` (oracle): fraction from the first 8 hex chars — DuckDB replays
  it exactly (positional nibble sum), so the correctness gate covers the
  full pipeline.

Filters are pure row-local expressions: no shuffle, no state, parquet
predicate pushdown unaffected (the filter composes with pushed scans).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from kafka_delta_ingest_spark.operators.spread import (
    MIN_BYTES_MILD,
    spread_small_input,
)

TWO_32 = float(1 << 32)


def hash_fraction(
    key_cols: list[Column | str], salt: str = "", family: str = "xxhash64"
) -> Column:
    """Uniform [0, 1) as a pure function of (salt, key columns).

    Different salts give independent samples from the same keys — the
    standard way to carve train/eval/test splits that never overlap."""
    cols = [F.col(c) if isinstance(c, str) else c for c in key_cols]
    if family == "xxhash64":
        # pmod maps the signed 64-bit hash into [0, 2^32)
        return F.pmod(F.xxhash64(F.lit(salt), *cols), F.lit(1 << 32)).cast(
            "double"
        ) / F.lit(TWO_32)
    if family == "md5":
        h = F.md5(F.concat_ws("|", F.lit(salt), *cols).cast("binary"))
        return F.conv(F.substring(h, 1, 8), 16, 10).cast("double") / F.lit(TWO_32)
    raise ValueError(f"unknown hash family: {family}")


def hash_sample(
    df: DataFrame,
    rate: float,
    key_cols: list[str],
    salt: str = "",
    family: str = "xxhash64",
) -> DataFrame:
    """Keep rows whose key-hash fraction < ``rate``."""
    return df.where(hash_fraction(key_cols, salt=salt, family=family) < F.lit(rate))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float,
    key_cols: list[str],
    salt: str = "",
    family: str = "xxhash64",
) -> DataFrame:
    """Per-stratum rates (e.g. downsample web crawl, keep all books).

    The rate lookup is a literal CASE chain — no join, no broadcast; with
    thousands of strata use a broadcast-joined rate table instead, the
    membership predicate is identical."""
    rate = F.lit(default_rate)
    for k, v in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == k, F.lit(v)).otherwise(rate)
    return df.where(hash_fraction(key_cols, salt=salt, family=family) < rate)


def mix_rates(
    counts: dict[str, int], weights: dict[str, float]
) -> dict[str, float]:
    """Per-stratum keep rates that hit a target domain mixture exactly.

    Given observed stratum sizes ``counts`` and RELATIVE target weights
    ``weights`` (any positive scale — only ratios matter), return the
    keep-rate per stratum that yields the LARGEST possible output whose
    expected composition matches the target mix without upsampling: the
    bottleneck stratum (min n/w) is kept in full, every other stratum is
    downsampled to match. This is the standard water-filling solution used
    to hit domain mixtures (web/books/code/...) in pretraining pipelines.

    Rates are plain IEEE doubles computed as ``(T * w) / n`` with
    ``T = min(n / w)`` — the exact expression shape the DuckDB oracle
    replays, so membership decisions are bit-identical across engines.
    """
    missing = [s for s in weights if counts.get(s, 0) <= 0]
    if missing:
        raise ValueError(
            f"strata in target mix but absent from data: {sorted(missing)}"
        )
    bad = [s for s, w in weights.items() if w <= 0]
    if bad:
        raise ValueError(f"non-positive target weights: {sorted(bad)}")
    t = min(counts[s] / weights[s] for s in weights)
    return {s: (t * weights[s]) / counts[s] for s in weights}


def resample_to_mix(
    df: DataFrame,
    strata_col: str,
    weights: dict[str, float],
    key_cols: list[str],
    salt: str = "",
    family: str = "xxhash64",
) -> DataFrame:
    """Deterministically resample ``df`` to a target domain mixture.

    Strata not named in ``weights`` are dropped (weight 0). Two Spark jobs:
    a per-stratum count (tiny aggregate — one row per stratum, collected to
    the driver exactly like MLlib's ``sampleByKeyExact``), then a pure
    row-local hash filter with the literal per-stratum rate CASE chain —
    no join, no extra shuffle, and parquet predicate pushdown on the
    stratum column still applies. Membership is a pure function of
    (salt, key), so the resample is reproducible and resumable across
    runs and cluster sizes.
    """
    counts = {
        r[0]: r[1]
        for r in df.groupBy(strata_col).count().collect()
        if r[0] in weights
    }
    rates = mix_rates(counts, weights)
    in_mix = F.col(strata_col).isin(*rates.keys())
    rate = F.lit(0.0)
    for s, v in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == s, F.lit(v)).otherwise(rate)
    return df.where(
        in_mix & (hash_fraction(key_cols, salt=salt, family=family) < rate)
    )


def dsir_weights(
    df: DataFrame,
    target_pred: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 4096,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling" — public): features
    are hashed word uni+bigrams in ``n_buckets`` buckets; two add-1
    bag-of-words models are fit over the TARGET slice (rows matching
    ``target_pred``) and the RAW corpus; a document's weight is the sum
    over its feature occurrences of ``ln(p_target(f) / p_raw(f))``.
    Select with ``ORDER BY dsir_weight DESC, doc_id LIMIT k`` for the
    deterministic (no-Gumbel) resampling mode.

    Hash-robust float discipline: ``ln`` is NOT bit-identical across
    libm builds (measured 1-2 ulp Spark-vs-DuckDB), so each per-bucket
    log-ratio quantizes to DECIMAL(18,6) nats BEFORE the exact per-doc
    sum — order-free, and the 1-ulp engine skew only matters if a ratio
    lands within an ulp of the 5e-7 grid boundary (P ~ 1e-6 over 4096
    buckets, deterministic and covered by the gate). The ratio itself is
    pure IEEE multiply/divide on exact counts in a fixed order.

    Plan shape (the 100-TB story): features derive map-side (split +
    zip_with — no per-doc shuffle); bucket stats are ONE hash
    aggregation whose output is at most ``n_buckets`` rows — feature
    hashing makes the "model" a broadcastable dimension, so the corpus
    re-scores via a BROADCAST join (the corpus never shuffles for
    scoring); the only wide exchange is the per-doc weight aggregation.

    Returns ``(id_col, n_feats, dsir_weight)``.
    """
    from kafka_delta_ingest_spark.operators.text import normalize_text

    # spread before the uni+bigram feature explode (r6 §1): ~2|words|×
    # amplification otherwise single-sourced on a one-split scan
    arr = spread_small_input(df, id_col, MIN_BYTES_MILD).select(
        F.col(id_col),
        target_pred.alias("_t"),
        F.split(normalize_text(F.col(text_col)), " ").alias("_w"),
    )
    uni = arr.select("*", F.explode("_w").alias("_f"))
    bi = arr.select(
        "*",
        F.explode(
            F.expr(
                "zip_with(slice(_w, 1, size(_w) - 1), slice(_w, 2, size(_w) - 1),"
                " (x, y) -> concat(x, ' ', y))"
            )
        ).alias("_f"),
    )
    occ = uni.unionByName(bi).select(F.col(id_col), "_t", "_f")
    if hash_family == "md5":
        h = F.conv(F.substring(F.md5(F.col("_f").cast("binary")), 1, 8), 16, 10)
    else:
        h = F.pmod(F.xxhash64("_f"), F.lit(1 << 32))
    feat = occ.select(
        F.col(id_col), "_t", (h.cast("long") % F.lit(n_buckets)).alias("_b")
    )
    stats = feat.groupBy("_b").agg(
        F.count(F.lit(1)).alias("_c_raw"),
        F.sum(F.when(F.col("_t"), 1).otherwise(0)).cast("long").alias("_c_t"),
    )
    tot = stats.agg(
        F.sum("_c_raw").cast("long").alias("_r"),
        F.sum("_c_t").cast("long").alias("_tt"),
    )
    b = float(n_buckets)
    ratio = (
        (F.col("_c_t") + F.lit(1)).cast("double")
        * (F.col("_r").cast("double") + F.lit(b))
    ) / (
        (F.col("_c_raw") + F.lit(1)).cast("double")
        * (F.col("_tt").cast("double") + F.lit(b))
    )
    lrs = (
        stats.join(F.broadcast(tot))
        .select("_b", F.log(ratio).cast("decimal(18,6)").alias("_lr"))
    )
    return (
        feat.join(F.broadcast(lrs), "_b")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_feats"),
            F.sum("_lr").alias("_s"),
        )
        .select(
            F.col(id_col),
            F.col("n_feats"),
            F.col("_s").cast("double").alias("dsir_weight"),
        )
    )


def sample_exact_k(
    df: DataFrame,
    k: int,
    key_cols: list[str],
    by: str | None = None,
    salt: str = "",
    family: str = "xxhash64",
) -> DataFrame:
    """Deterministic exact-count sampling without replacement: the ``k``
    rows with the smallest key-hash (uniform, so a uniform simple random
    sample — but reproducible across runs, partitionings, and retries,
    unlike reservoir sampling). Rate-based ``hash_sample`` gives a
    binomial count; audits, eval-set carving, and per-source quotas need
    EXACTLY k.

    ``by=None``: global top-k by hash — Spark compiles ``orderBy(h)
    .limit(k)`` to TakeOrderedAndProject (per-partition heap of k, then a
    driver merge of partition heads: no global sort, no single-task
    window; k rows of driver memory is the only ceiling).

    ``by=<col>``: exactly k per group, via a ``row_number`` window hash-
    partitioned on the group key — ONE shuffle, each group's heap local
    to its task. This is ``domain_cap`` with a uniform hash as the rank
    key.

    Ties are impossible in practice (the hash is effectively unique per
    key), but the ordering appends the key columns so the result is
    total-ordered and engine-independent even on collisions."""
    if k < 0:
        raise ValueError(f"k must be non-negative, got {k}")
    h = shard_hash_long(key_cols, salt=salt, family=family)
    order = [h.asc()] + [F.col(c).asc() for c in key_cols]
    if by is None:
        return df.orderBy(*order).limit(int(k))
    w = Window.partitionBy(by).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= F.lit(int(k)))
        .drop("_rn")
    )


def shard_hash_long(
    key_cols: list[Column | str], salt: str = "", family: str = "xxhash64"
) -> Column:
    """Deterministic long hash of (salt, key columns) — the primitive
    behind shard assignment and shuffle order. xxhash64 = one JVM hash
    (production); md5 = first 8 hex chars parsed to a non-negative
    32-bit long (the DuckDB oracle replays it nibble-by-nibble)."""
    cols = [F.col(c) if isinstance(c, str) else c for c in key_cols]
    if family == "xxhash64":
        return F.xxhash64(F.lit(salt), *cols)
    if family == "md5":
        h = F.md5(F.concat_ws("|", F.lit(salt), *cols).cast("binary"))
        return F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
    raise ValueError(f"unknown hash family: {family}")


def shuffle_shards(
    df: DataFrame,
    key_cols: list[str],
    n_shards: int,
    salt: str = "",
    family: str = "xxhash64",
    pos_col: str = "pos",
    shard_col: str = "shard",
) -> DataFrame:
    """Deterministic global shuffle + shard assignment — the export step
    that turns a curated corpus into training shards whose read order is
    a pseudo-random permutation of the documents.

    Training loaders need (a) source/time ordering destroyed so
    minibatches are near-IID, and (b) a fixed shard count with
    near-equal sizes. Both must be REPRODUCIBLE: the same corpus +
    salt must yield the same permutation on any cluster size, any
    partitioning, any retry (``df.orderBy(rand())`` gives none of
    that). Shard = key-hash mod ``n_shards``; within-shard position =
    rank of an independent salted hash (ties broken by key), so the
    permutation is a pure function of (salt, keys).

    Plan shape at 100 TB: ONE hash shuffle on ``shard`` — exactly the
    shuffle the sharded write needs anyway — and a within-partition
    sort (the window per shard); uniform hashing bounds shard skew at
    O(sqrt(N/n_shards)). Writing is
    ``out.repartition(n_shards, shard_col).sortWithinPartitions(pos_col)``
    then ``partitionBy(shard_col)`` — file order IS the permutation.
    """
    from pyspark.sql.window import Window

    ties = [F.col(c) for c in key_cols]
    out = (
        df.withColumn(
            shard_col,
            F.pmod(
                shard_hash_long(key_cols, salt=salt + "|s", family=family),
                F.lit(n_shards),
            ).cast("int"),
        )
        .withColumn("_ord", shard_hash_long(key_cols, salt=salt + "|o", family=family))
    )
    w = Window.partitionBy(shard_col).orderBy(F.col("_ord"), *ties)
    return out.withColumn(pos_col, F.row_number().over(w) - 1).drop("_ord")


def domain_cap(
    df: DataFrame,
    group_col: str,
    cap: int,
    key_cols: list[str],
    caps: dict[str, int] | None = None,
    salt: str = "",
    family: str = "xxhash64",
    prefilter_counts: dict[str, int] | None = None,
    prefilter_margin: float = 4.0,
) -> DataFrame:
    """Keep at most ``cap`` rows per ``group_col`` value (RefinedWeb-style
    per-domain caps: no single site/domain may dominate the corpus).

    Selection is deterministic: within each group, rows are ranked by
    their key-hash fraction (uniform, reproducible — the same doc survives
    across runs and cluster sizes) with the key columns as tie-break, and
    ranks above the cap are dropped. ``caps`` overrides the default cap
    per group (literal CASE chain, same shape as stratified_sample).

    Scale: the exact form is ONE hash shuffle on ``group_col`` + a window
    row_number — a hot domain lands in one task. ``prefilter_counts``
    (per-group totals from a tiny count agg) enables the production
    two-phase plan: rows are pre-filtered to hash fraction <
    ``margin * cap / n_group`` BEFORE the shuffle, bounding the window
    input to ~margin*cap rows per group (O(domains*cap), not O(N)).
    With margin 4 the probability of under-selecting a capped group is
    Chernoff-negligible (< exp(-cap)); groups already under their cap are
    never pre-filtered. Exact mode (default) is what the oracle replays.
    """
    frac = hash_fraction(key_cols, salt=salt, family=family)
    cap_expr = F.lit(int(cap))
    for k, v in sorted((caps or {}).items()):
        cap_expr = F.when(F.col(group_col) == k, F.lit(int(v))).otherwise(cap_expr)
    if prefilter_counts:
        bound = F.lit(1.0)
        for k, n in sorted(prefilter_counts.items()):
            g_cap = (caps or {}).get(k, cap)
            if n > g_cap:
                bound = F.when(
                    F.col(group_col) == k,
                    F.lit(min(1.0, prefilter_margin * g_cap / n)),
                ).otherwise(bound)
        df = df.where(frac < bound)
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        frac.asc(), *[F.col(c).asc() for c in key_cols]
    )
    return (
        df.withColumn("_dc_rank", F.row_number().over(w))
        .where(F.col("_dc_rank") <= cap_expr)
        .drop("_dc_rank")
    )


def leakage_safe_split(
    docs: DataFrame,
    pairs: DataFrame,
    rate: float,
    id_col: str = "doc_id",
    pair_a: str = "id_a",
    pair_b: str = "id_b",
    salt: str = "split",
    family: str = "xxhash64",
) -> DataFrame:
    """Held-out split that near-duplicate GROUPS never straddle.

    The classic leakage failure of doc-hash splits: a near-duplicate of
    a held-out document hashes independently and lands in train, so the
    eval set is contaminated by construction. Here membership is a hash
    of the document's GROUP representative — the connected-component min
    id from ``near_dup_groups`` over the verified near-dup pairs;
    singleton docs represent themselves — so an entire duplicate cluster
    moves as one unit. Deterministic (same salt ⇒ same split on any
    cluster), one broadcast-scale join (the group table is pairs-sized,
    tiny next to the corpus at web scale).

    Returns the docs columns + ``split_key`` (the representative, as a
    string) + ``in_holdout`` boolean (fraction < rate)."""
    from kafka_delta_ingest_spark.operators.dedup import near_dup_groups

    groups = near_dup_groups(pairs, pair_a, pair_b).select(
        F.col("doc_id").alias(id_col), F.col("group_id")
    )
    out = docs.join(groups, id_col, "left").withColumn(
        "split_key",
        F.coalesce(F.col("group_id").cast("string"),
                   F.col(id_col).cast("string")),
    ).drop("group_id")
    return out.withColumn(
        "in_holdout",
        hash_fraction([F.col("split_key")], salt=salt, family=family)
        < F.lit(float(rate)),
    )

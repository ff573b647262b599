"""Deduplication operators for training-data curation.

All hot paths are built-in Spark SQL expressions (JVM, codegen). The core
primitive is **explode-first shingling**: normalize once per document,
generate one row per n-gram, and hash per row. Round 1 built gram *arrays*
inside higher-order-function lambdas, which re-evaluated the normalization
regex (and the whole gram array, for winnowing) per lambda element because
Catalyst does not hoist common subexpressions across lambda boundaries —
O(n²·regex) per row. The explode-first plan is linear by construction: the
normalized text flows through the generate as a real attribute, so
`regexp_replace` runs once per doc and `substring`+hash once per gram.

Scale notes
-----------
- MinHash-LSH: candidate generation is the band-bucket self-join — the
  standard shuffle-on-(band, hash) plan; each bucket is tiny by
  construction so the join never explodes. Exact-Jaccard verification runs
  only on candidates. Signature/shingle frames are persisted because the
  self-join and verify stages each consume them twice.
- SimHash: signatures are one aggregation; near-dup candidates come from
  4×16-bit chunk buckets (Hamming ≤ 3 within 64 bits guarantees one equal
  chunk by pigeonhole).
- Winnowing (Schleimer/Wilkerson/Aiken 2003): explode gram hashes to rows,
  take `min` over a `rowsBetween(0, window-1)` frame — one shuffle, linear
  work, versus round 1's per-window `array_min(slice(...))` re-evaluation.
- ``hash_family="md5"`` switches every hash to md5 hex strings, which DuckDB
  computes identically — that variant is byte-for-byte replayable in ANSI
  SQL and backs the driver's oracle check. The default ``xxhash64`` family
  is the fast JVM path for production/bench.
"""

from __future__ import annotations

import logging

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from kafka_delta_ingest_spark.operators.spread import (
    MIN_BYTES_MILD,
    spread_small_input,
)
from kafka_delta_ingest_spark.operators.text import normalize_text

log = logging.getLogger(__name__)


def _finalize(result: DataFrame, *cached: DataFrame) -> DataFrame:
    """Materialize ``result`` (eager localCheckpoint — truncates lineage to
    the small pair/group list), then release the gram/signature-scale
    caches. Without this, every operator call in a long-lived session
    leaves persisted shingle frames behind until executor storage evicts
    or OOMs (round-2 ADVICE). The checkpointed result is executor-resident
    and request-sized; its blocks are GC'd with the DataFrame."""
    out = result.localCheckpoint(eager=True)
    for df in cached:
        df.unpersist()
    return out


def _gram_hash(gram: Column, hash_family: str) -> Column:
    """Hash one gram string: 64-bit JVM xxhash64 (fast path) or md5 hex
    (oracle path — identical output in DuckDB's ``md5(varchar)``)."""
    if hash_family == "md5":
        return F.md5(gram.cast("binary"))
    return F.xxhash64(gram)


# MinHash permutation families (built inline in minhash_signatures as SQL
# text): xxhash64(key, i) is an i.i.d.-per-i 64-bit family, all JVM long
# ops. The md5 family orders by hex substrings (a valid total order DuckDB
# reproduces exactly) and amortizes digests: one md5 of ``key || ':' ||
# i//4`` yields FOUR independent 32-bit permutations as 8-hex-char slices
# — 16 digests per gram instead of 64 (measured ~3× cheaper; 32-bit values
# are plenty for a min over ~10²-10³ shingles).


def char_gram_rows(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """One row per character-n-gram OCCURRENCE: (id_col, _pos, _h).

    ``_pos`` is the 0-based gram position (used by winnowing); ``_h`` the
    gram hash. Not distinct — min-aggregates don't care, and set consumers
    dedupe via ``collect_set``/``distinct`` where semantics demand it.

    The input is spread to session parallelism BEFORE the explode when it
    arrives narrow (operators/spread.py): the ~|text|× row amplification
    otherwise runs on however few splits the source scan produced.
    """
    df = spread_small_input(df, id_col)
    norm = df.select(F.col(id_col), normalize_text(F.col(text_col)).alias("_norm"))
    idx = F.sequence(F.lit(1), F.greatest(F.length("_norm") - F.lit(n - 1), F.lit(1)))
    return norm.select(
        F.col(id_col), F.col("_norm"), F.posexplode(idx).alias("_pos", "_i")
    ).select(
        F.col(id_col),
        F.col("_pos"),
        _gram_hash(F.substring(F.col("_norm"), F.col("_i"), F.lit(n)), hash_family).alias("_h"),
    )


def word_gram_rows(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """One row per word-n-gram OCCURRENCE: (id_col, _pos, _h)."""
    df = spread_small_input(df, id_col)
    norm = df.select(F.col(id_col), normalize_text(F.col(text_col)).alias("_norm"))
    words = F.split(F.col("_norm"), " ")
    idx = F.sequence(F.lit(1), F.greatest(F.size(words) - F.lit(n - 1), F.lit(1)))
    return norm.select(
        F.col(id_col), words.alias("_w"), F.posexplode(idx).alias("_pos", "_i")
    ).select(
        F.col(id_col),
        F.col("_pos"),
        _gram_hash(
            F.concat_ws(" ", F.slice(F.col("_w"), F.col("_i"), F.lit(n))), hash_family
        ).alias("_h"),
    )


def token_gram_rows(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    n: int = 8,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """One row per token-id ``n``-gram OCCURRENCE: (id_col, _pos, _h).

    The token-array analogue of ``word_gram_rows``: grams are built from
    the tokenized sequences themselves (the representation the model
    actually trains on), each gram keyed by the space-joined decimal ids
    so both hash families — and the DuckDB oracle, which joins on the raw
    gram text — see the identical key. Like the word version, a document
    shorter than ``n`` contributes its full (short) sequence as one gram,
    so short docs are still checkable."""
    df = spread_small_input(df, id_col)
    arr = F.col(tokens_col).cast("array<int>")
    idx = F.sequence(F.lit(1), F.greatest(F.size(arr) - F.lit(n - 1), F.lit(1)))
    return df.select(
        F.col(id_col), arr.alias("_t"), F.posexplode(idx).alias("_pos", "_i")
    ).select(
        F.col(id_col),
        F.col("_pos"),
        _gram_hash(
            F.array_join(
                F.slice(F.col("_t"), F.col("_i"), F.lit(n)).cast(
                    "array<string>"
                ),
                " ",
            ),
            hash_family,
        ).alias("_h"),
    )


def decontaminate_tokens(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    n: int = 8,
    min_overlap: int = 1,
    hash_family: str = "xxhash64",
    materialize: bool = True,
) -> DataFrame:
    """Token-level benchmark decontamination: flag training documents
    sharing any token-id ``n``-gram with an evaluation set. Word-level
    overlap (``decontaminate``) misses contamination that survives
    reformatting but tokenizes identically (and vice versa); pipelines
    that store pre-tokenized sequences — this engine's input shape —
    decontaminate on the ids directly (the 13-gram token checks of
    GPT-3/PaLM-era reports). Same scale shape as ``decontaminate``:
    eval grams distinct'd + broadcast, train gram rows never shuffle,
    one map-side-combined per-doc count.

    Returns one row per TRAINING doc: ``(id_col, n_grams, n_hits,
    contaminated)`` with ``n_grams`` = distinct gram count, ``n_hits`` =
    grams also present anywhere in eval, ``contaminated`` =
    ``n_hits >= min_overlap``."""
    tg = (
        token_gram_rows(train, id_col, tokens_col, n, hash_family)
        .select(F.col(id_col), F.col("_h").alias("_g"))
        .distinct()
    )
    eg = (
        token_gram_rows(eval_df, id_col, tokens_col, n, hash_family)
        .select(F.col("_h").alias("_g"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    out = (
        tg.join(F.broadcast(eg), "_g", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count("_hit").alias("n_hits"),
        )
        .withColumn("contaminated", F.col("n_hits") >= F.lit(min_overlap))
    )
    if not materialize:
        return out
    return _finalize(out)


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    window: int = 8,
    hash_family: str = "xxhash64",
    grams: DataFrame | None = None,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken 2003):
    rolling k-gram hashes, keep the minimum of each ``window`` — the
    standard local-fingerprint scheme for plagiarism/near-dup detection.
    Returns ``(id_col, fps: array<hash>)`` with the sorted distinct set of
    selected minima per document.

    Plan: explode gram hashes to rows, sliding-window ``min`` over a
    ``rowsBetween(0, window-1)`` frame, keep only valid window starts, then
    ``collect_set`` — one shuffle, linear in total grams. (Replaces the
    round-1 Column expression whose per-window ``array_min(slice(grams,...))``
    re-evaluated the entire gram array per window element — measured >15 min
    on 500 docs; this plan does the same 500 docs in seconds.)

    The md5 family fingerprints on the 60-bit hex-prefix LONG, not the
    32-char hex string: the window sort, min buffers, collect_set, and the
    downstream candidate self-join all run on JVM longs (same reasoning as
    minhash_signatures' buffer parse; measured ~40% off the gram+window
    stages at sf0.1). Fixed-width hex orders identically to its numeric
    value, and the DuckDB oracle replays the parse as a nibble sum.

    ``grams``: optionally pass a precomputed (persisted) ``char_gram_rows``
    frame with MATCHING (id_col, text_col, n=k, hash_family) — winnowing,
    MinHash, and SimHash all explode the same gram rows, so a pipeline
    running several of them should shingle the corpus once and share the
    frame instead of paying the normalize+explode pass per operator.
    """
    if grams is None:
        grams = char_gram_rows(df, id_col, text_col, n=k, hash_family=hash_family)
    if hash_family == "md5":
        grams = grams.select(
            F.col(id_col),
            F.col("_pos"),
            F.conv(F.substring("_h", 1, 15), 16, 10).cast("long").alias("_h"),
        )
    frame = (
        Window.partitionBy(id_col).orderBy("_pos").rowsBetween(0, window - 1)
    )
    whole = Window.partitionBy(id_col)
    mins = grams.select(
        F.col(id_col),
        F.col("_pos"),
        F.min("_h").over(frame).alias("_m"),
        F.count(F.lit(1)).over(whole).alias("_n"),
    )
    # valid window starts: pos in [0, n_grams - window]; short docs keep
    # pos 0 only (the frame then simply covers every gram — same semantics
    # as the truncated slice in the original formulation)
    keep = mins.where(F.col("_pos") <= F.greatest(F.col("_n") - F.lit(window), F.lit(0)))
    return keep.groupBy(id_col).agg(F.sort_array(F.collect_set("_m")).alias("fps"))


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
    hash_family: str = "xxhash64",
    grams: DataFrame | None = None,
) -> DataFrame:
    """(id, sig: array<hash>) MinHash signatures. ``grams``: optional
    precomputed ``char_gram_rows`` frame (matching params) — see
    winnow_fingerprints.

    Explode shingles once, then ``num_perm`` min-aggregates in ONE groupBy —
    map-side partial aggregation keeps the shuffle tiny (num_perm values per
    doc regardless of document size). Occurrence rows suffice: min over a
    multiset equals min over its set.

    md5 family: the 16 shared digests are projected as real columns BEFORE
    the aggregation (Spark does not eliminate common subexpressions across
    aggregate functions — inlining md5 inside each ``min`` recomputes every
    digest 4x), and each 8-hex-char slice is parsed to a LONG with ``conv``
    before the min. The parse is not cosmetic: ``min(string)`` has an
    immutable aggregation-buffer type, which disqualifies HashAggregateExec
    and silently degrades the whole stage to SortAggregate — a full sort of
    every gram row per side of the exchange (measured 51 s vs 6.5 s for the
    identical plan with long buffers at sf0.1). Fixed-width lowercase hex
    orders lexicographically exactly as its numeric value, so the minimum
    is the same permutation either way, and DuckDB replays the parse as a
    positional nibble sum."""
    # num_perm-wide expression lists are built as SQL text (one F.expr per
    # aggregate, one for the final array): the Column-API equivalents cost
    # several py4j round-trips per node — measured seconds of DRIVER time
    # per query at num_perm=64 (same finding as similarity._cell_structs)
    ex = grams if grams is not None else char_gram_rows(
        df, id_col, text_col, shingle_n, hash_family
    )
    if hash_family == "md5":
        # NOTE (r6): a "digest per DISTINCT gram + join back" variant was
        # prototyped (sf0.1 vocabulary: 2,041 distinct of 1.47M occurrence
        # rows, so it cuts the md5/conv work ~700×) and REJECTED: Catalyst
        # sizes the gram side from the 5000-row scan — it cannot see the
        # explode amplification — so it BROADCAST the 1.45M exploded gram
        # rows and streamed the 2,041-row digest table (BuildLeft
        # inversion, ~100 MB broadcast, 103 s vs 9 s). And at scale the
        # join shape is wrong anyway: it shuffles every gram OCCURRENCE by
        # gram hash (Zipf-skewed), where this inline form shuffles only
        # num_perm longs per doc after map-side combine.
        n_dig = (num_perm + 3) // 4
        ex = ex.select(
            F.col(id_col),
            *[
                F.expr(f"md5(CAST(concat(_h, ':{g}') AS BINARY))").alias(f"_d{g}")
                for g in range(n_dig)
            ],
        )
        aggs = [
            F.expr(
                f"min(CAST(conv(substring(_d{i // 4}, {(i % 4) * 8 + 1}, 8),"
                f" 16, 10) AS BIGINT))"
            ).alias(f"h{i}")
            for i in range(num_perm)
        ]
    else:
        aggs = [
            F.expr(f"min(xxhash64(_h, {i}))").alias(f"h{i}")
            for i in range(num_perm)
        ]
    sigs = ex.groupBy(id_col).agg(*aggs)
    return sigs.select(
        id_col,
        F.expr("array(" + ",".join(f"h{i}" for i in range(num_perm)) + ")").alias(
            "sig"
        ),
    )


def _band_array(
    bands: int, rows_per_band: int, hash_family: str
) -> Column:
    """array of per-band bucket hashes over the ``sig`` column, as ONE
    F.expr (SQL ``sig[i]`` is 0-based like ``Column.getItem``)."""
    def parts(b: int) -> str:
        return ", ".join(
            f"sig[{b * rows_per_band + r}]" for r in range(rows_per_band)
        )

    if hash_family == "md5":
        els = ", ".join(
            f"md5(CAST(concat_ws('|', '{b}', {parts(b)}) AS BINARY))"
            for b in range(bands)
        )
    else:
        els = ", ".join(f"xxhash64({b}, {parts(b)})" for b in range(bands))
    return F.expr(f"array({els})")


def minhash_near_dups(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    bands: int = 16,
    shingle_n: int = 5,
    jaccard_threshold: float = 0.8,
    hash_family: str = "xxhash64",
    max_docs_per_bucket: int = 200,
    grams: DataFrame | None = None,
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b, jaccard >= threshold).

    ``grams``: optional precomputed ``char_gram_rows`` frame shared with
    sibling operators (caller manages its persistence). When omitted, the
    signature and Jaccard-verify branches each recompute the gram explode
    — deliberately: the explode+hash is cheap and stays inside one
    whole-stage-codegen pipeline per branch, while persisting the ~2
    orders-of-magnitude-larger exploded frame was measured 4-5x SLOWER at
    sf0.1 (cache materialization + storage pressure beat the recompute;
    244 s vs 60 s md5 family, 57 s vs 10 s xxhash64).

    LSH banding for candidates; exact Jaccard on shingle sets verifies.
    The signature and shingle-set frames are persisted: the band self-join
    and the verify join each read them twice, and without a cache Spark
    would recompute the shingling pass per branch. (An eager-
    localCheckpoint variant was A/B'd in r6 and was within noise of
    persist cold — 17.4 vs 19.1 s first-call — while losing both the
    deterministic unpersist in _finalize and CacheManager plan-fragment
    reuse across calls in a long session, so persist stays.)

    ``max_docs_per_bucket`` is the stop-bucket cutoff (the LSH analog of
    ngram_jaccard's posting-list cutoff): a band bucket holding more than
    this many docs is skipped before the self-join. Low-entropy signatures
    (very short docs sharing one popular shingle) otherwise produce
    hash-degenerate buckets whose O(bucket²) candidate pairs almost all
    fail verification — measured 250k candidates → 256 survivors on the
    sf0.1 corpus (max bucket 308 docs), and at web scale one boilerplate
    bucket of 10^6 docs would emit 10^12 doomed pairs. Genuinely-similar
    pairs co-occur in small buckets of other bands, so recall loss is
    confined to pathological cliques — the documented tradeoff every
    production LSH dedup makes."""
    rows_per_band = num_perm // bands
    if grams is None:
        grams = char_gram_rows(df, id_col, text_col, shingle_n, hash_family)
    sigs = minhash_signatures(
        df, id_col, text_col, num_perm, shingle_n, hash_family, grams=grams
    ).persist()
    band_arr = _band_array(bands, rows_per_band, hash_family)
    banded = sigs.select(
        F.col(id_col), F.posexplode(band_arr).alias("_band", "_bhash")
    ).persist()
    small = banded.groupBy("_band", "_bhash").agg(
        F.count(F.lit(1)).alias("_bsz")
    ).where(F.col("_bsz") <= max_docs_per_bucket).select("_band", "_bhash")
    pruned = banded.join(small, ["_band", "_bhash"])
    cand = (
        pruned.alias("l")
        .join(
            pruned.alias("r"),
            (F.col("l._band") == F.col("r._band"))
            & (F.col("l._bhash") == F.col("r._bhash"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b")
        )
        .distinct()
    )
    # explicit width for the verify join: the candidate exchange is a few
    # MB of ids, so AQE's byte-based coalescer folds it to 1-2 tasks, but
    # each verify row does a ~|shingles|-element array_intersect — the
    # stage ran 11.8 s single-task (r6 event-log profile). Width comes
    # from spark.sql.shuffle.partitions, the session's scale knob.
    cand = cand.repartition(
        int(cand.sparkSession.conf.get("spark.sql.shuffle.partitions")),
        "id_a",
    )
    sh = _shingle_sets(grams, id_col, hash_family).persist()
    verified = (
        cand.join(
            sh.select(
                F.col(id_col).alias("id_a"),
                F.col("_shingles").alias("_sa"),
                F.col("_n").alias("_na"),
            ),
            "id_a",
        )
        .join(
            sh.select(
                F.col(id_col).alias("id_b"),
                F.col("_shingles").alias("_sb"),
                F.col("_n").alias("_nb"),
            ),
            "id_b",
        )
        .withColumn("_common", F.size(F.array_intersect("_sa", "_sb")))
        .withColumn(
            "jaccard", F.col("_common") / (F.col("_na") + F.col("_nb") - F.col("_common"))
        )
        .where(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return _finalize(verified, sigs, banded, sh)


def _shingle_sets(grams: DataFrame, id_col: str, hash_family: str) -> DataFrame:
    """(id, _shingles: array<long>, _n) distinct shingle sets with
    precomputed sizes: |union| = na + nb - |common|, so a Jaccard verify
    needs only array_intersect (array_union over two ~300-element arrays
    per pair doubles the set work for a number already in hand).

    md5 family intersects 60-bit prefix LONGS, not 32-char strings — long
    arrays hash/compare several times faster, prefix collisions within a
    document's shingle set are ~n²/2^61, and the DuckDB oracle computes
    the identical prefixes (nibble sum), so parity holds by construction."""
    gram_rows = grams
    if hash_family == "md5":
        gram_rows = gram_rows.select(
            F.col(id_col),
            F.conv(F.substring("_h", 1, 15), 16, 10).cast("long").alias("_h"),
        )
    return (
        gram_rows.groupBy(id_col)
        .agg(F.collect_set("_h").alias("_shingles"))
        .withColumn("_n", F.size("_shingles"))
    )


def minhash_against_index(
    batch: DataFrame,
    index: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    bands: int = 16,
    shingle_n: int = 5,
    jaccard_threshold: float = 0.8,
    hash_family: str = "xxhash64",
    max_docs_per_bucket: int = 200,
) -> DataFrame:
    """Ingest-time near-dup check: MinHash-LSH pairs between a NEW batch
    and an EXISTING corpus (id_a from batch, id_b from index, jaccard >=
    threshold) — the content-level arrival dedup a training-data lake
    runs next to the reference's offset-level buffer dedupe
    (`/root/reference/src/lib.rs:326-524` consume loop; A10 analogue in
    `ingest/buffers.py`).

    Unlike the self-join in minhash_near_dups, the band join is
    batch×index, so candidate work scales with the BATCH's bucket
    collisions, never |index|². The stop-bucket cutoff is evaluated on
    the index side only: a boilerplate bucket already saturated in the
    lake is skipped outright. At 100-TB scale the index's banded table
    and shingle sets are materialized once as bucketed tables (keyed
    (_band, _bhash) and id) and only the batch side — a few thousand
    rows per micro-batch — is recomputed per ingest; this function
    expresses that plan over unmaterialized inputs."""
    rows_per_band = num_perm // bands
    band_arr = _band_array(bands, rows_per_band, hash_family)
    bsigs = minhash_signatures(
        batch, id_col, text_col, num_perm, shingle_n, hash_family
    )
    isigs = minhash_signatures(
        index, id_col, text_col, num_perm, shingle_n, hash_family
    )
    bband = bsigs.select(
        F.col(id_col), F.posexplode(band_arr).alias("_band", "_bhash")
    )
    iband = isigs.select(
        F.col(id_col), F.posexplode(band_arr).alias("_band", "_bhash")
    ).persist()
    small = (
        iband.groupBy("_band", "_bhash")
        .agg(F.count(F.lit(1)).alias("_bsz"))
        .where(F.col("_bsz") <= max_docs_per_bucket)
        .select("_band", "_bhash")
    )
    ipruned = iband.join(small, ["_band", "_bhash"])
    cand = (
        bband.select(F.col(id_col).alias("id_a"), "_band", "_bhash")
        .join(
            ipruned.select(F.col(id_col).alias("id_b"), "_band", "_bhash"),
            ["_band", "_bhash"],
        )
        .select("id_a", "id_b")
        .distinct()
    )
    # explicit verify width — same AQE-coalesce hazard as minhash_near_dups
    cand = cand.repartition(
        int(cand.sparkSession.conf.get("spark.sql.shuffle.partitions")),
        "id_a",
    )
    bsh = _shingle_sets(
        char_gram_rows(batch, id_col, text_col, shingle_n, hash_family),
        id_col,
        hash_family,
    )
    ish = _shingle_sets(
        char_gram_rows(index, id_col, text_col, shingle_n, hash_family),
        id_col,
        hash_family,
    )
    verified = (
        cand.join(
            bsh.select(
                F.col(id_col).alias("id_a"),
                F.col("_shingles").alias("_sa"),
                F.col("_n").alias("_na"),
            ),
            "id_a",
        )
        .join(
            ish.select(
                F.col(id_col).alias("id_b"),
                F.col("_shingles").alias("_sb"),
                F.col("_n").alias("_nb"),
            ),
            "id_b",
        )
        .withColumn("_common", F.size(F.array_intersect("_sa", "_sb")))
        .withColumn(
            "jaccard",
            F.col("_common") / (F.col("_na") + F.col("_nb") - F.col("_common")),
        )
        .where(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return _finalize(verified, iband)


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_docs_per_gram: int = 200,
) -> DataFrame:
    """Exact word-n-gram Jaccard near-dup pairs via an inverted index:
    distinct gram rows → self-join on gram (skipping stop-grams shared by
    more than ``max_docs_per_gram`` docs — the classic posting-list cutoff
    that keeps the join linear at scale) → count common grams → Jaccard.

    Jaccard depends only on gram-set identity, so the DuckDB oracle can
    replay it over raw gram strings while Spark joins on 64-bit hashes."""
    grams = (
        word_gram_rows(df, id_col, text_col, n)
        .select(F.col(id_col), F.col("_h").alias("_g"))
        .distinct()
        .persist()
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
    return _finalize(out, grams)


def simhash_bits(hash_family: str) -> int:
    """Signature width per family: 63 voting bits of xxhash64 (bit 63 is
    left 0 to keep signatures positive), or 60 bits parsed from the first
    15 hex chars of md5 — the widest slice that fits a positive BIGINT in
    both Spark and DuckDB, making the md5 family oracle-replayable."""
    return 60 if hash_family == "md5" else 63


def simhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 5,
    hash_family: str = "xxhash64",
    grams: DataFrame | None = None,
) -> DataFrame:
    """SimHash per doc: distinct shingle hashes (set semantics), sum ±1 per
    bit, one groupBy with one conditional sum per bit (all JVM), reassemble
    the sign bits. The md5 family hashes grams to md5 and votes with the
    60-bit prefix (``conv(hex, 16, 10)``), which DuckDB reproduces exactly
    via a per-nibble positional sum."""
    bits = simhash_bits(hash_family)
    if grams is None:
        grams = char_gram_rows(df, id_col, text_col, shingle_n, hash_family)
    ex = grams.select(id_col, "_h").distinct()
    if hash_family == "md5":
        ex = ex.select(
            id_col,
            F.conv(F.substring("_h", 1, 15), 16, 10).cast("long").alias("_h"),
        )
    # bit-width expression lists as SQL text — one F.expr per aggregate and
    # one for the sign-bit reassembly (Column-API construction cost seconds
    # of driver time at 60-63 bits; see minhash_signatures)
    aggs = [
        F.expr(
            f"sum(CASE WHEN (shiftright(_h, {b}) & 1) = 1 THEN 1 ELSE -1 END)"
        ).alias(f"b{b}")
        for b in range(bits)
    ]
    agg = ex.groupBy(id_col).agg(*aggs)
    sig = F.expr(
        "(" + " + ".join(
            f"(CASE WHEN b{b} > 0 THEN {1 << b}L ELSE 0L END)" for b in range(bits)
        ) + ")"
    )
    return agg.select(F.col(id_col), sig.alias("simhash"))


def simhash_near_dups(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    hash_family: str = "xxhash64",
    max_docs_per_bucket: int = 200,
    grams: DataFrame | None = None,
) -> DataFrame:
    """Candidate pairs with Hamming(simhash) <= max_hamming, bucketed by
    4 equal-width bit chunks (pigeonhole: ≤3 differing bits over 4 chunks
    ⇒ at least one chunk equal). Chunk width follows the signature width:
    16 bits for the 63/64-bit xxhash64 family, 15 for the 60-bit md5
    (oracle) family. ``max_docs_per_bucket`` is the stop-bucket cutoff —
    see minhash_near_dups; a popular 15/16-bit chunk value (boilerplate,
    short docs) otherwise emits O(bucket²) candidates."""
    width = simhash_bits(hash_family) + 1 if hash_family != "md5" else simhash_bits(hash_family)
    cw = width // 4
    mask = (1 << cw) - 1
    sigs = simhash_signatures(
        df, id_col, text_col, hash_family=hash_family, grams=grams
    ).persist()
    chunks = F.array(
        *[
            F.shiftright(F.col("simhash"), c * cw).bitwiseAND(F.lit(mask))
            for c in range(4)
        ]
    )
    chunked = sigs.select(
        F.col(id_col), F.col("simhash"), F.posexplode(chunks).alias("_c", "_v")
    ).persist()
    small = chunked.groupBy("_c", "_v").agg(F.count(F.lit(1)).alias("_bsz")).where(
        F.col("_bsz") <= max_docs_per_bucket
    ).select("_c", "_v")
    b = chunked.join(small, ["_c", "_v"])
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
    out = (
        cand.withColumn("hamming", F.bit_count(F.col("_sa").bitwiseXOR(F.col("_sb"))))
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
    return _finalize(out, sigs, chunked)


def near_dup_groups(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
    driver_edge_threshold: int = 100_000,
) -> DataFrame:
    """Resolve near-duplicate PAIRS into GROUPS: connected components of
    the pair graph, labeled by the minimum member id — the step that turns
    `minhash_near_dups`-style output into "keep one per group" dedup.

    Plan: iterative min-label propagation with POINTER JUMPING. Each round
    (a) takes the min label over direct neighbors (one join + one groupBy)
    and (b) replaces every label by its label's label (self-join) — the
    classic parallel connected-components shortcut that converges in
    O(log n) rounds instead of O(graph diameter) (Shiloach-Vishkin style;
    the same structure as large-star/small-star in the MapReduce CC
    literature). Each round is two shuffles over the EDGE list only — the
    corpus itself never enters the loop, so at web scale the loop runs on
    the (much smaller) near-dup graph. Converged when no label changes
    (one count() action per round, scalar).

    Returns (doc_id, group_id); only documents that appear in at least one
    pair are listed (singletons are trivially their own group).

    Size-adaptive: verified near-dup graphs are usually orders of
    magnitude smaller than the corpus, so when the (deduplicated) edge
    list fits comfortably on the driver (``driver_edge_threshold``), a
    driver-side union-find resolves the components exactly in one pass —
    no iterative jobs at all. The distributed pointer-jumping loop below
    is the path for graphs beyond that (boilerplate-heavy web corpora),
    where the edge list itself is cluster-sized."""
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
        .persist()
    )
    n_edges = edges.count()
    if n_edges <= driver_edge_threshold:
        rows = edges.collect()
        parent: dict = {}

        def find(x):
            root = x
            while parent.setdefault(root, root) != root:
                root = parent[root]
            while parent[x] != root:  # path compression
                parent[x], x = root, parent[x]
            return root

        for r in rows:
            ra, rb = find(r["src"]), find(r["dst"])
            if ra != rb:  # union by min: the smaller id becomes the root
                if rb < ra:
                    ra, rb = rb, ra
                parent[rb] = ra
        out_rows = [(n, find(n)) for n in parent]
        schema = pairs.schema[id_a].dataType
        from pyspark.sql import types as T

        result = pairs.sparkSession.createDataFrame(
            out_rows,
            T.StructType(
                [
                    T.StructField("doc_id", schema, False),
                    T.StructField("group_id", schema, False),
                ]
            ),
        )
        return _finalize(result, edges)
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .persist()
    )
    changed = 0
    for _ in range(max_iter):
        nbr_min = (
            edges.join(
                labels.select(
                    F.col("node").alias("dst"), F.col("label").alias("_dl")
                ),
                "dst",
            )
            .groupBy("src")
            .agg(F.min("_dl").alias("_nl"))
            .select(F.col("src").alias("node"), "_nl")
        )
        # persisted: the pointer-jump self-join below reads it twice —
        # without the cache the neighbor-min join + groupBy re-executes
        # per reference (round-2 verdict)
        stepped = labels.join(nbr_min, "node", "left").select(
            "node", F.least("label", F.coalesce("_nl", "label")).alias("label")
        ).persist()
        # pointer jumping: label <- label(label); every label value is a
        # node id, so it resolves in the same frame
        jumped = (
            stepped.alias("a")
            .join(
                stepped.select(
                    F.col("node").alias("label"), F.col("label").alias("_ll")
                ).alias("b"),
                "label",
            )
            .select("node", F.col("_ll").alias("label"))
            .persist()
        )
        # ONE action per round: this count materializes jumped (caching it
        # for the next round) and computes the convergence delta in the
        # same pass
        changed = (
            jumped.join(labels.withColumnRenamed("label", "_old"), "node")
            .where(F.col("label") != F.col("_old"))
            .count()
        )
        labels.unpersist()
        stepped.unpersist()
        labels = jumped
        if changed == 0:
            break
    if changed != 0:
        log.warning(
            "near_dup_groups: label propagation did not converge in %d "
            "rounds (%d labels still changing) — group ids may be split; "
            "raise max_iter for graphs with diameter > 2^%d",
            max_iter, changed, max_iter,
        )
    result = labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("group_id")
    )
    return _finalize(result, labels, edges)


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_overlap: int = 1,
    hash_family: str = "xxhash64",
    materialize: bool = True,
) -> DataFrame:
    """Benchmark decontamination: flag training documents that share any
    word-``n``-gram with an evaluation/benchmark set (the GPT-3 appendix-C
    / Llama-style n-gram overlap check every serious pretraining pipeline
    runs before training).

    Returns one row per TRAINING doc: ``(id_col, n_grams, n_hits,
    contaminated)`` where ``n_grams`` is the doc's distinct gram count,
    ``n_hits`` how many of those grams occur anywhere in the eval set, and
    ``contaminated`` is ``n_hits >= min_overlap``. Keeping every doc (not
    just the flagged ones) makes the output directly joinable as a filter
    AND auditable as a report.

    Scale shape: the eval set is benchmark-sized (thousands of docs) while
    the train side is the 100-TB corpus, so the eval gram set is distinct'd
    and **broadcast** — the contamination check is then a map-side hash
    join against the exploded train grams with NO shuffle of gram rows;
    the only shuffle is the per-doc count aggregation (partial map-side
    combine, ≤1 row per doc). Grams are joined on 64-bit hashes (xxhash64
    family) so the broadcast table is longs, not strings — same
    gram-set-identity argument as ngram_jaccard_pairs; the DuckDB oracle
    replays raw gram strings.

    ``materialize=False`` returns the lazy plan (no checkpoint) — for plan
    inspection or composition into a larger single-pass job.

    Plan shape: the train gram frame is consumed ONCE — a left broadcast
    join tags each distinct train gram with a hit marker, and a single
    groupBy produces both the gram count and the hit count. No persist, no
    second aggregation, no frame-vs-frame join of per-doc counts.
    """
    tg = (
        word_gram_rows(train, id_col, text_col, n, hash_family)
        .select(F.col(id_col), F.col("_h").alias("_g"))
        .distinct()
    )
    eg = (
        word_gram_rows(eval_df, id_col, text_col, n, hash_family)
        .select(F.col("_h").alias("_g"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    out = (
        tg.join(F.broadcast(eg), "_g", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count("_hit").alias("n_hits"),
        )
        .withColumn("contaminated", F.col("n_hits") >= F.lit(min_overlap))
    )
    if not materialize:
        return out
    return _finalize(out)


def span_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    hash_family: str = "xxhash64",
    materialize: bool = True,
) -> DataFrame:
    """Exact-substring deduplication at word-``k``-gram granularity
    (Lee et al. 2021, "Deduplicating Training Data Makes Language Models
    Better": remove repeated spans from all but one occurrence, keeping
    the corpus' unique content). The suffix-array span finder of the paper
    is replaced by the shuffle-native equivalent: any word-``k``-gram that
    occurs ≥2 times corpus-wide marks its non-winning occurrences for
    removal, so every repeated run of ≥k words loses all copies but one —
    the same guarantee the paper's ≥50-token spans give, at gram
    granularity, with no driver-side index.

    Deterministic winner rule: the occurrence with the smallest
    ``(doc_id, position)`` — encoded as the single long
    ``doc_id * 2^32 + pos`` so the per-gram reduction is a ``min`` over a
    primitive buffer (HashAggregate; a struct min would silently degrade
    to SortAggregate). Valid for doc_id < 2^31 and < 2^32 words per doc.

    Returns one row per document: ``(id_col, text, n_words, n_removed)``
    where ``text`` is the surviving words in original order and
    ``n_words`` counts the normalized input words.

    Plan shape (one corpus pass + bounded joins):
      1. words: posexplode of the normalized split — linear.
      2. gram occurrences: one row per k-gram start, hashed JVM-side.
      3. duplicate grams: groupBy gram hash → ``count ≥ 2`` + min
         occurrence code. ONE shuffle on the hash; partial aggregation
         map-side, so the exchange carries ≤1 row per distinct gram per
         task, not per occurrence.
      4. removal occurrences: occurrences ⋈ duplicate grams on the hash
         (skew-safe: a gram repeated N times corpus-wide produces N rows
         here, which is exactly the duplicated volume being removed).
      5. covered word positions: posexplode of sequence(i, i+k-1) —
         ≤k× the removal rows — then LEFT ANTI join against the word
         rows. No distinct needed: anti join ignores right-side
         multiplicity, saving a shuffle.
      6. reassembly: groupBy doc → sort_array(collect_list(struct(pos,
         word))) (ObjectHashAggregate — collect_list's designed path).

    At 100 TB the duplicate-gram table (step 3 output) is the only
    intermediate larger than the answer, and it shrinks with dedup
    quality; every join key is a 64-bit hash or (doc, pos) long.

    ``hash_family="md5"`` makes grams md5 hex so DuckDB replays the whole
    pipeline byte-for-byte (the driver oracle); xxhash64 is the fast path.
    """
    code = (F.col(id_col).cast("long") * F.lit(4294967296).cast("long")
            + F.col("_i").cast("long"))

    # spread first (r6 §1 — this operator explodes words AND hashed
    # k-gram occurrences straight off the scan; it builds its own grams,
    # so the phase-1 gram-builder spread never covered it). FLOORED: at
    # one md5 per gram its single-task cost is mild — A/B'd 3v3 at
    # sf0.1: spread-always cost +0.9 s there (the join/reassembly
    # machinery dominates) while the floor keeps the 16.6 -> 11.8 s win
    # at the 10× dir.
    df = spread_small_input(df, id_col, MIN_BYTES_MILD)
    norm = df.select(F.col(id_col), normalize_text(F.col(text_col)).alias("_norm"))
    words_arr = F.split(F.col("_norm"), " ")
    base = norm.select(F.col(id_col), words_arr.alias("_w"))

    words = base.select(
        F.col(id_col), F.posexplode(F.col("_w")).alias("_p0", "word")
    ).select(F.col(id_col), (F.col("_p0") + 1).alias("_i"), "word")

    occ_idx = F.sequence(F.lit(1), F.greatest(F.size("_w") - F.lit(k - 1), F.lit(1)))
    occ = base.select(
        F.col(id_col), F.col("_w"), F.explode(occ_idx).alias("_i")
    ).select(
        F.col(id_col),
        F.col("_i"),
        _gram_hash(
            F.concat_ws(" ", F.slice(F.col("_w"), F.col("_i"), F.lit(k))), hash_family
        ).alias("_h"),
        code.alias("_code"),
    )

    dup = (
        occ.groupBy("_h")
        .agg(F.count(F.lit(1)).alias("_cnt"), F.min("_code").alias("_win"))
        .filter(F.col("_cnt") >= 2)
        .select("_h", "_win")
    )

    removals = (
        occ.join(dup, "_h")
        .filter(F.col("_code") != F.col("_win"))
        .select(F.col(id_col), F.col("_i"))
    )

    covered = removals.select(
        F.col(id_col),
        F.explode(F.sequence(F.col("_i"), F.col("_i") + F.lit(k - 1))).alias("_i"),
    )

    kept = words.join(covered, [id_col, "_i"], "left_anti")

    totals = words.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_words"))

    rebuilt = (
        kept.groupBy(id_col)
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.sort_array(F.collect_list(F.struct("_i", "word"))),
                    lambda s: s["word"],
                ),
            ).alias("text"),
            F.count(F.lit(1)).alias("_n_kept"),
        )
    )

    out = (
        totals.join(rebuilt, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("text"), F.lit("")).alias("text"),
            F.col("n_words").cast("long").alias("n_words"),
            (F.col("n_words") - F.coalesce(F.col("_n_kept"), F.lit(0)))
            .cast("long").alias("n_removed"),
        )
    )
    if not materialize:
        return out
    return _finalize(out)


def near_dup_group_sizes(
    pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b"
) -> DataFrame:
    """Duplicate-cluster census: (group_size, n_groups) over the
    connected components of the near-dup pair graph — the first
    diagnostic every dedup run reports (a fat tail of huge clusters
    means boilerplate/templates; many 2-clusters means true near-dups).
    Runs on the groups table (pairs-sized), never the corpus."""
    g = near_dup_groups(pairs, id_a, id_b)
    return (
        g.groupBy("group_id")
        .agg(F.count("*").alias("group_size"))
        .groupBy("group_size")
        .agg(F.count("*").alias("n_groups"))
        .orderBy("group_size")
    )

"""Sequence packing: assign documents to fixed-size training context
windows (the concat-and-chunk step every LLM pretraining pipeline runs
between curation and the data loader).

Semantics — deterministic and partitioning-invariant: documents are
virtually concatenated in ascending ``order_col`` order into one token
stream, and the stream is cut into consecutive windows of ``budget``
tokens. Each document's placement is pure arithmetic on its starting
offset in the stream:

    start_off  = sum of weights of all documents ordered before it
    seq_id     = start_off // budget
    seq_offset = start_off %  budget
    n_seqs     = number of windows the document touches

The only nontrivial part at scale is the prefix sum. A naive
``Window.orderBy(order_col)`` with no partition key collapses the corpus
into ONE task — correct at test scale, dead at 100 TB. This operator uses
the classic two-phase distributed scan instead (same shape as Spark's own
``zipWithIndex``):

  1. ``repartitionByRange(order_col)`` — ascending key ranges land in
     ascending partition ids, so partition id order == stream order.
  2. One tiny job aggregates a per-partition weight total (≤ one row per
     partition, collected to the driver — KBs at any scale).
  3. Each partition's global offset is the exclusive prefix over those
     totals, joined back as a broadcast map; within a partition the
     cumsum is an ordinary ordered window (bounded by partition size).

The result is bit-identical to the single-window answer for any
partition-boundary placement (the range sampler's choices cancel out of
the arithmetic), which the tests assert and the DuckDB oracle — a plain
global window cumsum — verifies end-to-end.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from kafka_delta_ingest_spark.operators.spread import (
    MIN_BYTES_MILD,
    spread_small_input,
)


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    weight_col: str = "n_tok",
    budget: int = 2048,
    order_col: str | None = None,
    materialize: bool = True,
) -> DataFrame:
    """Pack documents into ``budget``-token context windows.

    ``order_col`` (default ``id_col``) must be unique — it defines the
    deterministic stream order. Returns one row per document:
    ``(id_col, n_tok, start_off, seq_id, seq_offset, n_seqs)``, all
    counts BIGINT. A zero-weight document occupies no tokens but is
    assigned the window its offset falls in (``n_seqs = 1``).

    ``materialize=False`` skips the range-cache persist and the result
    checkpoint and returns the lazy plan — for plan inspection ONLY: an
    unpersisted plan lets the range exchange re-sample boundaries between
    the offsets job and the final job, so production callers must keep
    the default.
    """
    order_col = order_col or id_col
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")

    base = df.select(
        F.col(id_col),
        F.col(order_col).alias("_ord"),
        F.col(weight_col).cast("long").alias("n_tok"),
    ).repartitionByRange(F.col("_ord"))

    # Persisted because BOTH jobs (the totals collect and the final
    # cumsum) must see the SAME range boundaries: the range partitioner
    # samples its input, and letting the exchange re-execute would let the
    # boundaries drift between the offset computation and the rows they
    # offset. One cache, two reads — released after the result is pinned.
    with_pid = base.withColumn("_pid", F.spark_partition_id())
    if materialize:
        with_pid = with_pid.persist()

    # Phase 1: per-partition totals — one row per partition, driver-sized.
    totals = (
        with_pid.groupBy("_pid")
        .agg(F.sum("n_tok").alias("_tot"))
        .collect()
    )
    by_pid = {r["_pid"]: r["_tot"] or 0 for r in totals}
    running = 0
    offsets = {}
    for pid in sorted(by_pid):
        offsets[pid] = running
        running += by_pid[pid]

    # Phase 2: broadcast the offset map as a literal CASE expression (a
    # join would shuffle; the map has one entry per partition).
    off_expr = F.lit(0).cast("long")
    if offsets:
        mapping = F.create_map(
            *[F.lit(x) for kv in offsets.items() for x in (kv[0], kv[1])]
        )
        off_expr = F.coalesce(mapping[F.col("_pid")], F.lit(0)).cast("long")

    w = (
        Window.partitionBy("_pid")
        .orderBy("_ord")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = (F.coalesce(F.sum("n_tok").over(w), F.lit(0)) + off_expr).alias(
        "start_off"
    )

    out = with_pid.select(F.col(id_col), F.col("n_tok"), start)
    # Integer division via SQL DIV: `/` on longs is double division in
    # Spark, which silently loses precision past 2^53 — real at 100 TB of
    # tokens. DIV stays in long arithmetic end-to-end.
    b = int(budget)
    result = out.select(
        F.col(id_col),
        F.col("n_tok"),
        F.col("start_off").cast("long").alias("start_off"),
        F.expr(f"CAST(start_off DIV {b} AS BIGINT)").alias("seq_id"),
        F.expr(f"CAST(start_off % {b} AS BIGINT)").alias("seq_offset"),
        F.expr(
            f"CAST(CASE WHEN n_tok <= 0 THEN 1 ELSE"
            f" (start_off + n_tok - 1) DIV {b} - start_off DIV {b} + 1"
            f" END AS BIGINT)"
        ).alias("n_seqs"),
    )
    if not materialize:
        return result
    # Pin the (row-per-doc, all-longs) result, then drop the corpus-sized
    # range cache — same materialize-then-release shape as the dedup
    # operators (round-2 ADVICE: no persisted frame may outlive its call).
    pinned = result.localCheckpoint(eager=True)
    with_pid.unpersist()
    return pinned


def pack_docs_bfd(
    df: DataFrame,
    id_col: str = "doc_id",
    weight_col: str = "n_tok",
    budget: int = 2048,
    docs_per_bucket: int = 100_000,
    salt: str = "",
) -> DataFrame:
    """Document-preserving packing: whole documents into ``budget``-token
    bins, best-fit-decreasing, never splitting a document (the
    "fewer truncations" packing of Ding et al. 2024 — truncation-free
    batches beat concat-and-chunk on downstream quality; public paper).

    Global BFD is inherently sequential, so the scale design is the
    standard sharded approximation: documents hash deterministically into
    buckets of ~``docs_per_bucket`` (bucket count derived from a cheap
    count, rounded to a power of two so the assignment is stable), and
    BFD runs independently inside each bucket via ``applyInPandas``. For
    large buckets the per-bucket waste concentrates (law of large
    numbers), so padding overhead approaches global BFD while the work is
    embarrassingly parallel — ONE hash shuffle on the bucket key, no
    global sort, no driver state. The in-bucket loop is O(docs·log bins)
    Python over plain numpy arrays inside one Arrow batch — control
    logic, not per-row data compute (the token arrays never enter the
    UDF; only (id, weight) pairs do).

    Documents wider than ``budget`` get a bin of their own (flagged
    ``oversize=true``) — the caller decides whether to truncate or drop.

    Returns one row per document:
    ``(id_col, weight_col, bucket, bin_id, bin_fill, oversize)`` where
    ``bin_id`` is unique within the bucket and ``bin_fill`` is the bin's
    total tokens (== its padding complement). Deterministic for a given
    (corpus, budget, salt): bucket assignment is a key hash and the
    in-bucket order is (weight desc, id) with best-fit ties broken by
    lowest bin id.
    """
    import math

    import pandas as pd

    n_docs = df.count()
    n_buckets = max(1, 2 ** int(math.ceil(math.log2(max(1, n_docs / docs_per_bucket)))))
    slim = df.select(
        F.col(id_col),
        F.col(weight_col).cast("long").alias(weight_col),
        F.pmod(F.xxhash64(F.lit(salt), F.col(id_col)), F.lit(n_buckets))
        .cast("int")
        .alias("bucket"),
    )

    out_schema = (
        f"{id_col} string, {weight_col} long, bucket int, "
        "bin_id long, bin_fill long, oversize boolean"
    )

    def _bfd(pdf: pd.DataFrame) -> pd.DataFrame:
        import bisect

        pdf = pdf.sort_values(
            [weight_col, id_col], ascending=[False, True], kind="mergesort"
        )
        # sorted list of (residual, bin_id) for best-fit lookup: the
        # tightest bin that still fits; ties -> lowest bin id
        residuals: list[tuple[int, int]] = []
        fills: list[int] = []
        bin_of = []
        for w in pdf[weight_col].to_numpy():
            w = int(w)
            if w >= budget:
                bin_of.append(len(fills))
                fills.append(w)
                continue
            i = bisect.bisect_left(residuals, (w, -1))
            if i < len(residuals):
                _, b = residuals.pop(i)
                fills[b] += w
                if fills[b] < budget:
                    bisect.insort(residuals, (budget - fills[b], b))
                bin_of.append(b)
            else:
                b = len(fills)
                fills.append(w)
                if w < budget:
                    bisect.insort(residuals, (budget - w, b))
                bin_of.append(b)
        res = pd.DataFrame(
            {
                id_col: pdf[id_col].astype(str).to_numpy(),
                weight_col: pdf[weight_col].to_numpy(),
                "bucket": pdf["bucket"].to_numpy(),
                "bin_id": pd.array(bin_of, dtype="int64"),
            }
        )
        res["bin_fill"] = res["bin_id"].map(lambda b: fills[int(b)]).astype("int64")
        res["oversize"] = res[weight_col] > budget
        return res

    return slim.groupBy("bucket").applyInPandas(_bfd, schema=out_schema)


def fim_transform(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    rate: float = 0.5,
    pre_tok: int = -1,
    suf_tok: int = -2,
    mid_tok: int = -3,
    salt: str = "",
    family: str = "xxhash64",
) -> DataFrame:
    """Fill-in-the-middle transformation of token sequences (Bavarian et
    al. 2022, "Efficient Training of Language Models to Fill in the
    Middle" — public paper): a deterministic ``rate`` fraction of
    documents is rewritten from ``prefix ⧺ middle ⧺ suffix`` into PSM
    order ``[PRE] prefix [SUF] suffix [MID] middle`` so the model learns
    infilling; the rest pass through causal (paper's recommended joint
    training). Sentinel ids default to negatives so they can never
    collide with a real vocab id.

    Everything is a pure row-local Catalyst expression — selection and
    the two cut points are key-hash-deterministic (same doc ⇒ same
    transform across runs, partitionings, and retries, like every
    sampling decision in this engine), the rewrite is slice+concat on
    the token array. No shuffle, no UDF; at 10^12 sequences this is a
    map-only pass fused into whatever scan feeds it.

    Returns ``(id_col, fim: boolean, tokens, n_tok)`` where ``tokens``
    is the (possibly rewritten) array and ``n_tok`` its length
    (original + 3 sentinels when rewritten).
    """
    from kafka_delta_ingest_spark.operators.sampling import (
        hash_fraction,
        shard_hash_long,
    )

    arr = F.col(tokens_col).cast("array<int>")
    n = F.size(arr)
    sel = hash_fraction([id_col], salt=salt + "|fim-sel", family=family) < F.lit(
        float(rate)
    )
    # two independent cut points in [0, n] (inclusive); lo <= hi
    c1 = F.pmod(
        shard_hash_long([id_col], salt=salt + "|fim-c1", family=family),
        (n + 1).cast("long"),
    )
    c2 = F.pmod(
        shard_hash_long([id_col], salt=salt + "|fim-c2", family=family),
        (n + 1).cast("long"),
    )
    lo = F.least(c1, c2).cast("int")
    hi = F.greatest(c1, c2).cast("int")

    def _tok(v: int) -> Column:
        return F.array(F.lit(int(v)).cast("int"))

    rewritten = F.concat(
        _tok(pre_tok),
        F.slice(arr, 1, lo),
        _tok(suf_tok),
        F.slice(arr, hi + 1, n - hi),
        _tok(mid_tok),
        F.slice(arr, lo + 1, hi - lo),
    )
    fim = sel & (n > 0)
    out_tokens = F.when(fim, rewritten).otherwise(arr)
    return df.select(
        F.col(id_col),
        fim.alias("fim"),
        out_tokens.alias("tokens"),
        F.size(out_tokens).cast("long").alias("n_tok"),
    )


def length_buckets(
    df,
    length_col: str,
    buckets: list[int],
):
    """Sequence-length bucketing for padded batching: assign each row the
    smallest bucket >= its length (rows longer than the largest bucket are
    truncated into it), and account exactly for the padding/truncation the
    batch builder will pay.

    Returns one row per non-empty bucket:
      bucket, n_docs, sum_tokens (raw), kept_tokens (after truncation),
      capacity_tokens (bucket * n_docs), padding_tokens (capacity - kept),
      trunc_tokens (raw - kept).

    The assignment is a literal CASE chain over the sorted bucket sizes —
    row-local, codegen'd, no UDF — followed by ONE partial-aggregated
    groupBy over at most len(buckets) keys: the full-corpus census costs
    one map-side-combined shuffle of |buckets| rows per task regardless of
    corpus size. All arithmetic stays in longs (exact on every engine).
    """
    from pyspark.sql import functions as F

    sizes = sorted(set(int(b) for b in buckets))
    if not sizes:
        raise ValueError("buckets must be non-empty")
    ln = F.col(length_col).cast("long")
    b = F.lit(sizes[-1]).cast("long")
    for s in reversed(sizes[:-1]):
        b = F.when(ln <= s, F.lit(s).cast("long")).otherwise(b)
    kept = F.least(ln, b)
    return (
        df.select(
            b.alias("bucket"), ln.alias("_len"), kept.alias("_kept")
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("_len").alias("sum_tokens"),
            F.sum("_kept").alias("kept_tokens"),
        )
        .withColumn("capacity_tokens", F.col("bucket") * F.col("n_docs"))
        .withColumn(
            "padding_tokens", F.col("capacity_tokens") - F.col("kept_tokens")
        )
        .withColumn("trunc_tokens", F.col("sum_tokens") - F.col("kept_tokens"))
    )


def pack_tokens(
    df: DataFrame,
    budget: int = 2048,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    eos: int | None = None,
    pad: int | None = None,
    order_col: str | None = None,
    materialize: bool = True,
    doc_mask: bool = False,
) -> DataFrame:
    """Materialize the packed training windows themselves — the export
    step after ``pack_sequences``'s offset plan: the corpus concatenates
    in deterministic ``order_col`` order (optionally with an ``eos``
    token after each document) and chunks into ``budget``-token windows.

    Scale shape: each document splits ROW-LOCALLY into its
    window-aligned segments (a doc spanning k windows emits k slices via
    sequence+transform — pure Catalyst, no per-token explode), then ONE
    hash shuffle groups segments by window id and an array_sort-by-offset
    flatten reassembles each window in order. Token arrays cross the
    wire exactly once. ``pad`` right-pads the final short window.

    ``doc_mask=True`` additionally emits a ``doc_mask`` column: one int
    per token giving the 0-based index (in stream order) of the document
    that token came from *within its window* — the boundary vector packed
    block-diagonal attention / per-document loss masking needs at train
    time (cross-document attention is masked by ``mask[i] != mask[j]``).
    Padding positions get ``-1``. The mask is derived from the same
    sorted segment array the token flatten uses (the segment's rank in
    the window IS the document index), so it costs no extra shuffle.

    Returns ``(seq_id, tokens[, doc_mask], n_tok, n_docs)`` where
    ``n_tok`` is the unpadded token count and ``n_docs`` the number of
    documents contributing to the window."""
    b = int(budget)
    if b <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    arr = F.col(tokens_col).cast("array<int>")
    if eos is not None:
        arr = F.concat(arr, F.array(F.lit(int(eos)).cast("int")))
    # spread first (r6 §1): the token arrays (built by upstream per-row
    # projections, e.g. the derived-corpus generator) otherwise
    # materialize single-task below the id-join exchange
    work = spread_small_input(df, id_col, MIN_BYTES_MILD).select(
        F.col(id_col), arr.alias("_arr")
    ).withColumn("_w", F.size("_arr").cast("long"))
    offs = pack_sequences(
        work, id_col=id_col, weight_col="_w", budget=b,
        order_col=order_col, materialize=materialize,
    ).select(id_col, "start_off")
    j = work.where(F.col("_w") > 0).join(offs, id_col)

    # segment expansion: one row per (doc, window) pair the doc touches;
    # each segment carries its in-window offset so reassembly is a sort
    segs = (
        j.select(
            F.col("start_off"),
            F.col("_w"),
            F.col("_arr"),
            F.explode(
                F.sequence(
                    F.expr(f"start_off DIV {b}"),
                    F.expr(f"(start_off + _w - 1) DIV {b}"),
                )
            ).alias("_k"),
        )
        .select(
            F.col("_k").alias("seq_id"),
            F.greatest(
                F.col("_k") * b - F.col("start_off"), F.lit(0).cast("long")
            ).alias("_loc"),
            (
                F.least(F.col("_w"), (F.col("_k") + 1) * b - F.col("start_off"))
                - F.greatest(
                    F.col("_k") * b - F.col("start_off"),
                    F.lit(0).cast("long"),
                )
            ).alias("_take"),
            (
                F.greatest(
                    F.col("start_off") - F.col("_k") * b, F.lit(0).cast("long")
                )
            ).cast("int").alias("off"),
            "_arr",
        )
        .select(
            "seq_id",
            "off",
            F.slice(
                F.col("_arr"), (F.col("_loc") + 1).cast("int"),
                F.col("_take").cast("int"),
            ).alias("seg"),
        )
    )
    sorted_segs = F.array_sort(F.collect_list(F.struct("off", "seg")))
    aggs = [
        F.flatten(F.transform(sorted_segs, lambda s: s["seg"])).alias("tokens"),
        F.count("*").alias("n_docs"),
    ]
    if doc_mask:
        # segment rank in the window == within-window document index:
        # offsets are distinct per (window, doc), and the same array_sort
        # that orders the token flatten orders the mask flatten.
        aggs.insert(
            1,
            F.flatten(
                F.transform(
                    sorted_segs,
                    lambda s, i: F.array_repeat(
                        i.cast("int"), F.size(s["seg"])
                    ),
                )
            ).alias("doc_mask"),
        )
    wins = segs.groupBy("seq_id").agg(*aggs)
    cols = ["seq_id", "tokens"] + (["doc_mask"] if doc_mask else [])
    out = wins.select(
        *cols,
        F.size("tokens").cast("long").alias("n_tok"),
        "n_docs",
    )
    if pad is not None:
        out = out.withColumn(
            "tokens",
            F.when(
                F.size("tokens") < b,
                F.concat(
                    "tokens",
                    F.array_repeat(
                        F.lit(int(pad)).cast("int"), b - F.size("tokens")
                    ),
                ),
            ).otherwise(F.col("tokens")),
        )
        if doc_mask:
            out = out.withColumn(
                "doc_mask",
                F.when(
                    F.size("doc_mask") < b,
                    F.concat(
                        "doc_mask",
                        F.array_repeat(
                            F.lit(-1).cast("int"), b - F.size("doc_mask")
                        ),
                    ),
                ).otherwise(F.col("doc_mask")),
            )
    return out.select(*cols, "n_tok", "n_docs")

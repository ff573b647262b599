"""End-to-end training-data curation: the pipeline a pretraining team runs
between "raw crawl landed" and "tokens shipped to the trainer", composed
from this repo's operators:

    exact dedup → near-dup groups → benchmark decontamination
    → quality filter → domain-mix resampling → curated table

Design for 100 TB
-----------------
The pipeline is **flag-based, not filter-chained**: every drop criterion is
computed as a boolean column on ONE annotated corpus frame, and the funnel
report comes from ONE aggregation over those flags. A naive chain of
``.filter().count()`` stages would re-scan the corpus once per stage; here
the corpus is read once, the per-doc joins (near-dup groups, contamination
hits) are id-keyed joins against frames that are orders of magnitude
smaller than the corpus, and the only corpus-wide shuffles are the exact-
dedup fingerprint partition and the id-keyed flag joins. The near-dup pair
graph and eval gram set never scale with the corpus (pairs ≪ docs; eval
sets are benchmark-sized and broadcast).

Drop-reason precedence in the funnel report (each doc counted once, by the
first reason that applies): exact_dup → near_dup → contaminated →
low_quality → sampled_out. The flags themselves are independent booleans so
auditors can cross-tabulate.

Semantics note: the "keeper" of a near-dup group is its min-id member. A
keeper can itself be flagged (e.g. contaminated), in which case the group
contributes nothing — the same behavior as running the stages as
sequential filters, and the conservative choice for decontamination.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_delta_ingest_spark.operators.dedup import (
    decontaminate,
    near_dup_groups,
    ngram_jaccard_pairs,
)
from kafka_delta_ingest_spark.operators.sampling import hash_fraction, mix_rates
from kafka_delta_ingest_spark.operators.text import doc_fingerprint, quality_score


def curate_flags(
    docs: DataFrame,
    eval_df: DataFrame | None = None,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram_n: int = 3,
    jaccard_threshold: float = 0.8,
    decontam_n: int = 5,
    decontam_min_overlap: int = 1,
    quality_min: float = 0.0,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Annotate every document with independent boolean drop flags:
    ``exact_dup``, ``near_dup``, ``contaminated``, ``low_quality``.

    - exact_dup: non-min id within a normalized-content fingerprint group.
    - near_dup: non-min member of a connected component of the exact
      word-``ngram_n``-gram Jaccard graph at ``jaccard_threshold``
      (``ngram_jaccard_pairs`` + ``near_dup_groups``).
    - contaminated: shares ≥ ``decontam_min_overlap`` word-``decontam_n``-
      grams with ``eval_df`` (False everywhere when no eval set is given).
    - low_quality: ``quality_score(text) < quality_min``.
    """
    w = Window.partitionBy("_fp").orderBy(F.col(id_col))
    flagged = (
        docs.withColumn("_fp", doc_fingerprint(F.col(text_col)))
        .withColumn("exact_dup", F.row_number().over(w) > 1)
        .drop("_fp")
    )

    pairs = ngram_jaccard_pairs(
        docs, id_col, text_col, n=ngram_n, threshold=jaccard_threshold
    )
    groups = near_dup_groups(pairs)
    flagged = flagged.join(
        groups.select(
            F.col("doc_id").alias(id_col),
            (F.col("group_id") != F.col("doc_id")).alias("_nd"),
        ),
        id_col,
        "left",
    ).withColumn("near_dup", F.coalesce(F.col("_nd"), F.lit(False))).drop("_nd")

    if eval_df is not None:
        contam = decontaminate(
            docs,
            eval_df,
            id_col,
            text_col,
            n=decontam_n,
            min_overlap=decontam_min_overlap,
            hash_family=hash_family,
        )
        flagged = flagged.join(
            contam.select(id_col, "contaminated"), id_col, "left"
        ).withColumn(
            "contaminated", F.coalesce(F.col("contaminated"), F.lit(False))
        )
    else:
        flagged = flagged.withColumn("contaminated", F.lit(False))

    return flagged.withColumn(
        "low_quality", quality_score(F.col(text_col)) < F.lit(quality_min)
    )


_REASONS = ["exact_dup", "near_dup", "contaminated", "low_quality"]


def curate(
    docs: DataFrame,
    eval_df: DataFrame | None = None,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    strata_col: str = "source",
    mix_weights: dict[str, float] | None = None,
    salt: str = "curate",
    hash_family: str = "xxhash64",
    **flag_kwargs,
) -> tuple[DataFrame, dict]:
    """Run the full curation pipeline. Returns ``(kept, report)``.

    ``kept`` is the curated corpus (original columns; flags dropped).
    ``report`` is the funnel: input size, drops per reason (precedence
    order — each doc counted once), and per-stratum kept sizes.

    When ``mix_weights`` is given, survivors are resampled to that target
    domain mixture with water-filling rates computed over the SURVIVOR
    stratum counts (the mix you ship, not the mix you crawled) and
    deterministic key-hash membership.
    """
    flags = curate_flags(
        docs, eval_df, id_col=id_col, text_col=text_col,
        hash_family=hash_family, **flag_kwargs,
    ).persist()

    # one pass: total + precedence-ordered drop counts
    prior = F.lit(False)
    aggs = [F.count(F.lit(1)).alias("n_input")]
    for r in _REASONS:
        aggs.append(
            F.sum(F.when(F.col(r) & ~prior, 1).otherwise(0)).alias(f"n_{r}")
        )
        prior = prior | F.col(r)
    funnel = flags.agg(*aggs).collect()[0].asDict()

    clean = flags.where(~F.col(_REASONS[0]))
    for r in _REASONS[1:]:
        clean = clean.where(~F.col(r))

    if mix_weights:
        counts = {
            r[0]: r[1]
            for r in clean.groupBy(strata_col).count().collect()
            if r[0] in mix_weights
        }
        rates = mix_rates(counts, mix_weights)
        rate = F.lit(0.0)
        for s, v in sorted(rates.items()):
            rate = F.when(F.col(strata_col) == s, F.lit(v)).otherwise(rate)
        kept = clean.where(
            F.col(strata_col).isin(*rates.keys())
            & (hash_fraction([id_col], salt=salt, family=hash_family) < rate)
        )
        funnel["mix_rates"] = rates
    else:
        kept = clean

    kept = kept.drop(*_REASONS)
    per_stratum = {
        r[0]: r[1] for r in kept.groupBy(strata_col).count().collect()
    }
    funnel["n_kept"] = sum(per_stratum.values())
    funnel["n_sampled_out"] = (
        funnel["n_input"]
        - sum(funnel[f"n_{r}"] for r in _REASONS)
        - funnel["n_kept"]
    )
    funnel["kept_per_stratum"] = per_stratum
    # `kept` still reads through the persisted flag frame; the caller must
    # call release(kept) once it has materialized (written/collected) the
    # result, or the cache outlives the pipeline (round-2 ADVICE class).
    kept._kdi_cached_flags = flags  # type: ignore[attr-defined]
    return kept, funnel


def release(kept: DataFrame) -> None:
    """Unpersist the flag frame backing a ``curate()`` result. Call after
    materializing ``kept``; reading ``kept`` afterwards recomputes."""
    cached = getattr(kept, "_kdi_cached_flags", None)
    if cached is not None:
        cached.unpersist()


def curate_to_table(
    spark: SparkSession,
    docs: DataFrame,
    table_root: str,
    eval_df: DataFrame | None = None,
    *,
    partition_cols: list[str] | None = None,
    strata_col: str = "source",
    **kwargs,
) -> dict:
    """Curate and commit the kept corpus to a table at ``table_root``
    (created if absent, partitioned by ``partition_cols`` or the stratum
    column), via the same staged-write + atomic-commit path as ingest.
    Returns the funnel report with the committed version added."""
    from kafka_delta_ingest_spark.table.format import Table
    from kafka_delta_ingest_spark.table.writer import write_dataframe

    kept, report = curate(docs, eval_df, strata_col=strata_col, **kwargs)
    parts = partition_cols if partition_cols is not None else [strata_col]
    try:
        table = Table(table_root)
        table.snapshot()
    except Exception:
        table = Table.create(table_root, kept.schema, parts)
    report["table_version"] = write_dataframe(
        spark, table, kept, operation="curate"
    )
    release(kept)
    return report

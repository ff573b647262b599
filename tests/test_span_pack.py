"""span_dedup (exact-substring dedup) and pack_sequences (concat-and-chunk
sequence packing) unit tests — hand-computable corpora, both hash families,
and the partitioning-invariance claim pack_sequences' design rests on."""

import pytest
from pyspark.sql import functions as F

WORDS = "w0 w1 w2 w3 w4 w5 w6 w7".split()


def _doc(*idx):
    return " ".join(WORDS[i % len(WORDS)] for i in idx)


@pytest.fixture(scope="module")
def docs(spark):
    # doc 1 and doc 2 share an identical 8-word run; doc 3 is unique;
    # doc 4 repeats doc 1's run a second time INSIDE itself.
    shared = _doc(0, 1, 2, 3, 4, 5, 6, 7)
    rows = [
        (1, shared + " " + _doc(1, 3, 5, 7)),
        (2, _doc(2, 4, 6) + " " + shared),
        (3, _doc(7, 6, 5, 4, 3, 2, 1, 0, 7, 6)),
        (4, shared + " " + shared),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.mark.parametrize("family", ["xxhash64", "md5"])
def test_span_dedup_removes_all_but_first_occurrence(spark, docs, family):
    from kafka_delta_ingest_spark.operators.dedup import span_dedup

    out = {
        r["doc_id"]: r
        for r in span_dedup(docs, k=8, hash_family=family).collect()
    }
    # winner is the smallest (doc_id, pos): doc 1's copy survives intact
    assert out[1]["n_removed"] == 0
    assert out[1]["text"].startswith("w0 w1 w2 w3 w4 w5 w6 w7")
    # doc 2 loses exactly the 8 shared words, keeps its prefix
    assert out[2]["n_removed"] == 8
    assert out[2]["text"] == _doc(2, 4, 6)
    # unique doc untouched
    assert out[3]["n_removed"] == 0
    # doc 4: both of its copies are non-winning occurrences; the two
    # 8-gram matches plus the bridging grams cover the whole doc
    assert out[4]["n_removed"] == out[4]["n_words"]
    assert out[4]["text"] == ""


def test_span_dedup_families_agree(spark, docs):
    from kafka_delta_ingest_spark.operators.dedup import span_dedup

    a = {
        (r["doc_id"], r["text"], r["n_words"], r["n_removed"])
        for r in span_dedup(docs, k=8, hash_family="xxhash64").collect()
    }
    b = {
        (r["doc_id"], r["text"], r["n_words"], r["n_removed"])
        for r in span_dedup(docs, k=8, hash_family="md5").collect()
    }
    assert a == b


def test_span_dedup_short_doc_exact_dup(spark):
    from kafka_delta_ingest_spark.operators.dedup import span_dedup

    # docs shorter than k dedupe as whole-text grams: the later copy empties
    df = spark.createDataFrame(
        [(10, "a b c"), (11, "a b c"), (12, "a b d")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in span_dedup(df, k=8).collect()}
    assert out[10]["n_removed"] == 0
    assert out[11]["text"] == "" and out[11]["n_removed"] == 3
    assert out[12]["n_removed"] == 0


def test_pack_sequences_arithmetic(spark):
    from kafka_delta_ingest_spark.operators.packing import pack_sequences

    df = spark.createDataFrame(
        [(1, 100), (2, 30), (3, 0), (4, 250), (5, 10)],
        "doc_id long, n_tok long",
    )
    out = {r["doc_id"]: r for r in pack_sequences(df, budget=128).collect()}
    assert (out[1]["start_off"], out[1]["seq_id"], out[1]["n_seqs"]) == (0, 0, 1)
    # doc 2 starts at 100, ends at 129 -> spans windows 0 and 1
    assert (out[2]["start_off"], out[2]["seq_id"], out[2]["seq_offset"],
            out[2]["n_seqs"]) == (100, 0, 100, 2)
    # zero-weight doc occupies no tokens but is placed (window 1 @ 130)
    assert (out[3]["start_off"], out[3]["seq_id"], out[3]["n_seqs"]) == (130, 1, 1)
    # doc 4 occupies [130, 379]: windows 1 ([128,255]) and 2 ([256,383])
    assert (out[4]["start_off"], out[4]["seq_id"], out[4]["n_seqs"]) == (130, 1, 2)
    assert (out[5]["start_off"], out[5]["seq_id"]) == (380, 2)


def test_pack_sequences_partitioning_invariant(spark):
    """The two-phase distributed prefix sum must equal the naive global
    window cumsum for ANY incoming partitioning — the operator's whole
    correctness claim."""
    from pyspark.sql import Window
    from kafka_delta_ingest_spark.operators.packing import pack_sequences

    base = (
        spark.range(0, 1000)
        .select(
            F.col("id").alias("doc_id"),
            (F.xxhash64("id") % 97 + 97).alias("n_tok"),
        )
    )
    naive_w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    naive = {
        r["doc_id"]: r["start_off"]
        for r in base.select(
            "doc_id",
            F.coalesce(F.sum("n_tok").over(naive_w), F.lit(0)).alias("start_off"),
        ).collect()
    }
    for arrangement in (
        base,
        base.repartition(7, "n_tok"),
        base.orderBy(F.desc("doc_id")).coalesce(1),
    ):
        got = {
            r["doc_id"]: r["start_off"]
            for r in pack_sequences(arrangement, budget=256).collect()
        }
        assert got == naive


def test_pack_sequences_rejects_bad_budget(spark):
    from kafka_delta_ingest_spark.operators.packing import pack_sequences

    df = spark.createDataFrame([(1, 5)], "doc_id long, n_tok long")
    with pytest.raises(ValueError):
        pack_sequences(df, budget=0)


def test_unigram_freq_scores_hand_computed(spark):
    from kafka_delta_ingest_spark.operators.text import unigram_freq_scores

    df = spark.createDataFrame(
        [(1, "a a b"), (2, "b c")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in unigram_freq_scores(df).collect()}
    # corpus: a:2 b:2 c:1, total 5 -> a,b = 400000 ppm, c = 200000 ppm
    assert out[1]["n_words"] == 3
    assert out[1]["freq_ppm_sum"] == pytest.approx(1_200_000.0)
    assert out[1]["avg_freq_ppm"] == pytest.approx(400_000.0)
    assert out[2]["n_words"] == 2
    assert out[2]["freq_ppm_sum"] == pytest.approx(600_000.0)
    assert out[2]["avg_freq_ppm"] == pytest.approx(300_000.0)


def test_bigram_lm_scores_hand_computed(spark):
    from kafka_delta_ingest_spark.operators.text import bigram_lm_scores

    df = spark.createDataFrame(
        [(1, "a a b"), (2, "b c"), (3, "x")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in bigram_lm_scores(df).collect()}
    # bigrams: doc1 (a,a),(a,b); doc2 (b,c). c1: a=2, b=1.
    # unigrams: a:2 b:2 c:1 x:1, total 6.
    # doc1: both bigrams = .7*(1/2) + .3*(2/6) = .45 -> 450000 ppm
    # doc2: .7*(1/1) + .3*(1/6) = .75 -> 750000 ppm
    assert out[1]["n_bigrams"] == 2
    assert out[1]["avg_bigram_ppm"] == pytest.approx(450_000.0)
    assert out[2]["n_bigrams"] == 1
    assert out[2]["avg_bigram_ppm"] == pytest.approx(750_000.0)
    assert 3 not in out  # single-word doc has no bigrams


def test_ccnet_buckets_tertiles(spark):
    from kafka_delta_ingest_spark.operators.text import ccnet_buckets

    # 9 docs in one lang with strictly ordered fluency: doc i repeats a
    # common bigram i times, so avg score increases with doc_id
    rows = [
        (i, " ".join(["the cat"] * i) + f" unique{i} tail{i}", "en")
        for i in range(1, 10)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r["doc_id"]: r["bucket"] for r in ccnet_buckets(df).collect()}
    assert len(out) == 9
    scores = {
        r["doc_id"]: r["avg_bigram_ppm"] for r in ccnet_buckets(df).collect()
    }
    ranked = sorted(scores, key=lambda d: scores[d])
    # cutoffs are the scores AT ascending ranks ceil(9/3)=3 and
    # ceil(18/3)=6, and comparisons are >=, so the boundary docs land in
    # the upper bucket: ranks 1-2 tail, 3-5 middle, 6-9 head
    assert [out[d] for d in ranked] == (
        ["tail"] * 2 + ["middle"] * 3 + ["head"] * 4
    )


def test_pack_docs_bfd_invariants(spark):
    from kafka_delta_ingest_spark.operators.packing import pack_docs_bfd

    rows = [(str(i), (i * 37) % 700 + 1) for i in range(3000)]
    df = spark.createDataFrame(rows, "doc_id string, n_tok long")
    out = pack_docs_bfd(df, budget=512, docs_per_bucket=1000, salt="t").collect()
    assert len(out) == 3000
    assert len({r["doc_id"] for r in out}) == 3000
    # bin accounting: fills consistent, nothing over budget except
    # single-doc oversize bins
    from collections import defaultdict

    bins = defaultdict(list)
    for r in out:
        bins[(r["bucket"], r["bin_id"])].append(r)
    for members in bins.values():
        fill = sum(m["n_tok"] for m in members)
        assert all(m["bin_fill"] == fill for m in members)
        if fill > 512:
            assert len(members) == 1 and members[0]["oversize"]
    # oversize flag matches weight
    for r in out:
        assert r["oversize"] == (r["n_tok"] > 512)
    # packing quality: within 30% of the token lower bound (BFD is
    # 11/9 OPT + O(1) per bucket)
    packable = sum(min(r["n_tok"], 512) for r in out)
    lower = -(-sum(r["n_tok"] for r in out if r["n_tok"] <= 512) // 512)
    n_regular_bins = len(
        {k for k, v in bins.items() if not v[0]["oversize"]}
    )
    assert n_regular_bins <= 1.3 * lower + len({r["bucket"] for r in out})
    # deterministic under repartitioning
    again = pack_docs_bfd(
        df.repartition(17), budget=512, docs_per_bucket=1000, salt="t"
    ).collect()
    assert {tuple(r) for r in again} == {tuple(r) for r in out}


def test_pack_tokens_materializes_exact_windows(spark):
    from kafka_delta_ingest_spark.datagen import tokens_df
    from kafka_delta_ingest_spark.operators.packing import pack_tokens

    rows = [
        ("a", [1, 2, 3]),
        ("b", [4, 5, 6, 7, 8]),
        ("c", [9]),
        ("d", []),          # empty doc contributes nothing
        ("e", [10, 11]),
    ]
    df = spark.createDataFrame(rows, "doc_id string, tokens array<int>")
    # stream in doc_id order: 1 2 3 | 4 5 6 7 8 | 9 | 10 11  (11 tokens)
    got = {r["seq_id"]: (r["tokens"], r["n_tok"], r["n_docs"])
           for r in pack_tokens(df, budget=4).collect()}
    assert got == {
        0: ([1, 2, 3, 4], 4, 2),
        1: ([5, 6, 7, 8], 4, 1),
        # 'd' is empty and (without eos) occupies zero tokens -> it is
        # not a contributing doc; n_docs counts contributors only
        2: ([9, 10, 11], 3, 2),
    }

    # eos: stream 1 2 3 E | 4 5 6 7 | 8 E 9 E | E 10 11 E — an empty doc
    # now occupies its EOS and counts as a contributor
    got2 = {r["seq_id"]: (r["tokens"], r["n_tok"], r["n_docs"])
            for r in pack_tokens(df, budget=4, eos=0).collect()}
    assert got2 == {
        0: ([1, 2, 3, 0], 4, 1),
        1: ([4, 5, 6, 7], 4, 1),
        2: ([8, 0, 9, 0], 4, 2),
        3: ([0, 10, 11, 0], 4, 2),
    }

    # pad: budget 5 leaves a short final window -> right-padded, n_tok
    # stays the pre-pad count
    got3 = {r["seq_id"]: (r["tokens"], r["n_tok"], r["n_docs"])
            for r in pack_tokens(df, budget=5, eos=0, pad=-1).collect()}
    assert got3[3] == ([0, -1, -1, -1, -1], 1, 1)  # trailing EOS + padding

    # global reassembly invariant at a bigger scale: concatenating all
    # windows in seq order equals the concatenated corpus in doc order
    big = tokens_df(spark, 200, max_tok=17)
    wins = pack_tokens(big, budget=64).collect()
    stream = []
    for r in sorted(wins, key=lambda r: r["seq_id"]):
        stream.extend(r["tokens"])
    exp = []
    for r in sorted(big.collect(), key=lambda r: r["doc_id"]):
        exp.extend(r["tokens"])
    assert stream == exp

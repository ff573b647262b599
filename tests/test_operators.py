"""Training-data operators: dedup (exact/minhash/simhash/ngram), similarity
(bruteforce + LSH ANN recall), text analysis, multimodal plumbing."""

import pytest
from pyspark.sql import functions as F

from kafka_delta_ingest_spark.operators.dedup import (
    exact_dedup,
    minhash_near_dups,
    ngram_jaccard_pairs,
    simhash_near_dups,
    simhash_signatures,
)
from kafka_delta_ingest_spark.operators.similarity import (
    ann_bruteforce,
    ann_lsh,
    embedding_near_dups,
)
from kafka_delta_ingest_spark.operators.text import (
    doc_fingerprint,
    lang_id,
    quality_score,
    token_count,
)

BASE = (
    "the quick brown fox jumps over the lazy dog and then runs far away to "
    "the forest where it finds food and shelter for the cold winter nights"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, BASE, "web"),
        (2, BASE, "web"),  # exact dup of 1
        (3, BASE.replace("winter", "summer"), "books"),  # near dup of 1
        (4, "der hund und die katze sind gute freunde und das ist schön", "web"),
        (5, "le chat et le chien sont les meilleurs amis est une belle chose", "web"),
        (6, "completely different text about quantum computing research topics", "code"),
        (7, "   ", "web"),
    ]
    return spark.createDataFrame(rows, "doc_id int, text string, source string")


def test_exact_dedup(spark, docs):
    out = exact_dedup(docs, "doc_id", "text")
    ids = {r["doc_id"] for r in out.collect()}
    assert 1 in ids and 2 not in ids  # dup dropped, min id kept
    assert {3, 4, 5, 6, 7} <= ids


def test_minhash_near_dups(spark, docs):
    pairs = minhash_near_dups(docs, "doc_id", "text", jaccard_threshold=0.6)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (1, 2) in got  # exact dup always found
    assert (1, 3) in got or (2, 3) in got  # near dup found
    assert all(a not in (4, 5, 6) and b not in (4, 5, 6) for a, b in got)


def test_minhash_against_index(spark, docs):
    from kafka_delta_ingest_spark.operators.dedup import minhash_against_index

    # batch = ids {2, 3, 6}: 2 is an exact dup of index doc 1, 3 a near
    # dup of it, 6 is novel. Only batch×index pairs may appear — the
    # batch-internal (2, 3) near-dup relationship is out of scope.
    batch = docs.where(F.col("doc_id").isin(2, 3, 6))
    index = docs.where(~F.col("doc_id").isin(2, 3, 6))
    pairs = minhash_against_index(
        batch, index, "doc_id", "text", jaccard_threshold=0.6
    )
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs.collect()}
    assert got.get((2, 1)) == 1.0          # exact dup of the lake
    assert (3, 1) in got and got[(3, 1)] < 1.0  # near dup of the lake
    assert all(a in (2, 3, 6) and b not in (2, 3, 6) for a, b in got)
    assert all(a != 6 for a, _ in got)     # novel doc passes clean


def test_ngram_jaccard(spark, docs):
    pairs = ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5)
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs.collect()}
    assert got.get((1, 2)) == 1.0
    assert (1, 3) in got and 0.5 <= got[(1, 3)] < 1.0


def test_simhash(spark, docs):
    sigs = {r["doc_id"]: r["simhash"] for r in simhash_signatures(docs).collect()}
    assert sigs[1] == sigs[2]
    assert sigs[1] != sigs[6]
    pairs = simhash_near_dups(docs, max_hamming=8)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (1, 2) in got


def test_simhash_md5_family(spark, docs):
    """The oracle-replayable md5 family: 60-bit signatures in [0, 2^60),
    same exact-dup behavior, and Spark's conv(hex,16,10) prefix matches
    Python's int(hex[:15], 16) (the identity the DuckDB oracle relies on)."""
    sigs = {
        r["doc_id"]: r["simhash"]
        for r in simhash_signatures(docs, hash_family="md5").collect()
    }
    assert sigs[1] == sigs[2] != sigs[6]
    assert all(0 <= s < (1 << 60) for s in sigs.values())
    pairs = simhash_near_dups(docs, max_hamming=8, hash_family="md5")
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (1, 2) in got

    import hashlib

    h = hashlib.md5(b"hello").hexdigest()
    row = (
        spark.range(1)
        .selectExpr(f"cast(conv(substring('{h}', 1, 15), 16, 10) as long) v")
        .first()
    )
    assert row["v"] == int(h[:15], 16)


def test_text_analysis(spark, docs):
    out = docs.select(
        "doc_id",
        token_count("text").alias("ntok"),
        lang_id("text").alias("lang"),
        quality_score("text").alias("q"),
        doc_fingerprint("text").alias("fp"),
    ).collect()
    d = {r["doc_id"]: r for r in out}
    assert d[1]["ntok"] == len(BASE.split())
    assert d[7]["ntok"] == 0
    assert d[1]["lang"] == "en"
    assert d[4]["lang"] == "de"
    assert d[5]["lang"] == "fr"
    assert d[1]["q"] > d[7]["q"]
    assert d[1]["fp"] == d[2]["fp"] != d[3]["fp"]
    assert 0.0 <= d[1]["q"] <= 1.0


def test_bpe_ish_token_count(spark):
    from kafka_delta_ingest_spark.operators.text import token_count_bpe

    df = spark.createDataFrame(
        [("it's 2024, we're testing-BPE!",), ("",), ("   ",)], "text string"
    )
    got = [r[0] for r in df.select(token_count_bpe("text")).collect()]
    # it|'s| 2024|,| we|'re| testing|-|BPE|! -> 10 tokens
    assert got == [10, 0, 0]


def test_winnow_fingerprints(spark):
    from kafka_delta_ingest_spark.operators.dedup import winnow_fingerprints

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog tonight"),
            (2, "the quick brown fox jumps over the lazy dog tonight"),
            (3, "a completely different sentence about marine biology research"),
        ],
        "doc_id int, text string",
    )
    fps = {r["doc_id"]: set(r["fps"]) for r in winnow_fingerprints(
        df, "doc_id", "text").collect()}
    assert fps[1] == fps[2]
    assert len(fps[1] & fps[3]) < len(fps[1]) / 2
    assert len(fps[1]) >= 3


@pytest.fixture(scope="module")
def vectors(spark):
    import numpy as np

    rng = np.random.default_rng(3)
    base = rng.normal(size=(40, 16)).astype("float32")
    rows = [(int(i), [float(x) for x in v]) for i, v in enumerate(base)]
    # 41: near-dup of 0
    rows.append((41, [float(x) for x in (base[0] + rng.normal(scale=1e-3, size=16).astype("float32"))]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_ann_bruteforce_and_lsh_recall(spark, vectors):
    queries = vectors.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    exact = ann_bruteforce(queries, vectors, k=5)
    ex = {(r["q_id"], r["rank"]): r["vec_id"] for r in exact.collect()}
    # self is always rank 1 (cos=1), and 41 is 0's nearest non-self
    assert ex[(0, 1)] in (0, 41) and ex[(0, 2)] in (0, 41)
    assert ex[(1, 1)] == 1
    approx = ann_lsh(queries, vectors, dim=16, k=5, n_planes=6, n_tables=6)
    ap = {}
    for r in approx.collect():
        ap.setdefault(r["q_id"], set()).add(r["vec_id"])
    exact_sets = {}
    for r in exact.collect():
        exact_sets.setdefault(r["q_id"], set()).add(r["vec_id"])
    # recall@5 across 3 queries: at least half of exact neighbors retrieved
    hits = sum(len(ap.get(q, set()) & s) for q, s in exact_sets.items())
    total = sum(len(s) for s in exact_sets.values())
    assert hits / total >= 0.5
    # each query finds itself
    for q in (0, 1, 2):
        assert q in ap.get(q, set())


def test_ivf_topk(spark, vectors):
    from kafka_delta_ingest_spark.operators.similarity import ivf_topk

    queries = vectors.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    # full probe (n_probe == n_centroids) degrades to the exact result
    exact = ann_bruteforce(queries, vectors, k=5)
    full = ivf_topk(queries, vectors, k=5, n_centroids=8, n_probe=8)
    ex = {(r["q_id"], r["rank"]): r["vec_id"] for r in exact.collect()}
    fu = {(r["q_id"], r["rank"]): r["vec_id"] for r in full.collect()}
    assert ex == fu
    # partial probe: each query's own cell is its top-1 probe, so every
    # query still retrieves itself at rank 1 (cos = 1)
    part = ivf_topk(queries, vectors, k=5, n_centroids=8, n_probe=2)
    selfhits = {r["q_id"] for r in part.collect() if r["q_id"] == r["vec_id"] and r["rank"] == 1}
    assert selfhits == {0, 1, 2}


def test_kmeans_centroids_separate_blobs(spark):
    import numpy as np

    from kafka_delta_ingest_spark.operators.similarity import (
        _cell_structs,
        kmeans_centroids,
    )

    # three well-separated direction blobs (cosine k-means ground truth)
    rng = np.random.default_rng(7)
    rows, truth = [], {}
    for b, center_dim in enumerate((0, 5, 10)):
        center = np.zeros(16)
        center[center_dim] = 10.0
        for i in range(30):
            v = center + rng.normal(scale=0.3, size=16)
            vid = b * 100 + i
            rows.append((vid, [float(x) for x in v]))
            truth[vid] = b
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = kmeans_centroids(df, n_centroids=3, iters=4)
    assert len(cents) == 3 and all(len(cv) == 16 for _, cv in cents)
    assigned = df.select(
        "vec_id",
        (-F.array_max(_cell_structs("embedding", cents))["negc"]).alias("cell"),
    ).collect()
    by_blob = {}
    for r in assigned:
        by_blob.setdefault(truth[r["vec_id"]], set()).add(r["cell"])
    # every blob maps unanimously to its own distinct cell
    assert all(len(cells) == 1 for cells in by_blob.values())
    assert len({c for cells in by_blob.values() for c in cells}) == 3


def test_semdedup_prunes_planted_duplicates(spark):
    import numpy as np

    from kafka_delta_ingest_spark.operators.similarity import semdedup

    # two direction blobs; ids 0/1/2 are near-identical copies (cos ≈ 1),
    # id 500 is a copy of 0 living in the same blob — all but the min id
    # of each high-cos star must be pruned, everything else kept
    rng = np.random.default_rng(11)
    rows = []
    base = np.zeros(16)
    base[0] = 10.0
    for vid in (0, 1, 2, 500):
        rows.append((vid, [float(x) for x in base + rng.normal(scale=0.01, size=16)]))
    other = np.zeros(16)
    other[8] = 10.0
    for i in range(20):
        rows.append((100 + i, [float(x) for x in other + rng.normal(scale=2.0, size=16)]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r["kept"] for r in semdedup(
        df, n_centroids=2, iters=3, threshold=0.99
    ).collect()}
    assert len(out) == 24
    assert out[0] is True           # keeper = min id of the duplicate star
    assert out[1] is False and out[2] is False and out[500] is False
    assert all(out[100 + i] for i in range(20))  # scattered blob survives


def test_ivf_index_roundtrip(spark, vectors, tmp_path):
    from kafka_delta_ingest_spark.operators.similarity import (
        ivf_search_index,
        ivf_topk,
        ivf_write_index,
    )

    path = str(tmp_path / "ivfidx")
    ivf_write_index(vectors, path, n_centroids=8)
    queries = vectors.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    got = ivf_search_index(spark, path, queries, k=5, n_probe=2)
    # driver-side probe-cell math must rank cells identically to the JVM
    # expression: the served result equals the unmaterialized-plan result
    want = ivf_topk(queries, vectors, k=5, n_centroids=8, n_probe=2)
    as_set = lambda df: {
        (r["q_id"], r["vec_id"], round(r["cos"], 9), r["rank"]) for r in df.collect()
    }
    assert as_set(got) == as_set(want)
    # the probe is partition PRUNING on the index scan, not a post-filter
    plan = got._jdf.queryExecution().executedPlan().toString()
    pf_lines = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert pf_lines and any("_cell" in l for l in pf_lines), plan


def test_embedding_near_dups(spark, vectors):
    pairs = embedding_near_dups(vectors, dim=16, threshold=0.999)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (0, 41) in got
    assert all(p == (0, 41) for p in got)


def test_multimodal_plumbing(spark):
    from kafka_delta_ingest_spark.operators.multimodal import (
        extract_features,
        fake_decode,
        real_decode,
        synthetic_media_df,
    )

    media = synthetic_media_df(spark, n=30)
    feats = extract_features(media.repartition(4))
    rows = feats.collect()
    assert len(rows) == 30
    assert all(len(r["features"]) == 8 for r in rows)
    assert all(r["n_bytes"] > 0 for r in rows)
    # deterministic across partitionings
    feats2 = {r["media_id"]: r["features"] for r in extract_features(media.repartition(1)).collect()}
    for r in rows:
        assert feats2[r["media_id"]] == r["features"]
    with pytest.raises(NotImplementedError):
        real_decode(b"xx", "image")


def test_multimodal_real_bmp_wav_decode(spark):
    """real_decode on REAL media bytes — the checked-in 90-byte BMP and
    76-byte PCM WAV fixtures decode through the same Arrow-batched
    extract_features path as the fake codec (compressed formats still
    raise: no PIL/soundfile in this container, by design)."""
    import os

    from kafka_delta_ingest_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_bmp,
        decode_wav,
        extract_features,
        real_decode,
    )

    fixtures = os.path.join(os.path.dirname(__file__), "fixtures")
    bmp = open(os.path.join(fixtures, "tiny.bmp"), "rb").read()
    wav = open(os.path.join(fixtures, "tiny.wav"), "rb").read()

    # exact pixel decode: 4x3 RGB, generator formula r=10y+x g=100+x b=200-10y
    px = decode_bmp(bmp)
    assert px.shape == (3, 4, 3)
    for y in range(3):
        for x in range(4):
            assert tuple(px[y, x]) == (10 * y + x, 100 + x, 200 - 10 * y)
    # exact sample decode: 16-step ramp at 8 kHz
    samples, rate = decode_wav(wav)
    assert rate == 8000 and len(samples) == 16
    assert abs(samples[0] - (-8000 / 32768.0)) < 1e-6
    assert abs(samples[15] - (7000 / 32768.0)) < 1e-6

    media = spark.createDataFrame(
        [
            ("bmp-1", "image", bmp, (4, 3, None, None, "image/bmp")),
            ("wav-1", "audio", wav, (None, None, 8000, None, "audio/wav")),
        ],
        MEDIA_SCHEMA,
    )

    def codec(payload, kind, n_features=8):
        import numpy as _np

        arr = real_decode(payload, kind)
        chunks = _np.array_split(arr, n_features)
        return _np.array([float(c.mean()) for c in chunks], dtype=_np.float32)

    rows = {r["media_id"]: r for r in
            extract_features(media.repartition(2), decode=codec).collect()}
    assert rows["bmp-1"]["n_bytes"] == len(bmp)
    assert rows["wav-1"]["n_bytes"] == len(wav)
    # features are real decoded-content statistics, not byte statistics
    flat = px.reshape(-1).astype("float32")
    import numpy as np

    exp0 = float(np.array_split(flat, 8)[0].mean())
    assert abs(rows["bmp-1"]["features"][0] - exp0) < 1e-4
    exp_wav0 = float(np.array_split(samples, 8)[0].mean())
    assert abs(rows["wav-1"]["features"][0] - exp_wav0) < 1e-6


def test_hash_sampling(spark):
    from kafka_delta_ingest_spark.operators.sampling import (
        hash_sample,
        stratified_sample,
    )

    df = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("src"), (F.col("id") % 4).cast("string")).alias("source"),
    )
    for family in ("xxhash64", "md5"):
        half = hash_sample(df, 0.5, ["doc_id"], salt="s1", family=family)
        n = half.count()
        assert 850 < n < 1150  # binomial(2000, .5), generous bounds
        # deterministic: membership survives repartitioning
        ids = {r["doc_id"] for r in half.collect()}
        ids2 = {
            r["doc_id"]
            for r in hash_sample(
                df.repartition(13), 0.5, ["doc_id"], salt="s1", family=family
            ).collect()
        }
        assert ids == ids2
        # nested: rate 0.2 sample is a subset of rate 0.5 (same salt)
        small = {
            r["doc_id"]
            for r in hash_sample(df, 0.2, ["doc_id"], salt="s1", family=family).collect()
        }
        assert small < ids
        # independent salts give a different (overlapping-but-not-equal) draw
        other = {
            r["doc_id"]
            for r in hash_sample(df, 0.5, ["doc_id"], salt="s2", family=family).collect()
        }
        assert other != ids
    strat = stratified_sample(
        df, "source", {"src0": 1.0, "src1": 0.0}, 0.5, ["doc_id"], salt="s1"
    )
    by_src = {r["source"]: r["c"] for r in strat.groupBy("source").agg(F.count("*").alias("c")).collect()}
    assert by_src["src0"] == 500
    assert "src1" not in by_src
    assert 180 < by_src["src2"] < 320


def test_repetition_scores(spark):
    from kafka_delta_ingest_spark.operators.text import repetition_scores

    df = spark.createDataFrame(
        [(1, "a a a b"), (2, "x y z"), (3, "q q q q")],
        "doc_id int, text string",
    )
    got = {r["doc_id"]: r for r in repetition_scores(df).collect()}
    # doc 1: 2-grams (a a, a a, a b) -> 1 dup of 3; 3-grams all distinct
    assert got[1]["n_words"] == 4
    assert abs(got[1]["dup_2gram_frac"] - 1 / 3) < 1e-9
    assert got[1]["dup_3gram_frac"] == 0.0
    assert abs(got[1]["top_word_frac"] - 0.75) < 1e-9
    # doc 2: no repetition at all
    assert got[2]["dup_2gram_frac"] == 0.0
    assert abs(got[2]["top_word_frac"] - 1 / 3) < 1e-9
    # doc 3: fully degenerate -> 2-grams (q q)x3 dup 2/3, 3-grams dup 1/2
    assert abs(got[3]["dup_2gram_frac"] - 2 / 3) < 1e-9
    assert abs(got[3]["dup_3gram_frac"] - 0.5) < 1e-9
    assert got[3]["top_word_frac"] == 1.0


def test_multimodal_resize_and_frame_sample(spark):
    from kafka_delta_ingest_spark.operators.multimodal import (
        resize_images,
        sample_frames,
        synthetic_media_df,
    )

    media = synthetic_media_df(spark, n=30)  # kinds cycle image/audio/video
    resized = resize_images(media.repartition(4), width=8, height=8)
    rows = resized.collect()
    assert len(rows) == 30  # 1-in-1-out, non-images pass through
    for r in rows:
        if r["kind"] == "image":
            assert len(r["payload"]) == 64
            assert (r["meta"]["width"], r["meta"]["height"]) == (8, 8)
        else:
            assert r["meta"] == media.where(
                F.col("media_id") == r["media_id"]
            ).first()["meta"]
    # frame sampling: videos have n_frames=30, every 10th kept -> 3 rows each
    frames = sample_frames(media.repartition(3), every_n=10)
    frows = frames.collect()
    vids = {r["media_id"] for r in media.where(F.col("kind") == "video").collect()}
    assert {r["media_id"] for r in frows} == vids
    assert len(frows) == 3 * len(vids)
    assert {r["frame_idx"] for r in frows} == {0, 10, 20}
    # deterministic across partitionings
    f1 = {(r["media_id"], r["frame_idx"]): bytes(r["payload"]) for r in frows}
    f2 = {
        (r["media_id"], r["frame_idx"]): bytes(r["payload"])
        for r in sample_frames(media.repartition(1), every_n=10).collect()
    }
    assert f1 == f2


def test_near_dup_groups(spark):
    from kafka_delta_ingest_spark.operators.dedup import near_dup_groups

    # two components + a 6-node chain (exercises pointer jumping past
    # direct neighbors) + an isolated pair
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23), (23, 24),
         (24, 25), (40, 41)],
        "id_a int, id_b int",
    )
    want = {
        1: 1, 2: 1, 3: 1,
        10: 10, 11: 10,
        20: 20, 21: 20, 22: 20, 23: 20, 24: 20, 25: 20,
        40: 40, 41: 40,
    }
    # driver union-find path (small graph)
    got = {r["doc_id"]: r["group_id"] for r in near_dup_groups(pairs).collect()}
    assert got == want
    # distributed pointer-jumping path (forced): identical labels
    dist = {
        r["doc_id"]: r["group_id"]
        for r in near_dup_groups(pairs, driver_edge_threshold=0).collect()
    }
    assert dist == want


def test_ivf_search_index_query_guard(spark, vectors, tmp_path):
    """The serving path collects queries to the driver — a corpus-sized
    query frame must be rejected, not silently collected."""
    from kafka_delta_ingest_spark.operators.similarity import (
        ivf_search_index,
        ivf_write_index,
    )

    path = str(tmp_path / "ivfguard")
    ivf_write_index(vectors, path, n_centroids=4)
    queries = vectors.select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    with pytest.raises(ValueError, match="max_queries"):
        ivf_search_index(spark, path, queries, k=3, max_queries=3)
    # at or under the cap it serves normally
    got = ivf_search_index(
        spark, path, queries.limit(2), k=3, max_queries=3
    )
    assert got.count() > 0


def test_dedup_operators_release_caches(spark, docs):
    """Round-2 ADVICE: repeated operator calls in a long-lived session must
    not accumulate persisted gram/signature frames. Only the checkpointed
    (request-sized) result frame may remain cached per call."""
    from kafka_delta_ingest_spark.operators.dedup import (
        minhash_near_dups,
        near_dup_groups,
        ngram_jaccard_pairs,
        simhash_near_dups,
    )

    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    pairs = minhash_near_dups(docs, "doc_id", "text", jaccard_threshold=0.6)
    simhash_near_dups(docs, max_hamming=8)
    ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5)
    near_dup_groups(pairs)
    after = jsc.getPersistentRDDs().size()
    # one localCheckpoint RDD per operator call is the allowed residue
    assert after - before <= 4, f"cached RDDs grew {before} -> {after}"


def test_fast_families_match_md5_pairs(spark, docs):
    """The xxhash64 fast families have no DuckDB oracle; this is their
    correctness anchor: on the same corpus they must emit the same
    near-dup PAIR SETS as the md5 families the driver hash-checks.
    (Signatures differ — the permutations are different hash families —
    but both bound the same Jaccard/Hamming neighborhoods, and the exact
    verify stages decide membership on the true gram sets.)"""
    from kafka_delta_ingest_spark.operators.dedup import (
        minhash_near_dups,
        simhash_near_dups,
    )

    as_pairs = lambda df: {(r["id_a"], r["id_b"]) for r in df.collect()}
    fast_mh = as_pairs(minhash_near_dups(docs, jaccard_threshold=0.5))
    md5_mh = as_pairs(
        minhash_near_dups(docs, jaccard_threshold=0.5, hash_family="md5")
    )
    assert fast_mh == md5_mh and fast_mh  # non-empty and identical

    fast_sh = as_pairs(simhash_near_dups(docs, max_hamming=3))
    md5_sh = as_pairs(simhash_near_dups(docs, max_hamming=3, hash_family="md5"))
    assert fast_sh == md5_sh and fast_sh


def test_pii_scrub_and_counts(spark):
    from kafka_delta_ingest_spark.operators.text import pii_counts, scrub_pii

    df = spark.createDataFrame(
        [
            (1, "mail me at jane.doe+x@corp.example.org or call 555-123-4567"),
            (2, "server 192.168.0.12 answered; backup at 10.0.0.1"),
            (3, "no pii here, just text with numbers 12 and 3456"),
        ],
        "id int, text string",
    )
    out = df.select("id", scrub_pii("text").alias("t"), *pii_counts("text")).collect()
    rows = {r["id"]: r for r in out}
    assert rows[1]["t"] == "mail me at <email> or call <phone>"
    assert rows[1]["n_email"] == 1 and rows[1]["n_phone"] == 1 and rows[1]["n_ipv4"] == 0
    assert rows[2]["t"] == "server <ipv4> answered; backup at <ipv4>"
    assert rows[2]["n_ipv4"] == 2
    assert rows[3]["t"] == rows[3]["t"] and rows[3]["n_email"] == 0
    assert rows[3]["n_phone"] == 0 and rows[3]["n_ipv4"] == 0


def test_shared_gram_frame_equivalence(spark, docs):
    """Passing a precomputed char_gram_rows frame must give identical
    results for winnowing, MinHash-LSH, and SimHash — the share-the-
    shingles pipeline pattern."""
    from kafka_delta_ingest_spark.operators.dedup import (
        char_gram_rows,
        minhash_near_dups,
        simhash_near_dups,
        winnow_fingerprints,
    )

    g = char_gram_rows(docs, "doc_id", "text", n=5).persist()
    try:
        w0 = {(r["doc_id"], tuple(r["fps"])) for r in winnow_fingerprints(docs).collect()}
        w1 = {
            (r["doc_id"], tuple(r["fps"]))
            for r in winnow_fingerprints(docs, grams=g).collect()
        }
        assert w0 == w1 and w0

        m0 = {(r["id_a"], r["id_b"]) for r in minhash_near_dups(docs).collect()}
        m1 = {
            (r["id_a"], r["id_b"])
            for r in minhash_near_dups(docs, grams=g).collect()
        }
        assert m0 == m1 and m0

        s0 = {(r["id_a"], r["id_b"]) for r in simhash_near_dups(docs).collect()}
        s1 = {
            (r["id_a"], r["id_b"])
            for r in simhash_near_dups(docs, grams=g).collect()
        }
        assert s0 == s1
    finally:
        g.unpersist()


def test_decontaminate(spark):
    from kafka_delta_ingest_spark.operators.dedup import decontaminate

    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "a completely unrelated sentence about spark plans"),
            (3, "quick brown fox jumps over nothing at all today"),
        ],
        "doc_id int, text string",
    )
    ev = spark.createDataFrame(
        [(100, "we saw the quick brown fox jumps over a fence")],
        "doc_id int, text string",
    )
    out = {r["doc_id"]: r for r in decontaminate(train, ev, n=3).collect()}
    assert set(out) == {1, 2, 3}
    # "quick brown fox", "brown fox jumps", "fox jumps over" shared
    assert out[1]["contaminated"] and out[1]["n_hits"] >= 3
    assert out[3]["contaminated"]
    assert not out[2]["contaminated"] and out[2]["n_hits"] == 0
    assert out[2]["n_grams"] == 5  # 7 words -> 5 trigrams


def test_mix_rates_waterfill():
    from kafka_delta_ingest_spark.operators.sampling import mix_rates

    # b is the bottleneck (n/w: a=100, b=50): keep all of b, half of a
    r = mix_rates({"a": 100, "b": 50, "ignored": 7}, {"a": 1.0, "b": 1.0})
    assert r == {"a": 0.5, "b": 1.0}
    with pytest.raises(ValueError, match="absent"):
        mix_rates({"a": 10}, {"a": 1.0, "missing": 1.0})
    with pytest.raises(ValueError, match="non-positive"):
        mix_rates({"a": 10}, {"a": -1.0})


def test_resample_to_mix_deterministic(spark):
    from kafka_delta_ingest_spark.operators.sampling import resample_to_mix

    df = spark.createDataFrame(
        [(i, "a" if i % 3 else "b") for i in range(600)], "id int, s string"
    )
    kw = dict(
        strata_col="s", weights={"a": 3.0, "b": 1.0}, key_cols=["id"], salt="t"
    )
    out1 = {r["id"] for r in resample_to_mix(df, **kw).collect()}
    out2 = {r["id"] for r in resample_to_mix(df.repartition(7), **kw).collect()}
    assert out1 == out2 and out1  # membership independent of partitioning
    # strata not in the target mix are dropped entirely
    df2 = df.union(spark.createDataFrame([(10_000, "c")], "id int, s string"))
    out3 = resample_to_mix(df2, **kw)
    assert out3.where(F.col("s") == "c").count() == 0


def test_dsir_weights_prefers_target_vocabulary(spark):
    from kafka_delta_ingest_spark.operators.sampling import dsir_weights

    # target docs speak "alpha beta", raw background speaks "gamma delta";
    # held-out doc 100 uses target vocabulary, doc 101 background's
    rows = (
        [(i, "alpha beta alpha beta alpha", "t") for i in range(20)]
        + [(i, "gamma delta gamma delta gamma", "r") for i in range(20, 60)]
        + [(100, "alpha beta alpha", "r"), (101, "gamma delta gamma", "r")]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string, src string")
    for fam in ("xxhash64", "md5"):
        out = {
            r["doc_id"]: r["dsir_weight"]
            for r in dsir_weights(
                df, F.col("src") == "t", n_buckets=512, hash_family=fam
            ).collect()
        }
        assert out[100] > out[101], fam
        # weights are a pure function of the corpus — partitioning-free
        out2 = {
            r["doc_id"]: r["dsir_weight"]
            for r in dsir_weights(
                df.repartition(13), F.col("src") == "t",
                n_buckets=512, hash_family=fam,
            ).collect()
        }
        assert out == out2, fam


def test_shuffle_shards_permutation_invariants(spark):
    from kafka_delta_ingest_spark.operators.sampling import shuffle_shards

    df = spark.createDataFrame([(i,) for i in range(2000)], "doc_id long")
    kw = dict(key_cols=["doc_id"], n_shards=16, salt="s1")
    out = shuffle_shards(df, **kw).collect()
    # complete permutation: every doc exactly once, (shard,pos) unique,
    # positions dense 0..k-1 per shard
    assert len(out) == 2000
    assert len({r["doc_id"] for r in out}) == 2000
    cells = {(r["shard"], r["pos"]) for r in out}
    assert len(cells) == 2000
    from collections import Counter

    sizes = Counter(r["shard"] for r in out)
    assert set(sizes) == set(range(16))
    for sh, n in sizes.items():
        assert {p for s, p in cells if s == sh} == set(range(n))
    # uniform hash → near-equal shards (loose 3-sigma-ish bound)
    assert max(sizes.values()) - min(sizes.values()) < 60
    # pure function of (salt, key): partitioning-invariant, salt-sensitive
    again = {
        (r["doc_id"], r["shard"], r["pos"])
        for r in shuffle_shards(df.repartition(13), **kw).collect()
    }
    assert again == {(r["doc_id"], r["shard"], r["pos"]) for r in out}
    other = shuffle_shards(df, key_cols=["doc_id"], n_shards=16, salt="s2")
    diff = {
        (r["doc_id"], r["shard"]) for r in other.collect()
    } ^ {(r["doc_id"], r["shard"]) for r in out}
    assert diff  # different salt → different permutation


def test_token_pair_counts(spark):
    from kafka_delta_ingest_spark.operators.text import token_pair_counts

    rows = [
        ("a", [1, 2, 1, 2, 3]),   # pairs: (1,2) (2,1) (1,2) (2,3)
        ("b", [1, 2]),            # (1,2)
        ("c", [7]),               # too short: no pairs
        ("d", []),                # empty
    ]
    df = spark.createDataFrame(rows, "doc_id string, tokens array<int>")
    got = [(r["left"], r["right"], r["cnt"])
           for r in token_pair_counts(df, k=10).collect()]
    assert got == [(1, 2, 3), (2, 1, 1), (2, 3, 1)]
    # top-k cut is deterministic under count ties (pair asc)
    got2 = [(r["left"], r["right"]) for r in token_pair_counts(df, k=2).collect()]
    assert got2 == [(1, 2), (2, 1)]
    # stays a hash aggregation over a primitive long (no SortAggregate)
    plan = token_pair_counts(df, k=10)._jdf.queryExecution().executedPlan().toString()
    assert "SortAggregate" not in plan


def test_bpe_merges(spark):
    from kafka_delta_ingest_spark.operators.text import bpe_merges

    rows = [
        ("a", [1, 2, 1, 2, 3]),
        ("b", [1, 2, 3, 1, 2]),
        ("c", [1, 1, 1, 1]),
    ]
    df = spark.createDataFrame(rows, "doc_id string, tokens array<int>")
    m = {r["rank"]: (r["left"], r["right"], r["new_id"], r["cnt"])
         for r in bpe_merges(spark, df, 3, new_id_start=100).collect()}
    # round 0: (1,2) x4 is the top pair
    assert m[0] == (1, 2, 100, 4)
    # after substituting 100=(1,2): a=[100,100,3], b=[100,3,100], c=[1,1,1,1]
    # round 1 pairs: (1,1)x3 (overlapping occurrences count, classic BPE
    # get_stats), (100,100)x1 (100,3)x2 (3,100)x1 -> (1,1) wins
    assert m[1] == (1, 1, 101, 3)
    # after 101=(1,1): c=[101,101]; round 2 top: (100,3)x2
    assert m[2] == (100, 3, 102, 2)


def test_bpe_apply_reproduces_training_end_state(spark):
    from kafka_delta_ingest_spark.operators.text import bpe_apply, bpe_merges

    rows = [
        ("a", [1, 2, 1, 2, 3]),
        ("b", [1, 2, 3, 1, 2]),
        ("c", [1, 1, 1, 1]),
    ]
    df = spark.createDataFrame(rows, "doc_id string, tokens array<int>")
    merges = bpe_merges(spark, df, 3, new_id_start=100)
    got = {r["doc_id"]: r["tokens"]
           for r in bpe_apply(df, merges).collect()}
    # 100=(1,2), 101=(1,1), 102=(100,3) applied in rank order
    assert got == {
        "a": [100, 102],        # [1,2,1,2,3] -> [100,100,3] -> [100,102]
        "b": [102, 100],        # [1,2,3,1,2] -> [100,3,100] -> [102,100]
        "c": [101, 101],        # [1,1,1,1] -> greedy (1,1) twice
    }


def test_leakage_safe_split_groups_never_straddle(spark, docs):
    from kafka_delta_ingest_spark.operators.dedup import minhash_near_dups
    from kafka_delta_ingest_spark.operators.sampling import leakage_safe_split

    pairs = minhash_near_dups(docs, "doc_id", "text", jaccard_threshold=0.5)
    out = leakage_safe_split(
        docs.select("doc_id", "source"), pairs, rate=0.5, salt="t"
    ).collect()
    by_id = {r["doc_id"]: r for r in out}
    # docs 1, 2, 3 are one near-dup cluster: same key, same side
    keys = {by_id[i]["split_key"] for i in (1, 2, 3)}
    sides = {by_id[i]["in_holdout"] for i in (1, 2, 3)}
    assert len(keys) == 1 and len(sides) == 1
    # singletons represent themselves
    assert by_id[6]["split_key"] == "6"
    # deterministic: rerun gives the identical split
    again = {r["doc_id"]: r["in_holdout"] for r in leakage_safe_split(
        docs.select("doc_id", "source"), pairs, rate=0.5, salt="t"
    ).collect()}
    assert again == {r["doc_id"]: r["in_holdout"] for r in out}


def test_near_dup_group_sizes(spark, docs):
    from kafka_delta_ingest_spark.operators.dedup import (
        minhash_near_dups,
        near_dup_group_sizes,
    )

    pairs = minhash_near_dups(docs, "doc_id", "text", jaccard_threshold=0.5)
    dist = {r["group_size"]: r["n_groups"]
            for r in near_dup_group_sizes(pairs).collect()}
    # docs 1,2,3 form one 3-cluster; no other pairs
    assert dist == {3: 1}


def test_pq_topk_rerank_and_mergeable_encoding(spark):
    """Product quantization: (a) codes are a pure function of the vector
    (same codebooks -> same codes at any partitioning); (b) ADC ranking
    with full-probe-free codes still places every query's own vector in
    its candidate set, and exact re-rank recovers it at rank 1; (c) the
    ADC score of a vector equals the inner product of the query with its
    RECONSTRUCTION (codebook centroids), asserted arithmetically."""
    from kafka_delta_ingest_spark.operators.similarity import (
        pq_codebooks,
        pq_encode,
        pq_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cbs = pq_codebooks(emb, m=4, k=8)
    codes1 = {r["vec_id"]: list(r["codes"]) for r in pq_encode(emb, cbs).collect()}
    codes2 = {
        r["vec_id"]: list(r["codes"])
        for r in pq_encode(emb.repartition(13), cbs).collect()
    }
    assert codes1 == codes2 and len(codes1) == emb.count()

    q = emb.where("vec_id < 4").select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    refined = pq_topk(q, emb, k=3, codebooks=cbs, rerank=60)
    top1 = {r["q_id"]: r["vec_id"] for r in refined.where("rank = 1").collect()}
    assert top1 == {0: 0, 1: 1, 2: 2, 3: 3}  # self recovered by re-rank

    # (c) hand-check one ADC value against the reconstruction
    import math

    row = pq_topk(q, emb, k=1, codebooks=cbs).where(
        "q_id = 0 AND rank = 1"
    ).collect()[0]
    qv = [float(x) for x in emb.where("vec_id = 0").first()["embedding"]]
    code = codes1[row["vec_id"]]
    recon = [x for s in range(4) for x in cbs[s][code[s]][1]]
    expect = 0.0
    for s in range(4):
        d = 0.0
        for i in range(16):
            d += qv[s * 16 + i] * recon[s * 16 + i]
        expect += d
    assert math.isclose(row["adc"], expect, rel_tol=0, abs_tol=1e-12)


def test_ivf_pq_full_probe_degrades_to_plain_pq(spark):
    """IVF-PQ composition: probing EVERY cell must reproduce plain PQ
    over the whole corpus exactly (same codebooks -> same ADC scores and
    ranks); a 4-of-16 probe returns a subset of each query's candidates
    with identical ADC values for shared (q, vec) pairs."""
    from kafka_delta_ingest_spark.operators.similarity import (
        ivf_pq_topk,
        pq_codebooks,
        pq_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.where("vec_id < 3").select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    cbs = pq_codebooks(emb, m=4, k=8)
    plain = {
        (r["q_id"], r["vec_id"]): (r["adc"], r["rank"])
        for r in pq_topk(q, emb, k=5, codebooks=cbs).collect()
    }
    full_probe = {
        (r["q_id"], r["vec_id"]): (r["adc"], r["rank"])
        for r in ivf_pq_topk(
            q, emb, k=5, n_centroids=16, n_probe=16, codebooks=cbs
        ).collect()
    }
    assert full_probe == plain

    probed = {
        (r["q_id"], r["vec_id"]): r["adc"]
        for r in ivf_pq_topk(
            q, emb, k=5, n_centroids=16, n_probe=4, codebooks=cbs
        ).collect()
    }
    assert 0 < len(probed) <= len(plain) * 2
    for key, adc in probed.items():
        if key in plain:
            assert adc == plain[key][0]

"""Round-4 operator tests: packed-window document masks, FIM transform,
token-level decontamination, exact-k sampling."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=d, tokens=t) for d, t in rows],
        "doc_id string, tokens array<int>",
    )


# ---------------------------------------------------------- doc masks


def test_pack_tokens_doc_mask_hand_verified(spark):
    from kafka_delta_ingest_spark.operators.packing import pack_tokens

    # budget 4, eos=0: stream = a:[1,2,0] b:[3,0] c:[4,5,6,7,0]
    # windows: w0=[1,2,0,3](docs a,b) w1=[0,4,5,6](docs b,c) w2=[7,0](c)
    df = _docs(
        spark, [("a", [1, 2]), ("b", [3]), ("c", [4, 5, 6, 7])]
    )
    out = {
        r["seq_id"]: r
        for r in pack_tokens(
            df, budget=4, eos=0, doc_mask=True, pad=-9
        ).collect()
    }
    assert out[0]["tokens"] == [1, 2, 0, 3]
    assert out[0]["doc_mask"] == [0, 0, 0, 1]
    assert out[1]["tokens"] == [0, 4, 5, 6]
    assert out[1]["doc_mask"] == [0, 1, 1, 1]
    assert out[2]["tokens"] == [7, 0, -9, -9]
    # the mask index restarts per window (block-diagonal attention only
    # needs distinct ids WITHIN a window)
    assert out[2]["doc_mask"] == [0, 0, -1, -1]
    assert out[2]["n_tok"] == 2 and out[2]["n_docs"] == 1
    # mask indices are contiguous from 0 and count n_docs groups
    for r in out.values():
        real = [m for m in r["doc_mask"] if m >= 0]
        assert sorted(set(real)) == list(range(r["n_docs"]))
        # mask is non-decreasing over real positions (stream order)
        assert real == sorted(real)


def test_pack_tokens_doc_mask_segments_align_with_tokens(spark):
    """On a larger corpus: for every window, token runs grouped by mask
    index must reassemble the original documents' slices in order."""
    from kafka_delta_ingest_spark.operators.packing import pack_tokens

    rows = [(f"d{i:03d}", [(i * 7 + j) % 997 for j in range((i % 19) + 1)])
            for i in range(120)]
    df = _docs(spark, rows)
    wins = pack_tokens(df, budget=32, eos=0, doc_mask=True).collect()
    # global stream (doc_id order, eos-joined) must equal window-order
    # concat, and mask boundaries must land exactly on doc boundaries
    stream = []
    for d, t in sorted(rows):
        stream.extend(t + [0])
    got = []
    boundaries = 0
    for r in sorted(wins, key=lambda r: r["seq_id"]):
        assert len(r["tokens"]) == len(r["doc_mask"]) == r["n_tok"]
        got.extend(r["tokens"])
        prev = None
        for m in r["doc_mask"]:
            if m != prev:
                boundaries += 1
                prev = m
    assert got == stream
    # each (window, doc) adjacency is one mask run; total runs = sum n_docs
    assert boundaries == sum(r["n_docs"] for r in wins)


# ---------------------------------------------------------- FIM


@pytest.mark.parametrize("family", ["xxhash64", "md5"])
def test_fim_transform_reorders_and_preserves_multiset(spark, family):
    from kafka_delta_ingest_spark.operators.packing import fim_transform

    rows = [(f"d{i}", list(range(i % 11))) for i in range(60)]
    df = _docs(spark, rows)
    out = fim_transform(
        df, rate=0.5, salt="t", family=family
    ).collect()
    by_id = {r["doc_id"]: r for r in out}
    n_fim = 0
    for d, t in rows:
        r = by_id[d]
        assert r["n_tok"] == len(r["tokens"])
        if not r["fim"]:
            assert r["tokens"] == t
            continue
        n_fim += 1
        toks = r["tokens"]
        assert len(toks) == len(t) + 3
        # PSM structure: [PRE] prefix [SUF] suffix [MID] middle
        assert toks[0] == -1
        i_suf, i_mid = toks.index(-2), toks.index(-3)
        assert 0 < i_suf < i_mid
        prefix = toks[1:i_suf]
        suffix = toks[i_suf + 1 : i_mid]
        middle = toks[i_mid + 1 :]
        assert prefix + middle + suffix == t
    # empty docs can't be transformed; others split ~rate
    assert 0 < n_fim < len(rows)


def test_fim_transform_deterministic_across_partitionings(spark):
    from kafka_delta_ingest_spark.operators.packing import fim_transform

    rows = [(f"d{i}", [i, i + 1, i + 2]) for i in range(40)]
    a = fim_transform(_docs(spark, rows).repartition(1), salt="s").collect()
    b = fim_transform(_docs(spark, rows).repartition(7), salt="s").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


# ------------------------------------------------- token decontamination


@pytest.mark.parametrize("family", ["xxhash64", "md5"])
def test_decontaminate_tokens_flags_planted_overlap(spark, family):
    from kafka_delta_ingest_spark.operators.dedup import decontaminate_tokens

    shared = list(range(100, 108))  # one 8-gram
    train = _docs(
        spark,
        [
            ("clean", [1, 2, 3, 4, 5, 6, 7, 8, 9, 10]),
            ("dirty", [51, 52] + shared + [53]),
            ("exact", shared),
            ("short", [100, 101]),  # shorter than n: one short gram
        ],
    )
    ev = _docs(spark, [("e1", [99] + shared + [98]), ("e2", [100, 101])])
    out = {
        r["doc_id"]: r
        for r in decontaminate_tokens(
            train, ev, n=8, hash_family=family
        ).collect()
    }
    assert not out["clean"]["contaminated"]
    assert out["dirty"]["contaminated"] and out["dirty"]["n_hits"] == 1
    assert out["exact"]["contaminated"]
    # the short doc's full-sequence gram matches eval doc e2's short gram
    assert out["short"]["contaminated"]
    assert out["clean"]["n_grams"] == 3  # 10 tokens -> 3 distinct 8-grams


def test_decontaminate_tokens_broadcasts_eval_side(spark):
    from kafka_delta_ingest_spark.operators.dedup import decontaminate_tokens

    train = _docs(spark, [("a", list(range(20)))])
    ev = _docs(spark, [("e", list(range(5, 15)))])
    plan = decontaminate_tokens(train, ev, n=8, materialize=False)
    physical = plan._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in physical


# ---------------------------------------------------------- exact-k


@pytest.mark.parametrize("family", ["xxhash64", "md5"])
def test_sample_exact_k_global_and_grouped(spark, family):
    from kafka_delta_ingest_spark.operators.sampling import sample_exact_k

    df = spark.createDataFrame(
        [Row(doc_id=f"d{i}", grp=f"g{i % 3}") for i in range(90)],
        "doc_id string, grp string",
    )
    top = sample_exact_k(df, 10, ["doc_id"], salt="s", family=family)
    rows = top.collect()
    assert len(rows) == 10
    # deterministic: same call, same rows, any partitioning
    again = sample_exact_k(
        df.repartition(13), 10, ["doc_id"], salt="s", family=family
    ).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    # different salt -> (almost surely) different sample
    other = sample_exact_k(df, 10, ["doc_id"], salt="t", family=family).collect()
    assert sorted(map(tuple, rows)) != sorted(map(tuple, other))

    per = sample_exact_k(df, 7, ["doc_id"], by="grp", salt="s", family=family)
    counts = {r["grp"]: r["n"] for r in per.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    assert counts == {"g0": 7, "g1": 7, "g2": 7}
    # grouped sample is a subset of the group's rows
    assert per.join(df, ["doc_id", "grp"], "left_anti").count() == 0


def test_sample_exact_k_small_groups_and_k_zero(spark):
    from kafka_delta_ingest_spark.operators.sampling import sample_exact_k

    df = spark.createDataFrame(
        [Row(doc_id="a", grp="g"), Row(doc_id="b", grp="h")],
        "doc_id string, grp string",
    )
    assert sample_exact_k(df, 5, ["doc_id"], by="grp").count() == 2
    assert sample_exact_k(df, 0, ["doc_id"]).count() == 0
    with pytest.raises(ValueError):
        sample_exact_k(df, -1, ["doc_id"])


def test_sample_exact_k_global_plan_is_take_ordered(spark):
    from kafka_delta_ingest_spark.operators.sampling import sample_exact_k

    df = spark.range(1000).select(F.col("id").cast("string").alias("doc_id"))
    plan = sample_exact_k(df, 5, ["doc_id"])
    physical = plan._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in physical


def test_multimodal_pipeline_query_hand_verified(spark, tmp_path):
    """The driver-contract multimodal query's checksums, recomputed with
    hashlib + plain Python on a 3-doc corpus (one of each media kind by
    construction of the payload's first byte)."""
    import hashlib

    import pandas as pd

    import __spark_entry__ as entrymod

    rows = []
    want_kinds = {0: None, 1: None, 2: None}
    i = 0
    while not all(v is not None for v in want_kinds.values()):
        text = f"doc text {i}"
        digest = hashlib.md5(f"{i}:{text}".encode()).digest()
        k = digest[0] % 3
        if want_kinds[k] is None:
            want_kinds[k] = (i, text, digest)
            rows.append((i, text, "en", "web", len(text)))
        i += 1
    sf = str(tmp_path / "sf")
    (tmp_path / "sf").mkdir()
    pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).to_parquet(str(tmp_path / "sf" / "documents.parquet"))
    out = {
        r["media_id"]: r.asDict()
        for r in entrymod.q_multimodal_pipeline(spark, sf).collect()
    }
    assert len(out) == 3
    for k, (doc_id, _text, d) in want_kinds.items():
        got = out[str(doc_id)]
        kind = ["image", "audio", "video"][k]
        assert got["kind"] == kind
        if kind == "image":
            # resize(4x2): nearest-neighbor keeps even-indexed bytes;
            # features over 8 bytes = the bytes themselves
            assert got["n_bytes"] == 8
            assert got["feat2_sum"] == 2 * sum(d[j] for j in range(0, 16, 2))
            assert got["frames_kept"] == 0 and got["frame_val_sum"] == 0
        else:
            # features over 16 bytes = 2-byte means; x2 = sum of all bytes
            assert got["n_bytes"] == 16
            assert got["feat2_sum"] == sum(d)
        if kind == "video":
            # 4 frames of 4 bytes, every 2nd kept -> frames 0 and 2,
            # each valued as its big-endian 32-bit integer
            assert got["frames_kept"] == 2
            assert got["frame_val_sum"] == int.from_bytes(
                d[0:4], "big"
            ) + int.from_bytes(d[8:12], "big")
        if kind == "audio":
            assert got["frames_kept"] == 0 and got["frame_val_sum"] == 0

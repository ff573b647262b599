"""B2 Z-order / Hilbert clustering: key math, scan preservation, and the
point of it all — manifest min/max pruning actually prunes."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from kafka_delta_ingest_spark.datagen import make_small_file_table
from kafka_delta_ingest_spark.functions.verify import content_fingerprint
from kafka_delta_ingest_spark.maintenance.zorder import (
    _manifest_ranges,
    cluster,
    cluster_keyed_df,
    hilbert_key,
    morton_key,
)
from kafka_delta_ingest_spark.plans.pruning import prune_files


def test_morton2_interleaves_bits():
    x = np.array([0b1010], dtype=np.uint64)
    y = np.array([0b0110], dtype=np.uint64)
    # interleave: y3 x3 y2 x2 y1 x1 y0 x0 = 0 1 1 0 1 1 0 0 -> 0b01101100
    assert morton_key([x, y])[0] == 0b01101100


def test_morton3_matches_naive():
    rng = np.random.default_rng(1)
    a = rng.integers(0, 2**21, 200).astype(np.uint64)
    b = rng.integers(0, 2**21, 200).astype(np.uint64)
    c = rng.integers(0, 2**21, 200).astype(np.uint64)
    fast = morton_key([a, b, c])
    naive = np.zeros_like(a)
    for bit in range(21):
        naive |= ((a >> np.uint64(bit)) & np.uint64(1)) << np.uint64(3 * bit)
        naive |= ((b >> np.uint64(bit)) & np.uint64(1)) << np.uint64(3 * bit + 1)
        naive |= ((c >> np.uint64(bit)) & np.uint64(1)) << np.uint64(3 * bit + 2)
    assert (fast == naive).all()


def test_hilbert_is_bijective_and_local():
    # 2D, 4 bits: all 256 cells map to distinct indices 0..255
    xs, ys = np.meshgrid(np.arange(16, dtype=np.uint64), np.arange(16, dtype=np.uint64))
    idx = hilbert_key([xs.ravel(), ys.ravel()], bits=4)
    assert sorted(idx.tolist()) == list(range(256))
    # locality: consecutive hilbert indices are adjacent cells (property of
    # the curve; morton does NOT have this)
    order = np.argsort(idx)
    x_sorted, y_sorted = xs.ravel()[order], ys.ravel()[order]
    dist = np.abs(np.diff(x_sorted.astype(int))) + np.abs(np.diff(y_sorted.astype(int)))
    assert (dist == 1).all()


def test_sql_key_impl_matches_arrow(spark):
    """morton_key_sql (pure Catalyst) must produce the same keys as the
    Arrow UDF for 2- and 3-dim interleaves."""
    from kafka_delta_ingest_spark.maintenance.zorder import (
        make_curve_udf,
        morton_key_sql,
    )

    df = spark.range(0, 2_000).select(
        (F.col("id") * 7 % (1 << 21)).alias("a"),
        (F.col("id") * 131 % (1 << 21)).alias("b"),
        (F.col("id") * 65537 % (1 << 21)).alias("c"),
    )
    for cols in (["a", "b"], ["a", "b", "c"]):
        udf = make_curve_udf(len(cols), "zorder")
        got = df.select(
            udf(*[F.col(c) for c in cols]).alias("k1"),
            morton_key_sql([F.col(c) for c in cols]).alias("k2"),
        )
        assert got.where(F.col("k1") != F.col("k2")).count() == 0


@pytest.mark.parametrize("curve", ["zorder", "hilbert"])
def test_cluster_preserves_scan(spark, tmp_table_root, curve):
    t = make_small_file_table(
        spark, tmp_table_root, n_docs=1_500, n_files=12, max_tok=48, partition_by_source=False
    )
    fp = content_fingerprint(t.snapshot().scan(spark))
    m = cluster(
        spark, t, dims=["source", "n_tok", "doc_id"], curve=curve,
        target_file_bytes=32 * 1024, verify=True,
    )
    assert m["files_written"] >= 2
    snap = t.snapshot()
    assert content_fingerprint(snap.scan(spark)) == fp
    assert t.history()[-1]["operation"] == f"cluster-{curve}"
    assert t.history()[-1]["data_change"] is False


def test_cluster_files_are_key_disjoint_and_size_targeted(spark, tmp_table_root):
    """The quantile-bucket placement (repartitionByRange replacement) must
    keep its two range-partitioning guarantees: within each partition
    value, output files cover pairwise-DISJOINT curve-key slices (what
    makes manifest pruning work on the curve dims), and file count tracks
    ceil(partition_bytes / target) (the reference's file-size targeting,
    src/lib.rs:1127-1145)."""
    import math
    from collections import defaultdict

    t = make_small_file_table(
        spark, tmp_table_root, n_docs=4_000, n_files=16, max_tok=256,
        partition_by_source=True,
    )
    dims = ["n_tok", "doc_id"]
    before = t.snapshot()
    ranges = _manifest_ranges(before.files, dims)
    bytes_by_part = defaultdict(int)
    for f in before.files:
        bytes_by_part[f.partition_values.get("source")] += f.size

    target = 96 * 1024
    cluster(spark, t, dims=dims, target_file_bytes=target, verify=True)

    after = t.snapshot()
    spans_by_part = defaultdict(list)
    for f in after.files:
        fdf = spark.read.parquet(f"{t.root}/{f.path}")
        keyed = cluster_keyed_df(fdf, dims, "zorder", ranges)
        lo, hi = keyed.agg(
            F.min("_ckey").alias("lo"), F.max("_ckey").alias("hi")
        ).collect()[0]
        spans_by_part[f.partition_values.get("source")].append((lo, hi, f.size))

    for part, spans in spans_by_part.items():
        # file count ≈ ceil(bytes/target): quantile cuts can dedupe on
        # repeated keys, never exceed the plan
        planned = max(1, math.ceil(bytes_by_part[part] / target))
        assert 1 <= len(spans) <= planned
        assert len(spans) >= max(1, planned // 2)
        # pairwise-disjoint key slices: sort by min key, each file's max
        # must fall strictly below the next file's min
        spans.sort()
        for (l0, h0, _), (l1, h1, _) in zip(spans, spans[1:]):
            assert h0 < l1, f"{part}: overlapping file key ranges"


def test_cluster_improves_pruning(spark, tmp_table_root):
    """After clustering on n_tok, a range predicate on n_tok must prune
    most files via manifest min/max (the payoff of B2+B3)."""
    t = make_small_file_table(
        spark, tmp_table_root, n_docs=4_000, n_files=16, max_tok=512, partition_by_source=False
    )
    before = t.snapshot()
    pred = [("n_tok", "<=", 64)]
    kept_before = len(prune_files(before.files, pred)) / len(before.files)

    cluster(spark, t, dims=["n_tok", "doc_id"], target_file_bytes=150 * 1024)
    after = t.snapshot()
    kept_after = len(prune_files(after.files, pred)) / len(after.files)
    # random layout keeps ~all files; clustered layout keeps a fraction
    assert kept_before > 0.9
    assert kept_after < 0.5
    # and the pruned scan returns exactly the right rows
    got = after.scan(spark, predicate=F.col("n_tok") <= 64, predicate_stats=pred)
    want = after.scan(spark).where(F.col("n_tok") <= 64)
    assert got.count() == want.count() > 0

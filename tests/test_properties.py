"""Property-based tests (hypothesis) for the driver-side planners and key
math — pure Python, no Spark session needed."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from kafka_delta_ingest_spark.maintenance.zorder import hilbert_key, morton_key
from kafka_delta_ingest_spark.plans.bin_packing import plan_bins
from kafka_delta_ingest_spark.plans.pruning import prune_files
from kafka_delta_ingest_spark.table.format import FileEntry


@st.composite
def file_lists(draw):
    n = draw(st.integers(1, 60))
    files = []
    for i in range(n):
        files.append(
            FileEntry(
                path=f"data/u/f{i}.parquet",
                size=draw(st.integers(1, 200)),
                num_records=draw(st.integers(1, 100)),
                partition_values={"source": draw(st.sampled_from(["a", "b", "c"]))},
                stats={
                    "min": {"n_tok": draw(st.integers(0, 50))},
                    "max": {"n_tok": draw(st.integers(50, 100))},
                    "null_count": {},
                },
            )
        )
    return files


@given(file_lists(), st.integers(50, 300))
@settings(max_examples=60, deadline=None)
def test_bin_packing_invariants(files, target):
    bins = plan_bins(files, target_file_bytes=target)
    seen = set()
    for b in bins:
        # no file packed twice
        for f in b.files:
            assert f.path not in seen
            seen.add(f.path)
        # bins never exceed target unless a single file does
        if len(b.files) > 1:
            assert b.size <= target
        # bins are per-partition
        assert len({tuple(sorted(f.partition_values.items())) for f in b.files}) == 1
        assert len(b.files) >= 2
    # determinism
    bins2 = plan_bins(files, target_file_bytes=target)
    assert [b.input_paths() for b in bins2] == [b.input_paths() for b in bins]
    # right-sized files are never rewritten
    threshold = int(target * 0.75)
    for f in files:
        if f.size >= threshold:
            assert f.path not in seen


@given(file_lists(), st.integers(0, 100))
@settings(max_examples=60, deadline=None)
def test_pruning_is_conservative(files, cut):
    kept = prune_files(files, [("n_tok", "<=", cut)])
    kept_paths = {f.path for f in kept}
    for f in files:
        lo = f.stats["min"]["n_tok"]
        # any file whose range definitely intersects must be kept
        if lo <= cut:
            assert f.path in kept_paths


@given(st.lists(st.integers(0, 2**21 - 1), min_size=1, max_size=200))
@settings(max_examples=30, deadline=None)
def test_morton3_roundtrip_bits(xs):
    a = np.array(xs, dtype=np.uint64)
    b = np.array(list(reversed(xs)), dtype=np.uint64)
    c = (a ^ b) & np.uint64(0x1FFFFF)
    key = morton_key([a, b, c])
    # de-interleave and compare
    for bit in range(21):
        assert (((key >> np.uint64(3 * bit)) & np.uint64(1)) == ((a >> np.uint64(bit)) & np.uint64(1))).all()
        assert (((key >> np.uint64(3 * bit + 1)) & np.uint64(1)) == ((b >> np.uint64(bit)) & np.uint64(1))).all()
        assert (((key >> np.uint64(3 * bit + 2)) & np.uint64(1)) == ((c >> np.uint64(bit)) & np.uint64(1))).all()


@given(st.integers(2, 3), st.integers(2, 5))
@settings(max_examples=12, deadline=None)
def test_hilbert_bijective(ndim, bits):
    side = 1 << bits
    grids = np.meshgrid(*[np.arange(side, dtype=np.uint64)] * ndim)
    coords = [g.ravel() for g in grids]
    idx = hilbert_key(coords, bits=bits)
    assert len(set(idx.tolist())) == side**ndim
    assert idx.max() == side**ndim - 1


@given(
    st.integers(2, 16),           # dim
    st.integers(2, 8),            # n centroids
    st.integers(1, 8),            # n_probe (clamped to k)
    st.integers(0, 2**31),        # rng seed
)
@settings(max_examples=40, deadline=None)
def test_probe_cells_match_numpy_argsort(dim, k, n_probe, seed):
    """_probe_cells (driver-side IVF probe ranking, sequential Python
    floats) must rank cells exactly like an independent numpy cosine
    reference with (sim DESC, cid ASC) ordering."""
    from kafka_delta_ingest_spark.operators.similarity import _probe_cells

    rng = np.random.default_rng(seed)
    n_probe = min(n_probe, k)
    q = rng.normal(size=dim).tolist()
    cents = [(cid * 3 + 1, rng.normal(size=dim).tolist()) for cid in range(k)]
    got = _probe_cells(q, cents, n_probe)

    qv = np.array(q)
    sims = []
    for cid, cv in cents:
        c = np.array(cv)
        sims.append((-float(qv @ c / (np.linalg.norm(qv) * np.linalg.norm(c))), cid))
    want = [cid for _, cid in sorted(sims)][:n_probe]
    assert got == want


@given(st.text(min_size=1, max_size=60), st.integers(4, 16))
@settings(max_examples=300, deadline=None)
def test_string_stat_truncation_bounds_hold(s, lim):
    """Truncated bounds stay VALID bounds for every value they covered:
    min' <= v and max' >= v (strictly greater whenever truncation actually
    shortened the bound)."""
    from pyspark.sql import types as T

    from kafka_delta_ingest_spark.table.stats import truncate_string_stats

    schema = T.StructType([T.StructField("text", T.StringType())])
    stats = {"min": {"text": s}, "max": {"text": s}, "null_count": {}}
    out = truncate_string_stats(stats, schema, limit=lim)
    lo, hi = out["min"]["text"], out["max"]["text"]
    assert lo <= s
    assert hi >= s
    if len(s) > lim and len(hi) <= lim:
        assert hi > s  # incremented prefix is a STRICT upper bound


@given(
    st.lists(st.text(min_size=1, max_size=12), min_size=1, max_size=30),
    st.integers(2, 16),
)
@settings(max_examples=200, deadline=None)
def test_bucket_transform_pruning_never_loses_the_match(doc_ids, n):
    """Hidden-partitioning prune through bucket(N,doc_id): for every value,
    the file recording its bucket is kept by an equality conjunct mapped
    through the transform (conservative: may keep others, never loses)."""
    from kafka_delta_ingest_spark.table import transforms

    spec = [f"bucket({n},doc_id)"]
    key = transforms.key(spec[0])
    files = [
        FileEntry(
            path=f"data/b/f{i}.parquet",
            size=1,
            num_records=1,
            partition_values={key: str(transforms.py_value(spec[0], v))},
            stats={},
        )
        for i, v in enumerate(doc_ids)
    ]
    for i, v in enumerate(doc_ids):
        kept = {f.path for f in prune_files(files, [("doc_id", "=", v)],
                                            schema=None, spec=spec)}
        assert files[i].path in kept
        # and pruning actually happens when buckets differ
        want = str(transforms.py_value(spec[0], v))
        for j, w in enumerate(doc_ids):
            got_b = str(transforms.py_value(spec[0], w))
            if got_b != want:
                assert files[j].path not in kept


# ---- sketch math (pure-Python models of the engine expressions; the
# Spark plans are asserted equal to these models in test_sketches.py) --

import hashlib


def _hll_reg(values, p=8, salt="hll"):
    regs = {}
    width = 60 - p
    for v in values:
        tok = hashlib.md5(str(v).encode()).hexdigest()
        h = int(hashlib.md5(f"{salt}|{tok}".encode()).hexdigest()[:15], 16)
        b, w = h % (1 << p), h >> p
        rho = (width + 1) if w == 0 else (width + 1 - w.bit_length())
        regs[b] = max(regs.get(b, 0), rho)
    return regs


@given(st.lists(st.text(min_size=1, max_size=8), min_size=1, max_size=300),
       st.integers(0, 300))
@settings(max_examples=60, deadline=None)
def test_hll_merge_commutes_with_union_and_ignores_duplication(vals, cut):
    a, b = vals[:cut], vals[cut:]
    merged = {}
    for regs in (_hll_reg(a), _hll_reg(b)):
        for k, r in regs.items():
            merged[k] = max(merged.get(k, 0), r)
    assert merged == _hll_reg(vals)
    # duplication invariance: the sketch sees sets, not multisets
    assert _hll_reg(vals * 3) == _hll_reg(vals)


def _cms(values, depth=4, width=64, salt="cms"):
    cells = {}
    for v in values:
        for d in range(depth):
            tok = hashlib.md5(str(v).encode()).hexdigest()
            h = int(
                hashlib.md5(f"{salt}|{d}|{tok}".encode()).hexdigest()[:15], 16
            )
            cells[(d, h % width)] = cells.get((d, h % width), 0) + 1
    return cells


def _cms_est(cells, v, depth=4, width=64, salt="cms"):
    tok = hashlib.md5(str(v).encode()).hexdigest()
    return min(
        cells.get(
            (d, int(hashlib.md5(f"{salt}|{d}|{tok}".encode()).hexdigest()[:15], 16) % width),
            0,
        )
        for d in range(depth)
    )


@given(st.lists(st.text(min_size=1, max_size=6), min_size=1, max_size=200),
       st.integers(0, 200))
@settings(max_examples=40, deadline=None)
def test_cms_merge_and_never_undercounts(vals, cut):
    cells = _cms(vals)
    # merge of any split == whole (cell-wise sum)
    merged = {}
    for part in (_cms(vals[:cut]), _cms(vals[cut:])):
        for k, c in part.items():
            merged[k] = merged.get(k, 0) + c
    assert merged == cells
    # point estimates never undercount, and deeper sketches never
    # estimate higher (min over more rows)
    truth = {}
    for v in vals:
        truth[v] = truth.get(v, 0) + 1
    deep = _cms(vals, depth=8)
    for v, n in truth.items():
        est = _cms_est(cells, v)
        assert est >= n
        assert _cms_est(deep, v, depth=8) <= est

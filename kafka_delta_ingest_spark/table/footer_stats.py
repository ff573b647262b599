"""Per-file stats from parquet footers — the reference's exact approach
(min_max_values_from_file_metadata, /root/reference/src/writer.rs:655-707):
row-group statistics are already in the file; reading them costs one footer
fetch per file, no data scan.

Stat rules identical to table.stats (writer.rs rules):
- scalars + struct leaves: min/max + null_count (dotted names);
- arrays (rep level > 0, leaf path contains ``.list.``): null_count only
  (writer.rs:676-681);
- partition columns never appear in data files, hence excluded naturally;
- timestamps rendered ISO ``yyyy-MM-dd'T'HH:mm:ss.SSS'Z'`` (writer.rs:1127).

Footers are fetched with a thread pool (I/O bound, ~ms each). A commit
touches at most ``max_bins_per_commit`` output files, so this is
metadata-scale work; beyond ~10^5 files per commit, distribute the same
function over executors with ``spark.sparkContext.parallelize(paths)``.
"""

from __future__ import annotations

import datetime as _dt
import os
from concurrent.futures import ThreadPoolExecutor

import pyarrow.parquet as pq
from pyspark.sql import types as T

from kafka_delta_ingest_spark.table.format import FileEntry
from kafka_delta_ingest_spark.table.stats import (
    _partition_values_from_path,
    stat_leaves,
)


def _leaf_to_stat_name(path_in_schema: str) -> tuple[str, bool]:
    """Map a parquet leaf path to (stat name, is_array_interior).

    ``tokens.list.element`` → (``tokens``, True); struct leaves keep their
    dotted names (``meta.producer.timestamp`` → itself, False)."""
    if ".list." in path_in_schema:
        return path_in_schema.split(".list.", 1)[0], True
    return path_in_schema, False


def _render(v, dtype: T.DataType):
    if v is None:
        return None
    if isinstance(dtype, T.TimestampType):
        if isinstance(v, _dt.datetime):
            return v.strftime("%Y-%m-%dT%H:%M:%S.") + f"{v.microsecond // 1000:03d}Z"
        return str(v)
    if isinstance(dtype, T.DateType):
        return v.isoformat() if hasattr(v, "isoformat") else str(v)
    if isinstance(v, bytes):
        try:
            return v.decode("utf-8")
        except UnicodeDecodeError:
            return v.hex()
    if isinstance(dtype, (T.FloatType, T.DoubleType)):
        return float(v)
    if isinstance(dtype, (T.IntegerType, T.LongType, T.ShortType, T.ByteType)):
        return int(v)
    return v


def _one_file(
    abs_path: str,
    table_root: str,
    leaf_types: dict[str, tuple[T.DataType, bool]],
    partition_cols: list[str],
) -> FileEntry:
    md = pq.ParquetFile(abs_path).metadata
    mins: dict = {}
    maxs: dict = {}
    nulls: dict = {}
    truncated: set[str] = set()
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            col = g.column(ci)
            name, is_array = _leaf_to_stat_name(col.path_in_schema)
            if name not in leaf_types:
                continue
            dtype, minmax_ok = leaf_types[name]
            st = col.statistics
            if st is not None and st.null_count is not None:
                nulls[name] = nulls.get(name, 0) + int(st.null_count)
            else:
                nulls.setdefault(name, 0)
            if is_array or not minmax_ok:
                continue
            if st is None or not st.has_min_max:
                truncated.add(name)
                continue
            lo, hi = _render(st.min, dtype), _render(st.max, dtype)
            if name not in mins or (lo is not None and lo < mins[name]):
                mins[name] = lo
            if name not in maxs or (hi is not None and hi > maxs[name]):
                maxs[name] = hi
    for name in truncated:  # any row group without stats ⇒ no min/max claim
        mins.pop(name, None)
        maxs.pop(name, None)
    # array null counts from leaf def-levels conflate element nulls with
    # null arrays; our schema forbids null elements so they coincide
    # (writer.rs:709-786 counts outer nulls — same number here)
    rel = os.path.relpath(os.path.abspath(abs_path), os.path.abspath(table_root))
    from kafka_delta_ingest_spark.table.stats import truncate_string_stats

    string_cols = {
        n
        for n, (dt, mm) in leaf_types.items()
        if mm and isinstance(dt, T.StringType)
    }
    return FileEntry(
        path=rel,
        size=os.path.getsize(abs_path),
        num_records=int(md.num_rows),
        partition_values=_partition_values_from_path(rel, partition_cols),
        stats=truncate_string_stats(
            {"min": mins, "max": maxs, "null_count": nulls},
            None,
            cols=string_cols,
        ),
    )


def footer_add_entries(
    table_root: str,
    staged_dir: str,
    schema: T.StructType,
    partition_cols: list[str],
    max_workers: int = 32,
) -> list[FileEntry]:
    paths = []
    for dirpath, _d, files in os.walk(staged_dir):
        for fn in files:
            if fn.endswith(".parquet"):
                paths.append(os.path.join(dirpath, fn))
    if not paths:
        return []
    pset = set(partition_cols)
    leaf_types = {
        n: (dt, mm)
        for (n, dt, mm) in stat_leaves(schema)
        if n.split(".", 1)[0] not in pset
    }
    with ThreadPoolExecutor(max_workers=min(max_workers, len(paths))) as ex:
        entries = list(
            ex.map(
                lambda p: _one_file(p, table_root, leaf_types, partition_cols), paths
            )
        )
    entries.sort(key=lambda e: e.path)
    return entries

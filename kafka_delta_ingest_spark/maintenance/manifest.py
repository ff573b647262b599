"""Manifest rewrite (north-rule op B3): recompute per-file min/max/null
count/num_records stats for live files WITHOUT rewriting data, and commit
refreshed Add entries.

Stat rules follow /root/reference/src/writer.rs:655-786 verbatim (via
table.stats): arrays → null count only, partition cols excluded, timestamps
ISO-rendered. Useful when files were added by a writer that skipped stats,
or after a schema change added stat-bearing columns.

One distributed aggregation grouped by input_file_name over only the
stat-bearing columns — column pruning keeps the token arrays out of the
scan (their null flags read definition levels only)."""

from __future__ import annotations

import os
import time

from pyspark.sql import SparkSession

from kafka_delta_ingest_spark.table.format import FileEntry, Table, Transaction
from kafka_delta_ingest_spark.table.stats import (
    _partition_values_from_path,
    _typed,
    file_stats_df,
    stat_leaves,
)


def rewrite_manifests(spark: SparkSession, table: Table, job_id: str = "manifest") -> dict:
    t0 = time.time()
    snap = table.snapshot()
    if not snap.files:
        return {"files": 0, "duration_s": 0.0}

    df = snap.scan(spark)
    rows = file_stats_df(df, snap.schema, snap.partition_cols).collect()
    leaves = [
        (n, dt, mm)
        for (n, dt, mm) in stat_leaves(snap.schema)
        if n.split(".", 1)[0] not in set(snap.partition_cols)
    ]
    by_path = {f.path: f for f in snap.files}
    root_abs = os.path.abspath(table.root)
    adds: list[FileEntry] = []
    for r in rows:
        d = r.asDict()
        fpath = d["_file"].removeprefix("file:")
        rel = os.path.relpath(os.path.abspath(fpath), root_abs)
        old = by_path.get(rel)
        mins, maxs, nulls = {}, {}, {}
        for name, dt, mm in leaves:
            safe = name.replace(".", "__DOT__")
            if mm:
                mins[name] = _typed(d.get(f"min__{safe}"), dt)
                maxs[name] = _typed(d.get(f"max__{safe}"), dt)
            nulls[name] = int(d.get(f"nulls__{safe}") or 0)
        adds.append(
            FileEntry(
                path=rel,
                size=old.size if old else os.path.getsize(fpath),
                num_records=int(d["num_records"]),
                partition_values=old.partition_values
                if old
                else _partition_values_from_path(rel, snap.partition_cols),
                stats={"min": mins, "max": maxs, "null_count": nulls},
                # preserve the data sequence number: replay would restamp
                # a missing seq with the rewrite version, silently ending
                # initial-default applicability (file.seq < added_seq)
                # and equality-delete applicability (file.seq < del.seq)
                # for every file whose manifest was refreshed
                seq=old.seq if old else None,
            )
        )
    adds.sort(key=lambda e: e.path)
    # re-Add the same paths with fresh stats; no Remove needed (Add upserts
    # by path in log replay, mirroring Delta's add-overwrites-add semantics)
    v = table.commit(
        Transaction(
            operation="manifest-rewrite",
            adds=adds,
            removes=[],
            data_change=False,
            metadata={"job_id": job_id},
        ),
        expected_schema=snap.schema,
    )
    return {"files": len(adds), "version": v, "duration_s": time.time() - t0}

"""Zero-copy table clone — Delta's ``CLONE`` for this format.

A clone gives a dev/test/experiment table over production data without
copying it: at 10^12 rows a deep copy is days of I/O, a clone is an
O(files) metadata operation. Delta's SHALLOW CLONE records *absolute
paths into the source table* — cheap, but the clone silently breaks the
moment the source VACUUMs the files it references. On a filesystem this
engine does strictly better with **hard links**:

- zero bytes copied (same inodes; pytest asserts identical st_ino),
- the clone is **self-contained**: source snapshot expiry + orphan GC
  unlink the source's directory entries, but the clone's links keep the
  shared content alive — no cross-table retention coordination, the
  exact failure mode shallow clones are notorious for (pytest kills the
  source's files and re-scans the clone byte-identically),
- both tables evolve independently from commit v1 (separate logs,
  separate CAS, separate ledgers); a rewrite in either breaks the share
  for the rewritten files only (copy-on-write at file granularity).

On an object store (no hard links) the same operation degrades to
Delta's absolute-path shallow clone or a server-side copy — the log
shape below is identical either way; only ``_materialize`` changes.

The clone pins ONE source snapshot (optionally a past ``version`` —
time-travel clones for reproducing an old training run). Live
merge-on-read deletes are refused, matching export: fold them first so
the cloned file set IS the row set (the clone does not carry the
source's delete entries, and silently resurrecting rows is worse than
asking for a ``rewrite_deletes``).
"""

from __future__ import annotations

import os

from kafka_delta_ingest_spark.table.format import (
    FileEntry,
    Table,
    Transaction,
)


class CloneError(RuntimeError):
    pass


def clone_table(
    src: Table, dst_root: str, version: int | None = None
) -> Table:
    """Create a new table at ``dst_root`` whose v1 snapshot is the
    source's pinned snapshot, with every data file hard-linked."""
    snap = src.snapshot(version)
    if snap.delete_entries:
        raise CloneError(
            f"{len(snap.delete_entries)} live merge-on-read delete "
            "entries at the source; run rewrite_deletes / optimize first"
        )
    if os.path.exists(dst_root) and os.listdir(dst_root):
        raise CloneError(f"destination {dst_root} exists and is not empty")

    dst = Table.create(
        dst_root,
        snap.schema,
        partition_cols=list(snap.partition_cols),
        properties=dict(snap.properties),
    )
    adds: list[FileEntry] = []
    for f in sorted(snap.files, key=lambda e: e.path):
        src_abs = os.path.join(src.root, f.path)
        dst_abs = os.path.join(dst.root, f.path)
        os.makedirs(os.path.dirname(dst_abs), exist_ok=True)
        os.link(src_abs, dst_abs)
        adds.append(
            FileEntry(
                path=f.path,
                size=f.size,
                num_records=f.num_records,
                partition_values=dict(f.partition_values),
                stats=f.stats,
            )
        )
    dst.commit(
        Transaction(
            operation="clone",
            adds=adds,
            metadata={
                "source_root": os.path.abspath(src.root),
                "source_version": snap.version,
            },
        )
    )
    return dst

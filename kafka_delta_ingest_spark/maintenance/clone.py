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
    # Data-sequence-number remap: initial defaults apply by the test
    # ``file.seq < added_seq`` (table/format.py), so the clone must
    # preserve each pinned file's position in the source's seq ORDER
    # while guaranteeing every FUTURE clone commit (seq = version >= 2)
    # sorts above every threshold. Map the k distinct source seqs
    # order-isomorphically onto -k..-1 and each default's added_seq onto
    # the matching rank boundary (<= 0): membership over the cloned
    # files is preserved exactly, and no future file can ever match.
    seqs = sorted({f.seq if f.seq is not None else 0 for f in snap.files})
    seq_rank = {s: i - len(seqs) for i, s in enumerate(seqs)}

    def _rebase_threshold(t: int) -> int:
        return sum(1 for s in seqs if s < t) - len(seqs)

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
                seq=seq_rank[f.seq if f.seq is not None else 0],
            )
        )
    # the clone's v1 carries the source snapshot's FULL metadata state:
    # column mapping (clone scans read the same physical parquet names),
    # drop tombstones, and initial defaults with thresholds rebased into
    # the remapped seq space above — per-file applicability is preserved
    # exactly, including the mixed case where only SOME pinned files
    # predate a default
    defaults = {
        c: {"value": d["value"], "added_seq": _rebase_threshold(d["added_seq"])}
        for c, d in snap.defaults.items()
    }
    dst.commit(
        Transaction(
            operation="clone",
            adds=adds,
            mapping_update={
                "map": dict(snap.column_mapping),
                "dropped": list(snap.dropped_physical),
            }
            if (snap.column_mapping or snap.dropped_physical)
            else None,
            defaults_update=defaults if defaults else None,
            metadata={
                "source_root": os.path.abspath(src.root),
                "source_version": snap.version,
            },
        )
    )
    return dst

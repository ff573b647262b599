"""Symlink-format manifest export — external-engine interop.

Engines that cannot read this table's snapshot log (Presto, Trino,
Athena, Hive external tables — anything that lists files itself) need a
pinned file list to see a CONSISTENT snapshot instead of whatever
half-committed mix a directory listing returns mid-OPTIMIZE. Delta Lake
solves this with ``GENERATE symlink_format_manifest``: one text file per
partition directory listing the absolute data-file paths of the current
snapshot. This module is that operation for this table format:

    _symlink_format_manifest/
      source=src1/manifest     # one absolute path per line
      source=src2/manifest
      ...

- Partition directories mirror the data layout exactly (derived from
  each live file's relative path, so hidden-partitioning transforms and
  historical specs after partition evolution come out right for free).
- Regeneration is atomic per manifest file (write + ``os.replace``): the
  path an engine opens never appears half-written and never vanishes
  mid-regeneration. Cross-partition, a concurrent reader can observe a
  mixed-but-individually-valid set during regeneration — the same
  per-partition guarantee Delta's GENERATE gives.
- **Refuses while merge-on-read deletes are live**: an external engine
  reads raw parquet and would resurrect deleted rows. Fold them first
  (``rewrite_deletes`` / compaction / OPTIMIZE) — same ordering Delta
  requires (deletion vectors must be purged before manifest generation).

The export is metadata-only: O(live files) driver work, no data read —
at 10^12 rows it costs a manifest walk, not a scan. Staleness semantics
are Delta's: the manifest pins the snapshot at generation time; rerun
after maintenance commits (cheap) to advance it.
"""

from __future__ import annotations

import os

from kafka_delta_ingest_spark.table.format import Table

MANIFEST_DIR = "_symlink_format_manifest"


class ExportRefusedError(RuntimeError):
    """Export refused: the snapshot's raw parquet does not equal its
    logical scan, so an external engine would read wrong answers."""


class LiveDeletesError(ExportRefusedError):
    """Export refused: merge-on-read deletes are live and an external
    engine reading raw parquet would resurrect deleted rows."""


def generate_symlink_manifest(table: Table, version: int | None = None) -> dict:
    """Write the symlink manifest tree for the given (default: current)
    snapshot. Returns ``{"version", "partitions", "files_listed",
    "manifest_root"}``."""
    snap = table.snapshot(version)
    if snap.delete_entries:
        raise LiveDeletesError(
            f"{len(snap.delete_entries)} live merge-on-read delete "
            "entries; run rewrite_deletes / optimize first"
        )
    # an external engine reads the raw parquet pages: with a column
    # mapping it would see PHYSICAL names where the logical schema
    # differs, and with initial defaults it would read NULLs where this
    # engine's scan applies the default — both silent wrong answers.
    # A full rewrite (OPTIMIZE) materializes defaults; renames keep
    # physical names by design, so mapped tables stay unexportable until
    # the mapping is identity again.
    if snap.column_mapping or snap.defaults:
        raise ExportRefusedError(
            "table has a column mapping or initial defaults an external "
            "engine cannot apply; materialize first (OPTIMIZE folds "
            "defaults; renames keep physical names by design)"
        )

    # group live files by partition directory, mirrored from the data
    # layout itself (correct across partition-spec history): keep only
    # the hive `col=value` path segments — data files sit under
    # per-commit staging dirs (data/<job>/<col=value>/...) that an
    # external table's partition discovery must not see, and files of
    # the same partition from different commits merge into one manifest
    by_dir: dict[str, list[str]] = {}
    for f in sorted(snap.files, key=lambda e: e.path):
        segs = os.path.dirname(f.path).split(os.sep)
        # only segments keyed by the file's RECORDED partition values —
        # internal layout dirs (compaction's _gbin=N bins, staging ids)
        # also ride in the path but are not partitions
        part = os.sep.join(
            s
            for s in segs
            if "=" in s and s.split("=", 1)[0] in f.partition_values
        )
        by_dir.setdefault(part, []).append(
            os.path.join(table.root, f.path)
        )

    # Regeneration is atomic PER MANIFEST FILE (write-then-os.replace):
    # the path an engine actually opens never appears half-written and
    # never vanishes mid-regeneration — a whole-tree double-rename would
    # open an ENOENT window at the documented path (and a crash between
    # the renames would strand the only copy under a name no reader
    # looks at). A reader listing partitions mid-regeneration can see a
    # mix of old- and new-snapshot manifests, each individually valid;
    # Delta's GENERATE gives the same per-partition guarantee. A crash
    # mid-loop leaves the same valid mix; rerunning converges.
    final_root = os.path.join(table.root, MANIFEST_DIR)
    os.makedirs(final_root, exist_ok=True)
    rewritten = 0
    for part, paths in by_dir.items():
        d = os.path.join(final_root, part) if part else final_root
        os.makedirs(d, exist_ok=True)
        target = os.path.join(d, "manifest")
        content = "\n".join(paths) + "\n"
        # incremental: unchanged partitions keep their manifest untouched
        # (on an object store every PUT costs; scoped maintenance touches
        # a few partitions of thousands)
        try:
            with open(target) as fh:
                if fh.read() == content:
                    continue
        except FileNotFoundError:
            pass
        tmp = target + f".tmp-v{snap.version}"
        with open(tmp, "w") as fh:
            fh.write(content)
        os.replace(tmp, target)
        rewritten += 1
    # drop manifests of partitions that no longer exist, then empty dirs
    for dirpath, _dirs, files in os.walk(final_root, topdown=False):
        part = os.path.relpath(dirpath, final_root)
        part = "" if part == "." else part
        if "manifest" in files and part not in by_dir:
            os.remove(os.path.join(dirpath, "manifest"))
        for fn in files:
            if fn.startswith("manifest.tmp-"):  # crashed-run leftovers
                os.remove(os.path.join(dirpath, fn))
        if dirpath != final_root and not os.listdir(dirpath):
            os.rmdir(dirpath)

    return {
        "version": snap.version,
        "partitions": len(by_dir),
        "manifests_rewritten": rewritten,
        "files_listed": sum(len(p) for p in by_dir.values()),
        "manifest_root": final_root,
    }


def read_manifest(table: Table) -> dict[str, list[str]]:
    """Parse the exported tree back: ``{partition_dir: [abs paths]}`` —
    what an external engine's partition discovery sees."""
    root = os.path.join(table.root, MANIFEST_DIR)
    out: dict[str, list[str]] = {}
    for dirpath, _dirs, files in os.walk(root):
        if "manifest" not in files:
            continue
        part = os.path.relpath(dirpath, root)
        with open(os.path.join(dirpath, "manifest")) as fh:
            out["" if part == "." else part] = [
                ln for ln in fh.read().splitlines() if ln
            ]
    return out

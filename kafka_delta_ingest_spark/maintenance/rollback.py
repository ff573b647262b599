"""Rollback: restore the table head to an earlier snapshot's contents.

A rollback is a NEW commit (never log surgery): adds = files live at the
target version but not at head, removes = head files absent from the
target. History stays intact — pinned readers of intermediate versions
are unaffected, time travel still reaches them, and snapshot expiry
retires them on its normal schedule. This is Iceberg's
``rollback_to_snapshot`` expressed in our commit protocol, and the
recovery path the reference gets by re-seeking consumer offsets after a
bad deploy (/root/reference/src/offsets.rs:35-101): undo the bad data,
keep the audit trail.

Metadata-only (no data bytes move); the target's files must still exist
on disk — rollback past an expire+GC horizon raises.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import types as T

from kafka_delta_ingest_spark.table.format import Table, TableError, Transaction


def rollback(table: Table, to_version: int) -> dict:
    """Commit a restore of ``to_version``'s exact file list (and schema).

    Returns metrics: files re-added / removed, rows before/after.
    """
    head_snap = table.snapshot()
    if not (0 <= to_version <= head_snap.version):
        raise ValueError(f"cannot roll back to v{to_version} (head={head_snap.version})")
    if to_version == head_snap.version:
        return {
            "version": head_snap.version,
            "files_readded": 0,
            "files_removed": 0,
            "rows_before": head_snap.num_records(),
            "rows_after": head_snap.num_records(),
        }
    target = table.snapshot(to_version)
    missing = [
        f.path
        for f in target.files
        if not os.path.exists(os.path.join(table.root, f.path))
    ]
    if missing:
        raise TableError(
            f"rollback target v{to_version} references {len(missing)} "
            f"garbage-collected files, e.g. {missing[:3]}"
        )
    head_paths = {f.path for f in head_snap.files}
    target_paths = {f.path for f in target.files}
    adds = [f for f in target.files if f.path not in head_paths]
    removes = sorted(head_paths - target_paths)
    # restore the target's position-delete set exactly: entries added (or
    # pruned differently) since the target are dropped, entries the target
    # had are re-added verbatim (replay re-intersects counts with the
    # restored live file set). An entry byte-identical at both versions
    # needs no action.
    head_del = {de.path: de.to_json() for de in head_snap.delete_entries}
    tgt_del = {de.path: de for de in target.delete_entries}
    remove_deletes = sorted(
        p for p, j in head_del.items()
        if p not in tgt_del or tgt_del[p].to_json() != j
    )
    add_deletes = [
        de for p, de in sorted(tgt_del.items())
        if p not in head_del or head_del[p] != de.to_json()
    ]
    missing_del = [
        de.path
        for de in add_deletes
        if not os.path.exists(os.path.join(table.root, de.path))
    ]
    if missing_del:
        raise TableError(
            f"rollback target v{to_version} references {len(missing_del)} "
            f"garbage-collected delete files, e.g. {missing_del[:3]}"
        )
    schema_update: T.StructType | None = None
    if json.loads(target.schema.json()) != json.loads(head_snap.schema.json()):
        schema_update = target.schema
    # column mapping is versioned with the schema: restoring a pre-rename/
    # pre-drop snapshot must restore its mapping + tombstones too, or the
    # restored logical names would read the wrong physical columns
    mapping_update: dict | None = None
    if (
        target.column_mapping != head_snap.column_mapping
        or target.dropped_physical != head_snap.dropped_physical
    ):
        mapping_update = {
            "map": target.column_mapping,
            "dropped": target.dropped_physical,
        }
    defaults_update: dict | None = None
    if target.defaults != head_snap.defaults:
        defaults_update = target.defaults
    txn = Transaction(
        operation="rollback",
        adds=adds,
        removes=removes,
        add_deletes=add_deletes,
        remove_deletes=remove_deletes,
        data_change=True,  # table contents change
        metadata={"rolled_back_to": to_version, "from_version": head_snap.version},
        schema_update=schema_update,
        mapping_update=mapping_update,
        defaults_update=defaults_update,
    )
    v = table.commit(txn)
    return {
        "version": v,
        "files_readded": len(adds),
        "files_removed": len(removes),
        "rows_before": head_snap.num_records(),
        "rows_after": target.num_records(),
    }

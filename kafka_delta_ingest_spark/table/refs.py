"""Branches, tags, and write-audit-publish (WAP).

Iceberg-style named refs over the commit log:

- a **branch** is its own linear commit sequence forked from a main
  version: ``_log/branches/<name>/v<fork+1>.json ...`` plus a
  ``branch.json`` recording the fork point. Versions ≤ fork resolve to
  the MAIN log (shared history, zero copying); versions > fork resolve to
  the branch directory. Writers commit to a branch with the exact same
  CAS/validation path as main — a ``Branch`` *is* a ``Table``.
- a **tag** is an immutable named pointer to a main version
  (``_log/tags/<name>.json``), created with put-if-absent so two racing
  taggers can't disagree about what ``v1.0`` means.
- **publish** moves branch work onto main: fast-forward (main head still
  at the fork → branch commits are appended verbatim, byte-identical
  history) or squash (main advanced → ONE atomic replace commit carrying
  the branch's net file diff, validated by the normal commit path so a
  concurrent removal of a file the branch also rewrote raises
  ConcurrentDeleteError instead of corrupting).

This is the write-audit-publish workflow the reference approximates with
its seek-offsets bootstrap + test-consumer validation loop
(/root/reference/README.adoc:151-209, tests/helpers/mod.rs:396-405):
stage data where readers can't see it, audit it, then expose it
atomically. Snapshot expiry and orphan GC treat branch- and tag-pinned
versions as live (maintenance/expire.py), so audit data can't be
collected out from under an unpublished branch.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from kafka_delta_ingest_spark.table.format import (
    CHECKPOINT_INTERVAL,
    CommitConflictError,
    SchemaChangedError,
    Table,
    TableError,
    Transaction,
    VERSION_DIGITS,
)

BRANCHES_SUBDIR = "branches"
TAGS_SUBDIR = "tags"


class Branch(Table):
    """A table view whose log is main-up-to-fork + the branch's own
    commits. All Table operations (snapshot, scan, commit, maintenance)
    work unchanged; commits land in the branch directory and are invisible
    to main readers until publish."""

    def __init__(self, parent: Table, name: str):
        super().__init__(parent.root, cas=parent.cas)
        self.name = name
        self.branch_dir = os.path.join(self.log_dir, BRANCHES_SUBDIR, name)
        meta_path = os.path.join(self.branch_dir, "branch.json")
        try:
            with open(meta_path) as f:
                self.fork_version = json.load(f)["fork_version"]
        except FileNotFoundError:
            raise TableError(f"no branch {name!r} at {parent.root}") from None

    def _version_path(self, v: int) -> str:
        if v <= self.fork_version:
            return os.path.join(self.log_dir, f"v{v:0{VERSION_DIGITS}d}.json")
        return os.path.join(self.branch_dir, f"v{v:0{VERSION_DIGITS}d}.json")

    def latest_version(self) -> int:
        best = self.fork_version
        try:
            for name in os.listdir(self.branch_dir):
                if name.startswith("v") and name.endswith(".json"):
                    try:
                        best = max(best, int(name[1 : 1 + VERSION_DIGITS]))
                    except ValueError:
                        pass
        except FileNotFoundError:
            pass
        return best

    def _latest_checkpoint_at_or_before(self, v: int) -> int | None:
        # main checkpoints summarize MAIN commits only — usable up to the
        # fork; a main checkpoint past the fork would replay main commits
        # the branch never saw
        return super()._latest_checkpoint_at_or_before(min(v, self.fork_version))

    def _write_checkpoint(self, v: int) -> None:
        # branches are short-lived staging lines; a checkpoint written
        # into the shared main log dir would poison main replay. Skip.
        return None


def create_branch(table: Table, name: str, at_version: int | None = None) -> Branch:
    _check_ref_name(name)
    head = table.latest_version()
    if head < 0:
        raise TableError(f"no table at {table.root}")
    v = head if at_version is None else at_version
    if v < 0 or v > head or not os.path.exists(table._version_path(v)):
        raise TableError(f"version {v} not available (head={head})")
    bdir = os.path.join(table.log_dir, BRANCHES_SUBDIR, name)
    os.makedirs(bdir, exist_ok=True)
    table.cas.put_if_absent(
        os.path.join(bdir, "branch.json"),
        json.dumps(
            {
                "name": name,
                "fork_version": v,
                "created_ms": int(time.time() * 1000),
            }
        ).encode(),
    )
    return Branch(table, name)


def list_branches(table: Table) -> dict[str, int]:
    """name -> fork_version for every live branch."""
    base = os.path.join(table.log_dir, BRANCHES_SUBDIR)
    out: dict[str, int] = {}
    try:
        for name in sorted(os.listdir(base)):
            meta = os.path.join(base, name, "branch.json")
            if os.path.exists(meta):
                with open(meta) as f:
                    out[name] = json.load(f)["fork_version"]
    except FileNotFoundError:
        pass
    return out


def drop_branch(table: Table, name: str) -> None:
    bdir = os.path.join(table.log_dir, BRANCHES_SUBDIR, name)
    if not os.path.isdir(bdir):
        raise TableError(f"no branch {name!r} at {table.root}")
    shutil.rmtree(bdir)


def create_tag(table: Table, name: str, version: int | None = None) -> int:
    _check_ref_name(name)
    head = table.latest_version()
    v = head if version is None else version
    if v < 0 or v > head or not os.path.exists(table._version_path(v)):
        raise TableError(f"version {v} not available (head={head})")
    tdir = os.path.join(table.log_dir, TAGS_SUBDIR)
    os.makedirs(tdir, exist_ok=True)
    table.cas.put_if_absent(
        os.path.join(tdir, f"{name}.json"),
        json.dumps({"version": v, "created_ms": int(time.time() * 1000)}).encode(),
    )
    return v


def tag_version(table: Table, name: str) -> int:
    p = os.path.join(table.log_dir, TAGS_SUBDIR, f"{name}.json")
    try:
        with open(p) as f:
            return json.load(f)["version"]
    except FileNotFoundError:
        raise TableError(f"no tag {name!r} at {table.root}") from None


def list_tags(table: Table) -> dict[str, int]:
    base = os.path.join(table.log_dir, TAGS_SUBDIR)
    out: dict[str, int] = {}
    try:
        for name in sorted(os.listdir(base)):
            if name.endswith(".json"):
                with open(os.path.join(base, name)) as f:
                    out[name[: -len(".json")]] = json.load(f)["version"]
    except FileNotFoundError:
        pass
    return out


def delete_tag(table: Table, name: str) -> None:
    p = os.path.join(table.log_dir, TAGS_SUBDIR, f"{name}.json")
    try:
        os.unlink(p)
    except FileNotFoundError:
        raise TableError(f"no tag {name!r} at {table.root}") from None


def fast_forward(table: Table, branch: Branch) -> int:
    """Append the branch's commits onto main verbatim. Requires main's
    head to still equal the fork (true fast-forward — published history is
    byte-identical to what was audited). Raises CommitConflictError if
    main advanced; use publish_branch for the squash fallback."""
    head = table.latest_version()
    bhead = branch.latest_version()
    if bhead == branch.fork_version:
        return head  # nothing to publish
    if head != branch.fork_version:
        raise CommitConflictError(
            f"main advanced to v{head} past fork v{branch.fork_version}; "
            "fast-forward impossible"
        )
    for v in range(branch.fork_version + 1, bhead + 1):
        commit = branch._read_commit(v)
        # CAS: a racing main writer surfaces as FileExistsError mid-way;
        # already-published prefixes are fine (retried publish is a no-op
        # for them) — re-raise as a conflict for anything else
        try:
            table._atomic_write_version(v, commit)
        except FileExistsError:
            if table._read_commit(v) != commit:
                raise CommitConflictError(
                    f"main advanced concurrently at v{v}; publish aborted "
                    f"after v{v - 1}"
                ) from None
        if v % CHECKPOINT_INTERVAL == 0:
            try:
                table._write_checkpoint(v)
            except Exception:
                pass
    return bhead


def publish_branch(table: Table, branch: Branch, drop: bool = True) -> int:
    """Publish a branch onto main: fast-forward when main hasn't moved,
    else ONE atomic squash commit carrying the branch's net diff vs its
    fork (adds/removes/delete-entry changes/schema/spec/app_txns), fully
    validated by the normal commit path — a file both main and the branch
    rewrote raises ConcurrentDeleteError, a regressed app offset raises
    ConflictingOffsetsError. Returns the new main head version."""
    try:
        v = fast_forward(table, branch)
    except CommitConflictError:
        v = _squash_publish(table, branch)
    if drop:
        drop_branch(table, branch.name)
    return v


def _squash_publish(table: Table, branch: Branch) -> int:
    fork = table.snapshot(version=branch.fork_version)
    bsnap = branch.snapshot()
    head_snap = table.snapshot()

    fork_files = {f.path for f in fork.files}
    branch_files = dict(bsnap._files)
    adds = [fe for p, fe in branch_files.items() if p not in fork_files]
    removes = sorted(fork_files - set(branch_files))

    fork_dels = {de.path: de for de in fork.delete_entries}
    branch_dels = {de.path: de for de in bsnap.delete_entries}
    add_deletes = [de for p, de in branch_dels.items() if p not in fork_dels]
    remove_deletes = sorted(set(fork_dels) - set(branch_dels))

    schema_update = None
    if json.loads(bsnap.schema.json()) != json.loads(fork.schema.json()):
        if json.loads(head_snap.schema.json()) != json.loads(fork.schema.json()):
            raise SchemaChangedError(
                "both main and branch evolved the schema since the fork"
            )
        schema_update = bsnap.schema
    partition_update = None
    if bsnap.partition_cols != fork.partition_cols:
        if head_snap.partition_cols != fork.partition_cols:
            raise CommitConflictError(
                "both main and branch changed the partition spec since the fork"
            )
        partition_update = bsnap.partition_cols

    app_txns = {
        k: off
        for k, off in bsnap.app_txns.items()
        if fork.app_txns.get(k, -1) < off
    }
    return table.commit(
        Transaction(
            operation="publish",
            adds=adds,
            removes=removes,
            add_deletes=add_deletes,
            remove_deletes=remove_deletes,
            app_txns=app_txns,
            data_change=True,
            schema_update=schema_update,
            partition_update=partition_update,
            metadata={
                "branch": branch.name,
                "fork_version": branch.fork_version,
                "branch_head": branch.latest_version(),
                "mode": "squash",
            },
        )
    )


def _check_ref_name(name: str) -> None:
    if not name or not all(c.isalnum() or c in "._-" for c in name):
        raise ValueError(f"invalid ref name: {name!r}")

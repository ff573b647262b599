"""Partition ledger: per-bin lineage + metrics checkpoint for resumable
maintenance jobs.

The analogue of the reference's per-partition ``txn`` offset entries read
back at startup to seek past completed work
(/root/reference/src/lib.rs:1026-1046, src/offsets.rs:35-101), with the
same integrity stance: an existing entry whose recorded inputs differ from
what the planner now wants is a hard error, never silently overwritten
(refuse-to-regress, src/offsets.rs:150-157).

Entries live under ``<table>/_ledger/<job_id>/<bin_key>.json`` and are
written create-exclusive *before* being trusted. Each records:
  inputs: sorted input file paths  (lineage: input files -> output files)
  outputs: staged output file paths (relative to table root)
  rows, bytes, duration_s          (metrics; north-rule requirement)
"""

from __future__ import annotations

import hashlib
import json
import os
import uuid


class InconsistentLedgerError(Exception):
    pass


def bin_key(input_paths: list[str]) -> str:
    h = hashlib.sha256("\n".join(sorted(input_paths)).encode()).hexdigest()
    return h[:24]


class Ledger:
    def __init__(self, table_root: str, job_id: str):
        self.dir = os.path.join(table_root, "_ledger", job_id)
        os.makedirs(self.dir, exist_ok=True)
        self.job_id = job_id

    def _path(self, key: str) -> str:
        return os.path.join(self.dir, f"{key}.json")

    def get(self, key: str) -> dict | None:
        try:
            with open(self._path(key)) as f:
                return json.load(f)
        except FileNotFoundError:
            return None

    def entries(self) -> list[dict]:
        out = []
        for name in sorted(os.listdir(self.dir)):
            if name.endswith(".json"):
                with open(os.path.join(self.dir, name)) as f:
                    out.append(json.load(f))
        return out

    def record(
        self,
        key: str,
        inputs: list[str],
        outputs: list[str],
        rows: int,
        bytes_: int,
        duration_s: float,
        extra: dict | None = None,
    ) -> dict:
        entry = {
            "job_id": self.job_id,
            "bin_key": key,
            "inputs": sorted(inputs),
            "outputs": sorted(outputs),
            "rows": rows,
            "bytes": bytes_,
            "duration_s": duration_s,
            **(extra or {}),
        }
        existing = self.get(key)
        if existing is not None:
            if existing["inputs"] != entry["inputs"]:
                raise InconsistentLedgerError(
                    f"bin {key}: ledger inputs differ from planned inputs"
                )
            return existing  # idempotent re-record
        tmp = os.path.join(self.dir, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            json.dump(entry, f)
        try:
            os.link(tmp, self._path(key))
        except FileExistsError:
            pass  # concurrent recorder won; entries are validated equal below
        finally:
            os.unlink(tmp)
        stored = self.get(key)
        if stored["inputs"] != entry["inputs"]:
            raise InconsistentLedgerError(f"bin {key}: concurrent conflicting entry")
        return stored

    def check_resume(self, key: str, planned_inputs: list[str], table_root: str) -> dict | None:
        """If a prior run already staged this bin, return its entry iff the
        recorded inputs match the plan and every staged output still exists;
        mismatched inputs are a hard error (refuse-to-regress)."""
        e = self.get(key)
        if e is None:
            return None
        if e["inputs"] != sorted(planned_inputs):
            raise InconsistentLedgerError(
                f"bin {key}: planned inputs diverge from committed ledger lineage"
            )
        if not e["outputs"]:
            # an entry with inputs but no outputs cannot be a completed bin
            # (rewrites never legitimately stage nothing) — trusting it would
            # let a replace commit Remove the inputs with zero Adds
            raise InconsistentLedgerError(
                f"bin {key}: ledger entry records no outputs — corrupt lineage"
            )
        for rel in e["outputs"]:
            if not os.path.exists(os.path.join(table_root, rel)):
                return None  # staged output lost: re-run the bin
        return e

    def metrics(self) -> dict:
        es = self.entries()
        return {
            "bins": len(es),
            "rows": sum(e["rows"] for e in es),
            "bytes": sum(e["bytes"] for e in es),
            "duration_s": sum(e["duration_s"] for e in es),
        }

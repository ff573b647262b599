"""File-level min/max pruning over manifest stats — the reader-side payoff
of the per-file stats the reference writes into Add actions
(/root/reference/src/writer.rs:655-707). Operates purely on metadata:
O(n_files), no data scan."""

from __future__ import annotations

from typing import Any, Iterable

from kafka_delta_ingest_spark.table.format import FileEntry

# predicate conjunct: (column, op, literal); op in =, <, <=, >, >=, in
_OPS = {"=", "==", "<", "<=", ">", ">=", "in"}


def _may_match(f: FileEntry, col: str, op: str, lit: Any) -> bool:
    mins = f.stats.get("min", {})
    maxs = f.stats.get("max", {})
    if col in f.partition_values:
        pv = f.partition_values[col]
        if op in ("=", "=="):
            return pv == str(lit)
        if op == "in":
            return pv in {str(x) for x in lit}
        # range ops on partition strings: compare as strings conservatively
        return True
    lo, hi = mins.get(col), maxs.get(col)
    if lo is None or hi is None:
        return True  # no stats ⇒ cannot prune
    if op in ("=", "=="):
        return lo <= lit <= hi
    if op == "<":
        return lo < lit
    if op == "<=":
        return lo <= lit
    if op == ">":
        return hi > lit
    if op == ">=":
        return hi >= lit
    if op == "in":
        return any(lo <= x <= hi for x in lit)
    return True


def prune_files(
    files: Iterable[FileEntry], conjuncts: list[tuple[str, str, Any]]
) -> list[FileEntry]:
    """Keep files that *may* contain rows matching every conjunct."""
    for col, op, _ in conjuncts:
        if op not in _OPS:
            raise ValueError(f"unsupported pruning op: {op}")
    return [
        f
        for f in files
        if all(_may_match(f, c, op, lit) for (c, op, lit) in conjuncts)
    ]

"""File-level min/max pruning over manifest stats — the reader-side payoff
of the per-file stats the reference writes into Add actions
(/root/reference/src/writer.rs:655-707). Operates purely on metadata:
O(n_files), no data scan.

Stats values vary in Python type by column and by stats path (footer stats
keep numerics native but render timestamps/dates/decimals as strings; scan
stats may differ) — so BOTH the stat bound and the predicate literal are
normalized to the column's logical type before comparing. Any value that
fails to normalize makes the comparison conservatively return True (keep
the file): pruning must never lose matching rows, only save I/O.
"""

from __future__ import annotations

import datetime as _dt
from decimal import Decimal, InvalidOperation
from typing import Any, Iterable

from pyspark.sql import types as T

from kafka_delta_ingest_spark.table.format import (
    HIVE_DEFAULT_PARTITION,
    FileEntry,
)

# predicate conjunct: (column, op, literal); op in =, <, <=, >, >=, in
_OPS = {"=", "==", "<", "<=", ">", ">=", "in"}


def lit_str(v: Any) -> str:
    """Render a predicate literal the way Spark renders the value in a
    partition directory path (booleans are lowercase JVM-side; Python's
    str(True) is 'True'). ONE helper shared by the driver planner here and
    the distributed planner (plans/distributed_planning.py) so both prune
    the identical file set."""
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def _canon(v: Any, dt: T.DataType | None) -> Any:
    """Normalize a stat bound or literal to a canonical comparable for its
    column's logical type. Returns None when it can't (⇒ caller keeps the
    file)."""
    if v is None:
        return None
    try:
        if isinstance(dt, (T.IntegerType, T.LongType, T.ShortType, T.ByteType,
                           T.FloatType, T.DoubleType, T.DecimalType)):
            return Decimal(str(v))  # exact total order across int/float/str
        if isinstance(dt, T.BooleanType):
            if isinstance(v, bool):
                return v
            return str(v).lower() == "true"
        if isinstance(dt, T.TimestampType):
            return _to_naive_utc(v)
        if isinstance(dt, T.DateType):
            if isinstance(v, _dt.datetime):
                return v.date()
            if isinstance(v, _dt.date):
                return v
            return _dt.date.fromisoformat(str(v))
        if isinstance(dt, T.StringType):
            return str(v)
        if dt is None:
            # no schema: keep native values; _range_ok turns a cross-type
            # TypeError into a conservative keep
            return v
        return None  # arrays/structs/binary: never prune on these
    except (ValueError, TypeError, InvalidOperation):
        return None


def _to_naive_utc(v: Any) -> _dt.datetime | None:
    if isinstance(v, _dt.datetime):
        ts = v
    else:
        s = str(v).strip().replace("Z", "+00:00")
        # stats render 'YYYY-MM-DDTHH:MM:SS.mmmZ'; literals may use a space
        ts = _dt.datetime.fromisoformat(s.replace(" ", "T", 1))
    if ts.tzinfo is not None:
        ts = ts.astimezone(_dt.timezone.utc).replace(tzinfo=None)
    return ts


def _may_match(
    f: FileEntry, col: str, op: str, lit: Any, dt: T.DataType | None
) -> bool:
    if col in f.partition_values:
        pv = f.partition_values[col]
        if pv is None or pv == HIVE_DEFAULT_PARTITION:
            # every row of the file is NULL in this column — no comparison
            # conjunct can match (NULL fails =, in, and every range op)
            return False
        if op in ("=", "=="):
            return pv == lit_str(lit)
        if op == "in":
            return pv in {lit_str(x) for x in lit}
        # range ops on partition values: compare typed when possible
        cpv, clit = _canon(pv, dt), _canon(lit, dt)
        if cpv is None or clit is None:
            return True
        return _range_ok(cpv, cpv, op, clit)
    lo = _canon(f.stats.get("min", {}).get(col), dt)
    hi = _canon(f.stats.get("max", {}).get(col), dt)
    if lo is None or hi is None:
        return True  # no stats (or un-normalizable) ⇒ cannot prune
    if op == "in":
        vals = [_canon(x, dt) for x in lit]
        if any(x is None for x in vals):
            return True
        try:
            return any(lo <= x <= hi for x in vals)
        except (TypeError, InvalidOperation):
            return True  # NaN bound / cross-type ⇒ keep conservatively
    clit = _canon(lit, dt)
    if clit is None:
        return True
    return _range_ok(lo, hi, op, clit)


def _range_ok(lo: Any, hi: Any, op: str, lit: Any) -> bool:
    # InvalidOperation: a NaN float stat canonicalizes to Decimal('NaN'),
    # whose ordered comparison raises — keep the file conservatively
    try:
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
    except (TypeError, InvalidOperation):
        return True
    return True


def prune_files(
    files: Iterable[FileEntry],
    conjuncts: list[tuple[str, str, Any]],
    schema: T.StructType | None = None,
    spec: list[str] | None = None,
) -> list[FileEntry]:
    """Keep files that *may* contain rows matching every conjunct.

    ``schema`` supplies the logical column types; without it, columns whose
    values aren't directly comparable are kept conservatively. ``spec`` is
    the table's partition spec: source-column equality conjuncts are mapped
    through its transforms (hidden partitioning — table/transforms.py) so
    a predicate on ``doc_id`` prunes on the recorded bucket values."""
    if spec:
        from kafka_delta_ingest_spark.table import transforms

        conjuncts = list(conjuncts) + transforms.derived_conjuncts(
            spec, list(conjuncts)
        )
    for col, op, _ in conjuncts:
        if op not in _OPS:
            raise ValueError(f"unsupported pruning op: {op}")
    types: dict[str, T.DataType] = (
        {fld.name: fld.dataType for fld in schema.fields} if schema is not None else {}
    )
    return [
        f
        for f in files
        if all(_may_match(f, c, op, lit, types.get(c)) for (c, op, lit) in conjuncts)
    ]


def _must_match(
    f: FileEntry, col: str, op: str, lit: Any, dt: T.DataType | None
) -> bool:
    """True iff EVERY row of the file provably matches the conjunct —
    the dual of _may_match. Unknown/missing stats ⇒ False (the file must
    be scanned); NULL rows never match a comparison, so a file with any
    nulls in the column can't fully match either."""
    if col in f.partition_values:
        pv = f.partition_values[col]
        if pv is None or pv == HIVE_DEFAULT_PARTITION:
            return False  # all rows NULL ⇒ no row provably matches
        if op in ("=", "=="):
            return pv == lit_str(lit)
        if op == "in":
            return pv in {lit_str(x) for x in lit}
        cpv, clit = _canon(pv, dt), _canon(lit, dt)
        if cpv is None or clit is None:
            return False
        return _all_in_range(cpv, cpv, op, clit)
    nulls = f.stats.get("null_count", {}).get(col)
    if nulls is None or int(nulls) > 0:
        return False
    lo = _canon(f.stats.get("min", {}).get(col), dt)
    hi = _canon(f.stats.get("max", {}).get(col), dt)
    if lo is None or hi is None:
        return False
    if op == "in":
        vals = [_canon(x, dt) for x in lit]
        try:
            return lo == hi and any(lo == x for x in vals if x is not None)
        except (TypeError, InvalidOperation):
            return False
    clit = _canon(lit, dt)
    if clit is None:
        return False
    return _all_in_range(lo, hi, op, clit)


def _all_in_range(lo: Any, hi: Any, op: str, lit: Any) -> bool:
    try:
        if op in ("=", "=="):
            return lo == lit == hi
        if op == "<":
            return hi < lit
        if op == "<=":
            return hi <= lit
        if op == ">":
            return lo > lit
        if op == ">=":
            return lo >= lit
    except (TypeError, InvalidOperation):
        return False
    return False


def split_files_by_predicate(
    files: Iterable[FileEntry],
    conjuncts: list[tuple[str, str, Any]],
    schema: T.StructType | None = None,
) -> "tuple[list[FileEntry], list[FileEntry]]":
    """Three-way file classification against a conjunction, returned as
    ``(inside, straddling)``: *inside* files provably contain ONLY matching
    rows (metadata alone can answer aggregates over them), *straddling*
    files may contain a mix and must be scanned, and provably-disjoint
    files are dropped (the prune_files rule). The partition of work behind
    metadata-only aggregation: at 10^12 rows a partition-aligned predicate
    makes every file 'inside' and the query touches zero data bytes."""
    for col, op, _ in conjuncts:
        if op not in _OPS:
            raise ValueError(f"unsupported pruning op: {op}")
    types: dict[str, T.DataType] = (
        {fld.name: fld.dataType for fld in schema.fields} if schema is not None else {}
    )
    inside: list[FileEntry] = []
    straddling: list[FileEntry] = []
    for f in files:
        if not all(_may_match(f, c, op, lit, types.get(c)) for (c, op, lit) in conjuncts):
            continue
        if all(_must_match(f, c, op, lit, types.get(c)) for (c, op, lit) in conjuncts):
            inside.append(f)
        else:
            straddling.append(f)
    return inside, straddling

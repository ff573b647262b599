"""Row-level DML: ``DELETE FROM ... WHERE`` and ``UPDATE ... SET ... WHERE``
as copy-on-write maintenance transactions.

The reference has no row-level mutation (its only "delete" is the DLQ side
output); a lakehouse of training sequences needs both — takedown requests
and label fixes are per-row operations over petabyte tables. Same scale
shape as MERGE (maintenance/merge.py):

  1. **Touched-file pruning from the manifest**: the predicate is a list of
     ``(col, op, literal)`` conjuncts — the same shape the scan planner
     pushes — evaluated against per-file min/max stats (plans/pruning.py).
     Only files that MAY contain a matching row are read; on a Z-ordered
     table a selective predicate touches a handful of files out of
     millions, and the decision is metadata-only (no data scan).
  2. Touched files are rewritten in one distributed pass — deletes keep the
     complement, updates rewrite matched rows via ``CASE WHEN`` column
     expressions (pure Catalyst, whole-stage codegen; no per-row Python).
  3. One atomic replace commit: Add(rewritten) + Remove(touched). Untouched
     files never move. ``data_change=True`` — row counts may change, so the
     pure-rewrite row-conservation guard does not apply; instead each op
     returns exact before/after row accounting from the manifests.

Snapshot isolation is inherited from the commit protocol: readers pinned
at the pre-DML version still scan the removed files until expiry + GC.
"""

from __future__ import annotations

import time
from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_delta_ingest_spark.plans.pruning import prune_files
from kafka_delta_ingest_spark.table.format import Table, Transaction
from kafka_delta_ingest_spark.table.scan import read_files
from kafka_delta_ingest_spark.table.writer import stage_dataframe

Conjunct = tuple[str, str, Any]


def predicate_column(conjuncts: list[Conjunct]) -> Column:
    """AND of simple conjuncts as a Catalyst Column (same ops the manifest
    pruner understands, so the data filter and the file filter agree)."""
    if not conjuncts:
        raise ValueError("empty predicate — refusing full-table DML")
    out = None
    for col, op, lit in conjuncts:
        c = F.col(col)
        if op in ("=", "=="):
            e = c == F.lit(lit)
        elif op == "<":
            e = c < F.lit(lit)
        elif op == "<=":
            e = c <= F.lit(lit)
        elif op == ">":
            e = c > F.lit(lit)
        elif op == ">=":
            e = c >= F.lit(lit)
        elif op == "in":
            e = c.isin(*list(lit))
        else:
            raise ValueError(f"unsupported DML predicate op: {op}")
        out = e if out is None else (out & e)
    return out


def _rewrite_touched(
    spark: SparkSession,
    table: Table,
    conjuncts: list[Conjunct],
    transform,
    operation: str,
) -> dict:
    t0 = time.time()
    snap = table.snapshot()
    touched = prune_files(snap.files, conjuncts, snap.schema)
    metrics = {
        "operation": operation,
        "files_total": len(snap.files),
        "files_touched": len(touched),
        "rows_before": snap.num_records(),
    }
    if not touched:
        metrics.update(rows_after=snap.num_records(), version=snap.version,
                       duration_s=time.time() - t0)
        return metrics
    paths = [f"{table.root}/{fe.path}" for fe in touched]
    df = read_files(spark, paths, snap.schema, snap.partition_cols)
    out = transform(df, predicate_column(conjuncts))
    _, adds = stage_dataframe(spark, table, out, snap.partition_cols, snap.schema)
    v = table.commit(
        Transaction(
            operation=operation,
            adds=adds,
            removes=[fe.path for fe in touched],
            data_change=True,
            metadata={"predicate": [list(c) for c in conjuncts]},
        )
    )
    after = table.snapshot(v)
    metrics.update(
        files_written=len(adds),
        rows_after=after.num_records(),
        version=v,
        duration_s=time.time() - t0,
    )
    return metrics


def delete_where(
    spark: SparkSession, table: Table, conjuncts: list[Conjunct]
) -> dict:
    """``DELETE FROM table WHERE <AND of conjuncts>`` — copy-on-write.

    Returns metrics incl. exact rows_before/rows_after from the manifests
    (``rows_deleted`` = difference). Rewritten file sizing follows the
    input split sizing; run compaction after mass deletes to restore
    target file sizes."""
    m = _rewrite_touched(
        spark, table, conjuncts,
        lambda df, pred: df.where(~pred),
        "delete",
    )
    m["rows_deleted"] = m["rows_before"] - m["rows_after"]
    return m


def update_where(
    spark: SparkSession,
    table: Table,
    conjuncts: list[Conjunct],
    set_exprs: dict[str, "Column | str"],
) -> dict:
    """``UPDATE table SET col=expr, ... WHERE <AND of conjuncts>`` —
    copy-on-write. ``set_exprs`` values are Columns or SQL expression
    strings over the pre-update row. Partition columns cannot be updated
    (that is a repartition-the-row move — use MERGE delete+insert).
    Row count is conserved (asserted via manifests)."""
    snap_cols = set(table.snapshot().partition_cols)
    bad = sorted(set(set_exprs) & snap_cols)
    if bad:
        raise ValueError(f"cannot UPDATE partition columns: {bad}")

    def _apply(df: DataFrame, pred: Column) -> DataFrame:
        out = df
        # evaluate all SET right-hand sides against the PRE-update row:
        # stage into temp columns first, then swap (SQL UPDATE semantics —
        # sequential withColumn would let one SET see another's result)
        tmp = {}
        for i, (col, expr) in enumerate(set_exprs.items()):
            e = F.expr(expr) if isinstance(expr, str) else expr
            name = f"_set_{i}"
            tmp[col] = name
            out = out.withColumn(name, F.when(pred, e).otherwise(F.col(col)))
        for col, name in tmp.items():
            out = out.withColumn(col, F.col(name)).drop(name)
        return out.select(*[f.name for f in df.schema.fields])

    m = _rewrite_touched(spark, table, conjuncts, _apply, "update")
    if m["rows_after"] != m["rows_before"]:
        raise AssertionError(
            f"UPDATE changed row count: {m['rows_before']} -> {m['rows_after']}"
        )
    return m

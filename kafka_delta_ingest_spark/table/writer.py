"""Write path: stage a DataFrame into the table's data dir and build Add
entries. The analogue of DataWriter::write + write_parquet_files
(/root/reference/src/writer.rs:389-481), with Spark doing the
divide-by-partition-values in the shuffle (src/writer.rs:544-574) and the
commit made visible only by the log entry (no renames)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_delta_ingest_spark.table.format import FileEntry, Table, Transaction
from kafka_delta_ingest_spark.table.stats import compute_add_entries


def _enforce_schema(df: DataFrame, schema) -> DataFrame:
    """Schema-on-write enforcement: project + cast to the table schema,
    failing fast on missing columns (ref record_batch_from_json schema
    mismatch error, src/writer.rs:203-208)."""
    cols = []
    have = dict((f.name, f) for f in df.schema.fields)
    for f in schema.fields:
        if f.name not in have:
            raise ValueError(f"missing column for table schema: {f.name}")
        cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
    return df.select(*cols)


def stage_dataframe(
    spark: SparkSession,
    table: Table,
    df: DataFrame,
    partition_cols: list[str],
    schema,
) -> tuple[str, list[FileEntry]]:
    """Write ``df`` to a fresh per-commit data dir; return (dir, adds).

    ``partition_cols`` is the partition SPEC: identity column names
    and/or transforms (``bucket(16,doc_id)`` — table/transforms.py).
    Transform values are computed here (pure Catalyst exprs) and become
    path-only columns via partitionBy; identity columns behave as
    before."""
    from kafka_delta_ingest_spark.table import transforms

    absd, _rel = table.new_data_dir()
    out = _enforce_schema(df, schema)
    pkeys = transforms.keys(partition_cols)
    for k, expr in transforms.derived_exprs(partition_cols, schema).items():
        out = out.withColumn(k, expr)
    w = out.write.mode("overwrite")
    if pkeys:
        w = w.partitionBy(*pkeys)
    w.parquet(absd)
    adds = compute_add_entries(spark, table.root, absd, schema, pkeys)
    return absd, adds


def write_dataframe(
    spark: SparkSession,
    table: Table,
    df: DataFrame,
    operation: str = "append",
    removes: list[str] | None = None,
    app_txns: dict[str, int] | None = None,
    data_change: bool = True,
) -> int:
    """Stage + commit in one step (the DataWriter::insert_all analogue,
    src/writer.rs:578-600). Returns the committed version."""
    snap = table.snapshot()
    _, adds = stage_dataframe(spark, table, df, snap.partition_cols, snap.schema)
    txn = Transaction(
        operation=operation,
        adds=adds,
        removes=removes or [],
        app_txns=app_txns or {},
        data_change=data_change,
    )
    return table.commit(txn, expected_schema=snap.schema)

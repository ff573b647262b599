"""Structured Streaming SOURCE over the table format (Python Data Source).

The reference consumes Kafka with stored offsets so a restarted worker
resumes exactly where it left off (src/lib.rs:1026-1046, offset seek
src/offsets.rs:35-101). This module is the same contract pointed the
other way: downstream training pipelines consume THIS engine's tables as
a stream, with **table versions as the offsets**. A micro-batch is the
append-only delta ``(start_version, end_version]`` — exactly
``table/inspect.py incremental_scan`` promoted to a real
`spark.readStream` source via PySpark 4's Python Data Source API:

- ``latestOffset`` = the table's current version (one listdir on the
  driver — no data touched at planning time);
- ``partitions(start, end)`` = one :class:`InputPartition` per data file
  appended by a data-changing commit in the range. Maintenance rewrites
  (compaction / Z-order / OPTIMIZE, ``data_change=False``) are invisible
  to consumers, matching the incremental-scan contract. Row-level DML in
  the range (removes, MOR position/equality deletes) fails the batch
  loudly — an append-only stream cannot express it (consumers needing
  DML use ``pipelines/incremental.py refresh_aggregate_cdc``);
- ``read(partition)`` runs on executors and yields **Arrow RecordBatches**
  straight off the parquet file (pyarrow, zero per-row Python), with
  identity partition columns reconstructed from the manifest's recorded
  ``partition_values`` (each file carries its own key set, so
  spec-evolved mixed-spec tables stream correctly) and a
  ``_commit_version`` column appended so consumers can build their own
  exactly-once ledgers keyed by source version — the engine's
  app-txn pattern (pipelines/incremental.py) made available to ANY
  downstream sink.

Offsets are checkpointed by Structured Streaming itself: a restarted
query resumes from the checkpoint, not ``initialOffset`` — the streaming
runtime plays the role the reference's Delta ``txn`` actions play for
its Kafka consumer (src/delta_helpers.rs:29-40).

Scale: planning is O(commits in range) driver metadata; each file is one
task, so a 1000-executor cluster drains a burst of appends at full fan-
out; no shuffle anywhere on the read path.

Usage::

    spark.dataSource.register(TableAppendsDataSource)
    df = (spark.readStream.format("kdi-table-appends")
          .option("path", table_root)
          .option("startingVersion", "earliest")   # or "latest" / "<int>"
          .load())
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

from kafka_delta_ingest_spark.table.format import HIVE_DEFAULT_PARTITION, Table
from kafka_delta_ingest_spark.table.inspect import IncrementalScanError

VERSION_COL = "_commit_version"


@dataclass
class AppendFilePartition(InputPartition):
    """One appended data file = one Spark task."""

    path: str  # absolute
    version: int
    partition_values: dict[str, str] = field(default_factory=dict)


def _typed_py(v: str | None, dt: T.DataType):
    """Manifest partition values are stringified scalars (ref
    src/writer.rs:1094-1124); convert to the Python value pyarrow can
    place into a typed constant column."""
    if v is None or v == HIVE_DEFAULT_PARTITION or v == "":
        return None
    if isinstance(dt, (T.IntegerType, T.LongType, T.ShortType, T.ByteType)):
        return int(v)
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return float(v)
    if isinstance(dt, T.BooleanType):
        return v == "true"
    return v  # strings (and ISO timestamps/dates, cast by arrow below)


class TableAppendsStreamReader(DataSourceStreamReader):
    def __init__(self, root: str, schema: T.StructType):
        self.root = root
        self.schema = schema  # includes VERSION_COL (appended last)
        self.starting = "latest"

    # ---- driver-side planning -------------------------------------
    def initialOffset(self) -> dict:
        if self.starting == "latest":
            return {"version": Table(self.root).latest_version()}
        if self.starting == "earliest":
            return {"version": -1}  # include the create commit's adds
        return {"version": int(self.starting)}

    def latestOffset(self) -> dict:
        return {"version": Table(self.root).latest_version()}

    def partitions(self, start: dict, end: dict):
        t = Table(self.root)
        out: list[AppendFilePartition] = []
        for v in range(int(start["version"]) + 1, int(end["version"]) + 1):
            c = t._read_commit(v)
            if not c.get("data_change", True):
                continue  # pure rewrite: no content delta
            if c.get("remove") or c.get("add_delete"):
                raise IncrementalScanError(
                    f"version {v} ({c.get('operation')}) is not an "
                    "append-only delta (removes or row-level deletes); "
                    "an appends stream cannot express DML — use the CDC "
                    "refresh pipeline instead"
                )
            for a in c.get("add", []):
                p = os.path.join(t.root, a["path"])
                if not os.path.exists(p):
                    raise IncrementalScanError(
                        f"appended file {a['path']} (v{v}) already "
                        "garbage-collected — raise the retain window or "
                        "start from a later version"
                    )
                out.append(
                    AppendFilePartition(
                        path=p,
                        version=v,
                        partition_values=dict(a.get("partition_values", {})),
                    )
                )
        return out

    def commit(self, end: dict) -> None:  # offsets live in the checkpoint
        pass

    # ---- executor-side read ---------------------------------------
    def read(self, partition: AppendFilePartition):
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        target = to_arrow_schema(self.schema)
        tbl = pq.read_table(partition.path)
        n = tbl.num_rows
        arrays = []
        for f in self.schema.fields:
            at = target.field(f.name).type
            if f.name == VERSION_COL:
                arrays.append(pa.array([partition.version] * n, type=at))
            elif f.name in tbl.column_names:
                col = tbl[f.name].combine_chunks()
                arrays.append(col if col.type == at else col.cast(at))
            else:
                # identity partition column: constant from the manifest's
                # recorded (unescaped) partition_values; absent key = the
                # pre-evolution spec didn't have it -> NULL-filled, the
                # same rule the batch scan applies
                v = _typed_py(
                    partition.partition_values.get(f.name), f.dataType
                )
                if v is None:
                    arrays.append(pa.nulls(n, type=at))
                else:
                    arrays.append(pa.array([v] * n).cast(at))
        yield from pa.Table.from_arrays(arrays, schema=target).to_batches()


class TableAppendsDataSource(DataSource):
    """``spark.readStream.format("kdi-table-appends")`` — see module doc."""

    @classmethod
    def name(cls) -> str:
        return "kdi-table-appends"

    def schema(self) -> T.StructType:
        root = self.options.get("path")
        if not root:
            raise ValueError("kdi-table-appends requires .option('path', ...)")
        snap = Table(root).snapshot()
        return T.StructType(
            list(snap.schema.fields)
            + [T.StructField(VERSION_COL, T.LongType(), False)]
        )

    def streamReader(self, schema: T.StructType) -> TableAppendsStreamReader:
        r = TableAppendsStreamReader(
            os.path.abspath(self.options["path"]), schema
        )
        r.starting = str(
            self.options.get("startingversion")
            or self.options.get("startingVersion")
            or "latest"
        ).lower()
        return r

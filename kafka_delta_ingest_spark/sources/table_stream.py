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
import uuid
from dataclasses import dataclass, field

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamArrowWriter,
    DataSourceStreamReader,
    InputPartition,
    WriterCommitMessage,
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
        # admission control: at most this many table versions per
        # micro-batch (None = unbounded). The Kafka-source maxOffsets
        # PerTrigger analogue — a consumer started against a year-old
        # table must drain the backlog in bounded transactions, not one
        # giant batch. Enforced by capping latestOffset (capping inside
        # partitions() would mark versions consumed without reading
        # them). The cap base is the last planned end when one exists;
        # before any batch has planned (fresh start OR checkpoint
        # restart — Spark calls latestOffset BEFORE initialOffset,
        # traced), a monotone probe advances by `cap` per trigger tick
        # from the starting-option base until it crosses the consumer's
        # real position, so a restarted stream can never stall behind a
        # stale base and every planned batch spans <= cap versions.
        self.max_versions_per_trigger: int | None = None
        self._last_end: int | None = None
        self._probe: int | None = None

    # ---- driver-side planning -------------------------------------
    def _starting_base(self) -> int:
        if self.starting == "latest":
            return Table(self.root).latest_version()
        if self.starting == "earliest":
            return -1  # include the create commit's adds
        return int(self.starting)

    def initialOffset(self) -> dict:
        return {"version": self._starting_base()}

    def latestOffset(self) -> dict:
        latest = Table(self.root).latest_version()
        cap = self.max_versions_per_trigger
        if cap:
            if self._last_end is not None:
                base = self._last_end  # authoritative: last planned end
            elif self._probe is not None:
                base = self._probe  # hunting toward the consumer position
            else:
                base = self._starting_base()
            capped = min(latest, base + cap)
            self._probe = capped
            return {"version": capped}
        return {"version": latest}

    def partitions(self, start: dict, end: dict):
        self._last_end = int(end["version"])
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


# --------------------------------------------------------------- sink

# Spark's ExternalCatalogUtils.escapePathName special set — the inverse
# of table/stats.py _unescape_hive, so recorded partition_values stay
# LOGICAL values whichever write path produced the file
_HIVE_SPECIALS = set('"#%\'*/:=?\\{[]^\x7f') | {chr(i) for i in range(32)}


def _escape_hive(v: str) -> str:
    return "".join(
        f"%{ord(c):02X}" if c in _HIVE_SPECIALS else c for c in v
    )


def _partition_str(v) -> str | None:
    """Render a partition value the way Spark's partitionBy renders it
    into the path (so path-reconstructing scans agree byte-for-byte)."""
    if v is None:
        return None
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


@dataclass
class StagedFilesMessage(WriterCommitMessage):
    rel_paths: list = field(default_factory=list)
    rows: int = 0


class TableStreamWriter(DataSourceStreamArrowWriter):
    """Streaming SINK: each micro-batch becomes ONE atomic table commit.

    This is the reference's buffer-then-atomic-commit loop (doc/
    DESIGN.md, src/lib.rs:931-1024) as a first-class ``writeStream``
    format instead of a foreachBatch closure: executors stage parquet
    files straight from Arrow batches (zero per-row Python, partition
    split + write.sort.order applied in Arrow compute), the driver
    assembles per-file min/max/null-count stats from the parquet FOOTERS
    it just wrote (the reference's own stats strategy, src/writer.rs:
    655-707) and commits adds + an app-txn ``{txnAppId: batchId}`` in
    one CAS. A crash-replayed micro-batch hits the refuse-to-regress
    txn guard (ConflictingOffsetsError, src/offsets.rs:60-99) and is
    dropped with its staged files — exactly-once without reading the
    table. Empty batches never commit (the reference's never-empty-
    commit rule).

    Constraints: table CHECK constraints (``constraint.*`` properties)
    are SQL expressions and cannot run on this sink's Spark-free
    executor path — the writer refuses such tables at planning time
    (use the foreachBatch ingest pipeline, which enforces them).
    Partition specs with hidden-partitioning transforms are likewise
    planning-time rejected (transform exprs are Catalyst-side).
    """

    def __init__(
        self,
        root: str,
        schema: T.StructType,
        pkeys: list[str],
        properties: dict,
        txn_app_id: str,
    ):
        from kafka_delta_ingest_spark.table.writer import sort_order

        self.root = root
        self.schema = schema
        self.pkeys = pkeys
        self.compression = str(
            properties.get("write.parquet.compression", "snappy")
        )
        self.order = sort_order(properties)
        self.txn_app_id = txn_app_id
        self.staging_rel = os.path.join("data", uuid.uuid4().hex)

    # ---- executor-side: stage one parquet file per (task, partition) --
    def write(self, iterator):
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        batches = [b for b in iterator if b.num_rows]
        if not batches:
            return StagedFilesMessage()
        tbl = pa.Table.from_batches(batches)
        groups: list[tuple[dict, "pa.Table"]] = []
        if self.pkeys:
            keys = tbl.group_by(self.pkeys).aggregate([]).to_pylist()
            for kv in keys:
                mask = None
                for k, v in kv.items():
                    m = (
                        pc.is_null(tbl[k])
                        if v is None
                        else pc.equal(tbl[k], pa.scalar(v, tbl[k].type))
                    )
                    mask = m if mask is None else pc.and_(mask, m)
                groups.append((kv, tbl.filter(mask).drop(self.pkeys)))
        else:
            groups.append(({}, tbl))
        rels, rows = [], 0
        for kv, sub in groups:
            if self.order:
                sub = sub.take(
                    pc.sort_indices(
                        sub,
                        sort_keys=[
                            (c, "ascending" if asc else "descending")
                            for c, asc in self.order
                        ],
                    )
                )
            segs = [
                f"{k}={_escape_hive(s) if (s := _partition_str(kv[k])) is not None else HIVE_DEFAULT_PARTITION}"
                for k in self.pkeys
            ]
            rel = os.path.join(
                self.staging_rel, *segs, f"part-{uuid.uuid4().hex}.parquet"
            )
            absp = os.path.join(self.root, rel)
            os.makedirs(os.path.dirname(absp), exist_ok=True)
            pq.write_table(sub, absp, compression=self.compression)
            rels.append(rel)
            rows += sub.num_rows
        return StagedFilesMessage(rel_paths=rels, rows=rows)

    # ---- driver-side: one atomic commit per micro-batch ---------------
    def _entries(self, rels: list[str]):
        from concurrent.futures import ThreadPoolExecutor

        from kafka_delta_ingest_spark.table.footer_stats import _one_file
        from kafka_delta_ingest_spark.table.stats import stat_leaves

        pset = set(self.pkeys)
        leaf_types = {
            n: (dt, mm)
            for (n, dt, mm) in stat_leaves(self.schema)
            if n.split(".", 1)[0] not in pset
        }
        with ThreadPoolExecutor(max_workers=min(32, len(rels))) as ex:
            out = list(
                ex.map(
                    lambda r: _one_file(
                        os.path.join(self.root, r),
                        self.root,
                        leaf_types,
                        self.pkeys,
                    ),
                    rels,
                )
            )
        out.sort(key=lambda e: e.path)
        return out

    def _drop_staged(self, rels: list[str]) -> None:
        for r in rels:
            try:
                os.remove(os.path.join(self.root, r))
            except OSError:
                pass

    def commit(self, messages, batchId: int) -> None:
        from kafka_delta_ingest_spark.table.format import (
            ConflictingOffsetsError,
            Transaction,
        )

        rels = [p for m in messages if m is not None for p in m.rel_paths]
        if not rels:
            return  # never commit an empty version (ref src/lib.rs:1127)
        t = Table(self.root)
        try:
            t.commit(
                Transaction(
                    operation="stream_append",
                    adds=self._entries(rels),
                    data_change=True,
                    app_txns={self.txn_app_id: int(batchId)},
                    metadata={
                        "batch_id": int(batchId),
                        "txn_app_id": self.txn_app_id,
                    },
                ),
                expected_schema=self.schema,
            )
        except ConflictingOffsetsError:
            # crash-replayed micro-batch: already committed once —
            # drop the duplicate staging (exactly-once)
            self._drop_staged(rels)

    def abort(self, messages, batchId: int) -> None:
        self._drop_staged(
            [p for m in messages if m is not None for p in m.rel_paths]
        )


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
        if snap.defaults:
            raise ValueError(
                "kdi-table-appends does not support tables with column "
                "defaults — the arrow reader would surface NULLs where "
                "the native scan applies them"
            )
        if snap.column_mapping or snap.dropped_physical:
            # the arrow reader selects parquet columns by logical name;
            # column-mapped tables need the native scan's physical aliasing
            raise ValueError(
                "kdi-table-appends does not support column-mapped tables "
                "(rename_column/drop_column applied)"
            )
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
        mv = self.options.get("maxversionspertrigger") or self.options.get(
            "maxVersionsPerTrigger"
        )
        if mv is not None:
            r.max_versions_per_trigger = max(1, int(mv))
        return r

    def streamWriter(self, schema: T.StructType, overwrite: bool):
        from kafka_delta_ingest_spark.table import transforms

        root = os.path.abspath(self.options["path"])
        if overwrite:
            raise ValueError("kdi-table-appends sink is append-only")
        snap = Table(root).snapshot()
        # planning-time schema enforcement: the stream's schema must BE
        # the table schema (coercion belongs upstream in the plan)
        want = [(f.name, f.dataType) for f in snap.schema.fields]
        got = [(f.name, f.dataType) for f in schema.fields]
        if want != got:
            raise ValueError(
                f"stream schema {got} != table schema {want} — align the "
                "plan before writeStream (select/cast in the query)"
            )
        if any(k in c for c in snap.partition_cols for k in "()"):
            raise ValueError(
                "hidden-partitioning transforms need Catalyst exprs; the "
                "arrow sink supports identity partition columns — use "
                "streaming ingest (foreachBatch) for transformed specs"
            )
        if any(k.startswith("constraint.") for k in snap.properties):
            raise ValueError(
                "table has CHECK constraints (SQL exprs) which the "
                "Spark-free arrow sink cannot enforce — use the "
                "foreachBatch ingest pipeline for constrained tables"
            )
        return TableStreamWriter(
            root,
            snap.schema,
            transforms.keys(snap.partition_cols),
            dict(snap.properties),
            str(
                self.options.get("txnappid")
                or self.options.get("txnAppId")
                or "kdi-stream-sink"
            ),
        )

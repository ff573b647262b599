"""Batch Python Data Source over the table format: ``spark.read.format(
"kdi-table")`` with manifest-driven file pruning via ``pushFilters``.

The engine's native read path is ``Table(root).snapshot().scan(spark)``
(table/format.py) — this module exposes the SAME pinned-snapshot,
delete-aware scan through Spark's standard reader API, so any tool that
only speaks ``spark.read.format(...).option(...).load()`` (SQL notebooks,
schedulers, third-party frameworks) consumes the table without importing
this package on the driver. PySpark 4's Python Data Source API supplies
the two hooks the table format maps onto exactly:

- **file pruning** via ``.option("where", "source = 'src1' AND n_tok
  >= 2")``: simple AND-ed comparisons become the engine's ``(col, op,
  literal)`` conjuncts and prune planned file tasks against manifest
  min/max + recorded partition values — including mapping through
  hidden-partitioning transforms (plans/pruning.py prune_files, the
  data-skipping analogue of the stats the reference writes per file,
  /root/reference/src/writer.rs:655-707). The same conjuncts are ALSO
  applied row-level in the Arrow read, so the option is semantically a
  WHERE clause. Pruning state lives in the load's OPTIONS — safe under
  any DataFrame/view reuse.
- ``pushFilters`` auto-pruning exists behind ``.option("pushdown",
  "true")`` — opt-in because Spark 4.1 caches the planned Python scan
  inside the relation object: after ONE filtered query over a shared
  DataFrame/temp view, the cached (pruned!) scan is REUSED by later
  differently-filtered queries, silently dropping rows (measured: a
  full COUNT(*) on a view returned the filtered count after a filtered
  query ran first). A pushdown-enabled load must therefore be used by
  exactly one query plan. The explicit ``where`` option is the
  recommended pruning path.
- ``partitions()`` (planning, driver): one :class:`InputPartition` per
  surviving data file — a 1000-executor cluster fans out file-per-task
  with zero shuffle. Each partition carries its own recorded
  ``partition_values`` (mixed-spec tables scan correctly) plus the
  merge-on-read delete files that cover it, planned from manifest
  metadata only (position deletes by covered path; equality deletes by
  the Iceberg sequence rule ``delete.seq > file.seq`` AND key-range
  intersection — DeleteEntry.applies_to).
- ``read(partition)`` (executors): pyarrow reads the parquet file and
  yields Arrow RecordBatches (zero per-row Python on uncovered files —
  at 10^12 rows that is almost every file). Covered files take the
  documented slow path: position deletes mask by in-file row index
  (identical to the ``_metadata.row_index`` anchor the Catalyst scan
  uses), equality deletes anti-join null-safe key tuples.

Time travel: ``.option("versionAsOf", N)`` pins any retained version.

Usage::

    spark.dataSource.register(KdiTableDataSource)
    df = (spark.read.format("kdi-table")
          .option("path", root)
          .option("where", "source = 'src1'")   # manifest file pruning
          .load())
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)

from kafka_delta_ingest_spark.sources.table_stream import _typed_py
from kafka_delta_ingest_spark.table.format import Table

_FILTER_OPS = {
    EqualTo: "=",
    GreaterThan: ">",
    GreaterThanOrEqual: ">=",
    LessThan: "<",
    LessThanOrEqual: "<=",
    In: "in",
}


@dataclass
class ScanFilePartition(InputPartition):
    """One live data file = one Spark task (plus its covering deletes)."""

    path: str  # absolute
    rel_path: str  # table-relative (position-delete join key)
    partition_values: dict[str, str] = field(default_factory=dict)
    # absolute paths of position-delete parquets covering this file
    pos_delete_paths: list = field(default_factory=list)
    # [(absolute path, [key col, ...])] equality deletes applicable to
    # this file (seq + key-range election already done at planning)
    eq_deletes: list = field(default_factory=list)
    # logical -> PHYSICAL parquet name for renamed columns (column
    # mapping, table/format.py) — the task reads physical, emits logical
    column_mapping: dict = field(default_factory=dict)
    # {logical col: python literal} initial defaults for columns this
    # file PREDATES (seq < added_seq, decided at planning) — emitted as
    # constant arrays, mirroring scan.py read_entries
    fill_defaults: dict = field(default_factory=dict)
    # manifest size (bytes) — split-packing weight only, not shipped
    # semantics
    size: int = 0


_SIZE_SUFFIX = {
    "b": 1, "k": 1 << 10, "kb": 1 << 10, "m": 1 << 20, "mb": 1 << 20,
    "g": 1 << 30, "gb": 1 << 30, "t": 1 << 40, "tb": 1 << 40,
}


def _parse_bytes(v, default: int) -> int:
    """Spark size-conf strings come back with unit suffixes
    ('134217728b', '128MB', '1m'); parse them, falling back on
    ``default``."""
    try:
        s = str(v).strip().lower()
        for suf in sorted(_SIZE_SUFFIX, key=len, reverse=True):
            if s.endswith(suf):
                return int(float(s[: -len(suf)]) * _SIZE_SUFFIX[suf])
        return int(s)
    except (TypeError, ValueError):
        return default


@dataclass
class ScanFileGroupPartition(InputPartition):
    """Several small files = one Spark task (guide §6: a Python
    datasource task has fixed worker/Arrow overhead, and one-task-per-
    file makes a fragmented table cost O(files) task launches; packing
    mirrors Spark's own file-split packing for native scans)."""

    files: list = field(default_factory=list)


def _pack_file_groups(
    parts: list[ScanFilePartition],
    target_bytes: int,
    open_cost: int,
) -> list[InputPartition]:
    """Greedy first-fit pack (size + per-file open cost) into splits of
    ``target_bytes`` — the same accounting Spark's FilePartition uses.
    Single-file groups stay bare ScanFilePartitions."""
    groups: list[list[ScanFilePartition]] = []
    acc: list[ScanFilePartition] = []
    acc_bytes = 0
    for p in sorted(parts, key=lambda x: -(x.size or 0)):
        w = (p.size or 0) + open_cost
        if acc and acc_bytes + w > target_bytes:
            groups.append(acc)
            acc, acc_bytes = [], 0
        acc.append(p)
        acc_bytes += w
    if acc:
        groups.append(acc)
    return [
        g[0] if len(g) == 1 else ScanFileGroupPartition(files=g)
        for g in groups
    ]


def to_conjuncts(filters: list[Filter]) -> list[tuple]:
    """Translate pushed-down Spark filters to engine pruning conjuncts.

    Only simple comparisons on top-level columns translate; everything
    else is ignored for pruning (and re-applied by Spark regardless)."""
    out: list[tuple] = []
    for f in filters:
        op = _FILTER_OPS.get(type(f))
        if op is None or len(f.attribute) != 1:
            continue
        v = list(f.value) if op == "in" else f.value
        out.append((f.attribute[0], op, v))
    return out


_LIT = r"('(?:[^']|'')*'|-?\d+(?:\.\d+)?)"
_WHERE_RE = re.compile(
    r"^\s*([A-Za-z_][A-Za-z0-9_]*)\s*(=|==|<=|>=|<|>)\s*" + _LIT + r"\s*$"
)
_IN_RE = re.compile(
    r"^\s*([A-Za-z_][A-Za-z0-9_]*)\s+IN\s*\(\s*" + _LIT
    + r"(?:\s*,\s*" + _LIT + r")*\s*\)\s*$",
    re.IGNORECASE,
)


def _lit_value(lit: str):
    if lit.startswith("'"):
        return lit[1:-1].replace("''", "'")
    if "." in lit:
        return float(lit)
    return int(lit)


def _split_and(where: str) -> list[str]:
    """Split on AND (any case) outside single-quoted literals — a quoted
    value containing ' AND ' must survive intact."""
    parts, buf, i, in_q = [], [], 0, False
    up = where.upper()
    while i < len(where):
        c = where[i]
        if c == "'":
            in_q = not in_q  # '' escape toggles twice: net unchanged
            buf.append(c)
            i += 1
        elif not in_q and up.startswith(" AND ", i):
            parts.append("".join(buf))
            buf = []
            i += 5
        else:
            buf.append(c)
            i += 1
    parts.append("".join(buf))
    return parts


def parse_where(where: str) -> list[tuple]:
    """Parse the ``where`` option: simple comparisons joined by AND.

    ``col op literal`` with op in = == < <= > >= IN, literal a
    single-quoted string ('' escapes a quote) or a number,
    ``col IN (a, b, ...)`` for membership. Anything fancier belongs in a
    normal ``.where()`` after load (row-level only, no file pruning)."""
    out: list[tuple] = []
    for part in _split_and(where):
        m = _WHERE_RE.match(part)
        if m:
            col, op, lit = m.groups()
            out.append((col, "=" if op == "==" else op, _lit_value(lit)))
            continue
        m = _IN_RE.match(part)
        if m:
            col = m.group(1)
            body = part[part.index("(") + 1 : part.rindex(")")]
            vals = [
                _lit_value(v.strip())
                for v in re.findall(_LIT, body)
            ]
            out.append((col, "in", vals))
            continue
        raise ValueError(
            f"kdi-table where option: cannot parse {part!r} "
            "(use: col op literal / col IN (...), AND-joined)"
        )
    return out


class KdiTableBatchReader(DataSourceReader):
    """Default reader: pruning only from the explicit ``where`` option —
    stateless under plan/view reuse (the conjuncts are part of the
    load's identity, never mutated by the optimizer)."""

    def __init__(
        self,
        root: str,
        schema: T.StructType,
        version: int | None,
        conjuncts: list[tuple] | None = None,
    ):
        self.root = root
        self.schema = schema
        self.version = version
        self.conjuncts: list[tuple] = list(conjuncts or [])

    # ---- driver-side planning -------------------------------------
    def partitions(self):
        from kafka_delta_ingest_spark.plans.pruning import prune_files

        snap = Table(self.root).snapshot(self.version)
        kept = snap.files
        if self.conjuncts:
            kept = prune_files(
                kept, self.conjuncts, snap.schema, spec=snap.partition_cols
            )
        pos = [de for de in snap.delete_entries if de.kind == "position"]
        eq = [de for de in snap.delete_entries if de.kind == "equality"]
        out = []
        for fe in kept:
            fseq = fe.seq if fe.seq is not None else 0
            out.append(
                ScanFilePartition(
                    path=os.path.join(self.root, fe.path),
                    rel_path=fe.path,
                    partition_values=dict(fe.partition_values),
                    pos_delete_paths=[
                        os.path.join(self.root, de.path)
                        for de in pos
                        if fe.path in de.counts
                    ],
                    eq_deletes=[
                        (os.path.join(self.root, de.path), list(de.equality_ids))
                        for de in eq
                        if de.applies_to(fe)
                    ],
                    column_mapping=dict(snap.column_mapping),
                    fill_defaults={
                        c: d["value"]
                        for c, d in snap.defaults.items()
                        if fseq < d["added_seq"]
                    },
                    size=int(fe.size or 0),
                )
            )
        if not out:
            # Spark requires >= 1 partition; emit one empty marker task
            out.append(ScanFilePartition(path="", rel_path=""))
            return out
        # split-pack small files (one python-worker task per FILE made a
        # fragmented table cost O(files) task launches); split size from
        # the session's scan knobs, floored so the pack never drops the
        # scan below ~2 tasks/core on small-but-wide tables
        target, open_cost, par = 128 * 1024 * 1024, 1024 * 1024, 32
        try:
            from pyspark.sql import SparkSession

            s = SparkSession.getActiveSession()
            if s is not None:
                target = _parse_bytes(
                    s.conf.get("spark.sql.files.maxPartitionBytes"), target
                )
                open_cost = _parse_bytes(
                    s.conf.get("spark.sql.files.openCostInBytes"), open_cost
                )
                par = s.sparkContext.defaultParallelism
        except Exception:  # noqa: BLE001 — planning must not die on conf
            pass
        total = sum((p.size or 0) + open_cost for p in out)
        target = max(open_cost, min(target, total // max(2 * par, 1) or 1))
        return _pack_file_groups(out, target, open_cost)

    # ---- executor-side read ---------------------------------------
    def read(self, partition):
        if isinstance(partition, ScanFileGroupPartition):
            for fp in partition.files:
                yield from self._read_file(fp)
            return
        yield from self._read_file(partition)

    def _read_file(self, partition: ScanFilePartition):
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        target = to_arrow_schema(self.schema)
        if not partition.path:
            yield from pa.Table.from_arrays(
                [pa.array([], type=f.type) for f in target], schema=target
            ).to_batches()
            return
        tbl = pq.read_table(partition.path)

        # merge-on-read position deletes: mask by in-file row index (the
        # same anchor the Catalyst path's _metadata.row_index uses)
        dead_pos: set[int] = set()
        for dp in partition.pos_delete_paths:
            dt = pq.read_table(dp, columns=["data_path", "pos"])
            m = pc.equal(dt["data_path"], pa.scalar(partition.rel_path))
            dead_pos.update(dt.filter(m)["pos"].to_pylist())
        if dead_pos:
            keep = [i for i in range(tbl.num_rows) if i not in dead_pos]
            tbl = tbl.take(pa.array(keep, type=pa.int64()))

        # full logical rows BEFORE equality deletes: identity partition
        # columns reconstructed from the manifest's recorded values (same
        # rule as the streaming source; absent key = pre-evolution spec
        # -> NULL) — equality-delete keys may BE partition columns, which
        # the staged parquet doesn't carry
        n = tbl.num_rows
        arrays = []
        for f in self.schema.fields:
            at = target.field(f.name).type
            # physical parquet name under column mapping (renames are
            # metadata-only; pages keep the original name)
            phys = partition.column_mapping.get(f.name, f.name)
            if f.name in partition.fill_defaults:
                # initial default: this file predates the column
                arrays.append(
                    pa.array([partition.fill_defaults[f.name]] * n).cast(at)
                )
            elif phys in tbl.column_names:
                col = tbl[phys].combine_chunks()
                arrays.append(col if col.type == at else col.cast(at))
            else:
                v = _typed_py(partition.partition_values.get(f.name), f.dataType)
                if v is None:
                    arrays.append(pa.nulls(n, type=at))
                else:
                    arrays.append(pa.array([v] * n).cast(at))
        out = pa.Table.from_arrays(arrays, schema=target)

        # equality deletes: null-safe anti-join on the key tuple (tuples
        # of Python values — None == None, matching the scan semantics);
        # the mask is explicitly boolean-typed (an untyped pa.array of an
        # empty list is null-typed and filter() rejects it)
        for dp, key_cols in partition.eq_deletes:
            kt = pq.read_table(dp, columns=key_cols)
            dead_keys = set(zip(*(kt[c].to_pylist() for c in key_cols)))
            if not dead_keys:
                continue
            rows = zip(*(out[c].to_pylist() for c in key_cols))
            mask = pa.array(
                [k not in dead_keys for k in rows], type=pa.bool_()
            )
            out = out.filter(mask)
        # the where-option conjuncts are a real WHERE: applied row-level
        # here (Arrow compute), so option-pruned loads return exactly the
        # matching rows, not whole surviving files
        for col, op, lit in self.conjuncts:
            f = pc.field(col)
            cond = {
                "=": f == lit, "<": f < lit, "<=": f <= lit,
                ">": f > lit, ">=": f >= lit,
            }.get(op)
            if cond is None and op == "in":
                cond = pc.field(col).isin(lit)
            out = out.filter(cond)
        yield from out.to_batches()


class KdiTablePruningReader(KdiTableBatchReader):
    """Opt-in ``pushFilters`` auto-pruning (``.option("pushdown",
    "true")``): correct ONLY for a single-use load — see module doc for
    the Spark 4.1 cached-scan hazard under DataFrame/view reuse."""

    def pushFilters(self, filters: list[Filter]):
        self.conjuncts = self.conjuncts + to_conjuncts(filters)
        # yield every filter back: this reader prunes files only, Spark
        # keeps row-level responsibility for pushed filters
        yield from filters


def register(spark) -> None:
    """Register the format and enable Python-datasource filter pushdown
    (a dynamic SQL conf, off by default in Spark 4.1). Re-registering is
    a silent replace in Spark 4.1 (probed), so no exception handling —
    a real registration failure must surface here, not as a later
    DATA_SOURCE_NOT_FOUND far from the cause."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(KdiTableDataSource)


class KdiTableDataSource(DataSource):
    """``spark.read.format("kdi-table")`` — see module doc."""

    def __init__(self, options):
        super().__init__(options)
        # Catalyst canonicalizes Python-datasource relations by their
        # pickled bytes: two load()s with IDENTICAL options collapse into
        # ONE scan, and a filter pushed by one branch of a union/self-join
        # then FILE-PRUNES the sibling branch's rows too (measured: the
        # unfiltered side of a union lost every pruned file's rows). A
        # per-instance nonce makes each load() its own scan, so pushdown
        # can never leak across plan branches. Costs nothing at scale —
        # scan reuse across branches was never load-bearing for a
        # file-per-task source.
        import uuid

        self._scan_nonce = uuid.uuid4().hex

    @classmethod
    def name(cls) -> str:
        return "kdi-table"

    def _version(self) -> int | None:
        v = self.options.get("versionasof") or self.options.get("versionAsOf")
        return None if v is None else int(v)

    def schema(self) -> T.StructType:
        root = self.options.get("path")
        if not root:
            raise ValueError("kdi-table requires .option('path', ...)")
        # column mapping and initial defaults are applied per task (the
        # planner threads them through ScanFilePartition), so mapped and
        # defaulted tables read correctly here
        return Table(root).snapshot(self._version()).schema

    def writer(self, schema: T.StructType, overwrite: bool):
        from kafka_delta_ingest_spark.table import transforms

        root = os.path.abspath(self.options["path"])
        snap = Table(root).snapshot()
        if snap.column_mapping or snap.dropped_physical:
            # the arrow writer emits parquet under the frame's column
            # names; a mapped table needs logical→physical renaming
            # (table/writer.py to_physical) — use write_dataframe
            raise ValueError(
                "kdi-table write does not support column-mapped tables "
                "— use table/writer.py write_dataframe"
            )
        want = [(f.name, f.dataType) for f in snap.schema.fields]
        got = [(f.name, f.dataType) for f in schema.fields]
        if want != got:
            raise ValueError(
                f"write schema {got} != table schema {want} — align the "
                "plan before write (select/cast)"
            )
        if any(k in c for c in snap.partition_cols for k in "()"):
            raise ValueError(
                "hidden-partitioning transforms need Catalyst exprs; the "
                "arrow writer supports identity partition columns — use "
                "table/writer.py write_dataframe for transformed specs"
            )
        if any(k.startswith("constraint.") for k in snap.properties):
            raise ValueError(
                "table has CHECK constraints (SQL exprs) which the "
                "Spark-free arrow writer cannot enforce — use "
                "table/writer.py write_dataframe for constrained tables"
            )
        return KdiTableBatchWriter(
            root,
            snap.schema,
            transforms.keys(snap.partition_cols),
            dict(snap.properties),
            overwrite,
        )

    def reader(self, schema: T.StructType) -> KdiTableBatchReader:
        conj = None
        w = self.options.get("where")
        if w:
            conj = parse_where(w)
        cls = (
            KdiTablePruningReader
            if str(self.options.get("pushdown", "false")).lower() == "true"
            else KdiTableBatchReader
        )
        return cls(
            os.path.abspath(self.options["path"]), schema, self._version(),
            conjuncts=conj,
        )


class KdiTableBatchWriter(DataSourceArrowWriter):
    """Batch WRITE half of the format: ``df.write.format("kdi-table")
    .option("path", root).mode("append" | "overwrite").save()``.

    Executors stage parquet straight from Arrow batches (the streaming
    sink's staging path reused verbatim — identity-partition split,
    write.sort.order, table codec, all in Arrow compute, zero per-row
    Python); the driver assembles per-file stats from the footers it
    just wrote and lands ONE atomic CAS commit: ``append`` adds the
    staged files, ``overwrite`` adds them and removes every live file of
    the head snapshot in the same commit (INSERT OVERWRITE; concurrent
    writers serialize through the CAS + conflict validation). A failed
    or speculatively-duplicated task's staging is dropped by abort() —
    nothing becomes visible except through the commit."""

    def __init__(self, root, schema, pkeys, properties, overwrite: bool):
        from kafka_delta_ingest_spark.sources.table_stream import (
            TableStreamWriter,
        )

        self._w = TableStreamWriter(
            root, schema, pkeys, properties, txn_app_id="kdi-batch-write"
        )
        self._overwrite = overwrite

    def write(self, iterator):
        return self._w.write(iterator)

    def commit(self, messages):
        from kafka_delta_ingest_spark.table.format import Transaction

        rels = [p for m in messages if m is not None for p in m.rel_paths]
        t = Table(self._w.root)
        removes = (
            t.snapshot().file_paths(absolute=False) if self._overwrite else []
        )
        if not rels and not removes:
            # never commit an empty version (append of nothing / overwrite
            # of an already-empty table); an empty-input OVERWRITE of a
            # non-empty table DOES commit — it is a truncate
            return
        t.commit(
            Transaction(
                operation="overwrite" if self._overwrite else "append",
                adds=self._w._entries(rels) if rels else [],
                removes=removes,
                data_change=True,
            ),
            expected_schema=self._w.schema,
        )

    def abort(self, messages):
        self._w._drop_staged(
            [p for m in messages if m is not None for p in m.rel_paths]
        )

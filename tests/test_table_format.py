"""Table format core: create / append / replace / CAS conflicts / time
travel / checkpoints / txn-offset guards — the commit semantics of
/root/reference/src/lib.rs:931-1024 and src/offsets.rs:35-157."""

import json
import os

import pytest
from pyspark.sql import functions as F

from kafka_delta_ingest_spark.datagen import TOKENS_SCHEMA, make_small_file_table, tokens_df
from kafka_delta_ingest_spark.table.format import (
    CHECKPOINT_INTERVAL,
    ConcurrentDeleteError,
    ConflictingOffsetsError,
    FileEntry,
    Table,
    Transaction,
)
from kafka_delta_ingest_spark.table.writer import stage_dataframe, write_dataframe


def test_create_and_empty_snapshot(tmp_table_root):
    t = Table.create(tmp_table_root, TOKENS_SCHEMA, ["source"])
    snap = t.snapshot()
    assert snap.version == 0
    assert snap.files == []
    assert snap.partition_cols == ["source"]
    assert [f.name for f in snap.schema.fields] == ["doc_id", "tokens", "n_tok", "source"]


def test_append_and_scan(spark, tmp_table_root):
    t = Table.create(tmp_table_root, TOKENS_SCHEMA, ["source"])
    df = tokens_df(spark, 500, max_tok=32)
    v = write_dataframe(spark, t, df)
    assert v == 1
    snap = t.snapshot()
    assert snap.num_records() == 500
    got = snap.scan(spark)
    assert got.count() == 500
    # partition columns recovered, token arrays intact
    row = got.filter(F.col("doc_id") == "doc-000000000007").collect()[0]
    exp = df.filter(F.col("doc_id") == "doc-000000000007").collect()[0]
    assert row["tokens"] == exp["tokens"]
    assert row["source"] == exp["source"]


def test_add_entries_have_reference_stat_shape(spark, tmp_table_root):
    """Stats rules: min/max for scalars, null-count-only for arrays,
    partition cols excluded (ref src/writer.rs:655-786)."""
    t = Table.create(tmp_table_root, TOKENS_SCHEMA, ["source"])
    write_dataframe(spark, t, tokens_df(spark, 300, max_tok=64))
    snap = t.snapshot()
    assert len(snap.files) > 0
    for fe in snap.files:
        assert "source" in fe.partition_values
        s = fe.stats
        assert "tokens" not in s["min"] and "tokens" not in s["max"]
        assert s["null_count"]["tokens"] == 0
        assert "source" not in s["min"]  # partition col excluded
        assert isinstance(s["min"]["n_tok"], int)
        assert 1 <= s["min"]["n_tok"] <= s["max"]["n_tok"] <= 64
        assert s["min"]["doc_id"].startswith("doc-")
        assert fe.num_records > 0 and fe.size > 0


def test_replace_commit_and_snapshot_isolation(spark, tmp_table_root):
    t = make_small_file_table(spark, tmp_table_root, n_docs=400, n_files=8)
    snap1 = t.snapshot()
    old_paths = snap1.file_paths(absolute=False)
    # rewrite everything into one commit dir
    df = snap1.scan(spark)
    _, adds = stage_dataframe(spark, t, df.repartition(2), ["source"], snap1.schema)
    v = t.commit(
        Transaction(operation="replace", adds=adds, removes=old_paths, data_change=False)
    )
    snap2 = t.snapshot()
    assert snap2.version == v
    assert set(snap2.file_paths(absolute=False)).isdisjoint(old_paths)
    assert snap2.num_records() == 400
    # pinned old snapshot still scans the old files (data still on disk)
    assert snap1.scan(spark).count() == 400
    assert t.snapshot(snap1.version).file_paths(absolute=False) == sorted(old_paths)


def test_concurrent_delete_detected(spark, tmp_table_root):
    t = make_small_file_table(spark, tmp_table_root, n_docs=100, n_files=4)
    snap = t.snapshot()
    victim = snap.file_paths(absolute=False)[0]
    # a competing committer removes the file first
    t.commit(Transaction(operation="replace", adds=[], removes=[victim]))
    with pytest.raises(ConcurrentDeleteError):
        t.commit(Transaction(operation="replace", adds=[], removes=[victim]))


def test_txn_offsets_refuse_to_regress(tmp_table_root):
    """Offset integrity guard (ref src/offsets.rs:150-157,
    InconsistentStoredOffsets / ConflictingOffsets)."""
    t = Table.create(tmp_table_root, TOKENS_SCHEMA, [])
    t.commit(Transaction(operation="append", app_txns={"job-0": 10}))
    assert t.txn_version("job-0") == 10
    assert t.txn_version("job-nope") == -1
    with pytest.raises(ConflictingOffsetsError):
        t.commit(Transaction(operation="append", app_txns={"job-0": 10}))
    with pytest.raises(ConflictingOffsetsError):
        t.commit(Transaction(operation="append", app_txns={"job-0": 3}))
    t.commit(Transaction(operation="append", app_txns={"job-0": 11}))
    assert t.txn_version("job-0") == 11


def test_cas_version_collision_retries(tmp_table_root):
    """Two writers race for the same version: one wins the os.link CAS, the
    loser retries onto the next version (ref src/lib.rs:964-1023)."""
    t = Table.create(tmp_table_root, TOKENS_SCHEMA, [])
    # simulate the race: pre-create v1 behind the transaction's back
    t._atomic_write_version(1, {"version": 1, "operation": "append", "add": [], "remove": [], "app_txns": {}})
    v = t.commit(Transaction(operation="append"))
    assert v == 2


def test_checkpoint_roundtrip(tmp_table_root):
    t = Table.create(tmp_table_root, TOKENS_SCHEMA, ["source"])
    fe = lambda i: FileEntry(  # noqa: E731
        path=f"data/x/part-{i}.parquet",
        size=10 * i + 1,
        num_records=i + 1,
        partition_values={"source": "web"},
        stats={"min": {"n_tok": i}, "max": {"n_tok": i + 5}, "null_count": {"tokens": 0}},
    )
    for i in range(1, CHECKPOINT_INTERVAL + 3):
        t.commit(Transaction(operation="append", adds=[fe(i)], app_txns={"j": i}))
    assert os.path.exists(t._checkpoint_path(CHECKPOINT_INTERVAL))
    snap = t.snapshot()
    assert len(snap.files) == CHECKPOINT_INTERVAL + 2
    # delete pre-checkpoint commit jsons: snapshot must still resolve
    for i in range(0, CHECKPOINT_INTERVAL):
        os.unlink(t._version_path(i))
    snap2 = t.snapshot()
    assert {f.path for f in snap2.files} == {f.path for f in snap.files}
    assert snap2.app_txns["j"] == CHECKPOINT_INTERVAL + 2
    assert snap2.files[0].partition_values == {"source": "web"}


def test_history_and_referenced_paths(spark, tmp_table_root):
    t = make_small_file_table(spark, tmp_table_root, n_docs=50, n_files=2)
    h = t.history()
    assert [e["operation"] for e in h] == ["create", "append"]
    refs = t.all_referenced_paths()
    assert refs == set(t.snapshot().file_paths(absolute=False))


def test_cas_backend_conflict_path(spark, tmp_table_root):
    """The commit loop retries through the pluggable CAS abstraction: a
    backend that loses the first put-if-absent (simulated concurrent
    committer) must trigger re-validation + retry, not a broken table."""
    from kafka_delta_ingest_spark.datagen import TOKENS_SCHEMA
    from kafka_delta_ingest_spark.table.cas import InMemoryCas, LocalFsCas
    from kafka_delta_ingest_spark.table.format import Table, Transaction

    class FlakyCas(LocalFsCas):
        def __init__(self):
            self.calls = 0

        def put_if_absent(self, dest, content):
            self.calls += 1
            if self.calls == 1:
                raise FileExistsError(dest)
            super().put_if_absent(dest, content)

    t = Table.create(tmp_table_root, TOKENS_SCHEMA, [])
    t.cas = FlakyCas()
    v = t.commit(Transaction(operation="append"))
    assert v == 1
    assert t.cas.calls == 2  # lost once, re-validated, won

    # the in-memory backend honors conditional-create semantics
    mem = InMemoryCas()
    mem.put_if_absent("/x", b"a")
    import pytest as _pytest

    with _pytest.raises(FileExistsError):
        mem.put_if_absent("/x", b"b")
    assert mem.read("/x") == b"a" and mem.exists("/x")


def test_s3_cas_conditional_put_win_and_lose(tmp_table_root):
    """S3 backend: commit via conditional PUT (IfNoneMatch='*'). A 412
    PreconditionFailed from a concurrent committer maps to FileExistsError
    and the optimistic loop retries at the next version — no network, the
    boto3-shaped client is a write-through fake (objects mirror to the
    local log dir so snapshot() reads see committed versions, as an
    S3-mounted deployment would)."""
    import io
    import json as _json

    from kafka_delta_ingest_spark.datagen import TOKENS_SCHEMA
    from kafka_delta_ingest_spark.table.cas import S3Cas
    from kafka_delta_ingest_spark.table.format import Table, Transaction

    class ClientError(Exception):
        def __init__(self, code):
            self.response = {"Error": {"Code": code}}

    class FakeS3Client:
        """Minimal boto3 surface honoring IfNoneMatch='*' semantics."""

        def __init__(self):
            self.objects = {}
            self.put_calls = 0
            self.inject_race_once = None  # (key, body) written before a 412

        def put_object(self, Bucket, Key, Body, IfNoneMatch=None):
            self.put_calls += 1
            if self.inject_race_once is not None:
                rk, rb = self.inject_race_once
                self.inject_race_once = None
                self._store(Bucket, rk, rb)
                if rk == Key:
                    raise ClientError("PreconditionFailed")
            if IfNoneMatch == "*" and (Bucket, Key) in self.objects:
                raise ClientError("PreconditionFailed")
            self._store(Bucket, Key, Body)

        def _store(self, bucket, key, body):
            self.objects[(bucket, key)] = body
            local = "/" + key  # write-through mirror for local log reads
            os.makedirs(os.path.dirname(local), exist_ok=True)
            with open(local, "wb") as f:
                f.write(body)

        def get_object(self, Bucket, Key):
            if (Bucket, Key) not in self.objects:
                raise ClientError("NoSuchKey")
            return {"Body": io.BytesIO(self.objects[(Bucket, Key)])}

        def head_object(self, Bucket, Key):
            if (Bucket, Key) not in self.objects:
                raise ClientError("404")
            return {}

    client = FakeS3Client()
    cas = S3Cas("test-bucket", client=client)
    t = Table.create(tmp_table_root, TOKENS_SCHEMA, [])
    t.cas = cas

    # win path: plain commit lands at v1, object exists in the bucket
    v = t.commit(Transaction(operation="append"))
    assert v == 1
    key = cas._key(t._version_path(1))
    assert ("test-bucket", key) in client.objects
    assert cas.exists(t._version_path(1))
    assert _json.loads(cas.read(t._version_path(1)))["version"] == 1

    # lose path: a concurrent committer wins v2 mid-flight (412); the loop
    # must re-validate against the new head and land at v3
    competitor = _json.dumps(
        {"version": 2, "operation": "append", "add": [], "remove": [],
         "app_txns": {}}
    ).encode()
    client.inject_race_once = (cas._key(t._version_path(2)), competitor)
    v = t.commit(Transaction(operation="append"))
    assert v == 3
    assert cas.exists(t._version_path(2)) and cas.exists(t._version_path(3))

    # unknown client errors propagate (misconfig must not look like a race)
    class BrokenClient(FakeS3Client):
        def put_object(self, **kw):
            raise ClientError("AccessDenied")

    t.cas = S3Cas("test-bucket", client=BrokenClient())
    with pytest.raises(Exception) as ei:
        t.commit(Transaction(operation="append"))
    assert "AccessDenied" in str(getattr(ei.value, "response", ei.value))


def test_schema_evolution_add_nullable_column(spark, tmp_path):
    """Add-column evolution: metadata-only commit; old files scan with
    NULLs in the new column; pinned pre-evolution snapshots keep the old
    schema; concurrent writers detect the drift; unsafe evolutions are
    rejected."""
    import pyspark.sql.types as T
    import pytest

    from kafka_delta_ingest_spark.datagen import make_small_file_table
    from kafka_delta_ingest_spark.table.format import (
        SchemaChangedError,
        SchemaEvolutionError,
        Table,
        Transaction,
    )
    from kafka_delta_ingest_spark.table.writer import stage_dataframe

    t = make_small_file_table(spark, str(tmp_path / "t"), n_docs=60, n_files=3, max_tok=8)
    old_schema = t.snapshot().schema
    v_pre = t.latest_version()

    evolved = T.StructType(
        old_schema.fields + [T.StructField("quality", T.DoubleType(), True)]
    )
    v_evo = t.evolve_schema(evolved)
    assert v_evo == v_pre + 1

    # head schema has the column; every old row scans as NULL
    snap = t.snapshot()
    assert "quality" in snap.schema.fieldNames()
    df = snap.scan(spark)
    assert df.schema["quality"].dataType == T.DoubleType()
    assert df.where(df.quality.isNotNull()).count() == 0
    n_old = df.count()

    # append rows WITH the column; scan merges old-null + new-valued
    add_df = (
        snap.scan(spark).limit(5)
        .withColumn("doc_id", F.concat(F.lit("new_"), "doc_id"))
        .withColumn("quality", F.lit(0.5))
    )
    _, adds = stage_dataframe(spark, t, add_df, snap.partition_cols, evolved)
    t.commit(Transaction(operation="append", adds=adds))
    df2 = t.snapshot().scan(spark)
    assert df2.count() == n_old + 5
    assert df2.where(df2.quality.isNotNull()).count() == 5

    # pinned pre-evolution snapshot keeps the OLD schema (metadata time travel)
    assert "quality" not in t.snapshot(version=v_pre).schema.fieldNames()

    # a writer that validated against the old schema detects the drift
    with pytest.raises(SchemaChangedError):
        t.commit(Transaction(operation="append"), expected_schema=old_schema)

    # unsafe evolutions rejected
    with pytest.raises(SchemaEvolutionError):
        t.evolve_schema(T.StructType(evolved.fields[1:]))  # drop
    with pytest.raises(SchemaEvolutionError):
        t.evolve_schema(
            T.StructType(
                evolved.fields
                + [T.StructField("req", T.LongType(), False)]  # non-nullable add
            )
        )
    changed = [
        T.StructField(f.name, T.StringType(), f.nullable)
        if f.name == "quality"
        else f
        for f in evolved.fields
    ]
    with pytest.raises(SchemaEvolutionError):
        t.evolve_schema(T.StructType(changed))  # type change


def test_partition_spec_evolution(spark, tmp_path):
    """Iceberg partition-spec evolution: metadata-only commit; old files
    keep their recorded layout, new files use the new spec, and one scan
    unions both spec groups with identical row content."""
    from kafka_delta_ingest_spark.table.format import SchemaEvolutionError

    t = make_small_file_table(spark, str(tmp_path / "t"), n_docs=60, n_files=3, max_tok=8)
    snap0 = t.snapshot()
    assert snap0.partition_cols == ["source"]
    v_pre = t.latest_version()
    before = {r["doc_id"]: r["tokens"] for r in snap0.scan(spark).collect()}

    # evolve to unpartitioned — future writes only, no data rewrite
    v_evo = t.evolve_partitioning([])
    assert v_evo == v_pre + 1
    snap1 = t.snapshot()
    assert snap1.partition_cols == []
    assert {f.path for f in snap1.files} == {f.path for f in snap0.files}

    # new append lands unpartitioned while old files keep source-in-path
    add_df = (
        snap1.scan(spark).limit(7)
        .withColumn("doc_id", F.concat(F.lit("new_"), "doc_id"))
    )
    new_rows = {r["doc_id"]: r["tokens"] for r in add_df.collect()}
    _, adds = stage_dataframe(spark, t, add_df, snap1.partition_cols, snap1.schema)
    assert all(fe.partition_values == {} for fe in adds)
    t.commit(Transaction(operation="append", adds=adds))

    snap2 = t.snapshot()
    specs = {frozenset(fe.partition_values.keys()) for fe in snap2.files}
    assert specs == {frozenset({"source"}), frozenset()}
    got = {r["doc_id"]: r["tokens"] for r in snap2.scan(spark).collect()}
    assert got == {**before, **new_rows}  # token-array equality across specs

    # pinned pre-evolution snapshot keeps the OLD spec (metadata time travel)
    assert t.snapshot(version=v_pre).partition_cols == ["source"]
    assert t.snapshot(version=v_pre).scan(spark).count() == 60

    # evolving to a non-schema or duplicate column is rejected
    with pytest.raises(SchemaEvolutionError):
        t.evolve_partitioning(["nope"])
    with pytest.raises(SchemaEvolutionError):
        t.evolve_partitioning(["source", "source"])

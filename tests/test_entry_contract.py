"""Driver-contract smoke: entry() runs and returns rows with a stable
schema; every queries() entry is callable; oracle_sql() keys subset
queries(). (Full Spark-vs-DuckDB parity runs via tools/check_oracles.py.)"""

import os

import pytest

import __spark_entry__ as entrymod


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.columns == ["doc_id", "n_tok", "source", "tok_sum"]
    assert df.count() == 500  # sf0.001 documents


def test_contract_shape():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert len(qs) >= 25
    assert set(oracles) <= set(qs)
    # every oracle references only pre-registered views
    for sql in oracles.values():
        assert "read_parquet" not in sql


def test_concurrent_committers(spark, tmp_path):
    """Two committers race replace-commits: exactly one wins per victim
    file; the loser sees ConcurrentDeleteError — never silent data loss
    (the reference's two-worker concurrency test idiom,
    tests/emails_s3_tests.rs:21-77)."""
    import threading

    from kafka_delta_ingest_spark.datagen import make_small_file_table
    from kafka_delta_ingest_spark.table.format import (
        ConcurrentDeleteError,
        Transaction,
    )

    t = make_small_file_table(spark, str(tmp_path / "t"), n_docs=200, n_files=4, max_tok=8)
    victim = t.snapshot().file_paths(absolute=False)[0]
    results = []

    def worker():
        try:
            v = t.commit(Transaction(operation="replace", adds=[], removes=[victim]))
            results.append(("ok", v))
        except ConcurrentDeleteError:
            results.append(("conflict", None))

    threads = [threading.Thread(target=worker) for _ in range(4)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert sorted(r[0] for r in results) == ["conflict", "conflict", "conflict", "ok"]


def test_pyfiles_zip_is_importable_and_deterministic(tmp_path):
    """The spark-submit --py-files artifact must expose the whole engine
    from a bare zip on sys.path (what executors see) and rebuild
    byte-identically."""
    import hashlib
    import subprocess
    import sys as _sys

    sys_mod = _sys
    import tools.package_pyfiles as pkg

    z1 = pkg.build(str(tmp_path / "a.zip"))
    z2 = pkg.build(str(tmp_path / "b.zip"))
    h = lambda p: hashlib.sha256(open(p, "rb").read()).hexdigest()
    assert h(z1) == h(z2)
    # import from the zip alone in a clean interpreter (repo cwd masked)
    code = (
        "import sys; sys.path.insert(0, %r); "
        "import kafka_delta_ingest_spark.operators.dedup as m; "
        "import kafka_delta_ingest_spark.maintenance.optimize; "
        "print(m.__name__)" % z1
    )
    out = subprocess.run(
        [sys_mod.executable, "-c", code],
        capture_output=True, text=True, cwd=str(tmp_path),
    )
    assert out.returncode == 0, out.stderr
    assert "operators.dedup" in out.stdout


def test_spark_submit_pyfiles_runs_maintenance_end_to_end(spark, tmp_path):
    """The north-rule launch shape, actually executed: `spark-submit
    --py-files <zip> jobs/maintain.py` in a FRESH JVM/interpreter (no
    repo on sys.path beyond the zip + the job file) builds, describes,
    and OPTIMIZEs a table with verify=ON. Skips if spark-submit is not
    on PATH."""
    import json as _json
    import shutil as _sh
    import subprocess

    submit = _sh.which("spark-submit")
    if submit is None:
        pytest.skip("spark-submit not on PATH")

    import tools.package_pyfiles as pkg
    from kafka_delta_ingest_spark.datagen import make_small_file_table

    z = pkg.build(str(tmp_path / "engine.zip"))
    root = str(tmp_path / "tbl")
    make_small_file_table(spark, root, n_docs=300, n_files=4)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def run(*args):
        r = subprocess.run(
            [submit, "--master", "local[4]", "--py-files", z,
             os.path.join(repo, "jobs", "maintain.py"),
             "--table", root, *args],
            capture_output=True, text=True, cwd=str(tmp_path), timeout=300,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        return _json.loads(r.stdout.strip().splitlines()[-1])

    d = run("--op", "describe")
    assert d["rows"] == 300 and d["files"] > 1

    m = run("--op", "optimize", "--dims", "source,n_tok,doc_id",
            "--target-file-bytes", "8388608", "--verify")
    assert m["files_rewritten"] == d["files"] and m["rows"] == 300

    d2 = run("--op", "describe")
    assert d2["rows"] == 300 and d2["files"] < d["files"]

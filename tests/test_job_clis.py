"""The spark-submit job entry points (jobs/pack.py, jobs/curate.py,
jobs/ingest.py --source --once) driven through their REAL argv parsing —
in-process (get_spark reuses the session) so each CLI's full arg →
pipeline → output path is covered without a JVM per test."""

import json
import os
import sys

import duckdb
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _run_cli(monkeypatch, capsys, module, argv):
    monkeypatch.setattr(sys, "argv", [f"{module.__name__}.py", *argv])
    module.main()
    out = capsys.readouterr().out.strip().splitlines()
    return json.loads(out[-1])


def test_pack_cli_assigns_every_doc(spark, tmp_path, monkeypatch, capsys):
    import jobs.pack as pack

    out_dir = str(tmp_path / "assignments")
    res = _run_cli(
        monkeypatch, capsys, pack,
        ["--input", os.path.join(SF_DIR, "documents.parquet"),
         "--output", out_dir, "--weight-col", "n_chars",
         "--budget", "4096"],
    )
    n_docs = duckdb.sql(
        f"SELECT COUNT(*) FROM '{SF_DIR}/documents.parquet'"
    ).fetchone()[0]
    assert res["docs"] == n_docs
    assert 0 < res["fill"] <= 1.0
    got = spark.read.parquet(out_dir)
    assert got.count() == n_docs
    assert {"doc_id", "seq_id"} <= set(got.columns)


def test_curate_cli_writes_a_real_table(spark, tmp_path, monkeypatch, capsys):
    import jobs.curate as curate
    from kafka_delta_ingest_spark.table.format import Table

    root = str(tmp_path / "curated")
    res = _run_cli(
        monkeypatch, capsys, curate,
        ["--input", os.path.join(SF_DIR, "documents.parquet"),
         "--output", root, "--quality-min", "0.0"],
    )
    t = Table(root)
    rows = t.snapshot().scan(spark).count()
    assert rows == res["n_kept"] > 0
    assert res["n_input"] >= res["n_kept"]
    assert res["table_version"] >= 1


def test_ingest_cli_batch_source_exactly_once(
    spark, tmp_path, monkeypatch, capsys
):
    """--source <json dir> --once lands one atomic commit; replaying the
    identical invocation is a no-op (offsets already stored)."""
    import jobs.ingest as ingest

    src = tmp_path / "msgs"
    src.mkdir()
    # envelope shape the batch source consumes: value + kafka coords
    for part in range(2):
        with open(src / f"part-{part}.json", "w") as f:
            for off in range(5):
                f.write(json.dumps({
                    "value": json.dumps({
                        "doc_id": f"d{part}-{off}",
                        "tokens": [part, off],
                        "n_tok": 2,
                        "source": "cli",
                    }),
                    "_partition": part,
                    "_offset": off,
                }) + "\n")
    root = str(tmp_path / "tbl")
    # destination schema is external (reference semantics): the table
    # must exist; ingest coerces messages toward it
    from pyspark.sql import types as T

    from kafka_delta_ingest_spark.table.format import Table

    Table.create(root, T.StructType([
        T.StructField("doc_id", T.StringType()),
        T.StructField("tokens", T.ArrayType(T.IntegerType())),
        T.StructField("n_tok", T.IntegerType()),
        T.StructField("source", T.StringType()),
    ]), partition_cols=["source"])

    res = _run_cli(
        monkeypatch, capsys, ingest,
        ["--source", str(src), "--table", root, "--once"],
    )
    assert res["rows"] == 10

    res2 = _run_cli(
        monkeypatch, capsys, ingest,
        ["--source", str(src), "--table", root, "--once"],
    )
    assert res2["rows"] == 0  # exactly-once replay

    assert Table(root).snapshot().scan(spark).count() == 10


def test_maintain_cli_new_ops_roundtrip(spark, tmp_path, monkeypatch, capsys):
    """The restart-session ops driven through jobs/maintain.py's REAL
    argv parsing: bloom, overwrite(-dynamic), rename-column,
    compact-deletes (no-op path), truncate, adopt."""
    import jobs.maintain as maintain
    from kafka_delta_ingest_spark.datagen import (
        make_small_file_table,
        tokens_df,
    )

    root = str(tmp_path / "t")
    make_small_file_table(spark, root, n_docs=80, n_files=2, max_tok=8,
                          partition_by_source=False)
    res = _run_cli(monkeypatch, capsys, maintain,
                   ["--table", root, "--op", "bloom",
                    "--columns", "doc_id"])
    assert res["files_scanned"] == 2

    batch = str(tmp_path / "batch")
    tokens_df(spark, 10, seed=3, max_tok=8).coalesce(1).write.parquet(batch)
    res = _run_cli(monkeypatch, capsys, maintain,
                   ["--table", root, "--op", "overwrite-dynamic",
                    "--source-parquet", batch])
    assert res["files_removed"] == 2  # unpartitioned => full replace

    res = _run_cli(monkeypatch, capsys, maintain,
                   ["--table", root, "--op", "overwrite",
                    "--source-parquet", batch,
                    "--where", '[["n_tok", ">=", 0]]'])
    assert res["rows_written"] == 10

    res = _run_cli(monkeypatch, capsys, maintain,
                   ["--table", root, "--op", "rename-column",
                    "--column", "n_tok", "--to-name", "tok_len"])
    assert res["renamed"] == {"n_tok": "tok_len"}

    res = _run_cli(monkeypatch, capsys, maintain,
                   ["--table", root, "--op", "compact-deletes"])
    assert res["delete_files_after"] == 0  # nothing to consolidate

    res = _run_cli(monkeypatch, capsys, maintain,
                   ["--table", root, "--op", "truncate"])
    assert res["rows"] == 0

    res = _run_cli(monkeypatch, capsys, maintain,
                   ["--table", str(tmp_path / "t2"), "--op", "adopt",
                    "--source-parquet", batch])
    assert res["rows"] == 10 and res["version"] == 1

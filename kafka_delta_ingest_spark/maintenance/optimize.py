"""Fused OPTIMIZE — bin-packing compaction + space-filling-curve clustering
in ONE read→shuffle→write pass (north-rule ops B1+B2 fused; the same fusion
Delta Lake's ``OPTIMIZE ... ZORDER BY`` performs).

Round 1 ran ``compact()`` and then ``cluster()`` as separate jobs: the
cluster pass re-reads and re-writes every byte the compaction pass just
wrote, so reaching the compacted+clustered end state moved ~2× the table
through storage. Fusing them halves bytes moved — on a shared-bandwidth
medium (one virtio disk here; the object-store egress budget at 100 TB)
that is the dominant throughput lever, and it is what closes the N→4N
scaling gap: the pipeline's second pass was pure I/O replay with no new
work for added cores to do.

Semantics: identical end state to compact-then-cluster —
- file-size targeting via ``repartitionByRange(n_out, partition_cols + _ckey)``
  (range partitioning gives even-sized output regardless of skew, the same
  file-size goal as the reference's buffer flush, /root/reference/src/lib.rs:1127-1145);
- every output file covers a bounded curve-key slice, so manifest min/max
  pruning works on every clustering dim;
- ONE atomic replace commit (Add new + Remove all old, data_change=False),
  validated by Table.commit's row-conservation check.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from kafka_delta_ingest_spark.maintenance.zorder import cluster
from kafka_delta_ingest_spark.plans.bin_packing import DEFAULT_TARGET_FILE_BYTES
from kafka_delta_ingest_spark.table.format import Table


def optimize(
    spark: SparkSession,
    table: Table,
    dims: list[str],
    curve: str = "zorder",
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
    small_file_threshold: float = 0.75,
    job_id: str | None = None,
    verify: bool = False,
    key_impl: str = "auto",
    scope: list[tuple] | None = None,
) -> dict:
    """Compact + cluster the whole table in a single rewrite pass.

    Returns the cluster metrics plus compaction accounting:
    ``files_before`` / ``small_files_before`` / ``files_written``."""
    snap = table.snapshot()
    cutoff = int(target_file_bytes * small_file_threshold)
    files_before = len(snap.files)
    small_before = sum(1 for f in snap.files if f.size < cutoff)
    m = cluster(
        spark,
        table,
        dims=dims,
        curve=curve,
        target_file_bytes=target_file_bytes,
        job_id=job_id,
        verify=verify,
        key_impl=key_impl,
        scope=scope,
    )
    after = table.snapshot()
    m.update(
        {
            "op": "optimize",
            "files_before": files_before,
            "small_files_before": small_before,
            "small_files_after": sum(1 for f in after.files if f.size < cutoff),
            "passes": 1,
        }
    )
    return m

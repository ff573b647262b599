"""kafka_delta_ingest_spark — a from-scratch PySpark-native lakehouse
table-maintenance engine with the semantics of kafka-delta-ingest
(reference: /root/reference, Rust) recast as Iceberg-style table
maintenance over pre-tokenized training sequences.

Layers
------
- ``table``       : snapshot-log table format (atomic CAS commits, per-file
                    stats manifests, checkpoints, time travel) —
                    ref src/lib.rs:931-1024, src/writer.rs:1030-1066,
                    src/delta_helpers.rs:15-68
- ``maintenance`` : compaction, Z-order/Hilbert clustering, manifest
                    rewrite, snapshot expiry + orphan GC, MERGE INTO
- ``ingest``      : transforms / coercions / buffer-dedupe / dead letters —
                    ref src/transforms.rs, src/coercions.rs,
                    src/value_buffers.rs, src/dead_letters.rs
- ``plans``       : driver-side planners (bin packing, salting, pruning)
- ``operators``   : training-data ops (dedup, similarity, text, multimodal)
- ``streaming``   : structured-streaming micro-batch ingest analogue
"""

__version__ = "0.1.0"

from kafka_delta_ingest_spark.session import get_spark  # noqa: F401

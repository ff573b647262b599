from kafka_delta_ingest_spark.table.format import (  # noqa: F401
    ConcurrentDeleteError,
    ConflictingOffsetsError,
    FileEntry,
    SchemaChangedError,
    Snapshot,
    Table,
    Transaction,
)
from kafka_delta_ingest_spark.table.stats import compute_add_entries  # noqa: F401
from kafka_delta_ingest_spark.table.writer import write_dataframe  # noqa: F401

"""Custom stateful streaming operators (``applyInPandasWithState``).

The reference's consume loop keeps per-partition mutable state across
message batches — the high-water offset used to drop redelivered
messages (buffers.rs: a message whose offset is <= the last written
offset for its partition is a duplicate and must not re-enter the
buffer). The batch engine reproduces that against the table's txn ledger
(`ingest/buffers.py dedupe_against_ledger`); this module is the TRUE
streaming form: state lives in the streaming state store, survives
restarts via the checkpoint, and scales per-key (one state row per
kafka partition, not per message).

Why ``applyInPandasWithState`` and not ``dropDuplicates``: the built-in
needs a watermark + event-time column and keeps one state row per seen
KEY (unbounded for offset streams); the per-partition high-water mark is
O(partitions) state and encodes the exactly-once contract the reference
ships (monotone offsets per partition — ref src/lib.rs:388-523,
writer offset txn check src/writer.rs).

State batches arrive as Arrow — the pandas loop below is per PARTITION
GROUP (a handful of rows of state per call), not per message.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType


def stateful_offset_dedupe(
    stream_df: DataFrame,
    partition_col: str = "partition",
    offset_col: str = "offset",
    payload_cols: tuple[str, ...] = ("value",),
) -> DataFrame:
    """Drop rows whose offset is <= the partition's high-water mark; emit
    the rest and advance the mark. Exactly the reference's redelivery
    guard, as a keyed stateful streaming op.

    Output schema: (partition, offset, *payload_cols).
    State schema:  (max_offset,) per partition — O(partitions) total.
    """
    out_fields = [
        StructField(partition_col, LongType()),
        StructField(offset_col, LongType()),
    ]
    src_schema = {f.name: f for f in stream_df.schema.fields}
    for c in payload_cols:
        out_fields.append(src_schema[c])
    out_schema = StructType(out_fields)
    state_schema = StructType([StructField("max_offset", LongType())])

    def dedupe(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (part,) = key
        high = state.get[0] if state.exists else -1
        cols = [partition_col, offset_col, *payload_cols]
        for pdf in pdfs:
            # strict monotone emission: a row survives only if its offset
            # exceeds every offset seen before it (running cummax) AND the
            # restored high-water mark. Kafka delivers per-partition in
            # order, so a non-increasing offset inside a batch is a
            # redelivery (rebalance replay) exactly like one across batches.
            prev = pdf[offset_col].cummax().shift(1, fill_value=high)
            fresh = pdf[(pdf[offset_col] > prev) & (pdf[offset_col] > high)]
            if len(fresh):
                high = int(fresh[offset_col].max())
                yield fresh[cols]
        state.update((high,))

    return (
        stream_df.groupBy(partition_col)
        .applyInPandasWithState(
            dedupe,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )

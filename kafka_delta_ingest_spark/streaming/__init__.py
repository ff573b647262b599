from kafka_delta_ingest_spark.streaming.micro_batch import (  # noqa: F401
    IngestPipeline,
    start_stream_ingest,
)

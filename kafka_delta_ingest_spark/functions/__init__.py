from kafka_delta_ingest_spark.functions.scalars import (  # noqa: F401
    epoch_micros_to_iso8601,
    epoch_seconds_to_iso8601,
    substr0,
    token_checksum,
)
from kafka_delta_ingest_spark.functions.verify import (  # noqa: F401
    content_fingerprint,
    scans_equal,
)

from kafka_delta_ingest_spark.ingest.coercions import coerce_json  # noqa: F401
from kafka_delta_ingest_spark.ingest.transforms import Transformer  # noqa: F401
from kafka_delta_ingest_spark.ingest.buffers import dedupe_against_ledger  # noqa: F401
from kafka_delta_ingest_spark.ingest.dead_letters import split_dead_letters  # noqa: F401

from kafka_delta_ingest_spark.maintenance.compact import compact  # noqa: F401
from kafka_delta_ingest_spark.maintenance.zorder import cluster  # noqa: F401
from kafka_delta_ingest_spark.maintenance.manifest import rewrite_manifests  # noqa: F401
from kafka_delta_ingest_spark.maintenance.expire import expire_snapshots, gc_orphans  # noqa: F401
from kafka_delta_ingest_spark.maintenance.merge import merge_into  # noqa: F401

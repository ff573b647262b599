from kafka_delta_ingest_spark.sources.testdata import load_table, register_views  # noqa: F401

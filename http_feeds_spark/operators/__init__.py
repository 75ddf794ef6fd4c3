from http_feeds_spark.operators import feed  # noqa: F401

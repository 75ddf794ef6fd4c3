"""http_feeds_spark — a PySpark-native analytics engine for HTTP feeds.

Re-expresses the data-processing contract of the HTTP Feeds specification
(www.http-feeds.org, vendored read-only at /root/reference/README.md) on top
of Apache Spark: batch DataFrame semantics for feed replay / compaction /
read-model materialization, Structured Streaming for live subscriptions, and
an LLM-data-pipeline operator suite (dedup, similarity search, text
analysis) designed for 100 TB scale.

The engine NEVER copies code from the reference — the reference is a
protocol specification (Markdown, no implementation); every operator here is
an idiomatic Spark design derived from the spec's normative text, cited
file:line in docstrings.
"""

__version__ = "0.1.0"

from http_feeds_spark.session import get_spark  # noqa: F401

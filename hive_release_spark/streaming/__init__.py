"""Structured Streaming pipelines (SURVEY.md §2.K).

Hive 2.3 has no streaming query engine — its 'streaming' is the HCatalog
ingest API writing micro-batches into ACID tables (upstream
``hcatalog/streaming/``) plus compactor jobs (``ql/txn/compactor/``).
Structured Streaming is a strict superset: continuous ingest AND
continuous queries. This package maps the capability.
"""

from hive_release_spark.streaming import pipelines  # noqa: F401

"""hive_release_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference ``apivovarov/hive-release``
(Apache Hive 2.3.x release artifacts; see SURVEY.md §0 for the identification
and BASELINE.md for targets).

Architecture: Spark-first. Hive's parser/optimizer/shuffle/vectorized runtime
are subsumed by Spark SQL + Catalyst + Tungsten + AQE (SURVEY.md §3-§4), so
this package is a *surface layer*:

- ``session``   — SparkSession factory tuned for scale (AQE, Arrow, UTC).
- ``catalog``   — table registry over parquet dirs (metastore analogue).
- ``functions`` — the Hive scalar/UDAF/UDTF surface (SURVEY.md §2.H) under
                  Hive names, gaps implemented Spark-natively.
- ``queries``   — operator inventory as runnable queries, each paired with an
                  ANSI-SQL oracle (SURVEY.md §2 coverage; driver t2 gate).
- ``operators`` — DML rewrites (MERGE/UPDATE/DELETE as join-rewrites),
                  multi-insert, table sampling helpers.
- ``streaming`` — Structured Streaming pipelines (SURVEY.md §2.K).
- ``llm``       — dedup / similarity / text-analysis / multimodal operators
                  (SURVEY.md §2.L).
"""

__version__ = "0.1.0"

from hive_release_spark.catalog import TABLES, load_table, register_views
from hive_release_spark.session import get_session

__all__ = ["TABLES", "load_table", "register_views", "get_session", "__version__"]

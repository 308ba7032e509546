"""Sources & sinks (SURVEY.md §2.G)."""

from hive_release_spark.sources import formats  # noqa: F401

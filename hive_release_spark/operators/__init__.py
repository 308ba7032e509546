"""Mutation + multi-sink operators (SURVEY.md §2.A FileSinkOperator,
§2.B MERGE/UPDATE/DELETE)."""

from hive_release_spark.operators import dml  # noqa: F401

"""Operator-inventory queries (SURVEY.md §2), registered on import."""

from hive_release_spark.queries.registry import REGISTRY, Query, register  # noqa: F401

# Importing the modules populates REGISTRY.
from hive_release_spark.queries import (  # noqa: F401,E402
    relational,
    joins,
    windows,
    functions_sql,
    llm,
    streaming_batch,
    extensions,
    coverage,
    coverage2,
    llm2,
    tpch_more,
)


def queries():
    return {name: q.fn for name, q in REGISTRY.items()}


def oracle_sql():
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}

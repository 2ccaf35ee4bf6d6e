"""Operator-inventory implementations, one module per SURVEY.md §2 family.

Importing this package registers every query into
``dmshadoop_spark.registry.QUERIES`` / ``ORACLE``.
"""

from dmshadoop_spark.queries import (  # noqa: F401
    aggregates,
    core,
    events,
    joins,
    llm,
    sinks,
    text,
    tpch,
    windows,
)

"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship hourly-rollup slice of the engine on
sf0.001; ``queries()``/``oracle_sql()`` expose every implemented
operator from SURVEY.md §2 with DuckDB oracles (see
cesium_spark/driver_queries.py for the implementations).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from cesium_spark import driver_queries as dq


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: scan sf0.001 events → derive transcript channels →
    hourly kernel rollup (the full engine path). Driver checks rows>0."""
    return dq.q_ts_rollup_1h_kernel(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(dq.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(dq.ORACLE_SQL)

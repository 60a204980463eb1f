"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``weather_bigquery_lakehouse_spark``; this module
only adapts the engine's query registry (plans/queries.py +
plans/extensions.py + plans/curation.py — the 50-entry driver window;
see docs/REGISTRY.md for the out-of-window retired/staged set) to the
driver's interface.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from weather_bigquery_lakehouse_spark.plans import QUERIES, flagship_star_revenue

SF0001_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return flagship_star_revenue(spark, SF0001_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB twin for every SQL-expressible query."""
    return {
        name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None
    }

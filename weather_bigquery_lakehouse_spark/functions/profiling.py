"""Single-job data profiling.

The reference profiles per column with separate Spark jobs —
``distinct().count()`` + ``show()`` per column for uniqueness
(src/etl/utils/data_profiling.py:1-8) and a 4-aggregate ``select`` per
column for ranges (:10-22). Both collapse to ONE aggregate job here: a
single ``df.agg(...)`` with all measures for all columns, which Spark
executes as one partial-aggregate (map-side) + one final aggregate —
O(1) scans regardless of column count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """count / countDistinct / min / max for every column, one row out,
    one job. Column naming: ``{measure}_{col}``. Equivalent output to
    ``basic_data_profiling`` (reference data_profiling.py:10-22)."""
    cols = cols or df.columns
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"count_{c}"),
            F.countDistinct(F.col(c)).alias(f"distinct_{c}"),
            F.min(F.col(c)).alias(f"min_{c}"),
            F.max(F.col(c)).alias(f"max_{c}"),
        ]
    return df.agg(*aggs)


def distinct_counts(df: DataFrame, cols: list[str] | None = None, approx: bool = False) -> DataFrame:
    """Distinct count per column in one pass — ``check_unique_values``
    (reference data_profiling.py:1-8) without the per-column job loop.
    ``approx=True`` swaps in HyperLogLog (``approx_count_distinct``) —
    the right call at 100 TB where exact per-column distincts would each
    shuffle the full column."""
    cols = cols or df.columns
    fn = F.approx_count_distinct if approx else F.countDistinct
    return df.agg(*[fn(F.col(c)).alias(f"distinct_{c}") for c in cols])


def consistency_violations(df: DataFrame, name_col: str, id_col: str) -> DataFrame:
    """Names mapped to more than one id — the reference's data-quality gate
    (``groupBy(name).agg(countDistinct(id)).where(!= 1)``,
    reference src/etl/bronze_to_silver.py:118-131). Hash aggregate with
    map-side partial aggregation; the ``!= 1`` filter runs post-agg."""
    return (
        df.groupBy(name_col)
        .agg(F.countDistinct(id_col).alias("unique_ids"))
        .where(F.col("unique_ids") != 1)
    )

"""Single-pass cleaning transforms.

The reference's cleaning utilities (src/etl/utils/data_cleaning.py) run an
eager ``count()`` per column around every transform — O(columns) Spark jobs
per cleaning step. These versions keep the same relational semantics as one
lazy transform each (zero extra jobs); row-removal accounting, when wanted,
is ``removal_accounting`` — every count the reference produced with its
eager per-column loops, computed in ONE aggregate pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _numeric_cols(df: DataFrame) -> set[str]:
    return {
        f.name
        for f in df.schema.fields
        if f.dataType.typeName() in ("double", "float")
    }


def drop_null_rows(df: DataFrame, subset: list[str] | None = None) -> DataFrame:
    """Remove rows with NULL (or NaN, for float columns) in any considered
    column — semantics of ``remove_null_values``
    (reference src/etl/utils/data_cleaning.py:3-24), which treats NaN as
    null only for numeric columns, in one pass instead of per-column
    count+filter jobs."""
    cols = subset or df.columns
    numeric = _numeric_cols(df)
    pred = None
    for name in cols:
        keep = F.col(name).isNotNull()
        if name in numeric:
            keep = keep & ~F.isnan(F.col(name))
        pred = keep if pred is None else (pred & keep)
    return df.filter(pred) if pred is not None else df


def trim_strings(df: DataFrame) -> DataFrame:
    """Trim every string column in one projection — semantics of
    ``remove_whitespace`` (reference data_cleaning.py:26-41) without the
    per-column dirty-row count jobs."""
    string_cols = {f.name for f in df.schema.fields if f.dataType.typeName() == "string"}
    return df.select(
        *[
            F.trim(F.col(c)).alias(c) if c in string_cols else F.col(c)
            for c in df.columns
        ]
    )


def dedupe_rows(df: DataFrame, subset: list[str] | None = None) -> DataFrame:
    """Exact-duplicate removal — ``drop_duplicates`` semantics
    (reference data_cleaning.py:43-53). Full-row dedup is a hash aggregate
    on all columns; at scale prefer a ``subset`` of key columns so the
    shuffle key is narrow."""
    return df.dropDuplicates(subset) if subset else df.dropDuplicates()


def removal_accounting(df: DataFrame, subset: list[str] | None = None) -> DataFrame:
    """Every count the reference's cleaning loops report — per-column
    null/NaN rows (``remove_null_values``, data_cleaning.py:8-24), per-
    string-column untrimmed rows (``remove_whitespace``, :29-41), and
    duplicate rows (``drop_duplicates``, :43-53) — as ONE aggregate job
    instead of O(columns) eager ``count()`` actions.

    Returns a 1-row frame: ``n_rows``, ``n_null_<col>`` for each considered
    column (NaN counted as null for float columns, the reference's typed
    branch), ``n_untrimmed_<col>`` for each string column, and
    ``n_distinct_rows`` / ``n_duplicate_rows`` over all columns."""
    cols = subset or df.columns
    numeric = _numeric_cols(df)
    string_cols = {f.name for f in df.schema.fields if f.dataType.typeName() == "string"}
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        is_null = F.col(c).isNull()
        if c in numeric:
            is_null = is_null | F.isnan(F.col(c))
        aggs.append(F.sum(is_null.cast("bigint")).alias(f"n_null_{c}"))
    for c in cols:
        if c in string_cols:
            dirty = F.col(c).isNotNull() & (F.col(c) != F.trim(F.col(c)))
            aggs.append(F.sum(dirty.cast("bigint")).alias(f"n_untrimmed_{c}"))
    aggs.append(
        F.countDistinct(F.struct(*[F.col(c) for c in df.columns])).alias(
            "n_distinct_rows"
        )
    )
    return df.agg(*aggs).withColumn(
        "n_duplicate_rows", (F.col("n_rows") - F.col("n_distinct_rows")).cast("bigint")
    )


def drop_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """``remove_columns`` (reference data_cleaning.py:55-61) — one ``drop``
    call instead of a loop; Catalyst prunes the scan either way."""
    return df.drop(*cols)


def normalize_names(df: DataFrame) -> DataFrame:
    """Identifier normalization: ``-`` → ``_`` in column names
    (reference bronze_to_silver.py:161-165), all columns in one ``toDF``."""
    return df.toDF(*[c.replace("-", "_") for c in df.columns])

"""Writers for tier tables.

Replaces ``write_to_minio`` (reference src/etl/utils/bucket.py:34-84).
Differences by design:
  * real ``partitionBy`` columns instead of dates embedded in object paths
    (reference bronze_to_silver.py:82) — enables Catalyst partition pruning
    and dynamic partition pruning on the read side;
  * no pandas branch — ``DataFrameWriter`` covers csv/parquet/json
    distributed, so nothing funnels through the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    **options,
) -> None:
    writer = df.write.format(fmt).mode(mode)
    if fmt == "csv":
        writer = writer.option("header", True)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    for key, value in options.items():
        writer = writer.option(key, value)
    writer.save(path)

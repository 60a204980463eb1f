"""Gold-tier warehouse catalog.

The reference's gold tier is BigQuery, reached through a client library
that (a) creates datasets/tables if absent (src/etl/utils/bigquery.py:7-17),
(b) loads Spark frames by collecting EVERY row to the driver and handing a
pandas frame to a load job (src/etl/utils/bigquery.py:105-141 — the
scalability bug this engine exists to not have), and (c) reads back with
filter/latest-snapshot SQL (src/etl/utils/bigquery.py:42-103).

``GoldCatalog`` keeps that exact surface but distributed: tables are
parquet directories under a warehouse root (standing in for the
``spark-bigquery-connector`` in this container — swap `_format` for
"bigquery" + connector options on a real deployment and nothing else
changes). All reads/writes stay on executors.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class GoldCatalog:
    """Dataset of named gold tables backed by a warehouse directory."""

    def __init__(self, warehouse_dir: str, dataset: str = "gold"):
        self.warehouse_dir = warehouse_dir
        self.dataset = dataset
        # CREATE DATASET IF NOT EXISTS (reference bigquery.py:7-17)
        os.makedirs(self._dataset_path(), exist_ok=True)

    def _dataset_path(self) -> str:
        return os.path.join(self.warehouse_dir, self.dataset)

    def _table_path(self, table: str) -> str:
        return os.path.join(self._dataset_path(), table)

    def table_exists(self, table: str) -> bool:
        return os.path.isdir(self._table_path(table))

    def drop_table(self, table: str) -> None:
        shutil.rmtree(self._table_path(table), ignore_errors=True)

    def write_table(
        self,
        df: DataFrame,
        table: str,
        mode: str = "append",
        partition_by: list[str] | None = None,
    ) -> None:
        """Distributed load — reference semantics of ``write_bq_table``
        (WRITE_APPEND / WRITE_TRUNCATE; bigquery.py:105-141) without the
        driver-side ``toPandas()`` collect."""
        writer = df.write.format("parquet").mode(
            {"append": "append", "truncate": "overwrite", "overwrite": "overwrite"}[mode]
        )
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.save(self._table_path(table))

    def read_table(
        self,
        spark: SparkSession,
        table: str,
        columns: list[str] | None = None,
        where: str | None = None,
    ) -> DataFrame:
        """Filtered read; predicate/columns push down into the parquet scan
        (the connector-equivalent of reference bigquery.py:42-103)."""
        df = spark.read.parquet(self._table_path(table))
        if where:
            df = df.where(where)
        if columns:
            df = df.select(*columns)
        return df

    def read_latest_snapshot(
        self,
        spark: SparkSession,
        table: str,
        date_col: str = "_ingestion_date",
    ) -> DataFrame:
        """Latest-snapshot read: rows whose ingestion date equals the table
        max — the reference's scalar-subquery pattern
        (``WHERE DATE(c) = (SELECT MAX(DATE(c)) FROM t)``, bigquery.py:77-85),
        expressed as a self-join on the 1-row max (Catalyst decorrelates the
        scalar subquery to the same shape; broadcast of the 1-row side)."""
        df = spark.read.parquet(self._table_path(table))
        latest = df.agg(F.max(F.col(date_col).cast("date")).alias("__latest"))
        return (
            df.join(F.broadcast(latest), F.col(date_col).cast("date") == F.col("__latest"))
            .drop("__latest")
        )

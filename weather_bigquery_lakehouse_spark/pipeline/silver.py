"""Silver tier: clean, standardize, validate → parquet.

Reference semantics (src/etl/bronze_to_silver.py), one lazy plan per table
instead of the reference's O(columns) eager count() jobs:

  weather:  flatten clima array (explode), parse `atualizado_em` through
            the 3-format coalesce chain, drop `indice_uv`, trim / null-
            filter / dedup, stamp `_processing_date`.
  cities:   flatten nested structs to `parent_child` columns, same
            cleaning, name↔id consistency check (A1).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.cleaning import (
    dedupe_rows,
    drop_null_rows,
    normalize_names,
    removal_accounting,
    trim_strings,
)
from ..functions.dates import parse_date_multi
from ..functions.flatten import flatten_structs
from ..functions.profiling import consistency_violations
from ..io.writers import write_table
from .bronze import CITY_PAYLOAD, FORECAST_PAYLOAD, read_bronze


def write_quality_report(
    pre: DataFrame,
    post: DataFrame,
    zone_dir: str,
    entity: str,
    processing_date: str,
) -> None:
    """Persist the per-stage cleaning accounting as a first-class silver
    output: one row per (entity, run) under ``silver/_quality/<entity>``
    with rows in/out and every count the reference prints per cleaning
    step (nulls per column, untrimmed strings, duplicate rows — reference
    data_cleaning.py:8-53). The accounting and the rows-out count are two
    aggregates composed into ONE write job (cross-join of two 1-row
    frames), not a loop of eager ``count()`` actions; append mode keeps
    the run history queryable."""
    report = (
        removal_accounting(pre)
        .withColumnRenamed("n_rows", "rows_in")
        .crossJoin(post.agg(F.count(F.lit(1)).alias("rows_out")))
    )
    metric_cols = [c for c in report.columns if c not in ("rows_in", "rows_out")]
    out = report.select(
        F.lit(entity).alias("entity"),
        F.lit(processing_date).cast("date").alias("_processing_date"),
        "rows_in",
        "rows_out",
        *metric_cols,
    )
    write_table(
        out, os.path.join(zone_dir, "silver", "_quality", entity), mode="append"
    )


def silver_weather(
    spark: SparkSession, zone_dir: str, processing_date: str
) -> DataFrame:
    """Bronze forecasts → one row per (city, day) with typed dates.

    Mirrors reference bronze_to_silver.py:30-86: the explode replaces the
    pandas `.explode('clima')` done at ingest (F13) — done HERE, the raw
    array survives in bronze."""
    bronze = read_bronze(spark, zone_dir, "cptec_weather", FORECAST_PAYLOAD)
    exploded = bronze.select(
        F.col("nome").alias("cidade"),
        "estado",
        "atualizado_em",
        F.explode("clima").alias("dia"),
        "_source",
        "_ingestion_date",
    ).select(
        "cidade",
        "estado",
        "atualizado_em",
        F.col("dia.data").alias("data"),
        F.col("dia.condicao").alias("condicao"),
        F.col("dia.condicao_desc").alias("condicao_desc"),
        F.col("dia.min").alias("min"),
        F.col("dia.max").alias("max"),
        # indice_uv dropped (reference bronze_to_silver.py:71)
        "_source",
        "_ingestion_date",
    )
    cleaned = (
        dedupe_rows(drop_null_rows(trim_strings(exploded)))
        .withColumn("atualizado_em", parse_date_multi("atualizado_em"))
        .withColumn("data", F.to_date("data"))
        .withColumn("_processing_date", F.lit(processing_date).cast("date"))
    )
    write_table(
        cleaned,
        os.path.join(zone_dir, "silver", "cptec_weather"),
        partition_by=["_ingestion_date"],
    )
    write_quality_report(exploded, cleaned, zone_dir, "cptec_weather", processing_date)
    return cleaned


def silver_cities(
    spark: SparkSession, zone_dir: str, processing_date: str
) -> tuple[DataFrame, DataFrame]:
    """Bronze city payloads → flat silver table + consistency violations.

    Struct flattening is a pure projection (F12) — the Spark-native
    replacement for `pd.json_normalize` with prefix renames."""
    bronze = read_bronze(spark, zone_dir, "ibge_cities", CITY_PAYLOAD)
    flat = normalize_names(flatten_structs(bronze))
    # Reference keeps id, nome + region attributes (bronze_ingest.py:40-47)
    projected = flat.select(
        "id",
        "nome",
        F.col("microrregiao_id"),
        F.col("microrregiao_nome"),
        F.col("microrregiao_mesorregiao_UF_sigla").alias("uf_sigla"),
        F.col("microrregiao_mesorregiao_UF_regiao_nome").alias("regiao_nome"),
        F.col("regiao_imediata_id"),
        F.col("regiao_imediata_nome"),
        "_source",
        "_ingestion_date",
    )
    cleaned = dedupe_rows(trim_strings(projected)).withColumn(
        "_processing_date", F.lit(processing_date).cast("date")
    )
    violations = consistency_violations(cleaned, "nome", "id")
    write_table(
        cleaned,
        os.path.join(zone_dir, "silver", "ibge_cities"),
        partition_by=["_ingestion_date"],
    )
    write_quality_report(projected, cleaned, zone_dir, "ibge_cities", processing_date)
    return cleaned, violations


def silver_cptec_cities(
    spark: SparkSession, zone_dir: str, processing_date: str
) -> DataFrame:
    """CPTEC city registry (id ↔ name) derived from the forecast payloads —
    the reference lands it as its own bronze CSV (bronze_ingest.py:53-55)."""
    bronze = read_bronze(spark, zone_dir, "cptec_weather", FORECAST_PAYLOAD)
    cities = bronze.select(
        F.col("codigo").alias("id"), "nome", "estado", "_source", "_ingestion_date"
    )
    cleaned = dedupe_rows(drop_null_rows(trim_strings(cities))).withColumn(
        "_processing_date", F.lit(processing_date).cast("date")
    )
    write_table(
        cleaned,
        os.path.join(zone_dir, "silver", "cptec_cities"),
        partition_by=["_ingestion_date"],
    )
    write_quality_report(cities, cleaned, zone_dir, "cptec_cities", processing_date)
    return cleaned

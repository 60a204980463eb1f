"""Pipeline runner: bronze → silver → gold in one session.

Replaces the reference's Airflow DAG sequencing
(airflow/dags/bigquery_weather_dag.py:63 —
`bronze_ingest >> bronze_to_silver >> silver_to_gold`). Orchestration is a
function call chain; any scheduler (Airflow, cron, Trigger.AvailableNow)
can wrap it without the engine caring.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import SparkSession

from ..io.catalog import GoldCatalog
from . import bronze, gold, silver


def run_pipeline(
    spark: SparkSession,
    zone_dir: str,
    warehouse_dir: str,
    city_records: list[dict],
    forecast_records: list[dict],
    run_date: str | None = None,
) -> dict:
    """One full daily run. ``city_records``/``forecast_records`` come from
    the injected sources (HTTP in production, fixtures in tests)."""
    run_date = run_date or dt.date.today().isoformat()

    bronze.land_records(
        spark, city_records, bronze.CITY_PAYLOAD, zone_dir,
        "ibge_cities", "IBGE API", run_date,
    )
    bronze.land_records(
        spark, forecast_records, bronze.FORECAST_PAYLOAD, zone_dir,
        "cptec_weather", "CPTEC API", run_date,
    )

    weather = silver.silver_weather(spark, zone_dir, run_date)
    cities, violations = silver.silver_cities(spark, zone_dir, run_date)
    cptec_cities = silver.silver_cptec_cities(spark, zone_dir, run_date)

    catalog = GoldCatalog(warehouse_dir)
    tables = gold.load_gold(
        spark, catalog, weather, cities, cptec_cities, modeling_date=run_date
    )
    return {
        "catalog": catalog,
        "tables": tables,
        "consistency_violations": violations,
    }

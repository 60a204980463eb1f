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


def run_maintenance(
    spark: SparkSession,
    zone_dir: str,
    keep_dates: list[str] | None = None,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> dict:
    """Nightly zone maintenance after the daily run: compact each zone's
    small files and, when a retention window is given, expire
    ``_ingestion_date`` partitions outside it. Kept separate from
    ``run_pipeline`` so a scheduler can run it at a different cadence (a
    daily load with weekly compaction is the common shape).

    Policy, not mechanism: retention applies to every entity zone
    (``zones/{tier}/{entity}``); compaction only to parquet zones
    (silver and up). Bronze lands raw JSON and is the audit trail — it
    expires, but it is never rewritten.
    """
    import os

    from ..io.maintenance import compact_zone, expire_partitions

    reports: dict[str, object] = {}

    def _entity_zones(root: str):
        for tier in sorted(os.listdir(root)):
            tpath = os.path.join(root, tier)
            if not os.path.isdir(tpath):
                continue
            for entity in sorted(os.listdir(tpath)):
                epath = os.path.join(tpath, entity)
                if os.path.isdir(epath):
                    yield f"{tier}/{entity}", epath

    if not os.path.isdir(zone_dir):
        return reports
    for name, zpath in _entity_zones(zone_dir):
        if keep_dates is not None:
            dropped = expire_partitions(zpath, "_ingestion_date", keep_dates)
            if dropped:
                reports[f"{name}:expired"] = dropped
        has_parquet = any(
            f.endswith(".parquet") for _, _, fs in os.walk(zpath) for f in fs
        )
        if has_parquet:
            reports[f"{name}:compaction"] = compact_zone(
                spark, zpath, target_file_bytes=target_file_bytes
            )
    return reports

"""End-to-end pipeline test: fixtures → bronze → silver → gold, asserting
the reference's star-schema contracts + this engine's idempotency upgrade."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from weather_bigquery_lakehouse_spark.pipeline import run_pipeline
from weather_bigquery_lakehouse_spark.pipeline.sources import (
    CitySource,
    fixture_city_rows,
    fixture_forecast_rows,
)


@pytest.fixture(scope="module")
def result(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("lakehouse")
    return run_pipeline(
        spark,
        zone_dir=str(base / "zones"),
        warehouse_dir=str(base / "warehouse"),
        city_records=fixture_city_rows(40),
        forecast_records=fixture_forecast_rows(40),
        run_date="2024-03-25",
    )


def test_gold_tables_exist(result):
    t = result["tables"]
    assert t["dim_city"].count() > 0
    assert t["dim_update_date"].count() >= 1
    assert t["dim_forecast_date"].count() == 6  # 6-day horizon
    assert t["dim_weather_condition"].count() >= 2
    assert t["fact_weather"].count() > 0


def test_fact_joins_every_dim_losslessly(result, spark):
    """The recomputed-FK contract: fact ⋈ each dim on the surrogate key
    keeps every fact row (reference invariant, silver_to_gold.py:158-166)."""
    t = result["tables"]
    fact = t["fact_weather"]
    n = fact.count()
    assert fact.join(t["dim_city"], "id_city").count() == n
    assert fact.join(t["dim_forecast_date"], "id_forecast_date").count() == n
    assert fact.join(t["dim_weather_condition"], "id_weather_condition").count() == n
    assert fact.join(t["dim_update_date"], "id_update_date").count() == n


def test_key_format_is_sha256_hex(result):
    row = result["tables"]["dim_city"].first()
    assert len(row["id_city"]) == 64
    int(row["id_city"], 16)  # parses as hex


def test_mixed_date_formats_collapsed(result):
    """All three atualizado_em formats must parse to the same date."""
    dates = [
        r["atualizado_em"]
        for r in result["tables"]["dim_update_date"].collect()
    ]
    assert [str(d) for d in dates] == ["2024-03-25"]


def test_cleaning_removed_whitespace_and_dups(result):
    cities = result["tables"]["dim_city"]
    names = [r["nome"] for r in cities.collect()]
    assert all(n == n.strip() for n in names)
    assert len(names) == len(set(names))


def test_fact_append_is_idempotent(spark, tmp_path):
    """Re-running the SAME day must not grow the fact table — the
    documented fix for the reference's rerun double-load (SURVEY.md §7)."""
    kwargs = dict(
        zone_dir=str(tmp_path / "zones"),
        warehouse_dir=str(tmp_path / "warehouse"),
        city_records=fixture_city_rows(10),
        forecast_records=fixture_forecast_rows(10),
        run_date="2024-03-25",
    )
    first = run_pipeline(spark, **kwargs)
    n1 = first["tables"]["fact_weather"].count()
    second = run_pipeline(spark, **kwargs)
    n2 = second["tables"]["fact_weather"].count()
    assert n1 == n2 > 0


def test_source_drop_accounting():
    src = CitySource(fetch_fn=lambda url: (_ for _ in ()).throw(IOError("down")))
    rows = src.city_rows(["a", "b"])
    assert rows == [] and src.stats.dropped == ["a", "b"] and src.stats.requested == 2

"""Pipeline runner: bronze → silver → gold (→ maintenance) in one session.

Replaces the reference's Airflow DAG sequencing
(airflow/dags/bigquery_weather_dag.py:14-66 —
`bronze_ingest >> bronze_to_silver >> silver_to_gold`, ``@daily``,
``catchup=False``, 1 retry / 5 min). The ordering is DATA, not code: a
scheduler-agnostic :class:`DagSpec` (task ids + dependency edges +
schedule/retry/catchup flags) drives the runner, and any scheduler
(Airflow, cron, Trigger.AvailableNow) can render the same spec into its
own DAG without the engine caring.
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from ..io.catalog import GoldCatalog
from . import bronze, gold, silver


@dataclass(frozen=True)
class TaskSpec:
    task_id: str
    upstream: tuple[str, ...] = ()
    cadence: str = "daily"  # maintenance runs on its own (slower) cadence


@dataclass(frozen=True)
class DagSpec:
    """Scheduler-agnostic DAG description — the flags mirror the
    reference DAG's (schedule/catchup/retries/retry_delay,
    airflow/dags/bigquery_weather_dag.py:9-22)."""

    dag_id: str
    schedule: str
    catchup: bool
    retries: int
    retry_delay_minutes: int
    tasks: tuple[TaskSpec, ...] = field(default_factory=tuple)

    def validate(self) -> None:
        ids = [t.task_id for t in self.tasks]
        if len(ids) != len(set(ids)):
            raise ValueError(f"duplicate task ids in {self.dag_id}")
        known = set(ids)
        for t in self.tasks:
            missing = set(t.upstream) - known
            if missing:
                raise ValueError(f"{t.task_id} depends on unknown {missing}")
        self.topological_order()  # raises on cycles

    def topological_order(self) -> list[str]:
        """Deterministic topological sort (declaration order among
        ready tasks)."""
        remaining = {t.task_id: set(t.upstream) for t in self.tasks}
        order: list[str] = []
        while remaining:
            ready = [t.task_id for t in self.tasks
                     if t.task_id in remaining and not remaining[t.task_id]]
            if not ready:
                raise ValueError(f"cycle in {self.dag_id}: {sorted(remaining)}")
            for task_id in ready:
                order.append(task_id)
                del remaining[task_id]
                for deps in remaining.values():
                    deps.discard(task_id)
        return order


#: The daily lakehouse cadence. Two independent bronze landings fan in to
#: the silver transform; maintenance hangs off gold on a weekly cadence.
PIPELINE_DAG = DagSpec(
    dag_id="weather_lakehouse_daily",
    schedule="@daily",
    catchup=False,
    retries=1,
    retry_delay_minutes=5,
    tasks=(
        TaskSpec("bronze_ingest_cities"),
        TaskSpec("bronze_ingest_weather"),
        TaskSpec("silver_transform", ("bronze_ingest_cities", "bronze_ingest_weather")),
        TaskSpec("gold_load", ("silver_transform",)),
        TaskSpec("zone_maintenance", ("gold_load",), cadence="weekly"),
    ),
)
PIPELINE_DAG.validate()


def run_pipeline(
    spark: SparkSession,
    zone_dir: str,
    warehouse_dir: str,
    city_records: list[dict],
    forecast_records: list[dict],
    run_date: str | None = None,
    dag: DagSpec = PIPELINE_DAG,
) -> dict:
    """One full daily run, executed in ``dag``'s topological order.
    ``city_records``/``forecast_records`` come from the injected sources
    (HTTP in production, fixtures in tests). Weekly-cadence tasks
    (maintenance) are skipped here — schedulers run them via
    :func:`run_maintenance` at their own cadence."""
    run_date = run_date or dt.date.today().isoformat()
    ctx: dict = {}

    def _bronze_cities(sess: SparkSession) -> None:
        bronze.land_records(
            sess, city_records, bronze.CITY_PAYLOAD, zone_dir,
            "ibge_cities", "IBGE API", run_date,
        )

    def _bronze_weather(sess: SparkSession) -> None:
        bronze.land_records(
            sess, forecast_records, bronze.FORECAST_PAYLOAD, zone_dir,
            "cptec_weather", "CPTEC API", run_date,
        )

    def _silver(sess: SparkSession) -> None:
        ctx["weather"] = silver.silver_weather(sess, zone_dir, run_date)
        ctx["cities"], ctx["violations"] = silver.silver_cities(
            sess, zone_dir, run_date
        )
        ctx["cptec_cities"] = silver.silver_cptec_cities(sess, zone_dir, run_date)

    def _gold(sess: SparkSession) -> None:
        ctx["catalog"] = GoldCatalog(warehouse_dir)
        ctx["tables"] = gold.load_gold(
            sess, ctx["catalog"], ctx["weather"], ctx["cities"],
            ctx["cptec_cities"], modeling_date=run_date,
        )

    stages = {
        "bronze_ingest_cities": _bronze_cities,
        "bronze_ingest_weather": _bronze_weather,
        "silver_transform": _silver,
        "gold_load": _gold,
    }
    # Fail fast with a descriptive error instead of a KeyError mid-run: a
    # custom dag may only reference executable stage ids (non-daily ids are
    # dispatched by the scheduler, not here), and must include the ctx
    # producers the gold stage consumes.
    dag.validate()
    daily_ids = {t.task_id for t in dag.tasks if t.cadence == "daily"}
    unknown = daily_ids - set(stages)
    if unknown:
        raise ValueError(
            f"dag {dag.dag_id}: daily task(s) {sorted(unknown)} have no "
            f"executable stage; known stages: {sorted(stages)}"
        )
    # one-directional requirements down the ctx chain: gold consumes
    # silver's ctx outputs and silver consumes both bronze landings, so a
    # dag running a downstream stage must also run its producers — a
    # silver-only dag would otherwise die mid-run on a missing bronze zone
    # read, the same KeyError-class failure this check exists to prevent.
    # Bronze-only partial dags (a re-landing backfill) are fine.
    if "gold_load" in daily_ids and "silver_transform" not in daily_ids:
        raise ValueError(
            f"dag {dag.dag_id}: gold_load requires silver_transform — gold "
            "consumes the silver stage's outputs"
        )
    _bronze_ids = {"bronze_ingest_cities", "bronze_ingest_weather"}
    if "silver_transform" in daily_ids and not _bronze_ids <= daily_ids:
        raise ValueError(
            f"dag {dag.dag_id}: silver_transform requires "
            f"{sorted(_bronze_ids)} — silver reads both bronze landings"
        )
    cadences = {t.task_id: t.cadence for t in dag.tasks}
    executed = []
    for task_id in dag.topological_order():
        if cadences[task_id] != "daily":
            continue
        stages[task_id](spark)
        executed.append(task_id)
    return {
        # .get: a partial dag (e.g. bronze-only backfill) has no gold ctx
        "catalog": ctx.get("catalog"),
        "tables": ctx.get("tables"),
        "consistency_violations": ctx.get("violations"),
        "executed": executed,
    }


def read_silver(spark: SparkSession, zone_dir: str, entity: str):
    """Read a silver entity zone back from disk — the cross-process input
    path for schedulers that run each DAG task in its own process (the
    in-process runner hands DataFrames through ctx instead)."""
    import os

    return spark.read.parquet(os.path.join(zone_dir, "silver", entity))


def execute_stage(
    spark: SparkSession,
    task_id: str,
    zone_dir: str,
    warehouse_dir: str,
    run_date: str | None = None,
    city_records: list[dict] | None = None,
    forecast_records: list[dict] | None = None,
    keep_dates: list[str] | None = None,
) -> None:
    """Execute ONE pipeline task in isolation — the entrypoint an external
    scheduler (e.g. the Airflow DAG emitted by ``pipeline.airflow_emit``)
    binds each task to. Unlike :func:`run_pipeline` (one session, outputs
    handed through ctx), every stage here reads its inputs from the zones,
    so tasks can run in separate processes exactly as a scheduler launches
    them — the gold stage re-reads the silver zone the silver task wrote.
    """
    run_date = run_date or dt.date.today().isoformat()
    if task_id == "bronze_ingest_cities":
        bronze.land_records(
            spark, city_records or [], bronze.CITY_PAYLOAD, zone_dir,
            "ibge_cities", "IBGE API", run_date,
        )
    elif task_id == "bronze_ingest_weather":
        bronze.land_records(
            spark, forecast_records or [], bronze.FORECAST_PAYLOAD, zone_dir,
            "cptec_weather", "CPTEC API", run_date,
        )
    elif task_id == "silver_transform":
        silver.silver_weather(spark, zone_dir, run_date)
        silver.silver_cities(spark, zone_dir, run_date)
        silver.silver_cptec_cities(spark, zone_dir, run_date)
    elif task_id == "gold_load":
        gold.load_gold(
            spark,
            GoldCatalog(warehouse_dir),
            read_silver(spark, zone_dir, "cptec_weather"),
            read_silver(spark, zone_dir, "ibge_cities"),
            read_silver(spark, zone_dir, "cptec_cities"),
            modeling_date=run_date,
        )
    elif task_id == "zone_maintenance":
        run_maintenance(spark, zone_dir, keep_dates=keep_dates)
    else:
        known = [
            "bronze_ingest_cities", "bronze_ingest_weather",
            "silver_transform", "gold_load", "zone_maintenance",
        ]
        raise ValueError(f"unknown task_id {task_id!r}; known: {known}")


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
                # underscore-prefixed dirs are metadata tables (_quality:
                # one row per run, nothing to compact or expire) — Spark's
                # own file index ignores _-prefixed paths, so treating one
                # as an entity zone would fail the read outright
                if entity.startswith("_"):
                    continue
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

"""The medallion pipeline: bronze ingest → silver clean → gold star schema.

Re-expresses the reference's three DAG tasks
(reference airflow/dags/bigquery_weather_dag.py:24-63) as engine library
calls sequenced by `runner.run_pipeline`. Orchestration is plain Python —
the reference's Airflow wiring is deployment detail, not engine capability.
"""

from .runner import run_pipeline

"""Airflow DAG stub — the reference's Entry point C, engine-native.

The reference schedules its Databricks notebook daily via MWAA
(reference: dag/0af8d0adfd13_dag.py:30-46 — DatabricksSubmitRunOperator,
schedule_interval='@daily', catchup=False, retries=5 @ 2 min). The engine's
equivalent runs the batch CLI (`python -m pinterest_data_pipeline218_spark.
runner batch`) on the same cadence; scheduling stays out-of-engine, so this
file is an optional deployment artifact, import-guarded because Airflow is
not a runtime dependency of the engine.
"""

from __future__ import annotations

from datetime import datetime, timedelta

try:
    from airflow import DAG
    from airflow.operators.bash import BashOperator
except ImportError:  # Airflow not installed: the engine never imports this module
    DAG = None

DEFAULT_ARGS = {
    "owner": "pyspark-pin-analytics",
    "depends_on_past": False,
    # the reference's retry policy (dag/0af8d0adfd13_dag.py:25-26)
    "retries": 5,
    "retry_delay": timedelta(minutes=2),
}

if DAG is not None:
    with DAG(
        dag_id="pyspark_pin_analytics_batch",
        default_args=DEFAULT_ARGS,
        description="Daily batch: generate/ingest -> clean -> T4..T11",
        schedule_interval="@daily",
        start_date=datetime(2026, 1, 1),
        catchup=False,
    ) as dag:
        run_batch = BashOperator(
            task_id="run_batch_pipeline",
            bash_command=(
                "cd {{ var.value.get('pin_analytics_repo', '/opt/pyspark-pin-analytics') }} && "
                "python -m pinterest_data_pipeline218_spark.runner batch "
                "--out {{ var.value.get('pin_analytics_out', '/data/pin_tables') }}"
            ),
        )

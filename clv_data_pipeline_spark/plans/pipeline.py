"""The 5-task reference DAG as one Spark driver program (SURVEY.md §3.1).

Reference chain (dags/clv_data_dag.py:115):
    generate_and_upload >> load_gcs_to_bq_staging >>
    transform_to_customer_features >> validate_features_step >>
    predict_clv_scores

Airflow task boundaries (separate processes + GCS/BQ round trips)
dissolve into DataFrame lineage.  The only true barriers remain:
(a) the validation gate — its aggregates must materialize before the
pass/fail decision; (b) the model-fit collects.  Everything else is one
lazily-planned job per sink.

Scale notes: staging is partitioned by ``load_date`` so the (full
refresh) feature build reads only what it needs if later made
incremental; features and predictions are tiny (1 row/customer) and
written overwrite like the reference's CTAS / WRITE_TRUNCATE.
"""

from __future__ import annotations

import datetime as dt
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clv_data_pipeline_spark.operators.clv import run_clv_logic
from clv_data_pipeline_spark.operators.features import (
    normalize_for_model,
    rfm_features,
)
from clv_data_pipeline_spark.operators.validate import (
    observed_features,
    run_validation_checks,
)
from clv_data_pipeline_spark.simulate import simulate_daily_batch


@dataclass
class PipelineResult:
    staging_rows: int
    feature_rows: int
    prediction_rows: int
    features_path: str
    predictions_path: str


def _registry_max_id(spark: SparkSession, path: str, before_date: str) -> int:
    """S8+A5: MAX(CustomerID) over registry allocations from runs BEFORE
    ``before_date``; 0 when the registry does not exist yet (reference
    simulate_data.py:30-42, 62-73: empty table -> max 0 -> all-new
    branch).  Excluding the current day makes a day's rerun read the
    same max, allocate the same IDs, and therefore regenerate the same
    batch — idempotency the reference's unconditional streaming insert
    lacks."""
    try:
        df = spark.read.parquet(path)
    except Exception:
        return 0
    row = (
        df.filter(F.col("load_date") < F.lit(before_date).cast("date"))
        .agg(F.coalesce(F.max("CustomerID"), F.lit(0).cast("long")).alias("m"))
        .first()
    )
    return int(row["m"])


def run_pipeline(
    spark: SparkSession,
    base_dir: str,
    run_date: dt.date | str = "2026-01-01",
    seed: int = 42,
    max_existing_id: int | None = 400,
    idempotent_reruns: bool = True,
) -> PipelineResult:
    """Execute the full reference pipeline under ``base_dir``.

    Task 0: read MAX(CustomerID) from the master_users registry (or use
            the explicit ``max_existing_id``), generate, append the new
            customer IDs back to the registry (reference
            simulate_data.py:74-95 streaming insert).
    Task 1+2: generate one 24 h batch, land it in the staging partition
            for ``run_date``.  ``idempotent_reruns`` uses dynamic
            partition overwrite so re-running a day replaces its
            partition instead of duplicating it — the reference's
            WRITE_APPEND double-loads on retry; at scale, idempotent
            daily jobs are the operational requirement.
    Task 3: full-refresh RFM-T features (CREATE OR REPLACE semantics).
    Task 4: firewall — raises ValueError on gate failure, aborting
            before scoring, exactly like the failed Airflow task.
    Task 5: fit + score + truncate-write predictions.
    """
    staging = os.path.join(base_dir, "transactions_staging")
    features_path = os.path.join(base_dir, "customer_features")
    predictions_path = os.path.join(base_dir, "predicted_clv")
    registry_path = os.path.join(base_dir, "master_users")
    run_date = str(run_date)

    # Task 0 — ID registry (reference simulate_data.py:23-95)
    if max_existing_id is None:
        max_existing_id = _registry_max_id(spark, registry_path, run_date)

    # Task 1+2 — generate & load (reference clv_data_dag.py:49-75).
    # The generation window is the 24 h BEFORE the run date
    # (START_TIME = END_TIME - 1 day, reference simulate_data.py:18-19),
    # so T = datediff(run_date, first_purchase) >= 0 at the firewall.
    window_start = (
        dt.date.fromisoformat(run_date) - dt.timedelta(days=1)
    ).isoformat()
    batch = simulate_daily_batch(
        spark, max_existing_id, f"{window_start} 00:00:00", seed=seed
    ).withColumn("load_date", F.lit(run_date).cast("date"))
    if idempotent_reruns:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        batch.write.mode("overwrite").partitionBy("load_date").parquet(staging)
    else:
        batch.write.mode("append").partitionBy("load_date").parquet(staging)

    # registry write for the newly-allocated IDs (S7), dated so a rerun
    # overwrites its own allocation instead of stacking a new one
    new_ids = (
        spark.range(
            max_existing_id + 1,
            max_existing_id + 1 + 10,  # NEW_USERS_DAILY
            1,
            1,
        )
        .select(F.col("id").alias("CustomerID"))
        .withColumn("load_date", F.lit(run_date).cast("date"))
    )
    if idempotent_reruns:
        new_ids.write.mode("overwrite").partitionBy("load_date").parquet(
            registry_path
        )
    else:
        new_ids.write.mode("append").partitionBy("load_date").parquet(
            registry_path
        )

    tx = spark.read.parquet(staging)
    staging_rows = tx.count()

    # Task 3 — full-refresh feature build (reference clv_data_dag.py:77-96).
    # The firewall's feature-side probes (row count == distinct customers,
    # since the build groups by customer; negative-value count) ride the
    # write via observe() — no second pass over the feature table.
    features = rfm_features(tx, asof=run_date)
    observed, obs = observed_features(features)
    observed.write.mode("overwrite").parquet(features_path)
    metrics = obs.get
    features = spark.read.parquet(features_path)

    # Task 4 — the firewall (reference clv_data_dag.py:99-103); raises on
    # DATA LOSS / SCHEMA ERROR / SANITY ERROR.  Only the raw-side
    # distinct-customer count still needs its own aggregate.
    raw_c = int(
        tx.agg(F.count_distinct("CustomerID").alias("c")).first()["c"]
    )
    run_validation_checks(
        raw_c,
        int(metrics["feature_count"]),
        int(metrics["invalid_count"]),
        features.columns,
    )

    # Task 5 — scoring (reference clv_data_dag.py:106-110)
    preds = run_clv_logic(normalize_for_model(features))
    out = preds.select(
        "customer_id",
        "predicted_purchases",
        "predicted_avg_value",
        "clv",
        "negatif_clv_flag",
        "outliners_flag",
    )
    out.write.mode("overwrite").parquet(predictions_path)

    return PipelineResult(
        staging_rows=staging_rows,
        feature_rows=features.count(),
        prediction_rows=spark.read.parquet(predictions_path).count(),
        features_path=features_path,
        predictions_path=predictions_path,
    )

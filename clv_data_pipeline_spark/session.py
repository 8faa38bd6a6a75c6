"""SparkSession factory with scale-oriented defaults.

The reference pipeline delegated execution to BigQuery and pandas
(SURVEY.md §4); here a single SparkSession replaces both.  Defaults:

- UTC session timezone: the reference's generator stamps UTC
  (reference dags/simulate_data.py:13,18) and its sample CSVs carry
  ``+00:00`` offsets, so all timestamp arithmetic is pinned to UTC.
- AQE on (coalesce + skew-join): at 100 TB the right shuffle
  partitioning is data-dependent; let the runtime re-plan.
- Arrow on: every driver <-> executor pandas crossing (the model-fit
  barrier, pandas UDF scoring) moves columnar batches, not pickled rows.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CONF: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # 128 MB scan splits: big enough to amortize task overhead, small
    # enough that a 100 TB scan still yields ~800k parallel tasks.
    "spark.sql.files.maxPartitionBytes": "134217728",
    # 64 MB broadcast ceiling: region/nation/part-class dims broadcast;
    # fact-fact joins shuffle.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    # Driver testdata stores events.ts as TIMESTAMP(NANOS), which the
    # Spark parquet reader rejects by default; read nanos as epoch-long
    # and convert at the source (sources/io.py) like DuckDB does (ns
    # truncated to micros).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}


def get_spark(
    app_name: str = "clv_data_pipeline_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine defaults.

    ``master`` defaults to whatever the environment provides (cluster
    deploy) or ``local[N]`` from ``SPARK_GRAFT_CPUS`` for local runs.
    ``shuffle_partitions`` defaults to 32 locally; on a real cluster
    leave it unset and let AQE coalesce from a high initial value.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None and "SPARK_GRAFT_CPUS" in os.environ:
        master = f"local[{os.environ['SPARK_GRAFT_CPUS']}]"
    if master:
        builder = builder.master(master)
    conf = dict(DEFAULT_CONF)
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions or 32)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()

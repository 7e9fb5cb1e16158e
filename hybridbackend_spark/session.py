"""SparkSession factory tuned for the engine.

Defaults follow the scale guidance: AQE on (runtime re-planning, skew-join
splitting, partition coalescing), Arrow enabled for the pandas-UDF boundary,
UTC session timezone (so timestamps compare exactly against external SQL
oracles), and shuffle partitions sized to the local core count rather than
Spark's default 200. On a real cluster the same builder is used with a
different ``master`` and a larger ``shuffle_partitions``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_session", "DEFAULT_CONF"]

DEFAULT_CONF = {
    # Adaptive execution: coalesce small shuffle partitions, split skewed
    # ones, and switch join strategies at runtime. Essential at 100 TB.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow batches for pandas UDFs / toPandas — the only sanctioned
    # Python boundary; row-at-a-time serde is never used in this engine.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    # Deterministic timestamp comparison against UTC-naive oracles.
    "spark.sql.session.timeZone": "UTC",
    # Parquet: vectorized reader + filter pushdown are on by default;
    # keep corrupt-file skipping opt-in per read, not global.
    "spark.sql.parquet.filterPushdown": "true",
    # Full metadata in plan strings so pushdown/pruning assertions can
    # inspect PushedFilters/ReadSchema without truncation.
    "spark.sql.maxMetadataStringLength": "10000",
    "spark.ui.enabled": "false",
}


def get_session(
    app_name: str = "hybridbackend-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` locally; pass an
    explicit master for cluster deployment. ``shuffle_partitions`` defaults
    to the local parallelism (cores) — on a cluster, set it to 2-3x total
    executor cores or rely on AQE coalescing from a higher initial value.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32

    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(DEFAULT_CONF)
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if master.startswith("local"):
        conf.setdefault("spark.driver.memory", "48g")
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark

"""SparkSession factory with the scale-oriented defaults this engine assumes.

Settings rationale (tested at local[N]; designed for a 1000-executor cluster):
* AQE on + coalescePartitions + skewJoin: runtime re-planning replaces
  hand-tuned shuffle-partition counts and absorbs url-host skew in joins.
* shuffle.partitions defaults to cores locally; on a real cluster set it
  ≈ 2-3× total executor cores (AQE coalesces down).
* Arrow enabled + bounded maxRecordsPerBatch: the web-text batch stages move
  large `text`/`html` values; unbounded batches OOM the Python workers.
* session timezone pinned UTC so timestamp semantics match the DuckDB oracle
  and are cluster-locale-independent.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "cloud_data_quality_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    arrow_batch_rows: int = 2048,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or cpus
    arrow_batch_rows = int(os.environ.get("SPARK_GRAFT_ARROW_BATCH",
                                          arrow_batch_rows))
    b = (
        SparkSession.builder.master(master).appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_batch_rows))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark

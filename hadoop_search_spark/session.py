"""SparkSession factory tuned for the local[N] test harness.

The configuration is chosen for correctness-at-scale first:

* AQE on (runtime coalescing, skew-join splitting) — on a real
  1000-executor cluster the same plans re-partition themselves at
  runtime instead of relying on a static ``shuffle.partitions``.
* ``spark.sql.session.timeZone=UTC`` so timestamp semantics match the
  DuckDB oracle (DuckDB timestamps are UTC-naive).
* Arrow enabled — every Pandas UDF / ``applyInPandas`` path transfers
  columnar batches, not pickled rows.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "hadoop_search_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) a local SparkSession.

    ``shuffle.partitions`` defaults to the core count: at local scale a
    200-way shuffle is pure overhead, and on a real cluster AQE
    coalesces to the right width anyway.
    """
    cpus = cpus or DEFAULT_CPUS
    shuffle_partitions = shuffle_partitions or cpus
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark

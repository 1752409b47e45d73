"""Exact-match query-result cache — reference S8/query cache
(`hadoop_wiki_search/util/CorpusFetcher.java:24,31-71`: a MapFile of
``query → serialized SearchResult``).

Spark form: a keyed parquet table ``(query, result, ts)`` probed with
a pushed-down equality filter. Append-only; the newest row wins on
probe. Optional — an optimization, not semantics.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import SparkSession

_SCHEMA = "query STRING, result STRING, ts DOUBLE"


class QueryCache:
    def __init__(self, spark: SparkSession, path: str) -> None:
        self.spark = spark
        self.path = path

    def _exists(self) -> bool:
        return os.path.exists(self.path)

    def get(self, query: str) -> str | None:
        """Point probe (`CorpusFetcher.isInCache`, `:31-55`)."""
        if not self._exists():
            return None
        from pyspark.sql import functions as F

        rows = (
            self.spark.read.schema(_SCHEMA)
            .parquet(self.path)
            .filter(F.col("query") == query)
            .orderBy(F.desc("ts"))
            .limit(1)
            .collect()
        )
        return rows[0].result if rows else None

    def put(self, query: str, result: str) -> None:
        """Append (`CorpusFetcher.addToCache`, `:57-71`)."""
        df = self.spark.createDataFrame([(query, result, time.time())], _SCHEMA)
        df.coalesce(1).write.mode("append").parquet(self.path)

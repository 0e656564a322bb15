"""Stats API (reference stats/ package + RestNeuralStatsAction).

The reference exposes event counters (EventStatsManager.increment, 5-minute
rolling windows) and info stats (cluster/processor config counts) over
`GET /_plugins/_neural/stats`. The Spark engine's equivalents:

* build/query events → the per-index ``stats_events`` parquet table written
  by IndexBuilder (run_id, stage, name, value, ts);
* info stats → derived from the index's stats/terms/lineage tables.

Both come back as DataFrames so callers aggregate with plain Spark.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def event_stats(spark: SparkSession, index_dir: str) -> DataFrame:
    """All recorded build/query events for an index."""
    return spark.read.parquet(os.path.join(index_dir, "stats_events"))


def event_stats_windowed(
    spark: SparkSession, index_dir: str, window: str = "5 minutes"
) -> DataFrame:
    """Rolling-window counters (the reference's TimestampedEventStat uses
    5-minute buckets): (window_start, stage, name, total)."""
    ev = event_stats(spark, index_dir)
    return (
        ev.groupBy(F.window("ts", window).alias("w"), "stage", "name")
        .agg(F.sum("value").alias("total"))
        .select(F.col("w.start").alias("window_start"), "stage", "name", "total")
    )


def info_stats(spark: SparkSession, index_dir: str) -> dict:
    """Point-in-time info snapshot (reference InfoStatsManager)."""
    srow = spark.read.parquet(os.path.join(index_dir, "stats")).collect()[0]
    terms = spark.read.parquet(os.path.join(index_dir, "terms"))
    lin = spark.read.parquet(os.path.join(index_dir, "lineage"))
    lrow = lin.filter(F.col("status") == "complete").agg(
        F.countDistinct("term_bucket").alias("buckets"),
        F.sum("n_blocks").alias("blocks"),
        F.sum("bytes").alias("bytes"),
    ).collect()[0]
    return {
        "n_docs": int(srow["n_docs"]),
        "avgdl": float(srow["avgdl"]),
        "n_shards": int(srow["n_shards"]),
        "block_size": int(srow["block_size"]),
        "vocab_size": terms.count(),
        "complete_buckets": int(lrow["buckets"] or 0),
        "n_blocks": int(lrow["blocks"] or 0),
        "index_bytes": int(lrow["bytes"] or 0),
    }

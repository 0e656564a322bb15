"""Input-table abstraction (the north rule's Iceberg surface).

The production contract is an Iceberg table of transcripts; this container
ships no Iceberg runtime jar, so ``load_table`` resolves in order:

1. ``iceberg:`` / catalog identifiers → ``spark.read.format("iceberg")``
   (or ``spark.table``) when the Iceberg runtime is on the classpath —
   snapshot pinning via ``snapshot-id``/``as-of-timestamp`` read options;
2. a filesystem path → parquet (what the sandbox uses everywhere).

The engine's checkpoint/resume keys off its OWN lineage table, so build
resumability works identically over either source; with Iceberg the
``snapshot_id`` argument additionally pins the corpus version across a
resume (the "resumable from Iceberg snapshot checkpoints" contract —
the snapshot id is recorded in the build's stats_events metrics).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TRANSCRIPT_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.source.IcebergSource"
        )
        return True
    except Exception:
        return False


def load_table(
    spark: SparkSession,
    source: str,
    snapshot_id: int | None = None,
    as_of_ts: int | None = None,
) -> DataFrame:
    """Load an input table from an Iceberg identifier or a parquet path."""
    if source.startswith("iceberg:"):
        ident = source[len("iceberg:"):]
        if not iceberg_available(spark):
            raise RuntimeError(
                "Iceberg runtime not on the classpath; add "
                "org.apache.iceberg:iceberg-spark-runtime to spark-submit "
                "--packages, or point at a parquet path instead"
            )
        reader = spark.read.format("iceberg")
        if snapshot_id is not None:
            reader = reader.option("snapshot-id", str(snapshot_id))
        if as_of_ts is not None:
            reader = reader.option("as-of-timestamp", str(as_of_ts))
        return reader.load(ident)
    if os.path.exists(source) or source.startswith(("file:", "hdfs:", "s3")):
        return spark.read.parquet(source)
    # bare identifier → session catalog (covers Iceberg catalog tables too)
    return spark.table(source)


def load_transcripts(spark: SparkSession, source: str, **kw) -> DataFrame:
    """Load + schema-check the transcripts input (BASELINE.json input_hint:
    conv_id string, turn_idx int32, role string, text string, tool string,
    ts timestamp)."""
    df = load_table(spark, source, **kw)
    missing = [c for c in TRANSCRIPT_COLUMNS if c not in df.columns]
    if missing:
        raise ValueError(f"transcripts table missing columns: {missing}")
    return df.select(*TRANSCRIPT_COLUMNS)

"""Structured-Streaming ingest for the transcripts pipeline.

The reference plugin has no streaming surface (ingest is request/response
bulk — SURVEY.md §1); at 10^12-turn scale, however, transcripts arrive
continuously, so the engine provides the Spark-native ingest path:

* ``stream_transcripts`` — readStream over a transcripts source (file /
  kafka / rate), schema-enforced to the BASELINE.json input_hint.
* ``stage_stream`` — append the stream to a partitioned staging table with
  exactly-once checkpointing; the batch ``IndexBuilder.build(resume=True)``
  then periodically folds new data in through the lineage checkpoint
  (streaming handles arrival, the index build stays a deterministic batch
  job — the Lambda shape the lineage/resume design was built for).
* ``turn_rollup_stream`` — watermarked tumbling-window per-role turn
  counters (the streaming analog of the stats-events rolling counters),
  late data bounded by the watermark.
* ``dedup_stream`` — exact-dedup on the fly via dropDuplicates on the
  content fingerprint within the watermark horizon (streaming state-store
  backed), the streaming form of extras.dedup.exact_dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def stream_transcripts(
    spark: SparkSession, source_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream of transcript turns (each micro-batch = newly
    arrived parquet files). Kafka would swap in via format('kafka') +
    from_json(value, TRANSCRIPT_SCHEMA)."""
    reader = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA).format("parquet")
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(source_dir)


def stage_stream(
    stream: DataFrame, staging_dir: str, checkpoint_dir: str
):
    """Append the stream to the staging table with exactly-once file-sink
    semantics (checkpointed offsets + file manifest). Returns the query."""
    return (
        stream.writeStream.format("parquet")
        .option("path", staging_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def turn_rollup_stream(
    stream: DataFrame, window: str = "5 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Watermarked tumbling-window counters per role: late turns beyond the
    watermark are dropped; state is bounded. Write with outputMode
    'append' (finalized windows only) or 'update'."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "role")
        .agg(
            F.count("*").alias("n_turns"),
            F.sum(F.length("text")).alias("n_chars"),
        )
        .select(
            F.col("w.start").alias("win_start"),
            F.col("w.end").alias("win_end"),
            "role",
            "n_turns",
            "n_chars",
        )
    )


def dedup_stream(
    stream: DataFrame, watermark: str = "10 minutes"
) -> DataFrame:
    """Streaming exact-dedup: drop turns whose normalized-content
    fingerprint was already seen within the watermark horizon.

    Uses ``dropDuplicatesWithinWatermark`` so the state store actually
    EVICTS fingerprints once the watermark passes them — a plain
    ``dropDuplicates([fp])`` without an event-time key never evicts and
    grows state unboundedly on a long-running stream. Duplicates farther
    apart than the watermark horizon may both survive (the documented
    within-watermark contract); the batch ``exact_dedup`` over the staging
    table is the global backstop."""
    from ..tokenizer import tokenize_expr

    fp = F.md5(F.array_join(tokenize_expr("text"), " ").cast("binary"))
    return (
        stream.withColumn("_fp", fp)
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["_fp"])
        .drop("_fp")
    )

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
* ``sessionize_stream`` — custom stateful operator
  (``applyInPandasWithState`` + event-time timeout): assembles turns into
  per-conversation session records, emitted once the conversation has
  been quiet for ``gap_s`` seconds of event time. State per key is a
  fixed-width counter row (never the turn texts), so state-store size is
  O(active conversations), not O(turns).
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


SESSION_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("n_turns", T.LongType()),
        T.StructField("n_chars", T.LongType()),
        T.StructField("n_user", T.LongType()),
        T.StructField("n_assistant", T.LongType()),
        T.StructField("first_ts", T.TimestampType()),
        T.StructField("last_ts", T.TimestampType()),
        T.StructField("duration_s", T.DoubleType()),
    ]
)

# state is one fixed-width row per live conversation; timestamps as epoch
# millis keep it Arrow-friendly and 48 bytes regardless of turn count
_SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_turns", T.LongType()),
        T.StructField("n_chars", T.LongType()),
        T.StructField("n_user", T.LongType()),
        T.StructField("n_assistant", T.LongType()),
        T.StructField("first_ms", T.LongType()),
        T.StructField("last_ms", T.LongType()),
    ]
)


def sessionize_stream(
    stream: DataFrame, gap_s: int = 1800, watermark: str = "10 minutes"
) -> DataFrame:
    """Stateful conversation sessionization via ``applyInPandasWithState``.

    Turns are grouped by ``conv_id``; per-key state accumulates turn/char/
    role counters and the event-time span. When the stream's watermark
    passes ``last turn + gap_s`` (event-time timeout — NOT wall clock), the
    assembled session record is emitted and the key's state is dropped.
    Sessions still quiet when the stream ends flush on the next batch that
    advances the watermark past their timeout (standard state-store
    semantics; production deployments pair this with a low-rate heartbeat
    source so terminal sessions drain).

    Semantics follow Spark's session-window pattern, but as a custom
    operator so the emitted record can carry arbitrary per-role counters
    (and, at 100 TB, per-key sketches) that ``session_window`` aggs can't
    express. Shuffle is one hash partitioning by conv_id; state size is
    one fixed-width row per live conversation.
    """
    import pandas as pd  # local: executors import lazily

    gap_ms = int(gap_s) * 1000

    def assemble(key, pdfs, state):
        if state.hasTimedOut:
            n_turns, n_chars, n_user, n_asst, first_ms, last_ms = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "conv_id": [key[0]],
                    "n_turns": [n_turns],
                    "n_chars": [n_chars],
                    "n_user": [n_user],
                    "n_assistant": [n_asst],
                    "first_ts": [pd.Timestamp(first_ms, unit="ms")],
                    "last_ts": [pd.Timestamp(last_ms, unit="ms")],
                    "duration_s": [(last_ms - first_ms) / 1000.0],
                }
            )
            return
        n_turns = n_chars = n_user = n_asst = 0
        first_ms, last_ms = None, None
        if state.exists:
            n_turns, n_chars, n_user, n_asst, first_ms, last_ms = state.get
        for pdf in pdfs:
            n_turns += len(pdf)
            n_chars += int(pdf["text"].str.len().sum())
            n_user += int((pdf["role"] == "user").sum())
            n_asst += int((pdf["role"] == "assistant").sum())
            ms = (pdf["ts"].astype("int64") // 1_000_000)
            lo, hi = int(ms.min()), int(ms.max())
            first_ms = lo if first_ms is None else min(first_ms, lo)
            last_ms = hi if last_ms is None else max(last_ms, hi)
        state.update((n_turns, n_chars, n_user, n_asst, first_ms, last_ms))
        state.setTimeoutTimestamp(last_ms + gap_ms)
        return
        yield  # pragma: no cover — generator contract

    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        stream.withWatermark("ts", watermark)
        .groupBy("conv_id")
        .applyInPandasWithState(
            assemble,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def sessionize_batch(turns: DataFrame) -> DataFrame:
    """Batch twin of ``sessionize_stream``: the same session record
    (schema ``SESSION_SCHEMA``), assembled with one hash aggregation —
    used by backfills over a static transcript corpus and by the
    correctness gate (the stateful stream operator can't run under a SQL
    oracle; ``tests/test_streaming.py`` asserts stream output equals this
    on the same input, and this form is oracle-checked against DuckDB).

    Counter semantics match the stream's ``assemble`` exactly: per-turn
    char counts, user/assistant role counters (other roles counted in
    n_turns only), event-time span truncated to millisecond precision
    (the stream's state carries epoch millis).
    """
    # sources may carry TIMESTAMP_NTZ (pandas-written parquet); the session
    # timezone is pinned UTC (session.py), so the cast is identity — same
    # face-value micros the stream's state reads via .astype("int64")
    ms = F.unix_millis(F.col("ts").cast("timestamp"))
    return (
        turns.groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum(F.length("text")).alias("n_chars"),
            F.sum((F.col("role") == "user").cast("long")).alias("n_user"),
            F.sum((F.col("role") == "assistant").cast("long")).alias("n_assistant"),
            F.timestamp_millis(F.min(ms)).alias("first_ts"),
            F.timestamp_millis(F.max(ms)).alias("last_ts"),
            ((F.max(ms) - F.min(ms)) / F.lit(1000.0)).alias("duration_s"),
        )
    )

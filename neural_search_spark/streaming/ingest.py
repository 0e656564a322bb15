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

# state is a LIST of pending session accumulators per live conversation
# (parallel arrays — Arrow-friendly, ~48 B per pending session). Usually
# one entry; more only while an already-split earlier session waits for
# the watermark to pass its quiet-period before it may be finalized.
_SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_turns", T.ArrayType(T.LongType())),
        T.StructField("n_chars", T.ArrayType(T.LongType())),
        T.StructField("n_user", T.ArrayType(T.LongType())),
        T.StructField("n_assistant", T.ArrayType(T.LongType())),
        T.StructField("first_ms", T.ArrayType(T.LongType())),
        T.StructField("last_ms", T.ArrayType(T.LongType())),
    ]
)


def sessionize_stream(
    stream: DataFrame, gap_s: int = 1800, watermark: str = "10 minutes"
) -> DataFrame:
    """Stateful conversation sessionization via ``applyInPandasWithState``.

    GAP-AWARE: turns are grouped by ``conv_id`` and split into sessions on
    EVENT-TIME gaps greater than ``gap_s`` — including gaps interior to a
    single micro-batch and gaps between bursts that arrive before any
    timeout fires (a burst landing after a quiet period starts a NEW
    accumulator; the previous one stays pending until the watermark passes
    its quiet-period, then is emitted — so a record is final only once no
    allowed-late turn could still extend it). A session record is emitted
    when the watermark passes ``its last turn + gap_s``, either inline
    (key received newer data) or via event-time timeout (key was quiet).
    Sessions still pending when the stream ends flush on the next batch
    that advances the watermark past their quiet-period (standard
    state-store semantics; production deployments pair this with a
    low-rate heartbeat source so terminal sessions drain).

    Semantics follow Spark's session-window pattern, but as a custom
    operator so the emitted record can carry arbitrary per-role counters
    (and, at 100 TB, per-key sketches) that ``session_window`` aggs can't
    express. Shuffle is one hash partitioning by conv_id; state size is
    ~48 B per PENDING session of a live conversation (normally one).
    ``sessionize_batch`` is the equivalent batch form (same lag-diff gap
    rule); ``tests/test_streaming.py`` asserts stream==batch on corpora
    with and without >gap_s internal pauses.
    """
    import pandas as pd  # local: executors import lazily

    gap_ms = int(gap_s) * 1000

    def _records(conv_id, accs):
        return pd.DataFrame(
            {
                "conv_id": [conv_id] * len(accs),
                "n_turns": [a[0] for a in accs],
                "n_chars": [a[1] for a in accs],
                "n_user": [a[2] for a in accs],
                "n_assistant": [a[3] for a in accs],
                "first_ts": [pd.Timestamp(a[4], unit="ms") for a in accs],
                "last_ts": [pd.Timestamp(a[5], unit="ms") for a in accs],
                "duration_s": [(a[5] - a[4]) / 1000.0 for a in accs],
            }
        )

    def _flush(state, accs, wm):
        """Split accs into (emitted-now, kept); update state/timeout."""
        ready = [a for a in accs if a[5] + gap_ms < wm]
        rest = [a for a in accs if a[5] + gap_ms >= wm]
        if rest:
            state.update(tuple([a[i] for a in rest] for i in range(6)))
            # earliest pending quiet-period (timeouts must sit above the
            # current watermark — a boundary-equal one fires next advance)
            state.setTimeoutTimestamp(max(rest[0][5] + gap_ms, wm + 1))
        elif state.exists:
            state.remove()
        return ready

    def assemble(key, pdfs, state):
        wm = state.getCurrentWatermarkMs()
        accs: list[list[int]] = []
        if state.exists:
            cols = state.get
            accs = [list(t) for t in zip(*cols)]
        if state.hasTimedOut:
            ready = _flush(state, accs, wm)
            if ready:
                yield _records(key[0], ready)
            return
        parts = [pdf for pdf in pdfs if len(pdf)]
        if parts:
            allr = pd.concat(parts) if len(parts) > 1 else parts[0]
            ms = (allr["ts"].astype("int64") // 1_000_000).to_numpy()
            order = ms.argsort(kind="stable")
            ms = ms[order]
            chars = allr["text"].str.len().to_numpy()[order]
            roles = allr["role"].to_numpy()[order]
            # vectorized gap split: group id = cumsum of >gap breaks, with
            # the first row's break judged against the pending accumulator
            prev = ms.copy()
            prev[1:] = ms[:-1]
            brk = (ms - prev) > gap_ms
            brk[0] = not accs or (ms[0] - accs[-1][5]) > gap_ms
            gids = brk.cumsum()  # first group is 0 iff it extends accs[-1]
            for g in range(int(gids[0]), int(gids[-1]) + 1):
                sel = gids == g
                grp = [
                    int(sel.sum()),
                    int(chars[sel].sum()),
                    int((roles[sel] == "user").sum()),
                    int((roles[sel] == "assistant").sum()),
                    int(ms[sel].min()),
                    int(ms[sel].max()),
                ]
                if g == 0:  # extends the pending accumulator
                    a = accs[-1]
                    a[0] += grp[0]
                    a[1] += grp[1]
                    a[2] += grp[2]
                    a[3] += grp[3]
                    a[4] = min(a[4], grp[4])
                    a[5] = max(a[5], grp[5])
                else:
                    accs.append(grp)
        ready = _flush(state, accs, wm)
        if ready:
            yield _records(key[0], ready)
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


def sessionize_batch(turns: DataFrame, gap_s: int = 1800) -> DataFrame:
    """Batch twin of ``sessionize_stream``: the same session record
    (schema ``SESSION_SCHEMA``), GAP-AWARE like the stream — a
    conversation whose turns pause for more than ``gap_s`` yields one
    record per quiet-period, exactly as the stream's event-time timeout
    emits one record per quiet-period. Used by backfills over a static
    transcript corpus and by the correctness gate (the stateful stream
    operator can't run under a SQL oracle; ``tests/test_streaming.py``
    asserts stream output equals this on corpora WITH AND WITHOUT
    >gap_s internal pauses, and this form is oracle-checked against
    DuckDB with the same lag-diff → cumsum in SQL).

    Session boundary rule (matching the stream's timeout semantics): a
    turn whose event-time gap from the previous turn in its conversation
    is STRICTLY greater than ``gap_s`` starts a new session — the stream
    times out only when the watermark passes ``last_ts + gap_s``, so a
    turn landing exactly on the boundary still joins. The equivalence
    holds for per-conversation in-order delivery; a late turn whose ts
    predates the stream's current session start would join that session
    in the stream but sort into an earlier one here (the stream's state
    has no time machine — standard watermark caveat).

    Counter semantics match the stream's ``assemble`` exactly: per-turn
    char counts, user/assistant role counters (other roles counted in
    n_turns only), event-time span truncated to millisecond precision
    (the stream's state carries epoch millis).

    Scale shape: one shuffle keyed by conv_id serves both the lag window
    and the (conv_id, session) aggregation — the session id is computed
    within the conversation's sorted run, no second repartition.
    """
    from pyspark.sql import Window

    # sources may carry TIMESTAMP_NTZ (pandas-written parquet); the session
    # timezone is pinned UTC (session.py), so the cast is identity — same
    # face-value micros the stream's state reads via .astype("int64")
    order = ["_ms"] + (["turn_idx"] if "turn_idx" in turns.columns else [])
    w = Window.partitionBy("conv_id").orderBy(*order)
    run = Window.partitionBy("conv_id").orderBy(*order).rowsBetween(
        Window.unboundedPreceding, 0
    )
    sess = (
        turns.withColumn("_ms", F.unix_millis(F.col("ts").cast("timestamp")))
        .withColumn(
            "_brk",
            (
                F.col("_ms") - F.lag("_ms").over(w) > F.lit(int(gap_s) * 1000)
            ).cast("int"),
        )
        .withColumn(
            "_sess", F.sum(F.coalesce(F.col("_brk"), F.lit(0))).over(run)
        )
    )
    return (
        sess.groupBy("conv_id", "_sess")
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum(F.length("text")).alias("n_chars"),
            F.sum((F.col("role") == "user").cast("long")).alias("n_user"),
            F.sum((F.col("role") == "assistant").cast("long")).alias("n_assistant"),
            F.timestamp_millis(F.min("_ms")).alias("first_ts"),
            F.timestamp_millis(F.max("_ms")).alias("last_ts"),
            ((F.max("_ms") - F.min("_ms")) / F.lit(1000.0)).alias("duration_s"),
        )
        .drop("_sess")
    )


# ---------------------------------------------------------------------------
# continuous index ingest: micro-batch → segment, compact → one index
# ---------------------------------------------------------------------------
def index_stream(
    stream: DataFrame,
    segments_root: str,
    checkpoint_dir: str,
    n_shards: int = 4,
    block_size: int = 256,
):
    """Continuous index ingest — the Lucene refresh analog: every
    micro-batch becomes its OWN on-disk segment index under
    ``segments_root/batch_<id>``, built with the same salted JVM block
    path as the batch builder, then ``compact_segments`` force-merges
    them without re-tokenizing (index/merge.py). Query-identical to one
    batch build over the union (asserted in tests/test_streaming.py).

    The foreachBatch sink rides Structured Streaming's checkpointed
    offsets: a replayed micro-batch rebuilds the SAME batch_<id> segment
    directory (IndexBuilder overwrites), so the segment set is
    exactly-once even under retries. At 10^12 turns the same shape holds:
    segments stay bounded by trigger size, and compaction is the existing
    one-shuffle merge, not a re-ingest."""
    import os

    from ..index.build import IndexBuilder

    def _build(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        IndexBuilder(
            batch_df.sparkSession,
            os.path.join(segments_root, f"batch_{batch_id:05d}"),
            n_shards=n_shards,
            block_size=block_size,
        ).build(batch_df)

    return (
        stream.writeStream.foreachBatch(_build)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def percolate_stream(
    stream: DataFrame,
    pidx,
    matches_root: str,
    checkpoint_dir: str,
):
    """Streaming alert fan-out — percolate every micro-batch of
    transcript turns against a registered-query registry
    (query.percolate.PercolatorIndex) and land the (doc_id, conv_id,
    turn_idx, query_id, n_matched) matches under
    ``matches_root/batch_<id>``.

    The BATCH plan serves the micro-batch unchanged (the percolate
    module's design claim, asserted stream==batch in
    tests/test_streaming.py): tokenize is a stateless map, the registry
    join is a broadcast hash join, and the coverage count aggregates
    within the micro-batch only — no streaming state, no watermark.
    Exactly-once rides the checkpointed source offsets + an idempotent
    per-batch overwrite (a replayed batch rewrites the SAME batch_<id>
    directory), the ``index_stream`` pattern."""
    import os

    from ..index.build import doc_id_col

    def _percolate(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        docs = batch_df.withColumn("doc_id", doc_id_col())
        keys = docs.select("doc_id", "conv_id", "turn_idx")
        pidx.percolate_df(docs).join(keys, "doc_id").select(
            "doc_id", "conv_id", "turn_idx", "query_id", "n_matched"
        ).write.mode("overwrite").parquet(
            os.path.join(matches_root, f"batch_{batch_id:05d}")
        )

    return (
        stream.writeStream.foreachBatch(_percolate)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def compact_segments(spark: SparkSession, segments_root: str, dst: str, **kw):
    """Force-merge every staged segment index under ``segments_root`` into
    one index at ``dst`` (delegates to index.merge.merge_indexes — stats
    recombined, per-block pruning bounds recomputed). Returns merge info."""
    import os

    from ..index.merge import merge_indexes

    segs = sorted(
        os.path.join(segments_root, d)
        for d in os.listdir(segments_root)
        if d.startswith("batch_")
    )
    if not segs:
        raise ValueError(f"no batch_* segment indexes under {segments_root}")
    return merge_indexes(spark, segs, dst, **kw)


def assemble_context(
    turns: DataFrame,
    n_prev: int = 3,
    sep: str = "\n",
    with_roles: bool = True,
) -> DataFrame:
    """Turn-context assembly — the training-pair construction primitive
    over conversation transcripts: for EVERY turn, the concatenation of
    its previous ``n_prev`` turns plus itself, in turn order (the context
    window an instruction-tuning / RAG pipeline feeds a model alongside
    the target turn).

    Returns (conv_id, turn_idx, role, text, context) where ``context``
    joins up to n_prev+1 turns with ``sep``, each rendered as
    ``role: text`` when with_roles else the bare text.

    One window over (conv_id ordered by turn_idx, ROWS n_prev PRECEDING)
    — conversations are the natural partition key, so the shuffle is
    conversation-keyed and each partition's state is bounded by
    conversation length, never corpus size. Pure Catalyst (collect_list
    over the frame + array_join)."""
    from pyspark.sql import Window

    rendered = (
        F.concat_ws(": ", F.col("role"), F.col("text"))
        if with_roles
        else F.col("text")
    )
    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(-int(n_prev), 0)
    )
    return turns.select(
        "conv_id",
        "turn_idx",
        "role",
        "text",
        F.array_join(
            F.collect_list(rendered.alias("r")).over(w), sep
        ).alias("context"),
    )

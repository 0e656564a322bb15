"""Structured-Streaming ingest: staging with exactly-once checkpoints,
watermarked rollups, streaming dedup, and the stream→resume-build loop."""

import os

import pandas as pd
import pytest

from neural_search_spark.streaming import ingest
from neural_search_spark.transcripts import generate_transcripts


@pytest.fixture()
def stream_dirs(tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    return {
        "src": str(src),
        "staging": str(tmp_path / "staging"),
        "ckpt": str(tmp_path / "ckpt"),
    }


def _drop_file(src_dir: str, pdf: pd.DataFrame, name: str):
    pdf.to_parquet(os.path.join(src_dir, name), index=False)


def test_stage_stream_exactly_once(spark, stream_dirs):
    pdf = generate_transcripts(50, seed=1)
    _drop_file(stream_dirs["src"], pdf.iloc[:100], "a.parquet")
    st = ingest.stream_transcripts(spark, stream_dirs["src"])
    q = ingest.stage_stream(st, stream_dirs["staging"], stream_dirs["ckpt"])
    q.awaitTermination(120)
    got1 = spark.read.parquet(stream_dirs["staging"]).count()
    assert got1 == 100
    # second trigger: only the NEW file is processed (checkpointed offsets)
    _drop_file(stream_dirs["src"], pdf.iloc[100:150], "b.parquet")
    st = ingest.stream_transcripts(spark, stream_dirs["src"])
    q = ingest.stage_stream(st, stream_dirs["staging"], stream_dirs["ckpt"])
    q.awaitTermination(120)
    assert spark.read.parquet(stream_dirs["staging"]).count() == 150


def test_percolate_stream_equals_batch(spark, stream_dirs, tmp_path):
    """Streaming alert fan-out: stream percolation over two micro-batch
    rounds equals ONE batch percolation of the union — the percolate
    module's stream==batch design claim — and a second trigger only
    processes the new file (checkpointed offsets)."""
    from neural_search_spark.index.build import doc_id_col
    from neural_search_spark.query.percolate import PercolatorIndex

    pdf = generate_transcripts(60, seed=3)
    queries = {
        "alerts": {"match": {"query_text": "tool call merge",
                             "minimum_should_match": 2}},
        "watch": {"term": {"value": "window"}},
    }
    pidx = PercolatorIndex(spark, queries)
    matches = str(tmp_path / "matches")
    _drop_file(stream_dirs["src"], pdf.iloc[:150], "a.parquet")
    st = ingest.stream_transcripts(spark, stream_dirs["src"])
    ingest.percolate_stream(
        st, pidx, matches, stream_dirs["ckpt"]
    ).awaitTermination(120)
    _drop_file(stream_dirs["src"], pdf.iloc[150:], "b.parquet")
    st = ingest.stream_transcripts(spark, stream_dirs["src"])
    ingest.percolate_stream(
        st, pidx, matches, stream_dirs["ckpt"]
    ).awaitTermination(120)
    got = {
        (r["doc_id"], r["query_id"], r["n_matched"])
        for r in spark.read.parquet(matches + "/batch_*").collect()
    }
    all_docs = spark.createDataFrame(pdf).withColumn(
        "doc_id", doc_id_col()
    )
    exp = {
        (r["doc_id"], r["query_id"], r["n_matched"])
        for r in pidx.percolate_df(all_docs).collect()
    }
    assert got == exp
    assert len(exp) > 0
    # batch 0 carries only the first file's matches (offsets advanced)
    first = spark.read.parquet(matches + "/batch_00000")
    first_docs = spark.createDataFrame(pdf.iloc[:150]).withColumn(
        "doc_id", doc_id_col()
    )
    assert first.count() == pidx.percolate_df(first_docs).count()


def test_stream_then_resume_build(spark, stream_dirs, tmp_path):
    """The Lambda loop: stream → staging → batch index build; more stream
    → resume-build folds the new turns in; queries see everything."""
    from neural_search_spark.index.build import IndexBuilder
    from neural_search_spark.query.bm25 import BM25Index, bm25_topk

    pdf = generate_transcripts(80, seed=2)
    half = len(pdf) // 2
    _drop_file(stream_dirs["src"], pdf.iloc[:half], "a.parquet")
    st = ingest.stream_transcripts(spark, stream_dirs["src"])
    ingest.stage_stream(
        st, stream_dirs["staging"], stream_dirs["ckpt"]
    ).awaitTermination(120)
    out = str(tmp_path / "idx")
    IndexBuilder(spark, out, n_shards=4, block_size=64).build(
        spark.read.parquet(stream_dirs["staging"])
    )
    n1 = BM25Index(spark, out).n_docs
    assert n1 == half
    # new arrivals → stage → full rebuild-from-scratch of changed corpus
    # (resume covers crash-restart; corpus growth rebuilds: doc stats and
    # idf change with N, so a grown corpus is a new index version)
    _drop_file(stream_dirs["src"], pdf.iloc[half:], "b.parquet")
    st = ingest.stream_transcripts(spark, stream_dirs["src"])
    ingest.stage_stream(
        st, stream_dirs["staging"], stream_dirs["ckpt"]
    ).awaitTermination(120)
    IndexBuilder(spark, out, n_shards=4, block_size=64).build(
        spark.read.parquet(stream_dirs["staging"])
    )
    idx = BM25Index(spark, out)
    assert idx.n_docs == len(pdf)
    assert bm25_topk(idx, "the", k=5).count() == 5


def test_turn_rollup_stream(spark, stream_dirs):
    pdf = generate_transcripts(40, seed=3)
    _drop_file(stream_dirs["src"], pdf, "a.parquet")
    st = ingest.stream_transcripts(spark, stream_dirs["src"])
    rolled = ingest.turn_rollup_stream(st, window="5 minutes")
    q = (
        rolled.writeStream.format("memory")
        .queryName("rollup_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM rollup_test").toPandas()
    assert got.n_turns.sum() == len(pdf)
    assert set(got.role) <= {"user", "assistant", "tool"}
    # windows align to 5-minute boundaries
    assert (got.win_start.astype("int64") // 10**9 % 300 == 0).all()


def test_sessionize_stream(spark, stream_dirs):
    """applyInPandasWithState sessionization: a conversation's session
    record is emitted once the watermark passes its last turn + gap."""
    t0 = pd.Timestamp("2026-01-01 00:00:00")

    def turns(conv, base, n, role0="user"):
        roles = ["user", "assistant"]
        return pd.DataFrame(
            {
                "conv_id": [conv] * n,
                "turn_idx": pd.array(range(n), dtype="int32"),
                "role": [roles[(i + (role0 == "assistant")) % 2] for i in range(n)],
                "text": [f"{conv} turn {i} text body" for i in range(n)],
                "tool": ["none"] * n,
                "ts": pd.Series(
                    [base + pd.Timedelta(seconds=30 * i) for i in range(n)]
                ).astype("datetime64[us]"),
            }
        )

    # conv A: 4 turns spanning 90 s; then files whose event times advance
    # the watermark (10 min delay) past A's last turn + 30 min gap
    _drop_file(stream_dirs["src"], turns("A", t0, 4), "a.parquet")
    _drop_file(
        stream_dirs["src"], turns("B", t0 + pd.Timedelta(hours=2), 2), "b.parquet"
    )
    _drop_file(
        stream_dirs["src"], turns("C", t0 + pd.Timedelta(hours=4), 1), "c.parquet"
    )
    st = ingest.stream_transcripts(
        spark, stream_dirs["src"], max_files_per_trigger=1
    )
    sessions = ingest.sessionize_stream(st, gap_s=1800, watermark="10 minutes")
    q = (
        sessions.writeStream.format("memory")
        .queryName("session_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql("SELECT * FROM session_test").toPandas()
    # files sort a<b<c; with one file per trigger the batch-3 watermark
    # (B's max ts - 10 min) passes A's timeout, so A must have flushed.
    # B/C flush only on a later watermark advance — stream ended first.
    assert "A" in set(got.conv_id)
    a = got[got.conv_id == "A"].iloc[0]
    assert a.n_turns == 4
    assert a.n_user == 2 and a.n_assistant == 2
    assert a.duration_s == 90.0
    assert a.n_chars == sum(len(f"A turn {i} text body") for i in range(4))
    assert a.first_ts == t0 and a.last_ts == t0 + pd.Timedelta(seconds=90)

    # batch twin: identical record for every conversation the stream
    # flushed (same counters, same ms-truncated span)
    src = spark.read.parquet(stream_dirs["src"])
    batch = (
        ingest.sessionize_batch(src.filter(src.conv_id == "A"))
        .toPandas()
        .iloc[0]
    )
    for c in SESSION_COLS:
        assert batch[c] == a[c], c


SESSION_COLS = [
    "conv_id", "n_turns", "n_chars", "n_user", "n_assistant",
    "first_ts", "last_ts", "duration_s",
]


def test_sessionize_batch_roles_and_span(spark):
    pdf = pd.DataFrame(
        {
            "conv_id": ["x"] * 3,
            "role": ["user", "assistant", "tool"],
            "text": ["ab", "cde", "f"],
            "ts": pd.Series(pd.date_range("2026-01-01", periods=3, freq="45s")),
        }
    )
    got = ingest.sessionize_batch(spark.createDataFrame(pdf)).toPandas().iloc[0]
    assert got.n_turns == 3 and got.n_chars == 6
    assert got.n_user == 1 and got.n_assistant == 1  # tool in n_turns only
    assert got.duration_s == 90.0


def test_dedup_stream(spark, stream_dirs):
    pdf = generate_transcripts(30, seed=4)
    dup = pd.concat([pdf, pdf.iloc[:20]], ignore_index=True)
    _drop_file(stream_dirs["src"], dup, "a.parquet")
    st = ingest.stream_transcripts(spark, stream_dirs["src"])
    deduped = ingest.dedup_stream(st)
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM dedup_test").toPandas()
    # each distinct text kept exactly once
    assert len(got) == pdf.text.map(
        lambda t: " ".join(t.lower().split())
    ).nunique()


def test_sessionize_batch_gap_aware(spark):
    """A conversation that pauses for more than gap_s yields ONE RECORD
    PER QUIET-PERIOD (round-3 verdict: the old conv_id-only groupBy could
    not represent multi-session conversations)."""
    t0 = pd.Timestamp("2026-01-01 00:00:00")
    rows = []
    # conv x: 3 turns, 60s apart → 1 session; then a 2h pause; 2 more
    # turns → 2nd session. conv y: no internal gap → 1 session.
    for i in range(3):
        rows.append(("x", i, "user", "aa", t0 + pd.Timedelta(seconds=60 * i)))
    for i in range(2):
        rows.append(
            ("x", 3 + i, "assistant", "bbb",
             t0 + pd.Timedelta(hours=2, seconds=60 * i))
        )
    for i in range(4):
        rows.append(("y", i, "tool", "c", t0 + pd.Timedelta(seconds=30 * i)))
    pdf = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "ts"]
    )
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    got = (
        ingest.sessionize_batch(spark.createDataFrame(pdf), gap_s=1800)
        .toPandas()
        .sort_values(["conv_id", "first_ts"])
        .reset_index(drop=True)
    )
    assert list(got.conv_id) == ["x", "x", "y"]
    assert list(got.n_turns) == [3, 2, 4]
    assert got.iloc[0].duration_s == 120.0
    assert got.iloc[1].duration_s == 60.0
    assert got.iloc[1].n_assistant == 2 and got.iloc[1].n_user == 0
    # boundary rule: a gap of EXACTLY gap_s still joins (stream timeout
    # fires only when the watermark passes last + gap strictly)
    b = pd.DataFrame(
        {
            "conv_id": ["z", "z"],
            "role": ["user", "user"],
            "text": ["q", "r"],
            "ts": [t0, t0 + pd.Timedelta(seconds=1800)],
        }
    )
    gb = ingest.sessionize_batch(spark.createDataFrame(b), gap_s=1800).toPandas()
    assert len(gb) == 1 and gb.iloc[0].n_turns == 2


def test_sessionize_stream_matches_batch_with_gaps(spark, stream_dirs):
    """stream==batch equivalence on a corpus WITH a >gap_s internal pause:
    the stream emits two records for the split conversation and the batch
    twin now reproduces both (previously it silently depended on the
    corpus having no internal gaps)."""
    t0 = pd.Timestamp("2026-01-01 00:00:00")

    def turns(conv, base, n, start_idx=0):
        roles = ["user", "assistant"]
        return pd.DataFrame(
            {
                "conv_id": [conv] * n,
                "turn_idx": pd.array(
                    range(start_idx, start_idx + n), dtype="int32"
                ),
                "role": [roles[i % 2] for i in range(start_idx, start_idx + n)],
                "text": [f"{conv} turn {i}" for i in range(start_idx, start_idx + n)],
                "tool": ["none"] * n,
                "ts": pd.Series(
                    [base + pd.Timedelta(seconds=30 * i) for i in range(n)]
                ).astype("datetime64[us]"),
            }
        )

    # conv A session 1 (3 turns), then a 1h in-conversation pause (> 30min
    # gap) → session 2 (2 turns); conv B much later so its watermark
    # advance flushes BOTH of A's sessions
    _drop_file(stream_dirs["src"], turns("A", t0, 3), "a.parquet")
    _drop_file(
        stream_dirs["src"],
        turns("A", t0 + pd.Timedelta(hours=1), 2, start_idx=3),
        "b.parquet",
    )
    _drop_file(
        stream_dirs["src"], turns("B", t0 + pd.Timedelta(hours=6), 1), "c.parquet"
    )
    # a second watermark advance flushes A's SECOND session too (the
    # first flushed on c's advance)
    _drop_file(
        stream_dirs["src"], turns("D", t0 + pd.Timedelta(hours=12), 1), "d.parquet"
    )
    st = ingest.stream_transcripts(
        spark, stream_dirs["src"], max_files_per_trigger=1
    )
    sessions = ingest.sessionize_stream(st, gap_s=1800, watermark="10 minutes")
    q = (
        sessions.writeStream.format("memory")
        .queryName("session_gap_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = (
        spark.sql("SELECT * FROM session_gap_test WHERE conv_id = 'A'")
        .toPandas()
        .sort_values("first_ts")
        .reset_index(drop=True)
    )
    assert len(got) == 2, "stream must emit one record per quiet-period"
    src = spark.read.parquet(stream_dirs["src"])
    batch = (
        ingest.sessionize_batch(src.filter(src.conv_id == "A"), gap_s=1800)
        .toPandas()
        .sort_values("first_ts")
        .reset_index(drop=True)
    )
    assert len(batch) == 2
    for i in range(2):
        for c in SESSION_COLS:
            assert batch.iloc[i][c] == got.iloc[i][c], (i, c)


def test_index_stream_segments_then_compact(spark, stream_dirs, tmp_path):
    """Continuous index ingest e2e (the Lucene refresh→segment→force-merge
    lifecycle): 3 micro-batches each become their own segment index, the
    compaction merges them WITHOUT re-tokenizing, and the merged index is
    float32-score-identical to one batch build over the whole corpus."""
    import numpy as np

    from neural_search_spark.index.build import IndexBuilder
    from neural_search_spark.query.bm25 import BM25Index, bm25_topk

    pdf = generate_transcripts(120, seed=7)
    # conversation-aligned thirds so segment doc sets are disjoint
    conv = pd.factorize(pdf["conv_id"])[0] % 3
    for i in range(3):
        _drop_file(stream_dirs["src"], pdf[conv == i], f"f{i}.parquet")
    segroot = str(tmp_path / "segments")
    st = ingest.stream_transcripts(
        spark, stream_dirs["src"], max_files_per_trigger=1
    )
    q = ingest.index_stream(st, segroot, stream_dirs["ckpt"])
    q.awaitTermination(240)
    segs = sorted(d for d in os.listdir(segroot) if d.startswith("batch_"))
    assert len(segs) == 3, segs
    merged_dir = str(tmp_path / "merged")
    ingest.compact_segments(spark, segroot, merged_dir)
    # one-shot build over the SAME corpus = ground truth
    full_dir = str(tmp_path / "full")
    full_pdf_path = str(tmp_path / "full.parquet")
    pdf.to_parquet(full_pdf_path, index=False)
    IndexBuilder(spark, full_dir, n_shards=4, block_size=256).build(
        spark.read.parquet(full_pdf_path)
    )
    for query in ("the", "tool call model", "w0100"):
        a = bm25_topk(BM25Index(spark, merged_dir), query, k=20).toPandas()
        b = bm25_topk(BM25Index(spark, full_dir), query, k=20).toPandas()
        assert (a.doc_id.to_numpy() == b.doc_id.to_numpy()).all()
        assert np.allclose(a.score, b.score, atol=0)  # bit-identical f32


def test_assemble_context(spark):
    """Turn-context assembly: exact window contents per turn, verified
    against a DuckDB window twin (the in-test oracle) and hand cases."""
    import duckdb

    from neural_search_spark.streaming.ingest import assemble_context

    rows = [
        ("c1", 0, "user", "hello"),
        ("c1", 1, "assistant", "hi"),
        ("c1", 2, "user", "run the tool"),
        ("c1", 3, "assistant", "done"),
        ("c2", 0, "user", "solo"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )
    got = {
        (r["conv_id"], r["turn_idx"]): r["context"]
        for r in assemble_context(df, n_prev=2).collect()
    }
    assert got[("c1", 0)] == "user: hello"
    assert got[("c1", 2)] == "user: hello\nassistant: hi\nuser: run the tool"
    assert got[("c1", 3)] == "assistant: hi\nuser: run the tool\nassistant: done"
    assert got[("c2", 0)] == "user: solo"
    # DuckDB window twin over the same rows
    con = duckdb.connect()
    con.register("t", df.toPandas())
    oracle = {
        (cid, ti): ctx
        for cid, ti, ctx in con.sql(
            """
            SELECT conv_id, turn_idx,
                   string_agg(role || ': ' || text, chr(10)) OVER (
                     PARTITION BY conv_id ORDER BY turn_idx
                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS ctx
            FROM t
            """
        ).fetchall()
    }
    assert got == oracle
    # bare-text form
    bare = {
        (r["conv_id"], r["turn_idx"]): r["context"]
        for r in assemble_context(df, n_prev=1, with_roles=False).collect()
    }
    assert bare[("c1", 1)] == "hello\nhi"

"""Distributed inverted-index build (the engine's replacement for the Lucene
segment writes the reference plugin delegates to OpenSearch core — SURVEY.md
§2.1 "Index write (sink)").

Pipeline (one pass over the corpus + one light stats pass):

  transcripts ──► doc_id = xxhash64(conv_id, turn_idx)          (stable docID)
              ──► tokenize (pure-Catalyst split+filter, whole-stage codegen)
              ──► (doc, term) → tf counted ROW-LOCALLY by a vectorized
                  Arrow kernel (a doc's tokens all sit in one array cell,
                  so the count needs no doc-keyed exchange — the salted
                  repartition below is the build's ONLY full-data shuffle)
              ──► salted repartition-by-term: hot terms (df above threshold)
                  are split into doc_id-RANGE salts so every build task is
                  bounded, while blocks stay globally doc-ordered per term
              ──► applyInPandas per (shard, term-group, salt): sort by doc_id,
                  chunk into 4096-doc blocks, delta+varint encode, attach
                  per-block max tf-norm (the block-max metadata the query-side
                  pruning uses — the Spark analog of Lucene advanceShallow
                  consumed by reference query/HybridScoreBlockBoundaryPropagator.java:53-86)
              ──► parquet partitioned by term_bucket (partition pruning for
                  query terms) + terms / stats / lineage / metrics tables.

Scale notes (100 TB / 10^12 turns): the ONLY wide shuffle of the posting
stream is the salted repartition into build groups (tf counting is
row-local — see postings_from_tokens; term df/cf aggregate map-side to a
vocab-sized exchange), keyed to bound task size; n_shards and n_salts grow
with the corpus, never a single-task hot spot. Resume skips term_buckets
already recorded complete in the lineage table.
"""

from __future__ import annotations

import math
import os
import shutil
import time
import uuid

import numpy as np
import pandas as pd
from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import BLOCK_SIZE, BM25_B, BM25_K1
from ..tokenizer import tokenize_expr
from .codec import encode_doc_ids_batch, encode_varint_batch

INDEX_FORMAT_VERSION = 2  # v2: int64 tid postings (v1 stored term strings)
N_TERM_BUCKETS = 64  # on-disk partitions; query prunes to its terms' buckets


def tid_expr(col="term"):
    """Term id: the cross-engine 60-bit h60 hash of the term string. Every
    shuffle/kernel downstream of tokenization carries this int64 instead of
    the term string (half the shuffle bytes, zero-copy Arrow→numpy in the
    block kernel); the terms table maps term → tid for query planning.
    Collisions (~vocab²/2^61) are counted at build time into metrics."""
    from ..extras.hashing import h60

    return h60(col)


def tid_py(term: str) -> int:
    import hashlib

    return int(hashlib.md5(term.encode()).hexdigest()[:15], 16)


def term_bucket_py(term: str) -> int:
    return tid_py(term) % N_TERM_BUCKETS

BLOCK_SCHEMA = T.StructType(
    [
        T.StructField("tid", T.LongType()),
        T.StructField("shard_id", T.IntegerType()),
        T.StructField("block_seq", T.LongType()),
        T.StructField("n_docs", T.IntegerType()),
        T.StructField("min_doc_id", T.LongType()),
        T.StructField("max_doc_id", T.LongType()),
        T.StructField("docs", T.BinaryType()),
        T.StructField("tfs", T.BinaryType()),
        T.StructField("dls", T.BinaryType()),
        T.StructField("max_tfnorm", T.FloatType()),
        T.StructField("sum_tf", T.LongType()),
    ]
)


def _parquet_complete(path: str) -> bool:
    """A parquet dir is reusable on resume only if its write COMMITTED —
    Spark drops a _SUCCESS marker at job commit. A crash mid-write leaves
    files without the marker; reusing such a dir would silently treat the
    missing rows as absent (unqueryable tokens, stale salt plans)."""
    return os.path.exists(os.path.join(path, "_SUCCESS"))


def doc_id_col(conv_id="conv_id", turn_idx="turn_idx"):
    """docID = hash(conv_id, turn_idx) per the north rule — stable under the
    (conv_id, turn_idx) turn ordering because it depends only on those keys."""
    return F.xxhash64(F.col(conv_id), F.col(turn_idx))


def _range_salt(doc_col, n_salts_col):
    """Map int64 doc_id uniformly to [0, n_salts) by RANGE (high bits), so
    salted sub-groups of a hot term cover disjoint, ordered doc_id ranges and
    the term's blocks stay globally doc-ordered."""
    u = (doc_col.cast("double") + F.lit(2.0**63)) / F.lit(2.0**64)
    return F.least(
        F.floor(u * n_salts_col).cast("int"), n_salts_col.cast("int") - F.lit(1)
    )


def _encode_udfs():
    """Scalar Arrow pandas UDFs wrapping the numpy varint codec — the ONLY
    python in the build, applied to one already-grouped array per block row
    (~blocks rows, not postings rows). BATCH-vectorized: the whole Arrow
    batch flattens into one array and encodes in a single numpy pass
    (byte-identical to per-row encode), so high-vocabulary fields — where
    millions of terms yield millions of near-singleton blocks — pay one
    codec pass per batch instead of one per block."""

    def _flat(col: pd.Series) -> tuple[np.ndarray, np.ndarray]:
        lens = np.fromiter(
            (len(a) for a in col), dtype=np.int64, count=len(col)
        )
        if int(lens.sum()) == 0:
            return np.empty(0, dtype=np.int64), lens
        return np.concatenate([np.asarray(a) for a in col]), lens

    @F.pandas_udf(T.BinaryType())
    def enc_docs(col: pd.Series) -> pd.Series:
        flat, lens = _flat(col)
        return pd.Series(
            encode_doc_ids_batch(flat.astype(np.int64), lens)
        )

    @F.pandas_udf(T.BinaryType())
    def enc_u64(col: pd.Series) -> pd.Series:
        flat, lens = _flat(col)
        return pd.Series(
            encode_varint_batch(flat.astype(np.uint64), lens)
        )

    return enc_docs, enc_u64


def posting_block_cells(
    salted: DataFrame, payload_cols: list[str], block_size: int
) -> tuple[DataFrame, "F.Column"]:
    """Shared JVM block skeleton for BOTH the BM25 and sparse builders:

      groupBy(tid, shard, salt) → sort_array(collect_list(struct)) (JVM
      sort, doc_id-ordered) → slice into block_size windows (JVM
      transform+slice) → posexplode.

    Returns (exploded, block_seq_col): exploded carries one row per block
    with the struct array in ``p``; block_seq = (salt << 20) + blk keeps a
    hot term's salted sub-ranges globally doc-ordered on disk (long — see
    build_blocks_jvm note). Group size is bounded by the hot-term salt
    plan (≤ target postings per group)."""
    grouped = salted.groupBy("tid", "shard_id", "salt").agg(
        F.sort_array(
            F.collect_list(F.struct("doc_id", *payload_cols))
        ).alias("ps")
    )
    nblocks = F.ceil(F.size("ps") / F.lit(block_size)).cast("int")
    exploded = grouped.select(
        "tid",
        "shard_id",
        "salt",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), nblocks - 1),
                lambda i: F.slice("ps", i * block_size + 1, block_size),
            )
        ).alias("blk", "p"),
    )
    # long, not int: a stopword with df > target*n_shards*2048 would
    # need n_salts ≥ 2048 and (salt << 20) would wrap int32 — inside
    # the 100 TB envelope. block_seq only orders the on-disk layout,
    # so widening costs nothing on the query path (never read there).
    seq = (F.shiftleft(F.col("salt").cast("long"), 20) + F.col("blk")).alias(
        "block_seq"
    )
    return exploded, seq


def build_blocks_jvm(
    salted: DataFrame, avgdl: float, k1: float, b: float, block_size: int
) -> DataFrame:
    """Posting-block construction with Catalyst owning the heavy lifting:

      posting_block_cells (JVM group/sort/slice — shared with the sparse
      builder) → per-block stats incl. max tf-norm (JVM zip_with/array_max)
      → varint encode (scalar pandas UDF over ~1 row per block)

    vs the previous applyInPandas kernel this moves the 63M-row shuffle-to-
    python transfer, the sort and the per-term loop into whole-stage
    codegen; python sees only block-grained array cells.
    """
    enc_docs, enc_u64 = _encode_udfs()
    exploded, block_seq = posting_block_cells(salted, ["tf", "dl"], block_size)
    doc_ids = F.transform("p", lambda x: x["doc_id"])
    tfs = F.transform("p", lambda x: x["tf"].cast("long"))
    dls = F.transform("p", lambda x: x["dl"].cast("long"))
    tfn = F.zip_with(
        tfs,
        dls,
        lambda t, d: t.cast("double")
        / (
            t.cast("double")
            + F.lit(k1) * (1.0 - b + b * d.cast("double") / F.lit(avgdl))
        ),
    )
    return exploded.select(
        "tid",
        F.col("shard_id").cast("int").alias("shard_id"),
        block_seq,
        F.size("p").alias("n_docs"),
        F.element_at(doc_ids, 1).alias("min_doc_id"),
        F.element_at(doc_ids, -1).alias("max_doc_id"),
        enc_docs(doc_ids).alias("docs"),
        enc_u64(tfs).alias("tfs"),
        enc_u64(dls).alias("dls"),
        F.array_max(tfn).cast("float").alias("max_tfnorm"),
        F.aggregate(
            tfs, F.lit(0).cast("long"), lambda acc, x: acc + x
        ).alias("sum_tf"),
    )


def tokenized_turns(
    transcripts: DataFrame, tokens_col: str | None = None
) -> DataFrame:
    """(doc_id, toks, dl) — ONE vectorized tokenize pass over the corpus.

    Uses the pure-Catalyst tokenizer (split+filter, output-identical to the
    Arrow pandas UDF — parity-tested): it stays inside whole-stage codegen
    and scales ~0.8 efficiency 8→32 cores, where the Python-worker path
    bottlenecks on Arrow transfer + interpreter contention.

    The builder persists THIS form so the tf table, doc stats and the term
    dictionary all derive from a single corpus scan — at 100 TB the
    tokenize+scan is the dominant cost and must not run twice.

    tokens_col: a PRE-ANALYZED array<string> column to index as-is
    (Lucene's pre-analyzed token stream / custom per-field analyzer
    case — e.g. search_as_you_type shingle subfields, whose "terms" are
    multi-word strings the frozen tokenizer must not re-split)."""
    toks = (
        F.col(tokens_col) if tokens_col else tokenize_expr("text")
    )
    return transcripts.select(
        doc_id_col().alias("doc_id"), toks.alias("toks")
    ).withColumn("dl", F.size("toks"))


def tokenize_corpus(transcripts: DataFrame) -> DataFrame:
    """(doc_id, dl, tid, tf) — tokenize + map-side-combined tf counts."""
    return postings_from_tokens(tokenized_turns(transcripts))


_TF_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("dl", T.IntegerType()),
        T.StructField("term", T.StringType()),
        T.StructField("tf", T.LongType()),
    ]
)


def _tf_kernel(batches):
    """Row-local (doc, term) → tf counting, fully vectorized per Arrow
    batch: list_flatten / list_parent_indices / dictionary_encode are
    pyarrow C++ kernels and the count itself is ONE np.unique over an
    int64 (row, term-code) key — no per-row Python anywhere."""
    import pyarrow as pa
    import pyarrow.compute as pc

    for batch in batches:
        toks = batch.column(2)
        if toks.null_count:
            # null text tokenizes to a null array cell; it contributes no
            # postings (the explode twin drops such docs the same way)
            batch = batch.filter(pc.is_valid(toks))
            toks = batch.column(2)
        flat = pc.list_flatten(toks)
        if len(flat) == 0:
            continue
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        d = pc.dictionary_encode(flat)
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        # parent < maxRecordsPerBatch (~10^4) and V < flat length, so
        # parent*V + code stays far inside int64
        v = len(d.dictionary)
        key = parent.astype(np.int64) * v + codes
        uk, counts = np.unique(key, return_counts=True)
        up = pa.array((uk // v).astype(np.int64))
        yield pa.RecordBatch.from_arrays(
            [
                pc.take(batch.column(0), up),
                pc.take(batch.column(1), up),
                pc.take(d.dictionary, pa.array((uk % v).astype(np.int64))),
                pa.array(counts.astype(np.int64)),
            ],
            names=["doc_id", "dl", "term", "tf"],
        )


def postings_from_tokens(toks: DataFrame) -> DataFrame:
    """(doc_id, dl, tid, tf) with NO exchange: tf per (doc, term) is
    row-local (every token of a doc sits in one array cell), so counting
    it never needs the doc-keyed groupBy shuffle the Catalyst explode
    form pays — the vectorized Arrow kernel emits already-aggregated
    postings map-side and the salted repartition-by-term becomes the
    build's ONLY full-data exchange. Also computes the md5 tid on ~0.6×
    the rows (postings, not occurrences). Output-identical to
    ``postings_from_tokens_catalyst`` (parity-tested); measured 2.6×
    faster to materialize at sf0.1/local[32]."""
    return toks.select("doc_id", "dl", "toks").mapInArrow(
        _tf_kernel, _TF_SCHEMA
    ).select("doc_id", "dl", tid_expr("term").alias("tid"), "tf")


def postings_from_tokens_catalyst(toks: DataFrame) -> DataFrame:
    """The pure-Catalyst twin (explode → doc-keyed groupBy): same output,
    one extra full-data exchange. Kept as the parity oracle for the Arrow
    kernel and as a fallback if a deployment forbids Python workers."""
    return (
        toks.select("doc_id", "dl", F.explode("toks").alias("term"))
        .select("doc_id", "dl", tid_expr("term").alias("tid"))
        .groupBy("doc_id", "dl", "tid")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def term_dictionary_from_tokens(toks: DataFrame) -> DataFrame:
    """(term, tid) from the already-tokenized form — no corpus re-scan.
    Per-row array_distinct halves the exploded row count before the
    map-side partial distinct; the shuffle stays ~vocab-sized."""
    return (
        toks.select(F.explode(F.array_distinct("toks")).alias("term"))
        .distinct()
        .withColumn("tid", tid_expr("term"))
    )


def term_dictionary(transcripts: DataFrame) -> DataFrame:
    """(term, tid) — distinct vocabulary straight off the corpus (used when
    no tokenized form is at hand; the builder uses
    ``term_dictionary_from_tokens`` to avoid the second scan)."""
    return term_dictionary_from_tokens(tokenized_turns(transcripts))


def compute_doc_stats(transcripts: DataFrame) -> tuple[int, float]:
    row = (
        transcripts.select(tokenize_expr("text").alias("toks"))
        .select(F.size("toks").alias("dl"))
        .agg(F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl"))
        .collect()[0]
    )
    return int(row["n"]), float(row["avgdl"] or 0.0)


def lineage_frame(
    written: DataFrame, term_stats: DataFrame, run_id: str
) -> DataFrame:
    """Per-term_bucket lineage rows (shard ids, term range, doc count,
    bytes, block count) derived from the WRITTEN postings — shared by the
    builder's stage 4 and by ``merge.merge_indexes`` so a merged index
    carries the same resumability surface as a built one."""
    lin0 = written.groupBy("term_bucket").agg(
        F.lit(run_id).alias("run_id"),
        F.countDistinct("shard_id").alias("n_shards"),
        F.min("tid").alias("tid_lo"),
        F.max("tid").alias("tid_hi"),
        F.sum("n_docs").alias("doc_count"),
        F.sum(
            F.length("docs") + F.length("tfs") + F.length("dls")
        ).alias("bytes"),
        F.count(F.lit(1)).alias("n_blocks"),
        F.lit("complete").alias("status"),
        F.current_timestamp().alias("completed_ts"),
    )
    # human-readable term range per bucket: two tiny joins against the
    # dictionary (lin0 is N_TERM_BUCKETS rows — broadcast side)
    tmap = term_stats.groupBy("tid").agg(F.min("term").alias("term"))
    return (
        lin0.join(
            tmap.withColumnRenamed("tid", "tid_lo").withColumnRenamed(
                "term", "term_lo"
            ),
            "tid_lo",
            "left",
        )
        .join(
            tmap.withColumnRenamed("tid", "tid_hi").withColumnRenamed(
                "term", "term_hi"
            ),
            "tid_hi",
            "left",
        )
        .drop("tid_lo", "tid_hi")
    )


def compute_term_stats(postings: DataFrame, n_stat_salts: int = 16) -> DataFrame:
    """(tid, df, cf) via explicit two-stage salted aggregation so the hot
    terms never concentrate in one reducer even at 10^12 postings."""
    partial = postings.groupBy(
        "tid", F.pmod(F.xxhash64("doc_id"), F.lit(n_stat_salts)).alias("_salt")
    ).agg(F.count(F.lit(1)).alias("df_p"), F.sum("tf").alias("cf_p"))
    return partial.groupBy("tid").agg(
        F.sum("df_p").alias("df"), F.sum("cf_p").alias("cf")
    )


class IndexBuilder:
    def __init__(
        self,
        spark: SparkSession,
        out_dir: str,
        n_shards: int = 32,
        block_size: int = BLOCK_SIZE,
        k1: float = BM25_K1,
        b: float = BM25_B,
        # bounds the collect_list cell in build_blocks_jvm: one (tid,
        # shard, salt) group materializes ≤ target structs of ~24 B in a
        # single array cell (~12 MB at 500k) before slicing into blocks —
        # keep well under executor row-size comfort; raising it trades
        # fewer salted groups for bigger single-row memory spikes
        target_postings_per_task: int = 500_000,
        n_term_groups: int = 32,
        tokens_col: str | None = None,
    ):
        self.spark = spark
        self.out = out_dir
        self.n_shards = n_shards
        self.block_size = block_size
        self.k1 = k1
        self.b = b
        self.target = target_postings_per_task
        self.n_term_groups = n_term_groups
        # pre-analyzed field support (see tokenized_turns): when set, the
        # named array<string> column IS the token stream
        self.tokens_col = tokens_col

    # ---- paths -------------------------------------------------------
    def _p(self, name: str) -> str:
        return os.path.join(self.out, name)

    # ---- lineage / resume --------------------------------------------
    def _write_config(self) -> None:
        """Layout parameters recorded at build START (before any postings)
        so a resume can validate against them even if the crash happened
        before the final stats write."""
        pd.DataFrame(
            {
                "format_version": [INDEX_FORMAT_VERSION],
                "n_shards": [self.n_shards],
                "block_size": [self.block_size],
                "k1": [self.k1],
                "b": [self.b],
            }
        ).to_parquet(os.path.join(self.out, "build_config.parquet"))

    def _check_config(self) -> None:
        """Resuming with different layout params would mix incompatible
        shard functions across kept and rebuilt buckets — refuse."""
        path = os.path.join(self.out, "build_config.parquet")
        if not os.path.exists(path):
            return
        cfg = pd.read_parquet(path).iloc[0]
        for name, mine in (
            ("n_shards", self.n_shards),
            ("block_size", self.block_size),
            ("k1", self.k1),
            ("b", self.b),
        ):
            if cfg[name] != mine:
                raise ValueError(
                    f"resume {name}={mine} differs from the index's "
                    f"{name}={cfg[name]} — kept buckets would be "
                    f"incompatible; rebuild without resume or match params"
                )

    def _done_buckets(self) -> set[int]:
        path = self._p("lineage")
        if not os.path.exists(path):
            return set()
        lin = self.spark.read.parquet(path)
        return {
            r["term_bucket"]
            for r in lin.filter(F.col("status") == "complete")
            .select("term_bucket")
            .distinct()
            .collect()
        }

    def _clean_incomplete(self, done: set[int]) -> None:
        """Remove postings partitions not covered by complete lineage (a
        killed run may have written files without recording lineage)."""
        pdir = self._p("postings")
        if not os.path.exists(pdir):
            return
        for d in os.listdir(pdir):
            if d.startswith("term_bucket="):
                b = int(d.split("=")[1])
                if b not in done:
                    shutil.rmtree(os.path.join(pdir, d))

    # ---- main build ---------------------------------------------------
    def build(self, transcripts: DataFrame, resume: bool = False) -> dict:
        run_id = uuid.uuid4().hex[:12]
        t0 = time.time()
        metrics: list[tuple] = []
        stage_sec: dict[str, float] = {}
        _t = [time.time()]

        def _mark(name: str) -> None:
            now = time.time()
            stage_sec[name] = round(now - _t[0], 3)
            _t[0] = now

        if resume:
            self._check_config()
        done = self._done_buckets() if resume else set()
        if resume:
            self._clean_incomplete(done)
        elif os.path.exists(self.out):
            shutil.rmtree(self.out)
        os.makedirs(self.out, exist_ok=True)
        self._write_config()

        # --- stage 1: tokenize ONCE → persist the tokenized turns; the tf
        # table, doc stats AND the term dictionary all derive from this one
        # corpus scan (previously the dictionary re-tokenized the corpus —
        # a second full scan of the most expensive stage at 100 TB)
        toks = tokenized_turns(transcripts, self.tokens_col).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        postings_all = postings_from_tokens(toks).persist(
            StorageLevel.MEMORY_AND_DISK
        )

        # corpus stats (reused verbatim on resume so avgdl/N stay
        # consistent across restarts — the resumability contract)
        stats_path = self._p("stats")
        if resume and _parquet_complete(stats_path):
            srow = self.spark.read.parquet(stats_path).collect()[0]
            n_docs, avgdl = int(srow["n_docs"]), float(srow["avgdl"])
        else:
            # N counts ALL turns (including zero-token ones, which produce
            # no postings), matching the numpy oracle's corpus definition
            row = toks.agg(
                F.count(F.lit(1)).alias("n"), F.sum("dl").alias("s")
            ).collect()[0]
            n_docs = int(row["n"])
            avgdl = float(row["s"] or 0) / max(n_docs, 1)
        _mark("tokenize_and_doc_stats")
        metrics.append((run_id, "build", "doc_count", n_docs))

        postings = postings_all
        if done:
            postings = postings.withColumn(
                "term_bucket", F.pmod("tid", F.lit(N_TERM_BUCKETS))
            ).filter(~F.col("term_bucket").isin(list(done)))
        postings = postings.withColumn(
            "shard_id", F.pmod(F.xxhash64("doc_id", F.lit(7)), F.lit(self.n_shards)).cast("int")
        )

        # --- stage 2: term dictionary + tid stats + hot-term salt plan.
        # The terms table (term, tid, df, cf) is the query planner's
        # dictionary; tid collisions (two terms, one hash) are counted.
        terms_path = self._p("terms")
        if resume and _parquet_complete(terms_path):
            term_stats = self.spark.read.parquet(terms_path)
        else:
            tdict = term_dictionary_from_tokens(toks)
            # stats over ALL postings, not the resume-filtered remainder —
            # a terms rebuild during resume must still cover the kept
            # buckets' vocabulary (df/cf drive queries and the salt plan)
            tid_stats = compute_term_stats(postings_all)
            # GLOBALLY SORTED BY TERM: the range partitioner gives every
            # output file (and row group) a tight disjoint [min,max] term
            # span, so the driver-side pyarrow dictionary reads — term
            # point lookups and PREFIX RANGE READS (fuzzy prefix_length,
            # match_bool_prefix, SAYT, terms_enum) — prune to the one or
            # two row groups covering the range instead of scanning the
            # whole vocabulary (measured 417→30 ms on a 9.7M-term shingle
            # dictionary's worst-case stopword prefix). One extra
            # vocabulary-sized sort shuffle at build, paid once.
            tdict.join(tid_stats, "tid").select(
                "term", "tid", "df", "cf"
            ).sort("term").write.mode("overwrite").parquet(terms_path)
            term_stats = self.spark.read.parquet(terms_path)
        toks.unpersist()  # everything downstream reads postings_all
        # postings per (shard, term) ≈ df / n_shards; split further when a
        # term's per-shard slice would exceed the per-task target
        hot = term_stats.filter(
            F.col("df") > F.lit(self.target * self.n_shards)
        ).select(
            "tid",
            F.ceil(F.col("df") / F.lit(self.target * self.n_shards))
            .cast("int")
            .alias("n_salts"),
        )
        # one driver action for hot-term count + tid-collision count
        agg_row = term_stats.agg(
            F.sum(
                (F.col("df") > F.lit(self.target * self.n_shards)).cast("int")
            ).alias("n_hot"),
            (F.count(F.lit(1)) - F.countDistinct("tid")).alias("collisions"),
        ).collect()[0]
        n_hot = int(agg_row["n_hot"] or 0)
        metrics.append(
            (run_id, "build", "tid_collisions", int(agg_row["collisions"]))
        )
        _mark("term_stats")
        metrics.append((run_id, "build", "hot_terms_split", n_hot))

        salted = (
            postings.join(F.broadcast(hot), "tid", "left")
            .withColumn("n_salts", F.coalesce(F.col("n_salts"), F.lit(1)))
            .withColumn("salt", _range_salt(F.col("doc_id"), F.col("n_salts")))
        )

        # --- stage 3: salted repartition-by-term → JVM block build
        blocks = build_blocks_jvm(
            salted, avgdl, self.k1, self.b, self.block_size
        )
        blocks = blocks.withColumn(
            "term_bucket", F.pmod("tid", F.lit(N_TERM_BUCKETS))
        )
        (
            # 64 hash partitions keyed by term_bucket: hash collisions
            # leave ~40 of the 64 tasks non-empty (birthday stats), but
            # that still beats the shuffle_partitions default's coarse
            # tasks (measured 18→14.6 s at local[8]); partitionBy on
            # write keeps exactly one file per bucket either way
            blocks.repartition(N_TERM_BUCKETS, "term_bucket")
            .sortWithinPartitions("tid", "shard_id", "block_seq")
            .write.mode("append")
            .partitionBy("term_bucket")
            .parquet(self._p("postings"))
        )
        _mark("block_build_write")

        # --- stage 4: lineage per term_bucket (shard ids, term range,
        # doc count, bytes — the north rule's per-partition lineage)
        written = self.spark.read.parquet(self._p("postings"))
        if done:
            written = written.filter(~F.col("term_bucket").isin(list(done)))
        lineage = lineage_frame(written, term_stats, run_id)
        lineage.write.mode("append").parquet(self._p("lineage"))
        _mark("lineage")

        # --- stage 5: global stats + metrics tables
        self.spark.createDataFrame(
            pd.DataFrame(
                {
                    "run_id": [run_id],
                    "format_version": [INDEX_FORMAT_VERSION],
                    "n_docs": [n_docs],
                    "avgdl": [avgdl],
                    "n_shards": [self.n_shards],
                    "block_size": [self.block_size],
                    "k1": [self.k1],
                    "b": [self.b],
                }
            )
        ).write.mode("overwrite").parquet(stats_path)

        elapsed = time.time() - t0
        metrics.append((run_id, "build", "elapsed_ms", int(elapsed * 1000)))
        metrics.append(
            (run_id, "build", "turns_per_sec", int(n_docs / max(elapsed, 1e-9)))
        )
        mdf = pd.DataFrame(
            metrics, columns=["run_id", "stage", "name", "value"]
        )
        mdf["ts"] = pd.Timestamp.utcnow().tz_localize(None)
        self.spark.createDataFrame(mdf).write.mode("append").parquet(
            self._p("stats_events")
        )
        postings_all.unpersist()
        _mark("stats_metrics")
        return {
            "stage_sec": stage_sec,
            "run_id": run_id,
            "n_docs": n_docs,
            "avgdl": avgdl,
            "elapsed_sec": elapsed,
            "hot_terms_split": n_hot,
        }

"""Positional index: per-(term, doc) token positions for phrase queries.

Lucene stores positions inside its postings format (`.pos` files written by
the codec the reference plugin inherits from OpenSearch core — consumed by
`PhraseQuery`/`ExactPhraseScorer`). This engine keeps them as an OPT-IN
sidecar table next to an existing block index:

    <index_dir>/positions/term_bucket=<b>/...   (tid, doc_id, dl, positions)

Why a sidecar and not a block payload: positions are only read by phrase
queries, roughly double the index footprint, and BM25/hybrid serving never
touches them — keeping them out of the posting blocks means the hot query
path's scan bytes are unchanged whether or not phrases are enabled (the same
reason Lucene puts positions in a separate file the scorer only opens on
demand).

Build shape (one tokenize pass, one postings-shaped shuffle):

  transcripts → tokenized_turns (pure-Catalyst, shared with the main build)
              → posexplode(toks) → (doc_id, dl, pos, tid)
              → groupBy(doc_id, tid) + sort_array(collect_list(pos))
              → parquet partitioned by term_bucket, sorted (tid, doc_id)

Everything stays in whole-stage codegen — positions are written as a plain
``array<int>`` column (parquet's own delta/RLE encoding compresses the
ascending ints; no Python in the build at all). collect_list partially
aggregates map-side, and since a turn's tokens arrive in ONE input row the
lists are complete before the shuffle — shuffled rows ≈ distinct (doc, term)
pairs, the same cardinality as the tf table the main build shuffles.

Scale notes (10^12 turns): the shuffle key is (doc_id, tid) — doc-keyed, so
hot TERMS do not concentrate (a stopword's positions spread across its docs'
partitions); the term_bucket repartition for the write reuses the main
build's 64-bucket layout so phrase queries prune to their terms' buckets.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .build import (
    INDEX_FORMAT_VERSION,
    N_TERM_BUCKETS,
    doc_id_col,
    tid_expr,
    tokenized_turns,
)

POSITIONS_FORMAT_VERSION = 1


def positions_table(transcripts: DataFrame) -> DataFrame:
    """(tid, doc_id, dl, positions sorted array<int>) — one Catalyst pass."""
    toks = tokenized_turns(transcripts)
    return (
        toks.select(
            "doc_id", "dl", F.posexplode("toks").alias("pos", "term")
        )
        .select(
            tid_expr("term").alias("tid"),
            "doc_id",
            "dl",
            F.col("pos").cast("int").alias("pos"),
        )
        .groupBy("tid", "doc_id", "dl")
        .agg(F.sort_array(F.collect_list("pos")).alias("positions"))
    )


def build_positions(
    spark: SparkSession, index_dir: str, transcripts: DataFrame
) -> dict:
    """Write the positions sidecar next to an existing block index.

    The index's own stats (n_docs/avgdl/k1/b) are reused at query time, so
    this pass stores only what phrase matching needs. Overwrites any prior
    positions sidecar (deterministic content — same corpus → same rows)."""
    t0 = time.time()
    out = os.path.join(index_dir, "positions")
    pos = positions_table(transcripts).withColumn(
        "term_bucket", F.pmod("tid", F.lit(N_TERM_BUCKETS))
    )
    (
        pos.repartition(N_TERM_BUCKETS, "term_bucket")
        .sortWithinPartitions("tid", "doc_id")
        .write.mode("overwrite")
        .partitionBy("term_bucket")
        .parquet(out)
    )
    cfg = {
        "positions_format_version": POSITIONS_FORMAT_VERSION,
        "index_format_version": INDEX_FORMAT_VERSION,
        "n_term_buckets": N_TERM_BUCKETS,
    }
    with open(os.path.join(index_dir, "positions_config.json"), "w") as f:
        json.dump(cfg, f)
    return {"elapsed_sec": time.time() - t0, "path": out}


def has_positions(index_dir: str) -> bool:
    return os.path.exists(os.path.join(index_dir, "positions_config.json"))


__all__ = [
    "build_positions",
    "has_positions",
    "positions_table",
    "doc_id_col",
]

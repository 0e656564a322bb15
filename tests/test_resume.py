"""Checkpoint/resume: a killed index build restarts from per-partition
lineage, rebuilding only term_buckets without complete lineage, and the
resumed index is query-identical to a single-shot build (the north rule's
resumability contract)."""

import os
import shutil

import pandas as pd
import pytest

from neural_search_spark.index.build import IndexBuilder
from neural_search_spark.query.bm25 import BM25Index, bm25_topk


@pytest.fixture(scope="module")
def crashed_build(spark, transcripts_df, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("idx") / "resume")
    IndexBuilder(spark, out, n_shards=4, block_size=64).build(transcripts_df)
    full = {
        q: bm25_topk(BM25Index(spark, out), q, k=10).toPandas()
        for q in ["the", "w0001 w0250", "rare00001 the"]
    }
    # simulate a crash mid-build: half the buckets lose their lineage rows;
    # some of those also keep orphaned partition files (written but not
    # recorded — _clean_incomplete must purge them), others lose files too
    lin_dir = os.path.join(out, "lineage")
    lin = pd.read_parquet(lin_dir)
    buckets = sorted(lin["term_bucket"].unique())
    dropped = buckets[::2]
    shutil.rmtree(lin_dir)
    os.makedirs(lin_dir)
    keep = lin[~lin["term_bucket"].isin(dropped)].copy()
    # pandas defaults to nanosecond timestamps, which Spark's parquet reader
    # rejects — write microseconds like Spark does
    keep["completed_ts"] = keep["completed_ts"].astype("datetime64[us]")
    keep.to_parquet(os.path.join(lin_dir, "part-0.parquet"), index=False)
    for i, b in enumerate(dropped):
        if i % 2 == 0:  # half the dropped buckets also lose their files
            d = os.path.join(out, "postings", f"term_bucket={b}")
            if os.path.exists(d):
                shutil.rmtree(d)
    # crash happened before the final stats write
    shutil.rmtree(os.path.join(out, "stats"))
    return out, dropped, buckets, full


def test_resume_completes_lineage(spark, transcripts_df, crashed_build):
    out, dropped, buckets, full = crashed_build
    res = IndexBuilder(spark, out, n_shards=4, block_size=64).build(
        transcripts_df, resume=True
    )
    assert res["n_docs"] == transcripts_df.count()
    lin = pd.read_parquet(os.path.join(out, "lineage"))
    done = lin[lin["status"] == "complete"]["term_bucket"]
    assert sorted(done.unique()) == buckets
    assert not done.duplicated().any(), "a bucket was rebuilt twice"


def test_resumed_index_query_identical(spark, crashed_build):
    out, _, _, full = crashed_build
    idx = BM25Index(spark, out)
    for q, expected in full.items():
        got = bm25_topk(idx, q, k=10).toPandas()
        assert got["doc_id"].tolist() == expected["doc_id"].tolist(), q
        assert got["score"].tolist() == expected["score"].tolist(), q


# ---------------------------------------------------------------------------
# sparse index resume
# ---------------------------------------------------------------------------
def test_sparse_resume_query_identical(spark, transcripts_df, tmp_path_factory):
    from pyspark.sql import functions as F

    from neural_search_spark.index.build import doc_id_col
    from neural_search_spark.index.sparse import (
        SparseIndex,
        SparseIndexBuilder,
        sparse_index_topk,
    )
    from neural_search_spark.tokenizer import tokenize_expr

    tall = (
        transcripts_df.withColumn("doc_id", doc_id_col())
        .select("doc_id", F.explode(tokenize_expr("text")).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count("*").cast("float").alias("weight"))
    )
    out = str(tmp_path_factory.mktemp("sidx") / "sparse_resume")
    SparseIndexBuilder(spark, out, n_shards=4, block_size=64).build(tall)
    q = {"the": 1.0, "w0001": 3.0, "w0250": 2.0}
    full = sparse_index_topk(SparseIndex(spark, out), q, k=10).toPandas()

    # crash: half the buckets lose lineage; some also keep orphaned files
    lin_dir = os.path.join(out, "lineage")
    lin = pd.read_parquet(lin_dir)
    buckets = sorted(lin["term_bucket"].unique())
    dropped = buckets[::2]
    shutil.rmtree(lin_dir)
    os.makedirs(lin_dir)
    keep = lin[~lin["term_bucket"].isin(dropped)]
    keep.to_parquet(os.path.join(lin_dir, "part-0.parquet"), index=False)
    for i, b in enumerate(dropped):
        if i % 2 == 0:
            d = os.path.join(out, "postings", f"term_bucket={b}")
            if os.path.exists(d):
                shutil.rmtree(d)

    SparseIndexBuilder(spark, out, n_shards=4, block_size=64).build(
        tall, resume=True
    )
    lin2 = pd.read_parquet(lin_dir)
    done = lin2[lin2["status"] == "complete"]["term_bucket"]
    assert sorted(done.unique()) == buckets
    assert not done.duplicated().any()
    got = sparse_index_topk(SparseIndex(spark, out), q, k=10).toPandas()
    assert got["doc_id"].tolist() == full["doc_id"].tolist()
    assert got["score"].tolist() == full["score"].tolist()


def test_resume_rejects_changed_layout(spark, transcripts_df, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("idx") / "cfg")
    IndexBuilder(spark, out, n_shards=4, block_size=64).build(transcripts_df)
    with pytest.raises(ValueError, match="n_shards=8 differs"):
        IndexBuilder(spark, out, n_shards=8, block_size=64).build(
            transcripts_df, resume=True
        )


def test_resume_rebuilds_uncommitted_terms(
    spark, transcripts_df, tmp_path_factory
):
    """A terms dir without the _SUCCESS commit marker (crash mid-write) must
    be rebuilt on resume, not silently reused with missing tokens."""
    out = str(tmp_path_factory.mktemp("idx") / "terms")
    IndexBuilder(spark, out, n_shards=4, block_size=64).build(transcripts_df)
    terms_dir = os.path.join(out, "terms")
    before = pd.read_parquet(terms_dir)
    # simulate a crash between file writes and job commit: drop the marker
    # AND half the rows' file (here: truncate via rewriting a subset)
    os.remove(os.path.join(terms_dir, "_SUCCESS"))
    for f in os.listdir(terms_dir):
        os.remove(os.path.join(terms_dir, f))
    before.head(3).to_parquet(
        os.path.join(terms_dir, "part-0.parquet"), index=False
    )
    # also invalidate lineage for one bucket so the resume has work to do
    lin_dir = os.path.join(out, "lineage")
    lin = pd.read_parquet(lin_dir)
    b0 = sorted(lin["term_bucket"].unique())[0]
    shutil.rmtree(lin_dir)
    os.makedirs(lin_dir)
    keep = lin[lin["term_bucket"] != b0].copy()
    keep["completed_ts"] = keep["completed_ts"].astype("datetime64[us]")
    keep.to_parquet(os.path.join(lin_dir, "part-0.parquet"), index=False)
    IndexBuilder(spark, out, n_shards=4, block_size=64).build(
        transcripts_df, resume=True
    )
    after = pd.read_parquet(terms_dir)
    assert len(after) == len(before), "uncommitted terms dir was reused"

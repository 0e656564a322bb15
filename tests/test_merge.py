"""Segment-style index merge: merging indexes built over disjoint halves
of a corpus must be QUERY-IDENTICAL (doc ids AND float32 scores) to a
single-shot build over the whole corpus — the avgdl/max_tfnorm recompute
and the doc-order restore are exactly the things a naive file concat gets
wrong. Also: layout-mismatch refusal, merged-df hot-term salting, lineage
parity with a built index."""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from neural_search_spark.index.build import IndexBuilder, doc_id_col
from neural_search_spark.index.merge import decoded_postings, merge_indexes
from neural_search_spark.query.bm25 import BM25Index, bm25_topk

QUERIES = ["the", "w0001 w0250", "rare00001 the", "tool call model", "w0100"]


@pytest.fixture(scope="module")
def merged_setup(spark, transcripts_df, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("merge"))
    full_dir = os.path.join(root, "full")
    a_dir, b_dir = os.path.join(root, "a"), os.path.join(root, "b")
    # disjoint halves by doc-id hash parity (every turn lands in exactly one)
    half = F.pmod(doc_id_col(), F.lit(2))
    parts = [transcripts_df.filter(half == i) for i in (0, 1)]
    for out, df in ((full_dir, transcripts_df), (a_dir, parts[0]), (b_dir, parts[1])):
        IndexBuilder(spark, out, n_shards=4, block_size=64).build(df)
    merged_dir = os.path.join(root, "merged")
    info = merge_indexes(spark, [a_dir, b_dir], merged_dir)
    return full_dir, a_dir, b_dir, merged_dir, info


def test_merge_query_identical_to_full_build(spark, merged_setup):
    full_dir, _, _, merged_dir, info = merged_setup
    full, merged = BM25Index(spark, full_dir), BM25Index(spark, merged_dir)
    assert merged.n_docs == full.n_docs == info["n_docs"]
    assert abs(merged.avgdl - full.avgdl) < 1e-6 * full.avgdl
    for q in QUERIES:
        a = bm25_topk(full, q, k=10).toPandas()
        b = bm25_topk(merged, q, k=10).toPandas()
        assert list(a.doc_id) == list(b.doc_id), q
        assert list(a.score) == list(b.score), q  # float32-exact


def test_merge_restores_block_invariants(spark, merged_setup):
    """Blocks are doc_id-ordered per (tid, shard) again after the merge —
    min/max ranges of consecutive block_seq must not overlap (the property
    a naive concat of interleaved sources breaks)."""
    _, _, _, merged_dir, _ = merged_setup
    blocks = (
        spark.read.parquet(os.path.join(merged_dir, "postings"))
        .select("tid", "shard_id", "block_seq", "min_doc_id", "max_doc_id")
        .toPandas()
        .sort_values(["tid", "shard_id", "block_seq"])
    )
    for (_, _), grp in blocks.groupby(["tid", "shard_id"]):
        prev = None
        for _, r in grp.iterrows():
            assert r.min_doc_id <= r.max_doc_id
            if prev is not None:
                assert r.min_doc_id > prev
            prev = r.max_doc_id


def test_merge_lineage_and_terms_parity(spark, merged_setup):
    full_dir, _, _, merged_dir, _ = merged_setup
    tf = pd.read_parquet(os.path.join(full_dir, "terms")).sort_values("term")
    tm = pd.read_parquet(os.path.join(merged_dir, "terms")).sort_values("term")
    assert list(tf.term) == list(tm.term)
    assert list(tf.df) == list(tm.df)
    assert list(tf.cf) == list(tm.cf)
    lin = pd.read_parquet(os.path.join(merged_dir, "lineage"))
    assert (lin.status == "complete").all()
    posted = pd.read_parquet(
        os.path.join(merged_dir, "postings"),
        columns=["n_docs"],
    )
    assert lin.doc_count.sum() == posted.n_docs.sum()


def test_merge_hot_split_from_merged_df(spark, merged_setup):
    """A term hot only in AGGREGATE must split: per-half df is below the
    threshold, merged df above it; identity must still hold."""
    full_dir, a_dir, b_dir, _, _ = merged_setup
    df_hot = pd.read_parquet(os.path.join(full_dir, "terms"))
    hot_df = int(df_hot.df.max())
    # threshold between half-corpus max df and full max df
    target = max(hot_df // 2 // 4, 1)  # n_shards=4
    out = os.path.join(os.path.dirname(a_dir), "merged_salted")
    info = merge_indexes(
        spark, [a_dir, b_dir], out, target_postings_per_task=target
    )
    assert info["hot_terms_split"] >= 1
    full, merged = BM25Index(spark, full_dir), BM25Index(spark, out)
    for q in QUERIES[:3]:
        a = bm25_topk(full, q, k=10).toPandas()
        b = bm25_topk(merged, q, k=10).toPandas()
        assert list(a.doc_id) == list(b.doc_id), q


def test_merge_refuses_layout_mismatch(spark, transcripts_df, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("mismatch"))
    a, b = os.path.join(root, "a"), os.path.join(root, "b")
    half = F.pmod(doc_id_col(), F.lit(2))
    IndexBuilder(spark, a, n_shards=4, block_size=64).build(
        transcripts_df.filter(half == 0)
    )
    IndexBuilder(spark, b, n_shards=8, block_size=64).build(
        transcripts_df.filter(half == 1)
    )
    with pytest.raises(ValueError, match="n_shards"):
        merge_indexes(spark, [a, b], os.path.join(root, "out"))
    with pytest.raises(ValueError, match="at least two"):
        merge_indexes(spark, [a], os.path.join(root, "out"))


def test_decoded_postings_round_trip(spark, merged_setup, transcripts_df):
    """Decoding the merged index's blocks reproduces the tokenize-derived
    postings exactly (tf AND dl per (doc, term))."""
    from neural_search_spark.index.build import tokenize_corpus

    _, _, _, merged_dir, _ = merged_setup
    dec = (
        decoded_postings(spark.read.parquet(os.path.join(merged_dir, "postings")))
        .select("tid", "doc_id", "tf", "dl")
        .toPandas()
        .sort_values(["tid", "doc_id"])
        .reset_index(drop=True)
    )
    ref = (
        tokenize_corpus(transcripts_df)
        .select("tid", "doc_id", "tf", "dl")
        .toPandas()
        .sort_values(["tid", "doc_id"])
        .reset_index(drop=True)
    )
    assert len(dec) == len(ref)
    assert (dec.tf.to_numpy() == ref.tf.to_numpy()).all()
    assert (dec.dl.to_numpy() == ref.dl.to_numpy()).all()


def test_merge_positions_sidecar(spark, transcripts_df, tmp_path_factory):
    """Positions sidecars merge with the postings: phrase serving against
    the merged-halves index is rank- and score-identical to a one-shot
    build+positions over the union corpus; expunged docs drop from the
    merged positions; a with/without mix refuses."""
    from neural_search_spark.index.positions import (
        build_positions,
        has_positions,
    )
    from neural_search_spark.query.phrase import phrase_topk

    root = str(tmp_path_factory.mktemp("merge_pos"))
    full_dir = os.path.join(root, "full")
    a_dir, b_dir = os.path.join(root, "a"), os.path.join(root, "b")
    half = F.pmod(doc_id_col(), F.lit(2))
    parts = [transcripts_df.filter(half == i) for i in (0, 1)]
    for out, df in (
        (full_dir, transcripts_df), (a_dir, parts[0]), (b_dir, parts[1])
    ):
        IndexBuilder(spark, out, n_shards=4, block_size=64).build(df)
        build_positions(spark, out, df)
    merged_dir = os.path.join(root, "merged")
    info = merge_indexes(spark, [a_dir, b_dir], merged_dir)
    assert info["positions_merged"] is True
    assert has_positions(merged_dir)
    full, merged = BM25Index(spark, full_dir), BM25Index(spark, merged_dir)
    for q, slop in (("the tool", 0), ("tool the", 2), ("w0000 w0001", 0)):
        for mode in ("driver", "distributed"):
            a = phrase_topk(full, q, k=10, mode=mode, slop=slop).toPandas()
            b = phrase_topk(merged, q, k=10, mode=mode, slop=slop).toPandas()
            assert list(a.doc_id) == list(b.doc_id), (q, mode)
            assert list(a.score) == list(b.score), (q, mode)
    # expunge: deleted docs vanish from merged phrase results
    victims = phrase_topk(full, "the tool", k=3).toPandas().doc_id.tolist()
    dels = spark.createDataFrame(pd.DataFrame({"doc_id": victims}))
    merged2_dir = os.path.join(root, "merged_tomb")
    info2 = merge_indexes(spark, [a_dir, b_dir], merged2_dir, deletes=dels)
    assert info2["positions_merged"] is True
    got = phrase_topk(
        BM25Index(spark, merged2_dir), "the tool", k=10
    ).toPandas()
    assert not set(victims) & set(got.doc_id)
    # mixed sources refuse
    c_dir = os.path.join(root, "c")
    IndexBuilder(spark, c_dir, n_shards=4, block_size=64).build(parts[0])
    with pytest.raises(ValueError, match="positions"):
        merge_indexes(spark, [c_dir, b_dir], os.path.join(root, "m2"))

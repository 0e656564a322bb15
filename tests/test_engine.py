"""Engine.search() dispatcher (HybridQueryPhaseSearcher analog) + the JSON
query-spec surface + CLI `search` subcommand."""

import json

import pytest
from pyspark.sql import functions as F

from neural_search_spark.engine import Engine, HybridSpec, spec_from_json
from neural_search_spark.index.build import IndexBuilder, doc_id_col
from neural_search_spark.query.neural import QuerySpec


@pytest.fixture(scope="module")
def eng(spark, transcripts_df, tmp_path_factory):
    base = tmp_path_factory.mktemp("engine")
    idx_dir = str(base / "bm25")
    IndexBuilder(spark, idx_dir, n_shards=4, block_size=64).build(
        transcripts_df
    )
    corpus = transcripts_df.withColumn("doc_id", doc_id_col())
    # sparse features: tf map over the same corpus
    from neural_search_spark.index.sparse import (
        SparseIndex,
        SparseIndexBuilder,
    )
    from neural_search_spark.tokenizer import tokenize_expr

    tall = (
        corpus.select("doc_id", F.explode(tokenize_expr("text")).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count("*").cast("float").alias("weight"))
    )
    sp_dir = str(base / "sparse")
    SparseIndexBuilder(spark, sp_dir, n_shards=4, block_size=64).build(tall)
    from neural_search_spark.processors import text_embedding, to_feature_map
    from neural_search_spark.query.bm25 import BM25Index

    feats = to_feature_map(tall)
    dense = text_embedding(corpus, out_col="embedding")
    full = dense.join(feats, "doc_id")
    return Engine(
        spark,
        corpus=full,
        bm25_index=BM25Index(spark, idx_dir),
        sparse_index=SparseIndex(spark, sp_dir),
    )


def test_match_routes_to_index(spark, eng):
    from neural_search_spark.query.bm25 import bm25_topk

    got = eng.search(QuerySpec(query_type="match", query_text="the tool"), k=5)
    want = bm25_topk(eng.bm25_index, "the tool", k=5)
    assert got.toPandas().doc_id.tolist() == want.toPandas().doc_id.tolist()


def test_sparse_routes_to_index(spark, eng):
    from neural_search_spark.index.sparse import sparse_index_topk

    q = {"the": 1.0, "tool": 2.0}
    got = eng.search(
        QuerySpec(query_type="neural_sparse", query_tokens=q), k=5
    ).toPandas()
    want = sparse_index_topk(eng.sparse_index, q, k=5).toPandas()
    assert got.doc_id.tolist() == want.doc_id.tolist()


def test_neural_dense_path(spark, eng):
    got = eng.search(
        QuerySpec(query_type="neural", field="embedding", query_text="the tool"),
        k=5,
    ).toPandas()
    assert len(got) == 5 and got["rank"].tolist() == [1, 2, 3, 4, 5]


def test_hybrid_json_roundtrip_and_search(spark, eng):
    spec = spec_from_json(
        json.dumps(
            {
                "hybrid": {
                    "queries": [
                        {"match": {"query_text": "the tool"}},
                        {"neural_sparse": {"query_tokens": {"the": 1.0}}},
                    ],
                    "normalization": "min_max",
                    "combination": "arithmetic_mean",
                    "pagination_depth": 30,
                }
            }
        )
    )
    assert isinstance(spec, HybridSpec) and spec.pagination_depth == 30
    out = eng.search(spec, k=5).toPandas()
    assert len(out) == 5
    assert out["score"].is_monotonic_decreasing


def test_bad_specs():
    with pytest.raises(ValueError, match="exactly one"):
        spec_from_json({"match": {}, "neural": {}})
    with pytest.raises(ValueError, match="unknown query type"):
        spec_from_json({"frobnicate": {}})
    with pytest.raises(ValueError, match="cannot nest"):
        spec_from_json(
            {"hybrid": {"queries": [{"hybrid": {"queries": []}}]}}
        )


def test_corpus_required_error(spark):
    eng2 = Engine(spark)
    with pytest.raises(ValueError, match="needs a corpus"):
        eng2.search(QuerySpec(query_type="neural", query_text="x"), k=3)


def test_cli_search(spark, eng, tmp_path, capsys):
    from neural_search_spark import cli

    spec = {"match": {"query_text": "the tool"}}
    p = tmp_path / "spec.json"
    p.write_text(json.dumps(spec))
    cli.main(
        ["search", "--spec", str(p), "--index", eng.bm25_index.path, "--k", "3"]
    )
    out = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert len(out) == 3 and out[0]["rank"] == 1


def test_hybrid_collapse_and_rerank(spark, eng):
    base = {
        "queries": [
            {"match": {"query_text": "the tool"}},
            {"match": {"query_text": "the user"}},
        ],
        "pagination_depth": 40,
    }
    col = eng.search({"hybrid": {**base, "collapse_field": "role"}}, k=3).toPandas()
    # one row per role value, ranked
    assert len(col) == 3 and col["rank"].tolist() == [1, 2, 3]
    rr = eng.search(
        {"hybrid": {**base, "rerank_by_field": "turn_idx"}}, k=5
    ).toPandas()
    assert len(rr) == 5
    assert rr["score"].is_monotonic_decreasing  # re-sorted by turn_idx


def test_spec_reuse_reinfers(spark, eng):
    """rewrite() must not mutate the caller's spec — a reused spec whose
    query_text changed re-infers instead of serving stale results."""
    from neural_search_spark.query.neural import QuerySpec, rewrite

    spec = QuerySpec(query_type="neural", query_text="cats and dogs")
    r1 = rewrite(spec)
    assert spec.vector is None and r1.vector is not None
    spec.query_text = "submarines"
    r2 = rewrite(spec)
    assert r2.vector != r1.vector


def test_bad_body_key_is_value_error():
    with pytest.raises(ValueError, match="invalid match query body"):
        spec_from_json({"match": {"text": "typo for query_text"}})


def test_empty_hybrid_with_collapse_raises(spark, eng):
    with pytest.raises(ValueError, match="1..5 sub-queries"):
        eng.search({"hybrid": {"queries": [], "collapse_field": "role"}}, k=3)


def test_collapse_then_rerank_applies_both(spark, eng):
    out = eng.search(
        {
            "hybrid": {
                "queries": [{"match": {"query_text": "the tool"}}],
                "collapse_field": "role",
                "rerank_by_field": "turn_idx",
            }
        },
        k=3,
    ).toPandas()
    assert len(out) <= 3 and out["score"].is_monotonic_decreasing


def test_msearch_batches_match_specs(spark, eng):
    from neural_search_spark.query.bm25 import bm25_topk

    res = eng.msearch(
        {
            "q1": {"match": {"query_text": "the tool"}},
            "q2": {"match": {"query_text": "the user"}},
            "q3": {"neural_sparse": {"query_tokens": {"the": 1.0}}},
        },
        k=4,
    ).toPandas()
    assert set(res.query_id) == {"q1", "q2", "q3"}
    for qid, text in (("q1", "the tool"), ("q2", "the user")):
        got = res[res.query_id == qid].sort_values("rank")
        want = bm25_topk(eng.bm25_index, text, k=4).toPandas()
        assert got.doc_id.tolist() == want.doc_id.tolist(), qid


def test_msearch_empty_specs_raises(spark, eng):
    with pytest.raises(ValueError, match="at least one spec"):
        eng.msearch({})

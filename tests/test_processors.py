"""Ingest processors (stub models), neural query prep, sort/search_after."""

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from neural_search_spark import processors
from neural_search_spark.extras.hashing import H60_MAX
from neural_search_spark.query import neural
from neural_search_spark.tokenizer import tokenize_py


@pytest.fixture(scope="module")
def docs_df(spark):
    rows = [
        (0, "alpha beta gamma"),
        (1, "Alpha,  BETA gamma!"),  # same normalized content as 0
        (2, "delta epsilon"),
        (3, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _py_embed(text, dim=8):
    fp = hashlib.md5(" ".join(tokenize_py(text)).encode()).hexdigest()
    return [
        2.0 * (int(hashlib.md5(f"{fp}#{j}".encode()).hexdigest()[:15], 16) / H60_MAX)
        - 1.0
        for j in range(dim)
    ]


def test_text_embedding_deterministic(docs_df):
    out = processors.text_embedding(docs_df).toPandas().set_index("doc_id")
    # normalization-insensitive: 0 and 1 embed identically
    np.testing.assert_array_equal(out.loc[0, "embedding"], out.loc[1, "embedding"])
    np.testing.assert_allclose(
        out.loc[0, "embedding"], _py_embed("alpha beta gamma"), rtol=1e-6
    )


def test_sparse_encode_weights(docs_df):
    tall = processors.sparse_encode(docs_df).toPandas()
    row = tall[(tall.doc_id == 0) & (tall.token == "alpha")].iloc[0]
    expect = 1.0 * (1.0 + int(hashlib.md5(b"alpha").hexdigest()[:15], 16) / H60_MAX)
    assert row.weight == pytest.approx(expect, rel=1e-6)
    assert (tall.weight > 0).all()


def test_semantic_field_pipeline(docs_df):
    out = processors.semantic_field(
        docs_df, chunk_algorithm="fixed_char_length", char_limit=10,
        max_chunk_limit=-1,
    ).toPandas()
    # chunks of doc 3 exist with per-chunk embeddings of the right dim
    d3 = out[out.doc_id == 3].sort_values("chunk_idx")
    assert len(d3) >= 2
    assert all(len(e) == processors.EMBED_DIM for e in d3.chunk_embedding)
    # identical chunk text → identical embedding (dedup'd inference)
    joined = "".join(d3.chunk)
    assert joined == "alpha beta gamma delta epsilon zeta eta theta iota kappa"


def test_skip_existing_filter(spark, docs_df):
    existing = spark.createDataFrame(
        [(0, "alpha beta gamma"), (2, "delta epsilon CHANGED")],
        "doc_id long, text string",
    )
    needs, reuse = processors.skip_existing_filter(docs_df, existing)
    assert sorted(r.doc_id for r in reuse.collect()) == [0]
    assert sorted(r.doc_id for r in needs.collect()) == [1, 2, 3]


def test_neural_query_matches_ingest_embedding(spark, docs_df):
    embedded = processors.text_embedding(docs_df, out_col="vec")
    spec = neural.QuerySpec(query_type="neural", field="vec",
                            query_text="alpha beta gamma")
    scored = neural.execute(spec, embedded).toPandas().set_index("doc_id")
    # query embedding == doc 0/1 embedding → cosine 1.0
    assert scored.loc[0, "score"] == pytest.approx(1.0, abs=1e-6)
    assert scored.loc[1, "score"] == pytest.approx(1.0, abs=1e-6)
    assert scored.loc[2, "score"] < 0.999


def test_neural_sparse_query_prep():
    spec = neural.rewrite(
        neural.QuerySpec(query_type="neural_sparse", query_text="alpha alpha beta")
    )
    assert set(spec.query_tokens) == {"alpha", "beta"}
    assert spec.query_tokens["alpha"] == pytest.approx(
        2.0 * (1.0 + int(hashlib.md5(b"alpha").hexdigest()[:15], 16) / H60_MAX)
    )


def test_enricher_defaults():
    specs = [
        neural.QuerySpec(query_type="neural", field="a"),
        neural.QuerySpec(query_type="neural", field="b", model_id="explicit"),
    ]
    out = neural.enrich(specs, default_model_id="global", field_defaults={"a": "per-field"})
    assert out[0].model_id == "per-field"
    assert out[1].model_id == "explicit"


def test_sort_topk_search_after(spark):
    rows = [(i, i % 3, float(100 - i)) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, grp int, val double")
    page1 = neural.sort_topk(df, [("grp", "asc"), ("val", "desc")], k=5)
    p1 = page1.toPandas()
    assert list(p1.doc_id) == [0, 3, 6, 9, 12]  # grp 0, val desc
    last = p1.iloc[-1]
    page2 = neural.sort_topk(
        df, [("grp", "asc"), ("val", "desc")], k=5,
        search_after=[int(last.grp), float(last.val), int(last.doc_id)],
    ).toPandas()
    assert list(page2.doc_id) == [15, 18, 21, 24, 27]
    # next page crosses into grp 1
    last2 = page2.iloc[-1]
    page3 = neural.sort_topk(
        df, [("grp", "asc"), ("val", "desc")], k=3,
        search_after=[int(last2.grp), float(last2.val), int(last2.doc_id)],
    ).toPandas()
    assert list(page3.grp) == [1, 1, 1]
    assert list(page3.doc_id) == [1, 4, 7]

"""Engine.explain_score — the Lucene Explanation analog: per-(doc, term)
BM25 breakdown whose totals equal the engine's search scores, with
index-stats and corpus-stats routes agreeing on the same corpus."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from neural_search_spark.engine import Engine
from neural_search_spark.index.build import IndexBuilder, doc_id_col
from neural_search_spark.query.bm25 import BM25Index


@pytest.fixture(scope="module")
def corpus(spark, transcripts_df):
    return transcripts_df.withColumn("doc_id", doc_id_col())


@pytest.fixture(scope="module")
def idx(spark, corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("explain_idx"))
    IndexBuilder(spark, d, n_shards=4, block_size=128).build(corpus)
    return BM25Index(spark, d)


def test_explain_totals_match_search_scores(spark, corpus):
    eng = Engine(spark, corpus=corpus)
    spec = {"match": {"query_text": "tool call model"}}
    hits = eng.search(spec, k=5).collect()
    ids = [r["doc_id"] for r in hits]
    exp = eng.explain_score(spec, ids).toPandas()
    tot = exp.groupby("doc_id")["total"].first()
    for r in hits:
        assert np.isclose(tot[r["doc_id"]], r["score"], atol=1e-9)
    # contributions sum to the total, idf*tf_norm = contribution
    g = exp.groupby("doc_id")["contribution"].sum()
    assert np.allclose(g, tot.loc[g.index])
    assert np.allclose(exp["idf"] * exp["tf_norm"], exp["contribution"])


def test_explain_index_route_matches_corpus_route(spark, corpus, idx):
    spec = {"match": {"query_text": "tool call model"}}
    ids = [
        r["doc_id"]
        for r in Engine(spark, corpus=corpus).search(spec, k=4).collect()
    ]
    a = Engine(spark, corpus=corpus).explain_score(spec, ids).toPandas()
    b = Engine(spark, bm25_index=idx).explain_score(spec, ids).toPandas()
    m = a.merge(b, on=["doc_id", "term"], suffixes=("_c", "_i"))
    assert len(m) == len(a) == len(b)
    for c in ("tf", "df", "dl"):
        assert (m[f"{c}_c"] == m[f"{c}_i"]).all()
    assert np.allclose(m["contribution_c"], m["contribution_i"])
    assert np.allclose(m["total_c"], m["total_i"])


def test_explain_rejects_non_match(spark, corpus):
    eng = Engine(spark, corpus=corpus)
    with pytest.raises(ValueError, match="match specs"):
        eng.explain_score(
            {"hybrid": {"queries": [{"match": {"query_text": "x"}}]}}, [1]
        )
    with pytest.raises(ValueError, match="plain match"):
        eng.explain_score(
            {"match": {"query_text": "x", "fuzziness": 1}}, [1]
        )

"""Per-partition HNSW: recall vs the exact scan, deterministic rebuild,
write/load round-trip, and Engine delegation through the common ANN-asset
contract."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from neural_search_spark.extras import hnsw
from neural_search_spark.extras.similarity import brute_force_topk

DIM = 16
N = 400


@pytest.fixture(scope="module")
def emb_df(spark):
    """Clustered gaussian vectors: 8 centers, 50 points each."""
    rng = np.random.default_rng(7)
    centers = rng.normal(size=(8, DIM))
    pts = np.concatenate(
        [c + 0.25 * rng.normal(size=(N // 8, DIM)) for c in centers]
    )
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(N, dtype=np.int64),
            "embedding": [row.astype(np.float32).tolist() for row in pts],
        }
    )
    return spark.createDataFrame(
        pdf, "vec_id long, embedding array<float>"
    )


@pytest.fixture(scope="module")
def graphs(spark, emb_df):
    g = hnsw.build_graphs(emb_df, n_graphs=4, M=8, ef_construction=64).persist()
    g.count()
    return g


def test_hnsw_recall_vs_exact(spark, emb_df, graphs):
    queries = {
        f"q{i}": emb_df.filter(F.col("vec_id") == i).first()["embedding"]
        for i in (0, 57, 123, 261, 399)
    }
    got = hnsw.hnsw_topk_batch(graphs, queries, k=10, ef_search=64).toPandas()
    for qid, v in queries.items():
        exact = set(brute_force_topk(emb_df, list(v), k=10).toPandas().vec_id)
        mine = got[got.query_id == qid]
        assert mine["rank"].tolist() == list(range(1, 11))
        assert mine.cosine.is_monotonic_decreasing
        recall = len(exact & set(mine.vec_id)) / 10
        assert recall >= 0.9, f"{qid}: recall {recall}"


def test_hnsw_deterministic_rebuild(spark, emb_df, graphs):
    again = (
        hnsw.build_graphs(emb_df, n_graphs=4, M=8, ef_construction=64)
        .orderBy("graph_id", "vec_id")
        .toPandas()
    )
    first = graphs.orderBy("graph_id", "vec_id").toPandas()
    assert first.vec_id.tolist() == again.vec_id.tolist()
    assert first.level.tolist() == again.level.tolist()
    for a, b in zip(first.nbrs, again.nbrs):
        assert [list(x) for x in a] == [list(x) for x in b]


def test_hnsw_write_load_topk(spark, emb_df, tmp_path):
    path = str(tmp_path / "hnsw_idx")
    hnsw.HnswAnnIndex.write(emb_df, path, n_graphs=4, M=8, ef_construction=64)
    idx = hnsw.HnswAnnIndex.load(spark, path, ef_search=64)
    qv = emb_df.filter("vec_id = 123").first()["embedding"]
    got = idx.topk(list(qv), k=5).toPandas()
    assert list(got.columns) == ["vec_id", "cosine", "rank"]
    assert got["rank"].tolist() == [1, 2, 3, 4, 5]
    # nearest neighbor of a corpus vector is itself
    assert got.vec_id.iloc[0] == 123
    assert got.cosine.iloc[0] == pytest.approx(1.0)


def test_engine_delegates_to_hnsw(spark, emb_df, graphs):
    """HnswAnnIndex satisfies the Engine ANN-asset contract unchanged."""
    from neural_search_spark.engine import Engine, QuerySpec

    corpus = emb_df.select(
        F.col("vec_id").alias("doc_id"),
        F.lit("t").alias("text"),
        "embedding",
    )
    eng = Engine(spark, corpus=corpus, ann_index=hnsw.HnswAnnIndex(graphs))
    qv = [float(x) for x in emb_df.filter("vec_id = 57").first()["embedding"]]
    got = eng.search(
        QuerySpec(query_type="neural_knn", field="embedding", vector=qv), k=5
    ).toPandas()
    want = hnsw.HnswAnnIndex(graphs).topk(qv, k=5).toPandas()
    assert got.doc_id.tolist() == want.vec_id.tolist()
    assert got.score.tolist() == pytest.approx(want.cosine.tolist())

"""Index-backed multi_match: attached per-field block indexes must
reproduce the corpus-scan multi_match (per-field statistics, ^boosts,
dis-max / sum combine) on every route — driver numpy combine, pruned
per-field-top-k union (best_fields, tie_breaker=0), and the one-exchange
conditional-sum combine (most_fields / tie_breaker>0)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from neural_search_spark.engine import Engine, spec_from_json
from neural_search_spark.index.build import IndexBuilder, doc_id_col
from neural_search_spark.query.bm25 import BM25Index
from neural_search_spark.query.multimatch import (
    multi_match_index_topk,
    parse_field_boosts,
)
from neural_search_spark.query.neural import multi_match_scored

Q = "tool c0001"
FIELDS = ["text", "tag^2.5"]


@pytest.fixture(scope="module")
def mmx(spark, transcripts_df, tmp_path_factory):
    base = tmp_path_factory.mktemp("mmx")
    docs = transcripts_df.withColumn("doc_id", doc_id_col()).select(
        "doc_id", "text", F.col("conv_id").alias("tag")
    )
    idxs = {}
    for f, col in (("text", F.col("text")), ("tag", F.col("conv_id"))):
        d = str(base / f)
        src = transcripts_df.select(
            "conv_id", "turn_idx", col.alias("text")
        )
        IndexBuilder(spark, d, n_shards=4, block_size=64).build(src)
        idxs[f] = BM25Index(spark, d)
    return docs, idxs


def corpus_topk(docs, match_type, tb, k=10):
    return (
        multi_match_scored(
            docs, Q, FIELDS, match_type=match_type, tie_breaker=tb
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
        .toPandas()
    )


def test_parse_field_boosts():
    assert parse_field_boosts(["text", "tag^2.5"]) == [
        ("text", 1.0),
        ("tag", 2.5),
    ]


@pytest.mark.parametrize("mode", ["driver", "distributed"])
@pytest.mark.parametrize(
    "match_type,tb",
    [("best_fields", 0.0), ("best_fields", 0.4), ("most_fields", 0.0)],
)
def test_index_matches_corpus(mmx, match_type, tb, mode):
    docs, idxs = mmx
    got = (
        multi_match_index_topk(
            idxs, Q, FIELDS, match_type=match_type, tie_breaker=tb,
            k=10, mode=mode,
        )
        .toPandas()
        .sort_values("rank")
    )
    exp = corpus_topk(docs, match_type, tb)
    assert (got.doc_id.to_numpy() == exp.doc_id.to_numpy()).all()
    # index kernels cast float32 at the end; corpus scans stay double
    assert np.allclose(got.score, exp.score, rtol=1e-5)


def test_missing_field_raises(mmx):
    _, idxs = mmx
    with pytest.raises(KeyError, match="no attached index"):
        multi_match_index_topk(idxs, Q, ["text", "nope"])


def test_oov_query_empty(mmx):
    _, idxs = mmx
    out = multi_match_index_topk(idxs, "zzzzqqqq", FIELDS).toPandas()
    assert len(out) == 0


def test_engine_routes_multi_match_to_indexes(mmx, spark):
    docs, idxs = mmx
    eng = Engine(spark, corpus=docs, field_indexes=idxs)
    spec = spec_from_json(
        {
            "multi_match": {
                "query_text": Q,
                "fields": FIELDS,
                "match_type": "best_fields",
                "tie_breaker": 0.4,
            }
        }
    )
    route = eng.explain_route(spec)
    assert route["route"] == "index"
    got = eng.search(spec, k=10).toPandas()
    exp = corpus_topk(docs, "best_fields", 0.4)
    assert (got.doc_id.to_numpy() == exp.doc_id.to_numpy()).all()
    assert np.allclose(got.score, exp.score, rtol=1e-5)
    # an uncovered field falls back to the corpus scan
    spec2 = spec_from_json(
        {"multi_match": {"query_text": Q, "fields": ["text", "role"]}}
    )
    assert eng.explain_route(spec2)["route"] == "corpus"

"""more_like_this — term selection units + scan↔index rank identity
(host MoreLikeThisQueryBuilder / Lucene MoreLikeThis)."""

import math

import pytest
from pyspark.sql import functions as F

from neural_search_spark.engine import Engine, spec_from_json
from neural_search_spark.index.build import IndexBuilder, doc_id_col
from neural_search_spark.query.bm25 import BM25Index
from neural_search_spark.query.mlt import (
    candidate_terms,
    corpus_df_for,
    like_term_freqs,
    mlt_select,
    resolve_like,
    select_terms,
)
from neural_search_spark.query.neural import QuerySpec, execute
from neural_search_spark.tokenizer import tokenize_py


@pytest.fixture(scope="module")
def setup(spark, transcripts_df, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("mlt") / "idx")
    IndexBuilder(spark, d, n_shards=4, block_size=64).build(transcripts_df)
    corpus = transcripts_df.withColumn("doc_id", doc_id_col()).cache()
    idx = BM25Index(spark, d)
    # a reproducible like doc: the longest text (ties → doc_id asc)
    like_row = (
        corpus.orderBy(F.desc(F.length("text")), F.asc("doc_id"))
        .select("doc_id", "text")
        .first()
    )
    eng = Engine(spark, corpus=corpus, bm25_index=idx)
    return corpus, idx, eng, int(like_row.doc_id), like_row.text


def test_like_term_freqs_and_gates():
    tf = like_term_freqs(["a b a c", "b d"])
    assert tf == {"a": 2, "b": 2, "c": 1, "d": 1}
    cand = candidate_terms(tf, min_term_freq=2)
    assert cand == {"a": 2, "b": 2}
    assert candidate_terms(tf, min_term_freq=1, stop_words=["a", "b"]) == {
        "c": 1,
        "d": 1,
    }
    assert candidate_terms(
        {"xx": 3, "y": 3}, min_term_freq=1, min_word_length=2
    ) == {"xx": 3}


def test_select_terms_ranking_and_gates():
    cand = {"hot": 5, "warm": 3, "rare": 2, "toofreq": 9, "missing": 4}
    df_of = {"hot": 50, "warm": 40, "rare": 8, "toofreq": 900}
    n = 1000
    got = select_terms(
        cand, df_of, n, max_query_terms=2, min_doc_freq=5, max_doc_freq=800
    )
    # scores: tf * (ln(N/(df+1)) + 1); 'toofreq' out (max_doc_freq),
    # 'missing' out (df 0)
    score = {
        t: cand[t] * (math.log(n / (df_of[t] + 1.0)) + 1.0)
        for t in ("hot", "warm", "rare")
    }
    want = sorted(score, key=lambda t: (-score[t], t))[:2]
    assert got == want
    # deterministic ties: same (tf, df) → term asc
    got2 = select_terms(
        {"b": 2, "a": 2}, {"a": 10, "b": 10}, 100, max_query_terms=1,
        min_doc_freq=1,
    )
    assert got2 == ["a"]


def test_selection_matches_bruteforce(setup, transcripts_pd):
    corpus, idx, eng, like_id, like_text = setup
    # pure-pandas expected selection
    tf = {}
    for t in tokenize_py(like_text):
        tf[t] = tf.get(t, 0) + 1
    cand = {t: f for t, f in tf.items() if f >= 2}
    docsets = transcripts_pd.text.map(lambda s: set(tokenize_py(s)))
    n = len(transcripts_pd)
    df_of = {t: int(sum(t in s for s in docsets)) for t in cand}
    expect = [
        t
        for _, t in sorted(
            (
                (-(f * (math.log(n / (df_of[t] + 1.0)) + 1.0)), t)
                for t, f in cand.items()
                if df_of[t] >= 5
            )
        )
    ][:25]
    got_scan = mlt_select(
        [like_text], lambda c: corpus_df_for(corpus, c), n
    )
    got_idx = mlt_select([like_text], idx.term_stats, idx.n_docs)
    assert got_scan == expect
    assert got_idx == expect  # index df == corpus df on a fresh index


def test_scan_vs_index_rank_identity(setup):
    corpus, idx, eng, like_id, like_text = setup
    spec = QuerySpec(query_type="more_like_this", like_ids=[like_id])
    # index-served route
    via_idx = eng._mlt_index_topk(spec, 20).collect()
    # corpus-scan route
    scan = execute(spec, corpus)
    via_scan = (
        scan.orderBy(F.desc("score"), F.asc("doc_id")).limit(20).collect()
    )
    assert [int(r.doc_id) for r in via_idx] == [
        int(r.doc_id) for r in via_scan
    ]
    for a, b in zip(via_idx, via_scan):
        assert abs(a.score - b.score) < 1e-6
    # include=False (default): the like doc never returns
    assert like_id not in {int(r.doc_id) for r in via_idx}


def test_include_and_msm(setup):
    corpus, idx, eng, like_id, like_text = setup
    inc = execute(
        QuerySpec(
            query_type="more_like_this", like_ids=[like_id], include=True
        ),
        corpus,
    )
    # the like doc matches (it contains every selected term) and wins
    top = inc.orderBy(F.desc("score"), F.asc("doc_id")).first()
    assert int(top.doc_id) == like_id
    # msm=100% keeps only docs with every selected term — a subset
    strict = execute(
        QuerySpec(
            query_type="more_like_this",
            like_ids=[like_id],
            minimum_should_match="100%",
            include=True,
        ),
        corpus,
    )
    loose_ids = {int(r.doc_id) for r in inc.collect()}
    strict_ids = {int(r.doc_id) for r in strict.collect()}
    assert strict_ids <= loose_ids
    assert like_id in strict_ids


def test_resolve_like_validation(setup):
    corpus, idx, eng, like_id, like_text = setup
    assert resolve_like(["abc"], None, None) == ["abc"]
    with pytest.raises(ValueError, match="need a corpus"):
        resolve_like(None, [1], None)
    with pytest.raises(ValueError, match="not found"):
        resolve_like(None, [123456789], corpus)
    with pytest.raises(ValueError, match="needs 'like'"):
        resolve_like(None, None, corpus)


def test_json_search_and_explain(setup):
    corpus, idx, eng, like_id, like_text = setup
    spec = spec_from_json(
        {"more_like_this": {"like": like_text, "max_query_terms": 10}}
    )
    assert spec.like == [like_text] and spec.max_query_terms == 10
    out = eng.search(spec, k=5).collect()
    assert len(out) == 5 and [r.rank for r in out] == [1, 2, 3, 4, 5]
    assert eng.explain_route(spec)["route"] == "index"
    scan_eng = Engine(eng.spark, corpus=corpus)
    assert scan_eng.explain_route(spec)["route"] == "corpus"

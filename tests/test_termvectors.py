"""_termvectors: re-analysis tf/positions/offsets, index-read df/ttf and
field statistics, the distributed frame twin, and the Engine surface."""

from collections import Counter

import pytest

from neural_search_spark.engine import Engine
from neural_search_spark.index.build import IndexBuilder, doc_id_col
from neural_search_spark.query.bm25 import BM25Index
from neural_search_spark.query.termvectors import (
    analyze_with_offsets,
    termvectors_frame,
    termvectors_response,
)
from neural_search_spark.tokenizer import tokenize_py


@pytest.fixture(scope="module")
def tv_setup(spark, transcripts_df, tmp_path_factory):
    idx_dir = str(tmp_path_factory.mktemp("tv") / "bm25")
    IndexBuilder(spark, idx_dir, n_shards=4, block_size=64).build(
        transcripts_df
    )
    corpus = transcripts_df.withColumn("doc_id", doc_id_col())
    return corpus, BM25Index(spark, idx_dir)


def _sample_ids(corpus, n=3):
    return [
        int(r["doc_id"])
        for r in corpus.select("doc_id").orderBy("doc_id").limit(n).collect()
    ]


def test_analyze_with_offsets_matches_tokenizer():
    text = "Hello, World! hello x9 --"
    toks = analyze_with_offsets(text)
    assert [t for t, _, _, _ in toks] == tokenize_py(text)
    assert [p for _, p, _, _ in toks] == list(range(len(toks)))
    # offsets index the original string
    for term, _, s, e in toks:
        assert text[s:e].lower() == term


def test_response_tf_positions_offsets(tv_setup):
    corpus, idx = tv_setup
    ids = _sample_ids(corpus)
    texts = {
        int(r["doc_id"]): r["text"]
        for r in corpus.filter(corpus.doc_id.isin(ids)).collect()
    }
    resp = termvectors_response(corpus, ids)
    for i in ids:
        assert resp[i]["found"]
        expected = Counter(tokenize_py(texts[i]))
        got = {t: e["term_freq"] for t, e in resp[i]["terms"].items()}
        assert got == dict(expected)
        # tokens carry per-occurrence position + offsets
        for t, e in resp[i]["terms"].items():
            assert len(e["tokens"]) == e["term_freq"]
            for tok in e["tokens"]:
                s, o = tok["start_offset"], tok["end_offset"]
                assert texts[i][s:o].lower() == t


def test_response_term_and_field_statistics(tv_setup):
    corpus, idx = tv_setup
    ids = _sample_ids(corpus, 2)
    resp = termvectors_response(
        corpus, ids, index=idx, term_statistics=True, field_statistics=True
    )
    for i in ids:
        terms = resp[i]["terms"]
        stats = idx.term_stats_full(list(terms))
        for t, e in terms.items():
            assert (e["doc_freq"], e["ttf"]) == stats[t]
            assert e["doc_freq"] >= 1 and e["ttf"] >= e["term_freq"]
        fs = resp[i]["field_statistics"]
        assert fs["doc_count"] == idx.n_docs
        assert fs["sum_ttf"] >= fs["sum_doc_freq"] > 0


def test_response_missing_id_and_stats_guard(tv_setup):
    corpus, idx = tv_setup
    resp = termvectors_response(corpus, [999999999999])
    assert resp[999999999999] == {"found": False}
    with pytest.raises(ValueError, match="term_statistics"):
        termvectors_response(corpus, [1], term_statistics=True)


def test_frame_matches_response_and_index_df(tv_setup):
    corpus, idx = tv_setup
    ids = _sample_ids(corpus)
    resp = termvectors_response(corpus, ids, index=idx, term_statistics=True)
    rows = termvectors_frame(corpus, ids).collect()
    got = {(int(r["doc_id"]), r["term"]): (r["term_freq"], r["doc_freq"]) for r in rows}
    expected = {
        (i, t): (e["term_freq"], e["doc_freq"])
        for i in ids
        for t, e in resp[i]["terms"].items()
    }
    # corpus-scan df equals index df (index built over the same corpus)
    assert got == expected


def test_engine_termvectors(tv_setup, spark):
    corpus, idx = tv_setup
    eng = Engine(spark, corpus=corpus, bm25_index=idx)
    ids = _sample_ids(corpus, 2)
    resp = eng.termvectors(
        ids, term_statistics=True, field_statistics=True
    )
    assert set(resp) == set(ids)
    assert all(resp[i]["found"] for i in ids)
    # positions=False, offsets=False drops the tokens list entirely
    bare = eng.termvectors(ids[:1], positions=False, offsets=False)
    for e in bare[ids[0]]["terms"].values():
        assert "tokens" not in e and e["term_freq"] >= 1

"""WordPiece payload-weight analyzer (analysis.py) — tokenization parity
with the published WordPiece algorithm, the reference's getQueryTokens
weight semantics (NeuralSparseQueryBuilder.java:453-494), precedence rules
(model_id vs analyzer vs raw tokens), and the doc-side Spark encoding."""

import pytest

from neural_search_spark.analysis import (
    WordPieceAnalyzer,
    analyze_features,
    basic_tokenize,
    vocab_from_corpus,
    weights_from_idf,
)


# -- basic tokenization ----------------------------------------------------
def test_basic_tokenize_lowercase_punct_accents():
    assert basic_tokenize("Hello, World!") == ["hello", ",", "world", "!"]
    # accents strip (bert-uncased), punctuation splits mid-word
    assert basic_tokenize("Héllo-wörld") == ["hello", "-", "world"]
    assert basic_tokenize("") == []
    assert basic_tokenize("  \t\n ") == []


# -- WordPiece: the canonical published test vectors -----------------------
def test_wordpiece_canonical_vectors():
    # the example vocab from the BERT reference tokenizer tests (public)
    vocab = ["[UNK]", "[CLS]", "[SEP]", "want", "##want", "##ed", "wa",
             "un", "runn", "##ing"]
    an = WordPieceAnalyzer(vocab)
    assert an.tokenize("unwanted running") == [
        "un", "##want", "##ed", "runn", "##ing"
    ]
    # unmatchable word → whole-word [UNK], neighbors unaffected
    assert an.tokenize("unwantedx running") == ["[UNK]", "runn", "##ing"]
    # greedy longest-match-first: 'want' whole beats 'wa'
    assert an.tokenize("want") == ["want"]


def test_wordpiece_max_chars_guard():
    an = WordPieceAnalyzer(["a", "##a"], max_input_chars_per_word=5)
    assert an.tokenize("aaaaaa") == ["[UNK]"]
    assert an.tokenize("aaaaa") == ["a", "##a", "##a", "##a", "##a"]


# -- analyze(): the reference's token-weight map semantics ------------------
def test_analyze_weight_semantics():
    vocab = ["un", "##want", "##ed", "runn", "##ing", "[UNK]"]
    weights = {"un": 2.5, "##want": 0.0, "runn": -1.0}
    an = WordPieceAnalyzer(vocab, weights)
    got = an.analyze("unwanted running runnING")
    # payload present → that weight; absent → 1.0; <= 0 → dropped
    # (NeuralSparseQueryBuilder.java:465-469); repeats collapse to one
    # entry like HashMap.put
    assert got == {"un": 2.5, "##ed": 1.0, "##ing": 1.0}
    assert an.analyze("") == {}


def test_model_and_analyzer_mutually_exclusive():
    from neural_search_spark.query.neural import QuerySpec, rewrite

    an = WordPieceAnalyzer(["hi"])
    spec = QuerySpec(query_type="neural_sparse", query_text="hi",
                     model_id="m", analyzer="bert-uncased")
    with pytest.raises(ValueError, match="only one tokenization method"):
        rewrite(spec, analyzers={"bert-uncased": an})
    with pytest.raises(ValueError, match=r"Analyzer \[nope\] not found"):
        rewrite(QuerySpec(query_type="neural_sparse", query_text="hi",
                          analyzer="nope"), analyzers={"bert-uncased": an})
    # raw query_tokens win over both (doRewrite's queryTokensSupplier
    # early-return) — no conflict raised, tokens untouched
    spec = QuerySpec(query_type="neural_sparse", query_tokens={"x": 1.0},
                     model_id="m", analyzer="bert-uncased")
    assert rewrite(spec, analyzers={}).query_tokens == {"x": 1.0}
    # analyzer resolves through rewrite
    got = rewrite(QuerySpec(query_type="neural_sparse", query_text="hi",
                            analyzer="a"), analyzers={"a": an})
    assert got.query_tokens == {"hi": 1.0}


# -- corpus-derived vocab / weights -----------------------------------------
def test_vocab_from_corpus_decomposes_unseen(spark, transcripts_df):
    vocab = vocab_from_corpus(transcripts_df, max_terms=500)
    assert vocab == sorted(vocab) and len(vocab) == len(set(vocab))
    an = WordPieceAnalyzer(vocab)
    # an alnum word never analyzed before still decomposes (char pieces)
    pieces = an.tokenize("zzqj7")
    assert "[UNK]" not in pieces and pieces  # decomposed, not UNK
    # determinism
    assert vocab == vocab_from_corpus(transcripts_df, max_terms=500)


def test_weights_from_idf_shape(spark, transcripts_df):
    import math

    w = weights_from_idf(transcripts_df.limit(200))
    assert w and all(v > 0 for v in w.values())
    # rarer token ⇒ larger weight: check bounds vs the formula
    n = transcripts_df.limit(200).count()
    assert max(w.values()) <= math.log(1.0 + (n - 0.5) / 0.5) + 1e-9


# -- doc-side Spark encoding == per-row python analyze ----------------------
def test_analyze_features_matches_python(spark, transcripts_df):
    vocab = vocab_from_corpus(transcripts_df.limit(100), max_terms=200)
    an = WordPieceAnalyzer(vocab, {"the": 0.2, "a": 0.0})
    sample = transcripts_df.limit(40)
    got = analyze_features(sample, an).select("text", "features").collect()
    for r in got:
        assert dict(r["features"] or {}) == pytest.approx(
            an.analyze(r["text"] or "")
        )


# -- end-to-end through the Engine ------------------------------------------
def test_engine_neural_sparse_analyzer_route(spark, transcripts_df):
    from neural_search_spark.engine import Engine
    from neural_search_spark.index.build import doc_id_col
    from neural_search_spark.query.neural import QuerySpec
    from neural_search_spark.query.sparse import sparse_topk

    corpus = transcripts_df.limit(300).withColumn("doc_id", doc_id_col())
    vocab = vocab_from_corpus(corpus, max_terms=300)
    an = WordPieceAnalyzer(vocab, weights_from_idf(corpus, vocab=vocab))
    feats = analyze_features(corpus, an).cache()
    eng = Engine(spark, corpus=feats, analyzers={"bert-uncased": an})

    q = "the user tool"
    got = eng.search(
        QuerySpec(query_type="neural_sparse", field="features",
                  query_text=q, analyzer="bert-uncased"),
        k=10,
    ).toPandas()
    want = sparse_topk(feats, an.analyze(q), k=10).drop("rank").toPandas()
    assert got.doc_id.tolist() == want.doc_id.tolist()
    assert got.score.tolist() == pytest.approx(want.score.tolist())

    # JSON surface carries the analyzer name through spec_from_json
    got_json = eng.search(
        {"neural_sparse": {"query_text": q, "field": "features",
                           "analyzer": "bert-uncased"}},
        k=10,
    ).toPandas()
    assert got_json.doc_id.tolist() == want.doc_id.tolist()

    with pytest.raises(ValueError, match="not found"):
        eng.search({"neural_sparse": {"query_text": q, "field": "features",
                                      "analyzer": "missing"}}, k=5)

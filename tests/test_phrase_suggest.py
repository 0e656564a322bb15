"""Phrase suggester: bigram-LM build vs a pandas oracle, hand-computed
noisy-channel scores on a controlled corpus, confidence/max_errors
semantics, and the enumeration guard."""

import math

import pandas as pd
import pytest

from neural_search_spark.index.build import IndexBuilder
from neural_search_spark.query.bm25 import BM25Index
from neural_search_spark.query.phrase_suggest import (
    BigramLM,
    phrase_suggest,
)
from neural_search_spark.tokenizer import tokenize_py

DOCS = [
    "hello world again",
    "hello world",
    "hello there world",
    "brave new world",
    "hello brave friend",
]


@pytest.fixture(scope="module")
def ps_setup(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("psuggest")
    corpus = spark.createDataFrame(
        [("c0", i, t) for i, t in enumerate(DOCS)],
        schema="conv_id string, turn_idx int, text string",
    )
    IndexBuilder(spark, str(root / "idx"), n_shards=2, block_size=16).build(
        corpus
    )
    lm = BigramLM.build(spark, corpus, str(root / "lm"), partitions=2)
    idx = BM25Index(spark, str(root / "idx"))
    return idx, lm


def _pd_counts():
    uni: dict[str, int] = {}
    bi: dict[tuple[str, str], int] = {}
    n = 0
    for d in DOCS:
        toks = tokenize_py(d)
        n += len(toks)
        for t in toks:
            uni[t] = uni.get(t, 0) + 1
        for a, b in zip(toks, toks[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    return uni, bi, n


def test_lm_build_matches_pandas_oracle(ps_setup):
    _idx, lm = ps_setup
    uni, bi, n = _pd_counts()
    assert lm.n_tokens == n
    assert lm.vocab_size == len(uni)
    assert lm.unigram_counts(set(uni)) == uni
    assert lm.bigram_counts(set(bi)) == bi
    # pruned point reads: asking for a subset returns only that subset
    assert lm.unigram_counts({"world"}) == {"world": uni["world"]}
    assert lm.bigram_counts({("hello", "world")}) == {
        ("hello", "world"): bi[("hello", "world")]
    }
    assert lm.unigram_counts(set()) == {}


def test_corrects_single_typo_with_exact_score(ps_setup):
    idx, lm = ps_setup
    got = phrase_suggest(idx, lm, "hello worlx", size=3, confidence=0.0)
    assert got and got[0].text == "hello world"
    # hand-computed: channel = rwel("hello" in dict) × sim(world|worlx)
    # = 0.95 × (1 − 1/5); LM = P(hello) × P_sb(world|hello)
    uni, bi, n = _pd_counts()
    chan = 0.95 * (1 - 1 / 5)
    lm_p = (uni["hello"] / n) * (bi[("hello", "world")] / uni["hello"])
    assert got[0].score == pytest.approx(chan * lm_p, rel=1e-9)


def test_real_word_error_corrected_by_lm(ps_setup):
    # "brave new worls": every token correction competes against the
    # kept-original channel; the LM lifts the attested trigram path
    idx, lm = ps_setup
    got = phrase_suggest(
        idx, lm, "brave new worls", size=3, confidence=0.0
    )
    assert got and got[0].text == "brave new world"


def test_confidence_gates_rewrites(ps_setup):
    idx, lm = ps_setup
    # unchanged phrase is fully attested — at confidence 1.0 a rewrite
    # must BEAT it, and none does
    assert phrase_suggest(idx, lm, "hello world", confidence=1.0) == []
    # the typo'd phrase has an OOV token: the fix clears confidence 1.0
    got = phrase_suggest(idx, lm, "hello worlx", confidence=1.0)
    assert got and got[0].text == "hello world"


def test_max_errors_bounds_rewrites(ps_setup):
    idx, lm = ps_setup
    two = phrase_suggest(
        idx, lm, "hellx worlx", size=10, max_errors=2, confidence=0.0
    )
    assert any(s.text == "hello world" in s.text for s in two)
    one = phrase_suggest(
        idx, lm, "hellx worlx", size=10, max_errors=1, confidence=0.0
    )
    # with one error allowed, no suggestion may differ from the input
    # at both positions
    for s in one:
        ws = s.text.split(" ")
        assert sum(a != b for a, b in zip(ws, ["hellx", "worlx"])) <= 1
    assert all(s.text != "hello world" for s in one)


def test_laplace_smoothing_scores(ps_setup):
    idx, lm = ps_setup
    got = phrase_suggest(
        idx,
        lm,
        "hello worlx",
        smoothing="laplace",
        alpha=0.5,
        confidence=0.0,
    )
    assert got and got[0].text == "hello world"
    uni, bi, n = _pd_counts()
    chan = 0.95 * (1 - 1 / 5)
    lm_p = (uni["hello"] / n) * (
        (bi[("hello", "world")] + 0.5)
        / (uni["hello"] + 0.5 * len(uni))
    )
    assert got[0].score == pytest.approx(chan * lm_p, rel=1e-9)
    with pytest.raises(ValueError, match="smoothing"):
        phrase_suggest(idx, lm, "hello", smoothing="kneser_ney")


def test_stupid_backoff_uses_unigram_for_unseen_bigram(ps_setup):
    idx, lm = ps_setup
    # "world hello" never occurs: P_sb = 0.4 × P(hello)
    got = phrase_suggest(
        idx, lm, "world hellx", size=1, confidence=0.0
    )
    assert got and got[0].text == "world hello"
    uni, bi, n = _pd_counts()
    chan = 0.95 * (1 - 1 / 5)
    lm_p = (uni["world"] / n) * (0.4 * uni["hello"] / n)
    assert got[0].score == pytest.approx(chan * lm_p, rel=1e-9)


def test_combo_guard_trips(ps_setup):
    idx, lm = ps_setup
    import neural_search_spark.query.phrase_suggest as mod

    old = mod._MAX_COMBOS
    mod._MAX_COMBOS = 1
    try:
        with pytest.raises(ValueError, match="cap 1"):
            phrase_suggest(
                idx, lm, "hellx worlx", max_errors=2, confidence=0.0
            )
    finally:
        mod._MAX_COMBOS = old


def test_empty_and_sizes(ps_setup):
    idx, lm = ps_setup
    assert phrase_suggest(idx, lm, "") == []
    got = phrase_suggest(
        idx, lm, "hellx", size=2, confidence=0.0, num_candidates=5
    )
    assert len(got) <= 2
    assert got == sorted(got, key=lambda s: (-s.score, s.text))

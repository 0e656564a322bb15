"""Completion suggester (index/completion.py): build over a known entry
set, then check the exact point-read (tops) and range-read (entries)
routes against a brute-force python oracle, plus skip_duplicates, the
fuzzy path (AUTO fuzziness, min_length, prefix_length guard), and the
Engine wiring."""

import pandas as pd
import pytest

from neural_search_spark.engine import Engine
from neural_search_spark.index.completion import (
    CompletionIndex,
    CompletionIndexBuilder,
)
from neural_search_spark.tokenizer import tokenize_py

ENTRIES = [
    # (input, weight, doc_id)
    ("machine learning basics", 10.0, 1),
    ("machine learning advanced", 30.0, 2),
    ("machine translation", 20.0, 3),
    ("machinery maintenance", 25.0, 4),
    ("matching algorithms", 5.0, 5),
    ("Machine Learning Advanced", 30.0, 6),   # same analyzed key as 2
    ("market analysis", 30.0, 7),
    ("marketing mix", 1.0, 8),
    ("deep learning", 40.0, 9),
    ("delta lake", 2.0, 10),
]


def brute2(prefix, size=5):
    akey = " ".join(tokenize_py(prefix))
    got = []
    for text, w, d in ENTRIES:
        key = " ".join(tokenize_py(text))
        if key.startswith(akey):
            # surface used for the asc tiebreak, then doc_id
            got.append((-w, key, d, text, w))
    got.sort(key=lambda r: (r[0], r[3], r[2]))
    return [(text, w, d) for _, key, d, text, w in got][:size]


@pytest.fixture(scope="module")
def cidx(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("cidx"))
    df = spark.createDataFrame(
        pd.DataFrame(ENTRIES, columns=["inp", "w", "doc_id"])
    )
    meta = CompletionIndexBuilder(
        spark, p, prefix_depth=3, prefix_top=4, n_files=2
    ).build(df, input_col="inp", weight_col="w")
    assert meta["n_entries"] == len(ENTRIES)
    return CompletionIndex(spark, p)


def test_short_prefix_point_read_matches_brute(cidx):
    # len(akey)=2 <= prefix_depth → tops route
    got = [(c.text, c.weight, c.doc_id) for c in cidx.complete("ma", 4)]
    assert got == brute2("ma", 4)
    # the weight-desc / surface-asc / doc_id-asc order is visible:
    # market(30,7) ties machine learning advanced (30) — 'Machine
    # Learning Advanced' (doc 6) sorts before 'machine learning
    # advanced' (doc 2) before 'market analysis'
    assert got[0][0] == "Machine Learning Advanced"
    assert got[1] == ("machine learning advanced", 30.0, 2)
    assert got[2] == ("market analysis", 30.0, 7)
    assert got[3] == ("machinery maintenance", 25.0, 4)


def test_long_prefix_range_read_matches_brute(cidx):
    got = [(c.text, c.weight, c.doc_id)
           for c in cidx.complete("machine l", 10)]
    assert got == brute2("machine l", 10)
    assert [g[2] for g in got] == [6, 2, 1]
    # token-boundary analysis: a trailing space analyzes away
    assert [c.doc_id for c in cidx.complete("machine ", 10)] == [
        c.doc_id for c in cidx.complete("machine", 10)
    ]
    got2 = [c.doc_id for c in cidx.complete("machine", 10)]
    # 'machine' prefix (4 <= len? 7 > depth 3 → range) also matches
    # 'machinery'
    assert got2 == [6, 2, 4, 3, 1]


def test_skip_duplicates(cidx):
    got = cidx.complete("machine learning advanced", 10)
    assert [c.doc_id for c in got] == [6, 2]
    # identical analyzed key, different surfaces → NOT duplicates;
    # make a true duplicate case via the same surface
    got = cidx.complete("ma", 10, skip_duplicates=True)
    assert len({c.text for c in got}) == len(got)


def test_empty_and_missing(cidx):
    assert cidx.complete("", 5) == []
    assert cidx.complete("zzz", 5) == []
    assert cidx.complete("??", 5) == []


def test_fuzzy_auto_and_min_length(cidx):
    # 'machne l' (dropped i): len 8 ≥ 6 → AUTO = 2 edits; candidates
    # share the protected 1-char prefix 'm'
    got = cidx.complete("machne l", 5, fuzzy={})
    assert got[0].text == "Machine Learning Advanced"
    assert got[0].distance == 1
    # exact matches rank above fuzzed ones: prefix 'machin' matches
    # machine* exactly (dist 0) and 'matching' at dist 2
    got = cidx.complete("machin", 10, fuzzy={})
    assert [c.distance for c in got[:4]] == [0, 0, 0, 0]
    assert any(c.text == "matching algorithms" for c in got)
    # min_length: a 2-char prefix fuzzes to 0 edits → exact only
    got = cidx.complete("mx", 5, fuzzy={})
    assert got == []


def test_fuzzy_prefix_length_guard(cidx):
    with pytest.raises(ValueError, match="prefix_length=0"):
        cidx.complete("machin", 5, fuzzy={"prefix_length": 0})
    # override works
    got = cidx.complete("machin", 5,
                        fuzzy={"prefix_length": 0, "allow_unpruned": True})
    assert got[0].distance == 0


def test_fuzzy_transpositions_toggle(cidx):
    # 'amchine' = transposition of 'machine': OSA dist 1, Levenshtein 2.
    # With fuzziness=1: OSA finds it, plain Levenshtein does not.
    # protected prefix must be 0 chars (the typo is at position 0)
    t = cidx.complete("amchine", 5, fuzzy={
        "fuzziness": 1, "prefix_length": 0, "allow_unpruned": True})
    assert any("machine" in c.text.lower() for c in t)
    nt = cidx.complete("amchine", 5, fuzzy={
        "fuzziness": 1, "prefix_length": 0, "allow_unpruned": True,
        "transpositions": False})
    assert nt == []


def test_engine_wiring(spark, cidx):
    eng = Engine(spark, completion_index=cidx)
    got = eng.complete("deep", 3)
    assert got[0].text == "deep learning"
    with pytest.raises(ValueError, match="completion_index"):
        Engine(spark).complete("x")


def test_prefix_edit_distance_kernel_property():
    """The vectorized DP must equal the brute-force min-over-cuts OSA/
    Levenshtein on random strings (small alphabet → dense edit space)."""
    import random

    import numpy as np

    from neural_search_spark.index.completion import _prefix_edit_distances
    from neural_search_spark.query.fuzzy import levenshtein, osa_distance

    rng = random.Random(13)
    alpha = "abc "

    def rand_s(n):
        return "".join(rng.choice(alpha) for _ in range(n))

    for trans in (True, False):
        ref_fn = osa_distance if trans else levenshtein
        for _ in range(40):
            akey = rand_s(rng.randint(1, 8))
            keys = [rand_s(rng.randint(0, 12)) for _ in range(25)]
            edits = rng.randint(1, 2)
            got = _prefix_edit_distances(akey, keys, edits, trans)
            la = len(akey)
            for g, key in zip(got, keys):
                best = edits + 1
                for cut in range(
                    max(0, la - edits), min(len(key), la + edits) + 1
                ):
                    best = min(best, ref_fn(akey, key[:cut]))
                exp = best if best <= edits else edits + 1
                assert int(g) == min(exp, edits + 1), (
                    akey, key, edits, trans, int(g), exp,
                )
    # all-empty candidate list
    assert _prefix_edit_distances("ab", [], 2, True).size == 0


CTX_ENTRIES = [
    # (input, weight, doc_id, contexts)
    ("machine learning basics", 10.0, 1, ["tech"]),
    ("machine learning advanced", 30.0, 2, ["tech", "edu"]),
    ("machine translation", 20.0, 3, ["tech"]),
    ("market analysis", 30.0, 4, ["biz"]),
    ("marketing mix", 1.0, 5, ["biz"]),
    ("machinery maintenance", 25.0, 6, ["industry"]),
]


@pytest.fixture(scope="module")
def ctx_idx(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("cctx"))
    df = spark.createDataFrame(
        pd.DataFrame(CTX_ENTRIES, columns=["inp", "w", "doc_id", "cats"])
    )
    CompletionIndexBuilder(
        spark, p, prefix_depth=3, prefix_top=4, n_files=2
    ).build(df, input_col="inp", weight_col="w", context_col="cats")
    return CompletionIndex(spark, p)


def brute_ctx(prefix, ctxs, size=5):
    akey = " ".join(tokenize_py(prefix))
    got = []
    for text, w, d, cats in CTX_ENTRIES:
        k = " ".join(tokenize_py(text))
        if k.startswith(akey) and any(c in cats for c in ctxs):
            got.append((text, w, d))
    got.sort(key=lambda r: (-r[1], r[0], r[2]))
    return got[:size]


def test_contexts_filter_and_merge(ctx_idx):
    # single context: short (tops) and long (range) prefixes
    for pfx in ("ma", "machine l"):
        got = [
            (c.text, c.weight, c.doc_id)
            for c in ctx_idx.complete(pfx, size=5, contexts=["tech"])
        ]
        assert got == brute_ctx(pfx, ["tech"]), pfx
    # multi-context merge: doc 2 carries both tech and edu → once
    got = ctx_idx.complete("machine", size=10, contexts=["tech", "edu"])
    ids = [c.doc_id for c in got]
    assert ids.count(2) == 1
    assert [(c.text, c.weight, c.doc_id) for c in got] == brute_ctx(
        "machine", ["tech", "edu"], size=10
    )
    # a context with no matches under the prefix
    assert ctx_idx.complete("machine", size=5, contexts=["biz"]) == []


def test_contexts_fuzzy(ctx_idx):
    # 'machene' (1 edit) under tech only — machinery (industry) excluded
    got = ctx_idx.complete(
        "machene", size=5, contexts=["tech"], fuzzy={}
    )
    assert all(c.doc_id in (1, 2, 3) for c in got) and got
    assert got[0].distance >= 1
    # same typo under industry reaches machinery
    goti = ctx_idx.complete(
        "machiner", size=5, contexts=["industry"], fuzzy={}
    )
    assert [c.doc_id for c in goti] == [6]


def test_contexts_mandatory_both_ways(ctx_idx, cidx):
    with pytest.raises(ValueError, match="[Mm]andatory"):
        ctx_idx.complete("machine", size=5)
    with pytest.raises(ValueError, match="without a"):
        cidx.complete("machine", size=5, contexts=["tech"])


def test_context_separator_validation(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("cbad"))
    df = spark.createDataFrame(
        pd.DataFrame(
            [("abc", 1.0, 1, "te\x01ch")],
            columns=["inp", "w", "doc_id", "cat"],
        )
    )
    # validation rides the build pass itself (raise_error in the
    # projection — no separate validation job), so it surfaces as the
    # build action's Spark error rather than a driver-side ValueError
    with pytest.raises(Exception, match="separator"):
        CompletionIndexBuilder(spark, p).build(
            df, input_col="inp", weight_col="w", context_col="cat"
        )

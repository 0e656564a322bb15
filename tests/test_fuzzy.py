"""Fuzzy match (Lucene FuzzyQuery + BlendedTermQuery semantics): OSA /
Levenshtein distances, closest-first dictionary expansion with blended
df, kernel reuse via per-term weights, Engine routing."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from neural_search_spark.index.build import IndexBuilder, doc_id_col, tokenized_turns
from neural_search_spark.query.bm25 import BM25Index, lucene_idf
from neural_search_spark.query.fuzzy import (
    fuzzy_expansions,
    fuzzy_match_scored_scan,
    fuzzy_match_topk,
    levenshtein,
    osa_distance,
    resolve_fuzziness,
)


@pytest.fixture(scope="module")
def fz_setup(spark, transcripts_df, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("fuzzy") / "idx")
    IndexBuilder(spark, d, n_shards=4, block_size=64).build(transcripts_df)
    idx = BM25Index(spark, d)
    tt = tokenized_turns(transcripts_df).toPandas()
    return idx, tt


def test_distances():
    assert levenshtein("kitten", "sitting") == 3
    assert levenshtein("ab", "ba") == 2
    assert osa_distance("ab", "ba") == 1          # adjacent transposition
    assert osa_distance("kitten", "sitting") == 3
    assert osa_distance("ca", "abc") == 3          # restricted variant (full DL = 2)
    assert levenshtein("", "abc") == 3 and osa_distance("abc", "") == 3
    assert osa_distance("tool", "tool") == 0


def test_resolve_fuzziness_auto():
    assert resolve_fuzziness("AUTO", "ab") == 0
    assert resolve_fuzziness("AUTO", "abc") == 1
    assert resolve_fuzziness("AUTO", "abcde") == 1
    assert resolve_fuzziness("AUTO", "abcdef") == 2
    assert resolve_fuzziness(1, "whatever") == 1
    assert resolve_fuzziness(5, "x") == 2          # Lucene max 2


def test_expansion_order_and_caps():
    vocab = [("tool", 50), ("tol", 3), ("toll", 7), ("cool", 9), ("to", 90)]
    # query 'tool', 1 edit: tool(0, boost 1), toll(1, 1-1/4), tol(1, 1-1/3),
    # cool(1, 1-1/4) — closest first, ties by term asc
    exps = fuzzy_expansions(vocab, "tool", fuzziness=1)
    assert [e[0] for e in exps] == ["tool", "cool", "toll", "tol"]
    assert exps[0][2] == 1.0
    assert exps[1][2] == pytest.approx(0.75) and exps[2][2] == pytest.approx(0.75)
    assert exps[3][2] == pytest.approx(1 - 1 / 3)
    # prefix_length=1 drops 'cool'; max_expansions caps after ordering
    exps_p = fuzzy_expansions(vocab, "tool", fuzziness=1, prefix_length=1)
    assert [e[0] for e in exps_p] == ["tool", "toll", "tol"]
    assert [e[0] for e in fuzzy_expansions(vocab, "tool", 1, max_expansions=2)] == [
        "tool", "cool",
    ]
    # transpositions toggle: 'ba' reaches 'ab' only under OSA
    assert [e[0] for e in fuzzy_expansions([("ab", 2)], "ba", 1)] == ["ab"]
    assert fuzzy_expansions([("ab", 2)], "ba", 1, transpositions=False) == []


def fuzzy_oracle(idx, tt, expansions_by_token, k=10):
    """Independent scorer: caller supplies the expansion groups
    {token: [(term, boost)]}; df/df_blend/idf recomputed from the corpus."""
    dfs = {}
    for g in expansions_by_token.values():
        for t, _ in g:
            dfs[t] = int(sum(t in set(l) for l in tt.toks))
    weights = {}
    for g in expansions_by_token.values():
        df_blend = max(dfs[t] for t, _ in g)
        idf_b = lucene_idf(idx.n_docs, df_blend)
        for t, boost in g:
            weights[t] = weights.get(t, 0.0) + boost * idf_b
    rows = []
    for did, dl, l in zip(tt.doc_id, tt.dl, tt.toks):
        from collections import Counter

        tfc = Counter(l)
        sc = 0.0
        for t, w in weights.items():
            tf = tfc.get(t, 0)
            if tf:
                sc += w * tf / (tf + idx.k1 * (1 - idx.b + idx.b * dl / idx.avgdl))
        if sc > 0:
            rows.append((did, np.float32(sc)))
    return (
        pd.DataFrame(rows, columns=["doc_id", "score"])
        .sort_values(["score", "doc_id"], ascending=[False, True], kind="mergesort")
        .head(k)
        .reset_index(drop=True)
    )


def test_fuzzy_topk_matches_independent_oracle(fz_setup):
    """Query 'tol' (fuzziness 1) expands to exactly {to, tol?, tool, toll?}
    ∩ vocabulary; expected expansions derived here by hand from the corpus
    vocabulary so the oracle does not reuse the engine's expander."""
    idx, tt = fz_setup
    vocab = sorted({t for l in tt.toks for t in l})
    by_hand = [
        (t, 1.0 if t == "tol" else 1.0 - 1.0 / min(len(t), 3))
        for t in vocab
        if levenshtein(t, "tol") <= 1
    ]
    assert any(t == "tool" for t, _ in by_hand), "fixture vocab has 'tool'"
    exp = fuzzy_oracle(idx, tt, {"tol": by_hand}, k=10)
    for mode in ("driver", "distributed"):
        got = fuzzy_match_topk(
            idx, "tol", k=10, fuzziness=1, transpositions=False, mode=mode
        ).toPandas()
        assert got.doc_id.tolist() == exp.doc_id.tolist(), mode
        assert np.allclose(got.score, exp.score, atol=1e-5)


def test_fuzzy_scan_matches_index(fz_setup, transcripts_df):
    idx, tt = fz_setup
    docs = transcripts_df.withColumn("doc_id", doc_id_col())
    got = (
        fuzzy_match_scored_scan(docs, "tol", fuzziness=1, transpositions=False)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(10)
        .toPandas()
    )
    want = fuzzy_match_topk(
        idx, "tol", k=10, fuzziness=1, transpositions=False
    ).toPandas()
    # both rank on their own precision; compare canonicalized on f32
    def canon(df):
        f32 = df.score.to_numpy().astype(np.float32)
        o = np.lexsort((df.doc_id.to_numpy(), -f32.astype(np.float64)))
        return df.doc_id.to_numpy()[o].tolist(), f32[o]

    gi, gs = canon(got)
    wi, ws = canon(want)
    assert gi == wi
    assert np.allclose(gs, ws, atol=1e-5)


def test_fuzzy_engine_routing_and_guards(fz_setup, transcripts_df, spark):
    from neural_search_spark.engine import Engine, spec_from_json

    idx, tt = fz_setup
    docs = transcripts_df.withColumn("doc_id", doc_id_col())
    eng = Engine(spark, corpus=docs, bm25_index=idx)
    spec = spec_from_json(
        {"match": {"query_text": "tol", "fuzziness": 1,
                   "fuzzy_transpositions": False}}
    )
    got = eng.search(spec, k=10).toPandas()
    want = fuzzy_match_topk(
        idx, "tol", k=10, fuzziness=1, transpositions=False
    ).toPandas()
    assert got.doc_id.tolist() == want.doc_id.tolist()
    # fuzziness + coverage gates don't compose
    bad = spec_from_json(
        {"match": {"query_text": "tol", "fuzziness": 1, "operator": "and"}}
    )
    with pytest.raises(ValueError, match="fuzziness"):
        eng.search(bad, k=10)
    # zero-expansion query (garbage token, 0 edits allowed) matches nothing
    none = eng.search(
        spec_from_json({"match": {"query_text": "zz9qx", "fuzziness": 0}}),
        k=10,
    )
    assert none.count() == 0


def test_fuzzy_exact_token_dominates(fz_setup):
    """A doc containing the exact token outranks same-tf docs reachable
    only via an expansion (boost < 1) under equal blended idf."""
    idx, tt = fz_setup
    got = fuzzy_match_topk(idx, "tool", k=10, fuzziness=1).toPandas()
    assert len(got) > 0
    top_doc_toks = set(
        tt[tt.doc_id == got.doc_id.iloc[0]].toks.iloc[0]
    )
    assert "tool" in top_doc_toks


def test_term_suggest(fz_setup):
    """did-you-mean over the dictionary: a misspelled token suggests its
    real neighbors closest-first; in-vocabulary tokens get no suggestions
    under suggest_mode='missing' but do under 'always'."""
    from neural_search_spark.query.suggest import term_suggest

    idx, tt = fz_setup
    out = term_suggest(idx, "tol the", size=3)
    assert out["the"] == []  # in vocabulary, mode=missing
    sugg = out["tol"]
    assert sugg, "1-edit neighbors of 'tol' exist (tool/to)"
    assert all(s.score >= sugg[-1].score for s in sugg)
    terms = [s.term for s in sugg]
    assert "tool" in terms or "to" in terms
    vocab_df = {t: int(sum(t in set(l) for l in tt.toks))
                for t in {s.term for s in sugg}}
    for s in sugg:
        assert s.freq == vocab_df[s.term]
    # 'always' suggests even for valid tokens: the synthetic vocab's
    # wNNNN family guarantees 1-substitution neighbors of w0001
    out2 = term_suggest(idx, "w0001", suggest_mode="always", size=5)
    assert len(out2["w0001"]) > 0
    assert all(s.term != "w0001" for s in out2["w0001"])
    # 'popular' keeps only candidates with df above the token's own
    out3 = term_suggest(idx, "w0001", suggest_mode="popular", size=5)
    own = int(sum("w0001" in set(l) for l in tt.toks))
    assert all(s.freq > own for s in out3["w0001"])
    with pytest.raises(ValueError):
        term_suggest(idx, "x", suggest_mode="bogus")


def test_unpruned_dictionary_guard(fz_setup, monkeypatch):
    """prefix_length=0 over a dictionary above UNPRUNED_DICT_LIMIT raises
    at call time (the 100-TB-safe default); the explicit override and the
    pruned prefix_length>=1 path both still answer."""
    from neural_search_spark.query import fuzzy as fz
    from neural_search_spark.query.suggest import term_suggest

    idx, _ = fz_setup
    monkeypatch.setattr(fz, "UNPRUNED_DICT_LIMIT", 10)
    assert idx.n_terms() > 10
    with pytest.raises(ValueError, match="prefix_length"):
        fuzzy_match_topk(idx, "tol", k=5, fuzziness=1)
    with pytest.raises(ValueError, match="prefix_length"):
        term_suggest(idx, "tol", prefix_length=0)
    # explicit opt-in still walks
    got = fuzzy_match_topk(
        idx, "tol", k=5, fuzziness=1, allow_unpruned_dictionary=True
    ).toPandas()
    assert len(got) > 0
    # pruned walk is unaffected by the limit
    got_p = fuzzy_match_topk(
        idx, "tol", k=5, fuzziness=1, prefix_length=1
    ).toPandas()
    assert len(got_p) > 0
    out = term_suggest(idx, "tol", prefix_length=1)
    assert out["tol"]


def test_standalone_fuzzy_query(fz_setup, transcripts_df, spark):
    """The host's standalone `fuzzy` query: single UN-ANALYZED value →
    dictionary expansion (no tokenization — case differences count as
    edits), same blended scorer as match-fuzziness."""
    from neural_search_spark.engine import Engine, spec_from_json

    idx, tt = fz_setup
    docs = transcripts_df.withColumn("doc_id", doc_id_col())
    eng = Engine(spark, corpus=docs, bm25_index=idx)
    # a clean lowercase value behaves exactly like match+fuzziness
    spec = spec_from_json(
        {"fuzzy": {"value": "tol", "fuzziness": 1, "prefix_length": 1}}
    )
    assert eng.explain_route(spec)["route"] == "index"
    got = eng.search(spec, k=10).toPandas()
    want = fuzzy_match_topk(
        idx, "tol", k=10, fuzziness=1, prefix_length=1
    ).toPandas()
    assert got.doc_id.tolist() == want.doc_id.tolist()
    # corpus fallback agrees
    got_scan = Engine(spark, corpus=docs).search(spec, k=10).toPandas()
    assert got_scan.doc_id.tolist() == want.doc_id.tolist()
    # un-analyzed: 'Tool' is 1 edit from the indexed 'tool' — it matches
    # through the edit, not through analysis
    up = eng.search(
        spec_from_json({"fuzzy": {"value": "Tool", "fuzziness": 1}}), k=5
    ).toPandas()
    assert len(up) > 0
    # ...but at fuzziness 0 the verbatim value matches nothing
    z = eng.search(
        spec_from_json({"fuzzy": {"value": "Tool", "fuzziness": 0}}), k=5
    ).toPandas()
    assert len(z) == 0

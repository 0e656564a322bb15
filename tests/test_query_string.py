"""query_string (classic Lucene parser) — occur resolution + leaf
parity against independently-computed expectations."""

import pytest
from pyspark.sql import functions as F

from neural_search_spark.engine import Engine, spec_from_json
from neural_search_spark.index.build import doc_id_col
from neural_search_spark.query.neural import QuerySpec, execute
from neural_search_spark.query.qs import (
    parse_query_string,
    query_string_scored,
)
from neural_search_spark.tokenizer import tokenize_py


@pytest.fixture(scope="module")
def corpus(spark, transcripts_df):
    return (
        transcripts_df.withColumn("doc_id", doc_id_col())
        .withColumn(
            "tool2",
            F.when(F.col("tool") == "none", F.lit(None)).otherwise(
                F.col("tool")
            ),
        )
        .cache()
    )


@pytest.fixture(scope="module")
def pdx(corpus):
    df = corpus.select(
        "doc_id", "text", "role", "turn_idx", "tool2"
    ).toPandas()
    df["toks"] = df.text.map(tokenize_py)
    df["tokset"] = df.toks.map(set)
    return df.set_index("doc_id", drop=False)


def qs(corpus, q, **kw):
    out = query_string_scored(corpus, q, **kw)
    return {int(r.doc_id): r.score for r in out.collect()}


def term_scores(corpus, term):
    out = execute(QuerySpec(query_type="match", query_text=term), corpus)
    return {int(r.doc_id): r.score for r in out.collect()}


def test_parser_occur_resolution():
    g = parse_query_string("a AND b OR c")
    assert [(o, n.text) for o, n in g.clauses] == [
        ("must", "a"), ("must", "b"), ("should", "c")
    ]
    g2 = parse_query_string("a b", default_operator="and")
    assert [o for o, _ in g2.clauses] == ["must", "must"]
    g3 = parse_query_string("a OR b", default_operator="and")
    assert [o for o, _ in g3.clauses] == ["should", "should"]
    g4 = parse_query_string("a AND NOT b")
    assert [o for o, _ in g4.clauses] == ["must", "must_not"]
    g5 = parse_query_string("+a -b c")
    assert [o for o, _ in g5.clauses] == ["must", "must_not", "should"]


def test_and_or_scoring(corpus, pdx):
    the = term_scores(corpus, "the")
    model = term_scores(corpus, "model")
    got = qs(corpus, "the AND model")
    want_ids = set(the) & set(model)
    assert set(got) == want_ids
    for d in got:
        assert abs(got[d] - (the[d] + model[d])) < 1e-9
    got_or = qs(corpus, "the OR model")
    assert set(got_or) == set(the) | set(model)
    for d in got_or:
        assert abs(
            got_or[d] - (the.get(d, 0.0) + model.get(d, 0.0))
        ) < 1e-9
    # a AND b OR c == +a +b c (flat classic semantics)
    call = term_scores(corpus, "call")
    flat = qs(corpus, "the AND model OR call")
    assert set(flat) == want_ids
    for d in flat:
        assert abs(
            flat[d] - (the[d] + model[d] + call.get(d, 0.0))
        ) < 1e-9


def test_must_not_and_pure_negative(corpus):
    the = term_scores(corpus, "the")
    model = term_scores(corpus, "model")
    got = qs(corpus, "the -model")
    assert set(got) == set(the) - set(model)
    for d in got:
        assert abs(got[d] - the[d]) < 1e-9
    assert qs(corpus, "-the") == {}  # only-prohibited matches nothing
    assert qs(corpus, "the NOT model") == got  # NOT == '-'


def test_keyword_field_and_boost(corpus, pdx):
    got = qs(corpus, "role:user^2.5")
    want = pdx[pdx.role == "user"]
    assert set(got) == set(int(x) for x in want.doc_id)
    assert {v for v in got.values()} == {2.5}
    # keyword prefix / wildcard on the raw value
    got_p = qs(corpus, "role:use*")
    assert set(got_p) == set(got)
    got_w = qs(corpus, "role:u?er")
    assert set(got_w) == set(got)


def test_range_and_exists(corpus, pdx):
    got = qs(corpus, "turn_idx:[3 TO 9}")
    want = pdx[(pdx.turn_idx >= 3) & (pdx.turn_idx < 9)]
    assert set(got) == set(int(x) for x in want.doc_id)
    got_open = qs(corpus, "turn_idx:[30 TO *]")
    assert set(got_open) == set(
        int(x) for x in pdx[pdx.turn_idx >= 30].doc_id
    )
    got_e = qs(corpus, "_exists_:tool2")
    assert set(got_e) == set(int(x) for x in pdx[pdx.tool2.notna()].doc_id)


def test_phrase_prefix_wildcard_fuzzy_parity(corpus):
    from neural_search_spark.query.fuzzy import fuzzy_match_scored_scan
    from neural_search_spark.query.multiterm import multiterm_scored_scan
    from neural_search_spark.query.phrase import phrase_scored_scan

    got = qs(corpus, '"the model"~1')
    want = {
        int(r.doc_id): r.score
        for r in phrase_scored_scan(corpus, "the model", slop=1).collect()
    }
    assert got == want
    got_p = qs(corpus, "mod*")
    want_p = {
        int(r.doc_id): r.score
        for r in multiterm_scored_scan(corpus, "mod", kind="prefix").collect()
    }
    assert got_p == want_p
    got_r = qs(corpus, "/w00[12]/")
    want_r = {
        int(r.doc_id): r.score
        for r in multiterm_scored_scan(
            corpus, "w00[12]", kind="regexp"
        ).collect()
    }
    assert got_r == want_r
    got_f = qs(corpus, "modl~1")
    want_f = {
        int(r.doc_id): r.score
        for r in fuzzy_match_scored_scan(
            corpus, "modl", fuzziness=1
        ).collect()
    }
    assert got_f == want_f


def test_groups_and_field_groups(corpus, pdx):
    the = term_scores(corpus, "the")
    model = term_scores(corpus, "model")
    call = term_scores(corpus, "call")
    got = qs(corpus, "(the OR model) AND call")
    want_ids = (set(the) | set(model)) & set(call)
    assert set(got) == want_ids
    for d in got:
        assert abs(
            got[d] - (the.get(d, 0.0) + model.get(d, 0.0) + call[d])
        ) < 1e-9
    # field-qualified group over a keyword column
    got_g = qs(corpus, "role:(user assistant)")
    want_g = pdx[pdx.role.isin(["user", "assistant"])]
    assert set(got_g) == set(int(x) for x in want_g.doc_id)
    # group boost
    got_b = qs(corpus, "(the model)^2")
    for d, s in got_b.items():
        assert abs(s - 2.0 * (the.get(d, 0.0) + model.get(d, 0.0))) < 1e-9


def test_minimum_should_match(corpus, pdx):
    got = qs(corpus, "the model call", minimum_should_match=2)
    for d in got:
        n = sum(t in pdx.loc[d, "tokset"] for t in ("the", "model", "call"))
        assert n >= 2
    loose = qs(corpus, "the model call")
    assert set(got) < set(loose)


def test_strict_errors(corpus):
    for bad in ('"open', "(open", "a^x", "turn_idx:[1 TO", "x AND )"):
        with pytest.raises(ValueError):
            qs(corpus, bad)
    with pytest.raises(ValueError, match="unknown field"):
        qs(corpus, "nope:foo")
    with pytest.raises(ValueError, match="range needs a field"):
        qs(corpus, "[1 TO 2]")


def test_engine_search_and_json(spark, corpus):
    eng = Engine(spark, corpus=corpus)
    spec = spec_from_json(
        {
            "query_string": {
                "query": "the AND turn_idx:[0 TO 3]",
                "default_operator": "or",
            }
        }
    )
    assert spec.query_type == "query_string"
    out = eng.search(spec, k=5).collect()
    assert len(out) == 5 and [r.rank for r in out] == [1, 2, 3, 4, 5]
    assert eng.explain_route(spec)["route"] == "corpus"
    # default_field mapping
    spec2 = spec_from_json(
        {"query_string": {"query": "user", "default_field": "role",
                          "analyzed_fields": ["text"]}}
    )
    got = {int(r.doc_id) for r in eng.search(spec2, k=10000).collect()}
    want = {
        int(r.doc_id)
        for r in corpus.filter(F.col("role") == "user")
        .select("doc_id")
        .collect()
    }
    assert got == want or len(got) == 10000

"""simple_query_string: parser unit tests + evaluator equivalence against
manual compositions of the individually-oracled leaf scorers."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from neural_search_spark.index.build import doc_id_col, tokenized_turns
from neural_search_spark.query.sqs import Group, Leaf, parse_sqs, sqs_scored


@pytest.fixture(scope="module")
def docs(spark, transcripts_df):
    return transcripts_df.withColumn("doc_id", doc_id_col())


@pytest.fixture(scope="module")
def tt(transcripts_df):
    return tokenized_turns(transcripts_df).toPandas()


def flat(g):
    out = []
    for op, node in g.children:
        if isinstance(node, Group):
            out.append((op, "(", flat(node), node.negated))
        else:
            out.append((op, node.kind, node.text, node.negated,
                        node.slop, node.fuzziness))
    return out


def test_parser_shapes():
    g = parse_sqs('foo +bar | -baz "the tool"~2 pre* fz~1 (a | b)')
    k = flat(g)
    assert k[0] == ("default", "match", "foo", False, 0, 0)
    assert k[1] == ("and", "match", "bar", False, 0, 0)
    assert k[2] == ("or", "match", "baz", True, 0, 0)
    assert k[3] == ("default", "phrase", "the tool", False, 2, 0)
    assert k[4] == ("default", "prefix", "pre", False, 0, 0)
    assert k[5] == ("default", "fuzzy", "fz", False, 0, 1)
    assert k[6][1] == "(" and [x[2] for x in k[6][2]] == ["a", "b"]


def test_parser_lenient():
    # dangling operators, unbalanced quotes/parens: degrade, never raise
    assert flat(parse_sqs("foo +")) == [("default", "match", "foo", False, 0, 0)]
    assert flat(parse_sqs(')foo ("bar')) [0][2] == "foo"
    assert parse_sqs("").children == []
    assert parse_sqs("- | + ( )").children == []


def pdfd(df):
    p = df.toPandas().sort_values("doc_id").reset_index(drop=True)
    return dict(zip(p.doc_id, p.score))


def test_or_is_union_sum(docs):
    from neural_search_spark.gate import bm25_scored

    got = pdfd(sqs_scored(docs, "tool | call"))
    # OR == plain two-term match (disjunctive BM25 sum)
    want = pdfd(bm25_scored(docs, ["doc_id"], "tool call", ndp=None))
    assert set(got) == set(want)
    for d in got:
        assert got[d] == pytest.approx(want[d], rel=1e-9)


def test_and_filters_to_intersection(docs, tt):
    got = pdfd(sqs_scored(docs, "tool + call"))
    both = {
        int(d)
        for d, l in zip(tt.doc_id, tt.toks)
        if "tool" in set(l) and "call" in set(l)
    }
    assert set(got) == both
    # scores equal the OR scores on the surviving docs
    or_sc = pdfd(sqs_scored(docs, "tool | call"))
    for d in got:
        assert got[d] == pytest.approx(or_sc[d], rel=1e-9)


def test_negation_matchall_wrapper(docs, tt):
    """Lucene SimpleQueryParser parity: '-bar' becomes a MUST_NOT+
    MatchAllDocs wrapper clause at its position — 'tool -call' under
    default OR matches docs with tool OR docs without call, the wrapper
    hits scoring the MatchAllDocs constant 1.0 (the documented
    SimpleQueryParser negation quirk, buildQueryTree's not % 2 branch)."""
    from neural_search_spark.gate import bm25_scored

    got = pdfd(sqs_scored(docs, "tool -call"))
    tool_sc = pdfd(bm25_scored(docs, ["doc_id"], "tool", ndp=None))
    all_ids = {int(d) for d in tt.doc_id}
    have_call = {
        int(d) for d, l in zip(tt.doc_id, tt.toks) if "call" in set(l)
    }
    assert set(got) == set(tool_sc) | (all_ids - have_call)
    for d, s in got.items():
        exp = tool_sc.get(d, 0.0) + (0.0 if d in have_call else 1.0)
        assert s == pytest.approx(exp, rel=1e-9), d
    # clause order changes nothing (OR level is one flat BooleanQuery)
    assert got == pdfd(sqs_scored(docs, "-call tool"))
    # AND context: 'tool + -call' = docs with tool AND without call,
    # scoring tool + the wrapper's 1.0
    got_and = pdfd(sqs_scored(docs, "tool + -call"))
    assert set(got_and) == set(tool_sc) - have_call
    for d, s in got_and.items():
        assert s == pytest.approx(tool_sc[d] + 1.0, rel=1e-9)
    # pure-negative query = corpus minus the negated docs at score 1.0
    neg = pdfd(sqs_scored(docs, "-tool"))
    assert set(neg) == all_ids - set(tool_sc)
    assert all(v == 1.0 for v in neg.values())
    # double negation cancels (state.not % 2)
    assert set(pdfd(sqs_scored(docs, "--tool"))) == set(tool_sc)


def test_first_operator_wins(docs):
    """Between two clauses Lucene latches only the FIRST operator
    ('tool + | call' stays AND); leading operators are ignored."""
    g = flat(parse_sqs("tool + | call"))
    assert g[1][0] == "and"
    assert pdfd(sqs_scored(docs, "tool + | call")) == pdfd(
        sqs_scored(docs, "tool + call")
    )
    assert pdfd(sqs_scored(docs, "| tool call", default_operator="and")) == (
        pdfd(sqs_scored(docs, "tool + call"))
    )


def test_default_operator_and(docs):
    assert pdfd(sqs_scored(docs, "tool call", default_operator="and")) == pdfd(
        sqs_scored(docs, "tool + call")
    )


def test_phrase_prefix_fuzzy_leaves(docs, tt):
    from neural_search_spark.query.fuzzy import fuzzy_match_scored_scan
    from neural_search_spark.query.multiterm import multiterm_scored_scan
    from neural_search_spark.query.phrase import phrase_scored_scan

    assert pdfd(sqs_scored(docs, '"the tool"')) == pdfd(
        phrase_scored_scan(docs, "the tool")
    )
    assert pdfd(sqs_scored(docs, '"tool the"~2')) == pdfd(
        phrase_scored_scan(docs, "tool the", slop=2)
    )
    assert pdfd(sqs_scored(docs, "to*")) == pdfd(
        multiterm_scored_scan(docs, "to", kind="prefix")
    )
    assert pdfd(sqs_scored(docs, "tol~1")) == pdfd(
        fuzzy_match_scored_scan(docs, "tol", fuzziness=1)
    )


def test_grouping(docs, tt):
    got = pdfd(sqs_scored(docs, "(tool | call) + the"))
    have = {
        int(d)
        for d, l in zip(tt.doc_id, tt.toks)
        if ("tool" in set(l) or "call" in set(l)) and "the" in set(l)
    }
    assert set(got) == have


def test_engine_route_and_topk(docs, spark):
    from neural_search_spark.engine import Engine, spec_from_json

    eng = Engine(spark, corpus=docs)
    out = eng.search(
        spec_from_json(
            {
                "simple_query_string": {
                    "query": '"the tool" | call -w0001',
                    "default_operator": "or",
                }
            }
        ),
        k=10,
    ).toPandas()
    assert len(out) == 10
    assert out["rank"].tolist() == list(range(1, 11))
    assert (np.diff(out.score.to_numpy()) <= 1e-12).all()


def test_match_bool_prefix(docs, tt, spark):
    """match_bool_prefix = SHOULD term clauses + trailing prefix clause:
    equals the manual union-sum of the match part and the prefix part."""
    from neural_search_spark.engine import Engine, spec_from_json

    eng = Engine(spark, corpus=docs)
    got = pdfd(
        eng.search(
            spec_from_json({"match_bool_prefix": {"query_text": "call to"}}),
            k=10**9,
        ).drop("rank")
    )
    want = pdfd(sqs_scored(docs, "call | to*"))
    # engine path is k-bounded; compare on the docs it returned
    for d, s in got.items():
        assert s == pytest.approx(want[d], rel=1e-9)
    assert set(got) == set(want)


def test_match_bool_prefix_index_route(docs, spark, tmp_path_factory):
    """With an index attached, match_bool_prefix serves from the index
    (weighted term postings + dictionary prefix walk) — value-identical
    to the corpus sqs fold on both kernels, and explain_route says so."""
    from neural_search_spark.engine import Engine, spec_from_json
    from neural_search_spark.index.build import IndexBuilder
    from neural_search_spark.query.bm25 import BM25Index
    from neural_search_spark.query.multiterm import match_bool_prefix_topk

    d = str(tmp_path_factory.mktemp("mbpidx") / "idx")
    IndexBuilder(spark, d, n_shards=4, block_size=64).build(
        docs.drop("doc_id")
    )
    idx = BM25Index(spark, d)
    eng = Engine(spark, corpus=docs, bm25_index=idx)
    spec = {"match_bool_prefix": {"query_text": "call to"}}
    assert eng.explain_route(spec)["route"] == "index"
    want = pdfd(sqs_scored(docs, "call | to*"))

    def canon(p):
        f32 = p.score.to_numpy().astype(np.float32)
        o = np.lexsort((p.doc_id.to_numpy(), -f32.astype(np.float64)))
        return p.doc_id.to_numpy()[o].tolist(), f32[o]

    got = eng.search(spec_from_json(spec), k=10).toPandas()
    for mode in ("driver", "distributed"):
        m = match_bool_prefix_topk(idx, "call to", k=10, mode=mode).toPandas()
        ii = canon(m)
        assert ii[0] == canon(got)[0], mode
        # index f32 scores match the corpus fold's doubles on each doc
        for did, s in zip(ii[0], ii[1]):
            assert s == pytest.approx(want[did], rel=1e-5), (mode, did)
    # duplicate tokens are duplicate SHOULD clauses (scores double)
    dup = match_bool_prefix_topk(idx, "call call to", k=10).toPandas()
    want_dup = pdfd(sqs_scored(docs, "call call | to*"))
    for did, s in zip(dup.doc_id, dup.score):
        assert s == pytest.approx(want_dup[did], rel=1e-5)


def test_flat_sqs_routes_to_index(docs, spark, tmp_path_factory):
    """A flat OR/AND of single-token positive terms serves from the BM25
    index, identical results to the corpus fold; non-flat shapes fall
    back."""
    from neural_search_spark.engine import Engine, _sqs_as_flat_match, spec_from_json
    from neural_search_spark.index.build import IndexBuilder
    from neural_search_spark.query.bm25 import BM25Index

    assert _sqs_as_flat_match("tool call the", "or") == ("tool call the", "or")
    assert _sqs_as_flat_match("tool + call", "or") == ("tool call", "and")
    assert _sqs_as_flat_match("tool call", "and") == ("tool call", "and")
    assert _sqs_as_flat_match("tool", "or") == ("tool", "or")
    for bad in ('"tool call"', "to*", "tol~1", "tool -call",
                "(tool) call", "tool | call + the", "tool tool"):
        assert _sqs_as_flat_match(bad, "or") is None, bad

    d = str(tmp_path_factory.mktemp("sqsidx") / "idx")
    IndexBuilder(spark, d, n_shards=4, block_size=64).build(
        docs.drop("doc_id")
    )
    eng = Engine(spark, corpus=docs, bm25_index=BM25Index(spark, d))
    eng_scan = Engine(spark, corpus=docs)
    for q, op in [("tool call", "or"), ("tool + call", "or"),
                  ("tool call", "and")]:
        spec = {"simple_query_string": {"query": q, "default_operator": op}}
        via_idx = eng.search(spec_from_json(spec), k=10).toPandas()
        via_scan = eng_scan.search(spec_from_json(spec), k=10).toPandas()
        # canonicalize on f32 (index) vs double (scan) tie ordering
        def canon(df):
            f32 = df.score.to_numpy().astype(np.float32)
            o = np.lexsort((df.doc_id.to_numpy(), -f32.astype(np.float64)))
            return df.doc_id.to_numpy()[o].tolist(), f32[o]

        ii, si = canon(via_idx), canon(via_scan)
        assert ii[0] == si[0], (q, op)
        assert np.allclose(ii[1], si[1], atol=1e-5)


def test_kitchen_sink_hybrid_composition(docs, spark, tmp_path_factory):
    """Every new leaf type composes as a hybrid branch and inside bool:
    fuzzy match + sloppy phrase + prefix + simple_query_string in one
    hybrid request, and a bool with a terms filter gating a fuzzy must."""
    from neural_search_spark.engine import Engine, spec_from_json
    from neural_search_spark.index.build import IndexBuilder
    from neural_search_spark.index.positions import build_positions
    from neural_search_spark.query.bm25 import BM25Index

    d = str(tmp_path_factory.mktemp("sink") / "idx")
    raw = docs.drop("doc_id")
    IndexBuilder(spark, d, n_shards=4, block_size=64).build(raw)
    build_positions(spark, d, raw)
    eng = Engine(spark, corpus=docs, bm25_index=BM25Index(spark, d))
    out = eng.search(
        spec_from_json(
            {
                "hybrid": {
                    "queries": [
                        {"match": {"query_text": "tol", "fuzziness": 1}},
                        {"match_phrase": {"query_text": "tool the", "slop": 2}},
                        {"prefix": {"value": "w00"}},
                        {"simple_query_string": {"query": "call | to*"}},
                    ],
                    "normalization": "min_max",
                    "combination": "arithmetic_mean",
                    "pagination_depth": 50,
                }
            }
        ),
        k=10,
    ).toPandas()
    assert len(out) == 10
    assert out["rank"].tolist() == list(range(1, 11))
    b = eng.search(
        spec_from_json(
            {
                "bool": {
                    "must": [{"match": {"query_text": "tol", "fuzziness": 1}}],
                    "must_not": [{"wildcard": {"value": "w00?1"}}],
                    "filter": [{"terms": {"values": ["the", "tool"]}}],
                }
            }
        ),
        k=10,
    ).toPandas()
    assert len(b) > 0

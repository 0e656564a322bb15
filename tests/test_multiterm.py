"""prefix / wildcard constant-score queries (Lucene PrefixQuery /
WildcardQuery under the CONSTANT_SCORE rewrite)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from neural_search_spark.index.build import IndexBuilder, doc_id_col, tokenized_turns
from neural_search_spark.query.bm25 import BM25Index
from neural_search_spark.query.multiterm import (
    expand_pattern,
    multiterm_scored_scan,
    multiterm_topk,
    wildcard_literal_prefix,
    wildcard_regex,
)


@pytest.fixture(scope="module")
def mt_setup(spark, transcripts_df, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("mt") / "idx")
    IndexBuilder(spark, d, n_shards=4, block_size=64).build(transcripts_df)
    idx = BM25Index(spark, d)
    tt = tokenized_turns(transcripts_df).toPandas()
    return idx, tt


def test_wildcard_translation():
    assert wildcard_regex("to*") == "^to.*$"
    assert wildcard_regex("t?ol") == "^t.ol$"
    assert wildcard_regex("a.b*") == "^a\\.b.*$"  # dot escaped
    assert wildcard_literal_prefix("too*x?") == "too"
    assert wildcard_literal_prefix("*oo") == ""
    assert wildcard_literal_prefix("tool") == "tool"


def test_expansion_against_vocab(mt_setup):
    idx, tt = mt_setup
    vocab = sorted({t for l in tt.toks for t in l})
    exp_p = [t for t, _ in expand_pattern(idx, "to", "prefix")]
    assert exp_p == [t for t in vocab if t.startswith("to")]
    exp_w = [t for t, _ in expand_pattern(idx, "t?ol", "wildcard")]
    assert exp_w == [
        t for t in vocab if len(t) == 4 and t[0] == "t" and t[2:] == "ol"
    ]


def brute_ids(tt, pred, k=None):
    ids = sorted(
        int(d) for d, l in zip(tt.doc_id, tt.toks) if any(pred(t) for t in l)
    )
    return ids if k is None else ids[:k]


@pytest.mark.parametrize("mode", ["driver", "distributed"])
def test_prefix_topk(mt_setup, mode):
    idx, tt = mt_setup
    exp = brute_ids(tt, lambda t: t.startswith("to"), k=10)
    got = multiterm_topk(idx, "to", kind="prefix", k=10, mode=mode).toPandas()
    assert got.doc_id.tolist() == exp
    assert (got.score == 1.0).all()
    assert got["rank"].tolist() == list(range(1, len(exp) + 1))


@pytest.mark.parametrize("mode", ["driver", "distributed"])
def test_wildcard_topk(mt_setup, mode):
    import re

    idx, tt = mt_setup
    rx = re.compile("^w00.1$")
    exp = brute_ids(tt, lambda t: rx.match(t), k=10)
    assert exp, "fixture vocab has w00x1 tokens"
    got = multiterm_topk(
        idx, "w00?1", kind="wildcard", k=10, mode=mode, boost=2.0
    ).toPandas()
    assert got.doc_id.tolist() == exp
    assert (got.score == 2.0).all()


@pytest.mark.parametrize("mode", ["driver", "distributed"])
def test_regexp_topk(mt_setup, mode):
    import re

    idx, tt = mt_setup
    rx = re.compile("^w0(01|25)[0-9]$")
    exp = brute_ids(tt, lambda t: rx.match(t), k=10)
    assert exp, "fixture vocab has w001x/w025x tokens"
    got = multiterm_topk(
        idx, "w0(01|25)[0-9]", kind="regexp", k=10, mode=mode
    ).toPandas()
    assert got.doc_id.tolist() == exp
    assert (got.score == 1.0).all()


def test_regexp_scan_engine_and_guards(mt_setup, transcripts_df, spark):
    from neural_search_spark.engine import Engine, spec_from_json
    from neural_search_spark.query.multiterm import (
        check_regexp_pattern,
        regexp_literal_prefix,
    )

    # literal-prefix pushdown: quantifier makes the last literal optional
    assert regexp_literal_prefix("w00(1|2)x") == "w00"
    assert regexp_literal_prefix("to*l") == "t"  # '*' binds to 'o'
    assert regexp_literal_prefix("tool") == "tool"
    assert regexp_literal_prefix(".*x") == ""
    # Lucene optional operators refuse instead of diverging silently
    for bad in ("a~1", "a&b", "<1-10>", 'a"b"'):
        with pytest.raises(NotImplementedError):
            check_regexp_pattern(bad)
    check_regexp_pattern("a\\&b")  # escaped form is a literal — fine

    idx, tt = mt_setup
    docs = transcripts_df.withColumn("doc_id", doc_id_col())
    got = (
        multiterm_scored_scan(docs, "w0(01|25)[0-9]", kind="regexp")
        .orderBy("doc_id")
        .limit(10)
        .toPandas()
    )
    want = multiterm_topk(idx, "w0(01|25)[0-9]", kind="regexp", k=10).toPandas()
    assert got.doc_id.tolist() == want.doc_id.tolist()
    # engine routes regexp to the index and falls back to the scan
    eng = Engine(spark, corpus=docs, bm25_index=idx)
    spec = spec_from_json({"regexp": {"value": "w0(01|25)[0-9]"}})
    assert eng.explain_route(spec)["route"] == "index"
    assert (
        eng.search(spec, k=10).toPandas().doc_id.tolist()
        == want.doc_id.tolist()
    )
    assert (
        Engine(spark, corpus=docs).search(spec, k=10)
        .toPandas().doc_id.tolist()
        == want.doc_id.tolist()
    )


def test_no_expansion_is_empty(mt_setup):
    idx, _ = mt_setup
    assert multiterm_topk(idx, "zz9qx", kind="prefix", k=5).count() == 0
    assert multiterm_topk(idx, "", kind="prefix", k=5).count() == 0


def test_scan_matches_index(mt_setup, transcripts_df):
    idx, tt = mt_setup
    docs = transcripts_df.withColumn("doc_id", doc_id_col())
    got = (
        multiterm_scored_scan(docs, "to", kind="prefix")
        .orderBy("doc_id")
        .limit(10)
        .toPandas()
    )
    want = multiterm_topk(idx, "to", kind="prefix", k=10).toPandas()
    assert got.doc_id.tolist() == want.doc_id.tolist()
    assert (got.score == 1.0).all()


def test_engine_routing_and_hybrid_compose(mt_setup, transcripts_df, spark):
    from neural_search_spark.engine import Engine, spec_from_json

    idx, tt = mt_setup
    docs = transcripts_df.withColumn("doc_id", doc_id_col())
    eng = Engine(spark, corpus=docs, bm25_index=idx)
    got = eng.search(
        spec_from_json({"prefix": {"value": "to"}}), k=10
    ).toPandas()
    assert got.doc_id.tolist() == brute_ids(
        tt, lambda t: t.startswith("to"), k=10
    )
    # tombstones honored on the index route
    idx2 = BM25Index(spark, idx.path).with_deletes(got.doc_id.iloc[:2].tolist())
    eng2 = Engine(spark, corpus=docs, bm25_index=idx2)
    got2 = eng2.search(spec_from_json({"prefix": {"value": "to"}}), k=10).toPandas()
    assert set(got.doc_id.iloc[:2]).isdisjoint(set(got2.doc_id))
    # composes as a hybrid branch (constant-score + bm25)
    out = eng.search(
        spec_from_json(
            {
                "hybrid": {
                    "queries": [
                        {"match": {"query_text": "tool call"}},
                        {"wildcard": {"value": "w00?1"}},
                    ],
                    "normalization": "min_max",
                    "pagination_depth": 50,
                }
            }
        ),
        k=10,
    ).toPandas()
    assert len(out) == 10


# ---------------------------------------------------------------------------
# term / terms (un-analyzed value queries)
# ---------------------------------------------------------------------------
def test_terms_constant_score(mt_setup, transcripts_df, spark):
    from neural_search_spark.engine import Engine, spec_from_json

    idx, tt = mt_setup
    docs = transcripts_df.withColumn("doc_id", doc_id_col())
    eng = Engine(spark, corpus=docs, bm25_index=idx)
    vals = ["tool", "zz9qx"]
    got = eng.search(
        spec_from_json({"terms": {"values": vals, "boost": 3.0}}), k=10
    ).toPandas()
    exp = brute_ids(tt, lambda t: t in set(vals), k=10)
    assert got.doc_id.tolist() == exp
    assert (got.score == 3.0).all()
    # scan route (filter forces it) agrees
    spec2 = spec_from_json({"terms": {"values": vals, "boost": 3.0}})
    spec2.filter = F.lit(True)
    got2 = eng.search(spec2, k=10).toPandas()
    assert got2.doc_id.tolist() == exp


def test_term_query_bm25_scored(mt_setup, transcripts_df, spark):
    """term == single-token match for an in-vocabulary lowercase value
    (identical scores), but the value is NOT analyzed: an uppercase value
    misses entirely instead of being lowercased."""
    import numpy as np

    from neural_search_spark.engine import Engine, spec_from_json
    from neural_search_spark.query.bm25 import bm25_topk
    from neural_search_spark.query.multiterm import term_topk

    idx, tt = mt_setup
    got = term_topk(idx, "tool", k=10).toPandas()
    want = bm25_topk(idx, "tool", k=10).toPandas()
    assert got.doc_id.tolist() == want.doc_id.tolist()
    assert np.allclose(got.score, want.score, atol=1e-6)
    assert term_topk(idx, "Tool", k=10).count() == 0  # un-analyzed
    # Engine route + index-free scan agree
    docs = transcripts_df.withColumn("doc_id", doc_id_col())
    eng = Engine(spark, corpus=docs, bm25_index=idx)
    via_idx = eng.search(spec_from_json({"term": {"value": "tool"}}), k=10).toPandas()
    spec2 = spec_from_json({"term": {"value": "tool"}})
    spec2.filter = F.lit(True)
    via_scan = eng.search(spec2, k=10).toPandas()
    assert via_idx.doc_id.tolist() == via_scan.doc_id.tolist()
    assert np.allclose(via_idx.score, via_scan.score, atol=1e-5)


def test_terms_lookup(mt_setup, transcripts_df, spark):
    """Host terms-lookup form: the value set is fetched from one row of
    an attached lookup table at search time, then scores exactly like an
    inline terms query; a missing doc matches nothing (host behavior)."""
    from neural_search_spark.engine import Engine, spec_from_json
    from neural_search_spark.query.neural import execute, QuerySpec

    idx, tt = mt_setup
    docs = transcripts_df.withColumn("doc_id", doc_id_col())
    vals = ["tool", "zz9qx"]
    lk = spark.createDataFrame(
        [(7, vals), (8, [])],
        schema="pref_id long, allow array<string>",
    )
    eng = Engine(
        spark, corpus=docs, bm25_index=idx, lookup_tables={"prefs": lk}
    )
    spec = {
        "terms": {
            "lookup": {
                "index": "prefs", "id": 7, "path": "allow",
                "id_field": "pref_id",
            },
            "boost": 3.0,
        }
    }
    got = eng.search(spec, k=10).toPandas()
    inline = eng.search(
        spec_from_json({"terms": {"values": vals, "boost": 3.0}}), k=10
    ).toPandas()
    assert got.doc_id.tolist() == inline.doc_id.tolist()
    assert (got.score == 3.0).all()
    # missing doc → empty value set → no hits
    miss = dict(spec)
    miss["terms"] = dict(spec["terms"])
    miss["terms"]["lookup"] = dict(spec["terms"]["lookup"], id=999)
    assert eng.search(miss, k=10).count() == 0
    # nested under bool: lookup resolves through the composite walk
    nb = eng.search(
        {"bool": {"should": [spec, {"match": {"query_text": "tool"}}]}},
        k=10,
    )
    assert nb.count() > 0
    # guards: unknown table; values+lookup together; unresolved execute
    with pytest.raises(ValueError, match="lookup_tables"):
        Engine(spark, corpus=docs).search(spec, k=5)
    with pytest.raises(ValueError, match="not both"):
        spec_from_json(
            {"terms": {"values": ["a"],
                       "lookup": {"index": "x", "id": 1, "path": "p"}}}
        )
    with pytest.raises(ValueError, match="resolved before execution"):
        execute(
            QuerySpec(
                query_type="terms",
                lookup={"index": "prefs", "id": 7, "path": "allow"},
            ),
            docs,
            "doc_id",
        )


def test_terms_lookup_reaches_every_surface(mt_setup, transcripts_df, spark):
    """The chokepoint fix: lookups resolve inside _full_scored/_branch_topk,
    so has_child-wrapped, scroll-filtered and rescore-query lookups all
    work — not just bare search()."""
    from neural_search_spark.engine import Engine

    idx, tt = mt_setup
    docs = transcripts_df.withColumn("doc_id", doc_id_col())
    lk = spark.createDataFrame(
        [(7, ["tool"])], schema="pref_id long, allow array<string>"
    )
    eng = Engine(
        spark, corpus=docs, bm25_index=idx, lookup_tables={"prefs": lk}
    )
    spec = {
        "terms": {
            "lookup": {"index": "prefs", "id": 7, "path": "allow",
                       "id_field": "pref_id"}
        }
    }
    # has_child wrapping
    hc = eng.search({"has_child": {"query": spec}}, k=5)
    assert hc.count() > 0
    # scroll with the lookup spec as the match filter
    cur = eng.scroll(spec=spec, page_size=7, sort=[("ts", "asc")])
    assert len(cur.next_page()) == 7
    # rescore query carrying the lookup
    got = eng.search(
        {"match": {"query_text": "tool"}},
        k=5,
        rescore={"window_size": 10, "query": spec},
    )
    assert got.count() == 5

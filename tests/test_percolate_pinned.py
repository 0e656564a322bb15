"""Percolate (reverse search) and pinned queries: coverage semantics
against a brute-force python oracle, the driver fast path, registry
validation, and pin-order/exclusion behavior."""

import pytest
from pyspark.sql import functions as F

from neural_search_spark.engine import Engine, PinnedSpec, spec_from_json
from neural_search_spark.query.percolate import PercolatorIndex
from neural_search_spark.tokenizer import tokenize_py

QUERIES = {
    "msm2": {"match": {"query_text": "tool call merge",
                       "minimum_should_match": 2}},
    "and2": {"match": {"query_text": "tool call", "operator": "and"}},
    "anyof": {"terms": {"values": ["merge", "window"]}},
    "one": {"term": {"value": "tool"}},
}


def _brute(text):
    toks = set(tokenize_py(text))
    out = set()
    if len(toks & {"tool", "call", "merge"}) >= 2:
        out.add("msm2")
    if {"tool", "call"} <= toks:
        out.add("and2")
    if toks & {"merge", "window"}:
        out.add("anyof")
    if "tool" in toks:
        out.add("one")
    return out


@pytest.fixture(scope="module")
def corpus(spark, transcripts_df):
    from neural_search_spark.index.build import doc_id_col

    return transcripts_df.withColumn("doc_id", doc_id_col()).persist()


class TestPercolate:
    def test_distributed_matches_brute_force(self, spark, corpus):
        pidx = PercolatorIndex(spark, QUERIES)
        got = {}
        for r in pidx.percolate_df(corpus).collect():
            got.setdefault(r["doc_id"], set()).add(r["query_id"])
        rows = corpus.select("doc_id", "text").collect()
        n_hits = 0
        for r in rows:
            exp = _brute(r["text"])
            assert got.get(r["doc_id"], set()) == exp, r["text"][:80]
            n_hits += len(exp)
        assert n_hits > 0  # the corpus must exercise real matches

    def test_n_matched_counts_distinct_terms(self, spark):
        pidx = PercolatorIndex(spark, QUERIES)
        doc = spark.createDataFrame(
            [(1, "tool tool tool call")], "doc_id long, text string"
        )
        got = {
            r["query_id"]: r["n_matched"]
            for r in pidx.percolate_df(doc).collect()
        }
        # 'tool' repeats but counts once
        assert got == {"msm2": 2, "and2": 2, "one": 1}

    def test_driver_fast_path_equals_distributed(self, spark):
        pidx = PercolatorIndex(spark, QUERIES)
        for text in ("tool call something", "merge window", "nothing here",
                     "tool merge"):
            assert set(pidx.percolate(text)) == _brute(text)

    def test_unmatchable_msm_registers_no_terms(self, spark):
        pidx = PercolatorIndex(
            spark,
            {"dead": {"match": {"query_text": "tool call",
                                "minimum_should_match": 3}},
             "live": {"term": {"value": "tool"}}},
        )
        assert pidx.percolate("tool call tool call") == ["live"]

    def test_unsupported_kind_raises(self, spark):
        with pytest.raises(ValueError, match="coverage-decidable"):
            PercolatorIndex(
                spark, {"p": {"match_phrase": {"query_text": "a b"}}}
            )

    def test_empty_registry_raises(self, spark):
        with pytest.raises(ValueError, match="at least one"):
            PercolatorIndex(spark, {})


class TestPinned:
    def test_pin_order_exclusion_and_absent_id(self, spark, corpus):
        eng = Engine(spark, corpus=corpus)
        organic = {"match": {"query_text": "tool call"}}
        base = eng.search(spec_from_json(organic), k=6).collect()
        # pin the organic #3 and #1 in reversed order + an absent id
        ids = [base[2]["doc_id"], base[0]["doc_id"], 123456789]
        got = eng.search(
            spec_from_json({"pinned": {"ids": ids, "organic": organic}}),
            k=6,
        ).collect()
        assert [r["doc_id"] for r in got[:2]] == ids[:2]  # pin order
        assert got[0]["score"] > got[1]["score"] > got[2]["score"]
        # organic tail: original order minus the pinned ids
        exp_tail = [r["doc_id"] for r in base if r["doc_id"] not in ids]
        assert [r["doc_id"] for r in got[2:]] == exp_tail[:4]
        assert [r["rank"] for r in got] == list(range(1, len(got) + 1))

    def test_pinned_spec_validation(self):
        with pytest.raises(ValueError, match="non-empty 'ids'"):
            spec_from_json({"pinned": {"ids": [], "organic":
                            {"match": {"query_text": "x"}}}})
        with pytest.raises(ValueError, match="organic"):
            spec_from_json({"pinned": {"ids": [1]}})
        with pytest.raises(ValueError, match="doc-space"):
            spec_from_json(
                {"pinned": {"ids": [1], "organic": {"hybrid": {"queries": [
                    {"match": {"query_text": "x"}}]}}}}
            )

    def test_pinned_composes_with_post_filter(self, spark, corpus):
        eng = Engine(spark, corpus=corpus)
        some = corpus.select("doc_id", "role").first()
        spec = PinnedSpec(
            ids=[some["doc_id"]],
            organic=spec_from_json({"match": {"query_text": "tool call"}}),
        )
        allowed_role = some["role"]
        out = eng.search(spec, k=5)
        assert out.count() > 0
        # the pinned doc leads when unfiltered
        assert out.first()["doc_id"] == some["doc_id"]
        # a post_filter that excludes the pinned doc's role drops it too
        filtered = eng._branch_topk(
            spec,
            5,
            allowed=corpus.filter(F.col("role") != allowed_role).select(
                F.col("doc_id")
            ),
        ).collect()
        assert all(r["doc_id"] != some["doc_id"] for r in filtered)

"""intervals query: minimal-interval enumeration vs the brute-force
definition, gap/filter semantics, and index-backed serving."""

import random

import numpy as np
import pytest

from neural_search_spark.engine import Engine, spec_from_json
from neural_search_spark.query.intervals import (
    IAllOf,
    IAnyOf,
    IExpand,
    IMatch,
    IntervalClause,
    enumerate_intervals,
    intervals_topk,
    rule_from_json,
)


@pytest.fixture(scope="module")
def pos_index(spark, transcripts_df, tmp_path_factory):
    from neural_search_spark.index.build import IndexBuilder
    from neural_search_spark.index.positions import build_positions
    from neural_search_spark.query.bm25 import BM25Index

    d = str(tmp_path_factory.mktemp("ividx") / "idx")
    IndexBuilder(spark, d, n_shards=8, block_size=512).build(transcripts_df)
    build_positions(spark, d, transcripts_df)
    return BM25Index(spark, d)


def _pos(tokens):
    out = {}
    for i, t in enumerate(tokens):
        out.setdefault(t, []).append(i)
    return {t: np.asarray(p, dtype=np.int64) for t, p in out.items()}


def _brute_minimal(rule, tokens):
    """Reference implementation straight from the definition: minimal
    windows = windows containing a match with no matching proper
    sub-window (max_gaps=-1 rules only)."""

    def M(rule, s, e):
        if isinstance(rule, IMatch):
            pm = _pos(tokens)
            subs = [
                [p for p in pm.get(t, []) if s <= p <= e] for t in rule.terms
            ]
            if any(not x for x in subs):
                return False
            if not rule.ordered:
                return True
            prev = -1
            for ps in subs:
                nxt = [p for p in ps if p > prev]
                if not nxt:
                    return False
                prev = min(nxt)
            return True
        if isinstance(rule, IAllOf):
            assert not rule.ordered, "brute force covers unordered all_of"
            return all(M(r, s, e) for r in rule.sources)
        return any(M(r, s, e) for r in rule.sources)

    n = len(tokens)
    wins = [(s, e) for s in range(n) for e in range(s, n) if M(rule, s, e)]
    return sorted(
        w
        for w in wins
        if not any(
            w2 != w and w2[0] >= w[0] and w2[1] <= w[1] for w2 in wins
        )
    )


class TestEnumeration:
    RULES = [
        IMatch(("a", "b"), ordered=True),
        IMatch(("a", "b"), ordered=False),
        IMatch(("a", "b", "c"), ordered=True),
        IMatch(("a", "b", "c"), ordered=False),
        IAnyOf((IMatch(("a",)), IMatch(("b", "c"), ordered=True))),
        IAllOf(
            (IMatch(("a",)), IMatch(("b",)), IMatch(("c",))), ordered=False
        ),
        IMatch(("a", "a"), ordered=True),  # repeated term
    ]

    def test_property_matches_brute_force(self):
        rng = random.Random(7)
        for _ in range(300):
            toks = [rng.choice("abcd") for _ in range(rng.randint(1, 14))]
            pm = _pos(toks)
            for rule in self.RULES:
                got = sorted(
                    (s, e) for s, e, _g in enumerate_intervals(rule, pm)
                )
                assert got == _brute_minimal(rule, toks), (toks, rule)

    def test_gaps_and_max_gaps(self):
        pm = _pos("a x x b".split())
        assert enumerate_intervals(
            IMatch(("a", "b"), ordered=True), pm
        ) == [(0, 3, 2)]
        assert (
            enumerate_intervals(
                IMatch(("a", "b"), ordered=True, max_gaps=1), pm
            )
            == []
        )
        assert enumerate_intervals(
            IMatch(("a", "b"), ordered=True, max_gaps=2), pm
        ) == [(0, 3, 2)]

    def test_minimality_across_union(self):
        # any_of re-minimizes: the 2-term interval [0,1] absorbs into
        # the single positions it contains
        pm = _pos("a b".split())
        got = enumerate_intervals(
            IAnyOf((IMatch(("a", "b"), ordered=True), IMatch(("a",)))), pm
        )
        assert got == [(0, 0, 0)]

    def test_filters(self):
        pm = _pos("a b c a c".split())
        contain = IMatch(
            ("a", "c"), ordered=True, ifilter=("containing", IMatch(("b",)))
        )
        assert [(s, e) for s, e, _ in enumerate_intervals(contain, pm)] == [
            (0, 2)
        ]
        not_contain = IMatch(
            ("a", "c"),
            ordered=True,
            ifilter=("not_containing", IMatch(("b",))),
        )
        assert [
            (s, e) for s, e, _ in enumerate_intervals(not_contain, pm)
        ] == [(3, 4)]
        before = IMatch(("a",), ifilter=("before", IMatch(("b",))))
        assert [(s, e) for s, e, _ in enumerate_intervals(before, pm)] == [
            (0, 0)
        ]
        after = IMatch(("a",), ifilter=("after", IMatch(("b",))))
        assert [(s, e) for s, e, _ in enumerate_intervals(after, pm)] == [
            (3, 3)
        ]
        nov = IMatch(
            ("c",),
            ifilter=(
                "not_overlapping",
                IMatch(("b", "c"), ordered=True, max_gaps=0),
            ),
        )
        assert [(s, e) for s, e, _ in enumerate_intervals(nov, pm)] == [
            (4, 4)
        ]

    def test_unexpanded_prefix_raises(self):
        with pytest.raises(ValueError, match="unexpanded"):
            enumerate_intervals(IExpand("prefix", "me"), {})


class TestParser:
    def test_shapes(self):
        r = rule_from_json(
            {
                "all_of": {
                    "ordered": True,
                    "max_gaps": 2,
                    "intervals": [
                        {"match": {"query": "Merge"}},
                        {"prefix": {"value": "da"}},
                    ],
                    "filter": {"not_containing": {"match": {"query": "x"}}},
                }
            }
        )
        assert isinstance(r, IAllOf) and r.ordered and r.max_gaps == 2
        assert r.sources[0].terms == ("merge",)  # analyzed
        assert isinstance(r.sources[1], IExpand)
        assert r.ifilter[0] == "not_containing"
        with pytest.raises(ValueError, match="unknown intervals rule"):
            rule_from_json({"fuzzy": {"value": "x"}})
        with pytest.raises(ValueError, match="unknown intervals filter"):
            rule_from_json(
                {"match": {"query": "a", "filter": {"sideways": {}}}}
            )


class TestServing:
    def test_ordered_maxgaps0_equals_phrase(self, pos_index):
        from neural_search_spark.query.phrase import phrase_topk

        iv = intervals_topk(
            pos_index,
            {"match": {"query": "tool call", "ordered": True, "max_gaps": 0}},
            k=20,
        ).toPandas()
        ph = phrase_topk(pos_index, "tool call", k=20, mode="driver").toPandas()
        assert list(iv.doc_id) == list(ph.doc_id)
        assert np.allclose(iv.score, ph.score, rtol=1e-6)
        assert len(iv) > 0

    def test_driver_distributed_parity(self, pos_index):
        q = {"match": {"query": "tool call", "ordered": True}}
        d1 = intervals_topk(pos_index, q, k=15, mode="driver").toPandas()
        d2 = intervals_topk(pos_index, q, k=15, mode="distributed").toPandas()
        assert list(d1.doc_id) == list(d2.doc_id)
        assert np.allclose(d1.score, d2.score, rtol=1e-6)
        assert len(d1) > 0

    def test_prefix_expansion_in_tree(self, pos_index):
        got = intervals_topk(
            pos_index,
            {
                "all_of": {
                    "ordered": True,
                    "max_gaps": 3,
                    "intervals": [
                        {"match": {"query": "tool"}},
                        {"prefix": {"value": "ca"}},
                    ],
                }
            },
            k=10,
        )
        assert got.count() > 0

    def test_empty_expansion_empty_result(self, pos_index):
        got = intervals_topk(
            pos_index, {"prefix": {"value": "zzzzqq"}}, k=5
        )
        assert got.count() == 0

    def test_batch_matches_per_query(self, pos_index):
        from neural_search_spark.query.intervals import intervals_topk_batch

        rules = {
            "ord": {
                "match": {"query": "tool call", "ordered": True,
                          "max_gaps": 1}
            },
            "any": {
                "any_of": {
                    "intervals": [
                        {"match": {"query": "merge"}},
                        {"match": {"query": "call"}},
                    ]
                }
            },
            "gone": {"prefix": {"value": "zzzzqq"}},
        }
        rows = intervals_topk_batch(pos_index, list(rules.items()), k=10)
        by_q: dict[str, list] = {}
        for r in rows.collect():
            by_q.setdefault(r["query_id"], []).append(r)
        assert "gone" not in by_q  # empty expansion → no rows
        hits = 0
        for qid in ("ord", "any"):
            exp = intervals_topk(pos_index, rules[qid], k=10).collect()
            got = sorted(by_q.get(qid, []), key=lambda r: r["rank"])
            assert [(r["doc_id"], r["rank"]) for r in got] == [
                (r["doc_id"], r["rank"]) for r in exp
            ]
            for a, b in zip(got, exp):
                assert a["score"] == pytest.approx(b["score"], rel=1e-6)
            hits += len(got)
        assert hits > 0

    def test_engine_json_surface(self, spark, transcripts_df, pos_index):
        from neural_search_spark.index.build import doc_id_col

        eng = Engine(
            spark,
            corpus=transcripts_df.withColumn("doc_id", doc_id_col()),
            bm25_index=pos_index,
        )
        spec = spec_from_json(
            {
                "intervals": {
                    "text": {
                        "any_of": {
                            "intervals": [
                                {"match": {"query": "tool"}},
                                {"match": {"query": "call"}},
                            ]
                        }
                    }
                }
            }
        )
        out = eng.search(spec, k=5).toPandas()
        assert len(out) == 5 and list(out["rank"]) == [1, 2, 3, 4, 5]
        clause = spec.clause
        assert isinstance(clause, IntervalClause)
        assert clause.scoring_terms() == {"tool", "call"}

"""Rank evaluation API (host `_rank_eval`): precision/recall@k, MRR,
DCG/NDCG, ERR — Catalyst metric math checked against a brute-force
Python oracle over the engine's own ranked hits."""

import math

import pytest

from neural_search_spark.engine import Engine
from neural_search_spark.index.build import IndexBuilder
from neural_search_spark.query.bm25 import BM25Index
from neural_search_spark.query.rank_eval import metric_k, ratings_frame


@pytest.fixture(scope="module")
def re_setup(spark, transcripts_df, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("rankeval") / "idx")
    IndexBuilder(spark, d, n_shards=4, block_size=64).build(transcripts_df)
    eng = Engine(spark, corpus=transcripts_df, bm25_index=BM25Index(spark, d))
    return eng


def _requests(eng, k=10):
    """Three rated match requests. Ratings are derived
    deterministically from each request's own top hits (some relevant,
    some irrelevant, some unrated + one rated doc the query misses) so
    every metric exercises rated hits, unrated hits, and unretrieved
    relevant docs."""
    reqs = []
    for i, text in enumerate(
        ["tool call error", "the pipeline", "search index"]
    ):
        qid = f"q{i}"
        hits = [
            r.doc_id
            for r in eng.search(
                {"match": {"query_text": text}}, k=k
            ).collect()
        ]
        ratings = []
        for j, d in enumerate(hits):
            if j % 3 == 0:
                ratings.append([d, 3 - (j % 4)])   # rated 3..0
            elif j % 3 == 1:
                ratings.append([d, 0])             # rated irrelevant
            # j % 3 == 2 → unrated
        ratings.append([10**15 + i, 2])  # relevant but never retrieved
        reqs.append(
            {
                "id": qid,
                "request": {"match": {"query_text": text}},
                "ratings": ratings,
            }
        )
    return reqs


def _oracle(eng, reqs, metric, k):
    """Brute-force per-request metric."""
    ((name, opts),) = metric.items()
    opts = dict(opts or {})
    thr = int(opts.get("relevant_rating_threshold", 1))
    out = {}
    for req in reqs:
        rmap = {int(d): int(g) for d, g in req["ratings"]}
        rows = eng.search(req["request"], k=k).collect()
        top = [int(r.doc_id) for r in sorted(rows, key=lambda r: r.rank)][:k]
        rated = [rmap.get(d) for d in top]
        unrated = sum(1 for g in rated if g is None)
        if name == "precision":
            rel = sum(1 for g in rated if g is not None and g >= thr)
            den = (
                sum(1 for g in rated if g is not None)
                if opts.get("ignore_unlabeled")
                else len(top)
            )
            score = rel / den if den else 0.0
        elif name == "recall":
            rel = sum(1 for g in rated if g is not None and g >= thr)
            tot = sum(1 for g in rmap.values() if g >= thr)
            score = rel / tot if tot else 0.0
        elif name == "mean_reciprocal_rank":
            score = 0.0
            for i, g in enumerate(rated, 1):
                if g is not None and g >= thr:
                    score = 1.0 / i
                    break
        elif name == "dcg":
            score = sum(
                (2 ** (g or 0) - 1) / math.log2(i + 1)
                for i, g in enumerate(rated, 1)
            )
            if opts.get("normalize"):
                ideal = sorted(rmap.values(), reverse=True)[:k]
                idcg = sum(
                    (2**g - 1) / math.log2(i + 1)
                    for i, g in enumerate(ideal, 1)
                )
                score = score / idcg if idcg > 0 else 0.0
        else:  # expected_reciprocal_rank
            m = int(opts["maximum_relevance"])
            p, score = 1.0, 0.0
            for i, g in enumerate(rated, 1):
                r = (2 ** (g or 0) - 1) / 2**m
                score += p * r / i
                p *= 1 - r
        out[req["id"]] = (score, unrated)
    return out


@pytest.mark.parametrize(
    "metric",
    [
        {"precision": {"k": 10}},
        {"precision": {"k": 10, "ignore_unlabeled": True}},
        {"precision": {"k": 5, "relevant_rating_threshold": 2}},
        {"recall": {"k": 10}},
        {"recall": {"k": 10, "relevant_rating_threshold": 3}},
        {"mean_reciprocal_rank": {"k": 10}},
        {"mean_reciprocal_rank": {"k": 10, "relevant_rating_threshold": 3}},
        {"dcg": {"k": 10}},
        {"dcg": {"k": 10, "normalize": True}},
        {"expected_reciprocal_rank": {"k": 10, "maximum_relevance": 3}},
    ],
    ids=lambda m: "_".join(
        [next(iter(m))]
        + [f"{a}={b}" for a, b in next(iter(m.values())).items()]
    ),
)
def test_metrics_match_oracle(re_setup, metric):
    eng = re_setup
    reqs = _requests(eng)
    k = metric_k(metric)
    got = {
        r.query_id: (r.metric_score, r.unrated_docs)
        for r in eng.rank_eval(reqs, metric).collect()
    }
    exp = _oracle(eng, reqs, metric, k)
    assert set(got) == set(exp)
    for qid in exp:
        assert got[qid][0] == pytest.approx(exp[qid][0], abs=1e-9), (
            qid,
            metric,
        )
        assert got[qid][1] == exp[qid][1]


def test_no_hit_request_scores_zero(re_setup):
    eng = re_setup
    reqs = [
        {
            "id": "miss",
            "request": {"match": {"query_text": "zzqx_nonexistent_token"}},
            "ratings": [[1, 2]],
        }
    ]
    rows = eng.rank_eval(reqs, {"precision": {"k": 10}}).collect()
    assert len(rows) == 1
    assert rows[0].query_id == "miss"
    assert rows[0].metric_score == 0.0
    assert rows[0].unrated_docs == 0


def test_per_request_size_tightens_window(re_setup):
    eng = re_setup
    base = _requests(eng)[0]
    sized = {
        "id": base["id"],
        "request": {**base["request"], "size": 3},
        "ratings": base["ratings"],
    }
    got = eng.rank_eval([sized], {"precision": {"k": 10}}).collect()[0]
    exp = _oracle(eng, [base], {"precision": {"k": 3}}, 3)[base["id"]]
    assert got.metric_score == pytest.approx(exp[0])


def test_err_cascade_and_max_relevance_guard(re_setup):
    # rank-1 doc at g == M: R = (2^M−1)/2^M, and every later rank is
    # damped by exactly (1−R); a rating above M is rejected up front
    eng = re_setup
    hit = eng.search({"match": {"query_text": "tool call error"}}, k=5)
    top = [int(r.doc_id) for r in hit.orderBy("rank").collect()]
    reqs = [
        {
            "id": "casc",
            "request": {"match": {"query_text": "tool call error"}},
            "ratings": [[top[0], 3], [top[1], 3]],
        }
    ]
    got = eng.rank_eval(
        reqs, {"expected_reciprocal_rank": {"k": 5, "maximum_relevance": 3}}
    ).collect()[0]
    r = (2**3 - 1) / 2**3  # 0.875
    assert got.metric_score == pytest.approx(r + (1 - r) * r / 2)
    with pytest.raises(ValueError, match="exceeds"):
        eng.rank_eval(
            reqs,
            {"expected_reciprocal_rank": {"k": 5, "maximum_relevance": 2}},
        )


def test_validation_errors(spark, re_setup):
    eng = re_setup
    with pytest.raises(ValueError, match="at least one"):
        eng.rank_eval([], {"precision": {}})
    with pytest.raises(ValueError, match="one-key dict"):
        eng.rank_eval(
            [{"id": "a", "request": {"match": {"query_text": "x"}}}],
            {"precision": {}, "recall": {}},
        )
    with pytest.raises(ValueError, match="unknown metric"):
        metric_k({"auc": {}})
    with pytest.raises(ValueError, match="maximum_relevance"):
        metric_k({"expected_reciprocal_rank": {"k": 5}})
    with pytest.raises(ValueError, match="duplicate request id"):
        eng.rank_eval(
            [
                {"id": "a", "request": {"match": {"query_text": "x"}},
                 "ratings": []},
                {"id": "a", "request": {"match": {"query_text": "y"}},
                 "ratings": []},
            ],
            {"precision": {}},
        )
    with pytest.raises(ValueError, match="rates doc"):
        ratings_frame(
            spark, [{"id": "a", "ratings": [[1, 2], [1, 3]]}]
        )


def test_batch_routes_through_msearch(re_setup):
    # plain match requests must share the batched kernel: the per-query
    # scores from rank_eval's hit frame equal individual search() runs
    eng = re_setup
    reqs = _requests(eng)
    specs = {r["id"]: r["request"] for r in reqs}
    batched = eng.msearch(specs, k=10)
    for r in reqs:
        solo = {
            x.doc_id: x.rank
            for x in eng.search(r["request"], k=10).collect()
        }
        got = {
            x.doc_id: x.rank
            for x in batched.filter(
                batched.query_id == r["id"]
            ).collect()
        }
        assert got == solo

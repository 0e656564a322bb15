"""terms_set (CoveringQuery) and rank_feature (FeatureField) leaf queries
over corpus columns."""

import math

import pytest
from pyspark.sql import functions as F

from neural_search_spark.engine import Engine, spec_from_json
from neural_search_spark.index.build import doc_id_col
from neural_search_spark.query.multiterm import (
    term_scored_scan,
    terms_set_scored_scan,
)
from neural_search_spark.query.neural import QuerySpec, execute
from neural_search_spark.query.rank_feature import rank_feature_scored


@pytest.fixture(scope="module")
def corpus(spark, transcripts_df):
    # a per-doc required-match column (0..3, deterministic) and a
    # positive numeric feature (dl-ish), both riding the same scan
    return (
        transcripts_df.withColumn("doc_id", doc_id_col())
        .withColumn("required", F.pmod(F.col("turn_idx"), F.lit(4)))
        .withColumn(
            "pagerank",
            (F.length("text") % 97).cast("double") / 10.0,
        )
        .cache()
    )


VALUES = ["the", "tool", "model"]


def _matched_counts(corpus):
    toks = corpus.select(
        "doc_id",
        "required",
        F.split(F.lower("text"), r"[^a-z0-9]+").alias("raw"),
    )
    flags = [
        F.when(F.array_contains("raw", v), 1).otherwise(0).alias(f"m{i}")
        for i, v in enumerate(VALUES)
    ]
    return toks.select("doc_id", "required", *flags).withColumn(
        "matched", sum(F.col(f"m{i}") for i in range(len(VALUES)))
    )


class TestTermsSet:
    def test_coverage_per_doc(self, corpus):
        got = {
            r["doc_id"]
            for r in terms_set_scored_scan(
                corpus, VALUES, "required"
            ).collect()
        }
        exp_rows = _matched_counts(corpus).collect()
        exp = {
            r["doc_id"]
            for r in exp_rows
            if r["matched"] >= max(1, r["required"])
        }
        assert got == exp and len(got) > 0
        # the per-doc gate actually bites: some docs match ≥1 clause but
        # fail their own msm, and some pass
        partial = {
            r["doc_id"]
            for r in exp_rows
            if 0 < r["matched"] < max(1, r["required"])
        }
        assert partial and partial.isdisjoint(got)

    def test_score_is_sum_of_matched_term_scores(self, corpus):
        got = {
            r["doc_id"]: r["score"]
            for r in terms_set_scored_scan(
                corpus, VALUES, "required"
            ).collect()
        }
        total: dict[int, float] = {}
        for v in VALUES:
            for r in term_scored_scan(corpus, v).collect():
                total[r["doc_id"]] = total.get(r["doc_id"], 0.0) + r["score"]
        for d, s in got.items():
            assert s == pytest.approx(total[d], rel=1e-9)

    def test_null_msm_means_one(self, corpus):
        nulled = corpus.withColumn(
            "required",
            F.when(F.col("required") == 0, F.lit(None)).otherwise(
                F.col("required")
            ),
        )
        got = {
            r["doc_id"]
            for r in terms_set_scored_scan(
                nulled, VALUES, "required"
            ).collect()
        }
        exp = {
            r["doc_id"]
            for r in _matched_counts(corpus).collect()
            if r["matched"] >= max(1, r["required"])
        }
        assert got == exp  # null rows had required=0 → same max(1,·) gate

    def test_msm_above_clause_count_unmatchable(self, corpus):
        fixed = corpus.withColumn("required", F.lit(99))
        assert (
            terms_set_scored_scan(fixed, VALUES, "required").count() == 0
        )

    def test_engine_json_host_shape(self, spark, corpus):
        eng = Engine(spark, corpus=corpus)
        spec = spec_from_json(
            {
                "terms_set": {
                    "text": {
                        "terms": VALUES,
                        "minimum_should_match_field": "required",
                    }
                }
            }
        )
        assert isinstance(spec, QuerySpec)
        assert spec.query_type == "terms_set"
        assert spec.values == VALUES
        assert spec.minimum_should_match_field == "required"
        out = eng.search(spec, k=5).collect()
        assert 0 < len(out) <= 5
        assert out[0]["score"] >= out[-1]["score"]


class TestRankFeature:
    def _features(self, corpus):
        return {
            r["doc_id"]: r["pagerank"]
            for r in corpus.select("doc_id", "pagerank").collect()
            if r["pagerank"] is not None and r["pagerank"] > 0
        }

    def test_saturation_explicit_pivot(self, corpus):
        feats = self._features(corpus)
        got = {
            r["doc_id"]: r["score"]
            for r in rank_feature_scored(
                corpus, "pagerank", "saturation", pivot=3.0, boost=2.0
            ).collect()
        }
        assert set(got) == set(feats)  # zero-feature docs never match
        for d, s in got.items():
            assert s == pytest.approx(
                2.0 * feats[d] / (feats[d] + 3.0), rel=1e-12
            )

    def test_saturation_default_pivot_is_geomean(self, corpus):
        feats = self._features(corpus)
        pivot = math.exp(
            sum(math.log(v) for v in feats.values()) / len(feats)
        )
        got = dict(
            rank_feature_scored(corpus, "pagerank", "saturation")
            .collect()
        )
        d, s = next(iter(got.items()))
        assert s == pytest.approx(feats[d] / (feats[d] + pivot), rel=1e-9)

    def test_log_sigmoid_linear(self, corpus):
        feats = self._features(corpus)
        log = dict(
            rank_feature_scored(
                corpus, "pagerank", "log", scaling_factor=2.0
            ).collect()
        )
        sig = dict(
            rank_feature_scored(
                corpus, "pagerank", "sigmoid", pivot=4.0, exponent=0.5
            ).collect()
        )
        lin = dict(
            rank_feature_scored(corpus, "pagerank", "linear").collect()
        )
        for d, v in feats.items():
            assert log[d] == pytest.approx(math.log(2.0 + v), rel=1e-12)
            assert sig[d] == pytest.approx(
                v**0.5 / (v**0.5 + 4.0**0.5), rel=1e-12
            )
            assert lin[d] == pytest.approx(v, rel=1e-12)

    def test_validation(self, corpus):
        with pytest.raises(ValueError, match="scaling_factor"):
            rank_feature_scored(corpus, "pagerank", "log")
        with pytest.raises(ValueError, match=">= 1"):
            rank_feature_scored(
                corpus, "pagerank", "log", scaling_factor=0.5
            )
        with pytest.raises(ValueError, match="pivot and exponent"):
            rank_feature_scored(corpus, "pagerank", "sigmoid", pivot=2.0)
        with pytest.raises(ValueError, match="one of"):
            rank_feature_scored(corpus, "pagerank", "gauss")

    def test_engine_json_host_shape_and_bool_should(self, spark, corpus):
        eng = Engine(spark, corpus=corpus)
        spec = spec_from_json(
            {"rank_feature": {"field": "pagerank", "saturation": {"pivot": 8}}}
        )
        assert spec.rf_function == "saturation" and spec.pivot == 8.0
        out = eng.search(spec, k=5).collect()
        assert len(out) == 5
        # composes as a bool SHOULD signal next to a match clause
        boolspec = spec_from_json(
            {
                "bool": {
                    "must": [{"match": {"query_text": "tool call"}}],
                    "should": [
                        {
                            "rank_feature": {
                                "field": "pagerank",
                                "log": {"scaling_factor": 4},
                            }
                        }
                    ],
                }
            }
        )
        combined = eng.search(boolspec, k=10).collect()
        must_only = eng.search(
            spec_from_json(
                {"bool": {"must": [{"match": {"query_text": "tool call"}}]}}
            ),
            k=10,
        ).collect()
        assert {r["doc_id"] for r in combined}  # non-empty
        # the signal strictly raises scores of matched docs
        base = {r["doc_id"]: r["score"] for r in must_only}
        for r in combined:
            if r["doc_id"] in base:
                assert r["score"] > base[r["doc_id"]]

    def test_execute_dispatch(self, corpus):
        out = execute(
            QuerySpec(
                query_type="rank_feature",
                field="pagerank",
                rf_function="linear",
            ),
            corpus,
        )
        assert out.columns == ["doc_id", "score"]

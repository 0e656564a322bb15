"""Search-time aggregations (query/aggs.py): every agg family checked
against a pandas oracle computed from the same scoped frame; Engine
integration checked for scoping semantics (raw matched set, hybrid
pre-normalization union, post_filter gating)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from neural_search_spark.engine import Engine, HybridSpec
from neural_search_spark.index.build import doc_id_col
from neural_search_spark.query.aggs import compute_aggs
from neural_search_spark.query.neural import QuerySpec


@pytest.fixture(scope="module")
def scoped(spark, transcripts_df):
    # deterministic "matched set with scores": every turn, score from a
    # stable hash; plus a numeric and a timestamp column for metrics
    df = (
        transcripts_df.withColumn("doc_id", doc_id_col())
        .withColumn("n_chars", F.length("text"))
        .withColumn(
            "score", (F.abs(F.col("doc_id")) % 1000).cast("double") / 100.0
        )
        .withColumn(
            "ts",
            F.expr(
                "timestamp'2026-01-01 00:00:00' + make_interval("
                "0, 0, 0, 0, cast(abs(doc_id) % 72 as int), 0, 0)"
            ),
        )
    )
    return df


@pytest.fixture(scope="module")
def scoped_pd(scoped):
    return scoped.toPandas()


def test_metric_aggs_global(scoped, scoped_pd):
    out = compute_aggs(
        scoped,
        {
            "mean_len": {"avg": {"field": "n_chars"}},
            "tot": {"sum": {"field": "n_chars"}},
            "lo": {"min": {"field": "n_chars"}},
            "hi": {"max": {"field": "n_chars"}},
            "n": {"value_count": {"field": "text"}},
            "st": {"stats": {"field": "n_chars"}},
            "est": {"extended_stats": {"field": "n_chars"}},
            "card": {"cardinality": {"field": "role"}},
        },
    )
    r = {k: v.toPandas() for k, v in out.items()}
    col = scoped_pd["n_chars"]
    assert np.isclose(r["mean_len"]["mean_len"][0], col.mean())
    assert r["tot"]["tot"][0] == col.sum()
    assert r["lo"]["lo"][0] == col.min()
    assert r["hi"]["hi"][0] == col.max()
    assert r["n"]["n"][0] == len(scoped_pd)
    assert r["st"]["st_count"][0] == len(col)
    assert np.isclose(r["st"]["st_avg"][0], col.mean())
    assert np.isclose(r["est"]["est_variance"][0], col.var(ddof=0))
    assert np.isclose(
        r["est"]["est_sum_of_squares"][0], (col.astype(float) ** 2).sum()
    )
    assert r["card"]["card"][0] == scoped_pd["role"].nunique()


def test_percentiles_and_ranks(scoped, scoped_pd):
    out = compute_aggs(
        scoped,
        {
            "pct": {"percentiles": {"field": "n_chars",
                                    "percents": [50, 95]}},
            "pr": {"percentile_ranks": {"field": "n_chars",
                                        "values": [100]}},
        },
    )
    pct = out["pct"].toPandas()
    col = scoped_pd["n_chars"].astype(float)
    assert np.isclose(
        pct["pct_p50"][0], np.percentile(col, 50, method="linear")
    )
    assert np.isclose(
        pct["pct_p95"][0], np.percentile(col, 95, method="linear")
    )
    pr = out["pr"].toPandas()
    assert np.isclose(pr["pr_rank_100"][0], (col <= 100).mean() * 100.0)


def test_terms_with_metric_subagg_one_groupby(scoped, scoped_pd):
    out = compute_aggs(
        scoped,
        {
            "by_role": {
                "terms": {"field": "role", "size": 10},
                "aggs": {"mean_len": {"avg": {"field": "n_chars"}}},
            }
        },
    )
    got = out["by_role"].toPandas()
    exp = (
        scoped_pd.groupby("role")
        .agg(doc_count=("role", "size"), mean_len=("n_chars", "mean"))
        .reset_index()
        .sort_values(["doc_count", "role"], ascending=[False, True])
        .reset_index(drop=True)
    )
    assert list(got["by_role_key"]) == list(exp["role"])
    assert list(got["doc_count"]) == list(exp["doc_count"])
    assert np.allclose(got["mean_len"], exp["mean_len"])
    # the bucket + its metrics must be ONE shuffle: a single Aggregate
    # over the key, no join in the plan
    plan = out["by_role"]._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" not in plan


def test_terms_order_size_min_doc_count(scoped, scoped_pd):
    out = compute_aggs(
        scoped,
        {
            "top2": {"terms": {"field": "role", "size": 2,
                               "order": {"_count": "asc"}}},
            "rare": {"terms": {"field": "role", "min_doc_count": 10**9}},
        },
    )
    vc = scoped_pd["role"].value_counts()
    got = out["top2"].toPandas()
    exp_keys = list(vc.sort_values(ascending=True).index[:2])
    # ties broken key-asc after count-asc
    assert len(got) == 2
    assert got["doc_count"].is_monotonic_increasing
    assert set(got["top2_key"]) <= set(vc.index)
    assert list(got["top2_key"]) == sorted(
        exp_keys, key=lambda k: (vc[k], k)
    )
    assert out["rare"].count() == 0


def test_histogram_and_date_histogram(scoped, scoped_pd):
    out = compute_aggs(
        scoped,
        {
            "h": {"histogram": {"field": "n_chars", "interval": 50}},
            "dh": {"date_histogram": {"field": "ts",
                                      "fixed_interval": "1d"}},
            "dm": {"date_histogram": {"field": "ts",
                                      "calendar_interval": "day"}},
        },
    )
    h = out["h"].toPandas()
    exp = (
        (scoped_pd["n_chars"] // 50 * 50)
        .value_counts()
        .sort_index()
    )
    assert list(h["h_key"]) == list(exp.index.astype(float))
    assert list(h["doc_count"]) == list(exp.values)
    dh = out["dh"].toPandas()
    exp_dh = (
        scoped_pd["ts"].dt.floor("1D").value_counts().sort_index()
    )
    assert list(dh["dh_key"]) == list(exp_dh.index)
    assert list(dh["doc_count"]) == list(exp_dh.values)
    dm = out["dm"].toPandas()
    assert list(dm["dm_key"]) == list(exp_dh.index)


def test_range_filters_missing(scoped, scoped_pd):
    nullable = scoped.withColumn(
        "maybe", F.when(F.col("turn_idx") % 3 == 0, F.col("role"))
    )
    npd = nullable.toPandas()
    out = compute_aggs(
        nullable,
        {
            "r": {
                "range": {
                    "field": "n_chars",
                    "ranges": [
                        {"to": 50, "key": "short"},
                        {"from": 50, "to": 150, "key": "mid"},
                        {"from": 150, "key": "long"},
                    ],
                },
                "aggs": {"m": {"max": {"field": "n_chars"}}},
            },
            "f": {
                "filters": {
                    "filters": {
                        "user": "role = 'user'",
                        "asst": "role = 'assistant'",
                    }
                }
            },
            "miss": {"missing": {"field": "maybe"}},
        },
    )
    r = out["r"].toPandas().set_index("r_key")
    assert r.loc["short", "doc_count"] == (npd["n_chars"] < 50).sum()
    assert r.loc["mid", "doc_count"] == (
        (npd["n_chars"] >= 50) & (npd["n_chars"] < 150)
    ).sum()
    assert r.loc["long", "doc_count"] == (npd["n_chars"] >= 150).sum()
    assert r.loc["long", "m"] == npd["n_chars"].max()
    f = out["f"].toPandas().set_index("f_key")
    assert f.loc["user", "doc_count"] == (npd["role"] == "user").sum()
    assert f.loc["asst", "doc_count"] == (npd["role"] == "assistant").sum()
    assert out["miss"].toPandas()["doc_count"][0] == npd["maybe"].isna().sum()


def test_adjacency_matrix(scoped, scoped_pd):
    out = compute_aggs(
        scoped,
        {
            "adj": {
                "adjacency_matrix": {
                    "filters": {
                        "long": "n_chars >= 100",
                        "user": "role = 'user'",
                    }
                }
            }
        },
    )
    a = out["adj"].toPandas().set_index("adj_key")
    long_m = scoped_pd["n_chars"] >= 100
    user_m = scoped_pd["role"] == "user"
    assert a.loc["long", "doc_count"] == long_m.sum()
    assert a.loc["user", "doc_count"] == user_m.sum()
    assert a.loc["long&user", "doc_count"] == (long_m & user_m).sum()


def test_nested_terms_date_histogram_two_groupbys(scoped, scoped_pd):
    out = compute_aggs(
        scoped,
        {
            "by_role": {
                "terms": {"field": "role", "size": 3},
                "aggs": {
                    "per_day": {
                        "date_histogram": {"field": "ts",
                                           "fixed_interval": "1d"},
                        "aggs": {"s": {"sum": {"field": "n_chars"}}},
                    }
                },
            }
        },
    )
    top = out["by_role"].toPandas()
    nested = out["by_role>per_day"].toPandas()
    top_roles = set(top["by_role_key"])
    sub = scoped_pd[scoped_pd["role"].isin(top_roles)].copy()
    sub["day"] = sub["ts"].dt.floor("1D")
    exp = (
        sub.groupby(["role", "day"])
        .agg(doc_count=("role", "size"), s=("n_chars", "sum"))
        .reset_index()
    )
    m = nested.merge(
        exp,
        left_on=["by_role_key", "per_day_key"],
        right_on=["role", "day"],
        suffixes=("", "_exp"),
    )
    assert len(m) == len(exp) == len(nested)
    assert (m["doc_count"] == m["doc_count_exp"]).all()
    assert (m["s"] == m["s_exp"]).all()


def test_top_hits_subagg(scoped, scoped_pd):
    out = compute_aggs(
        scoped,
        {
            "by_role": {
                "terms": {"field": "role", "size": 10},
                "aggs": {
                    "best": {"top_hits": {"size": 2,
                                          "_source": ["doc_id", "score"]}}
                },
            }
        },
    )
    th = out["by_role>best"].toPandas()
    for role, grp in scoped_pd.groupby("role"):
        exp = grp.sort_values(
            ["score", "doc_id"], ascending=[False, True]
        ).head(2)
        got = th[th["by_role_key"] == role].sort_values("hit_rank")
        assert list(got["doc_id"]) == list(exp["doc_id"])


def test_pipeline_aggs(scoped, scoped_pd):
    out = compute_aggs(
        scoped,
        {
            "per_day": {
                "date_histogram": {"field": "ts", "fixed_interval": "1d"},
                "aggs": {
                    "s": {"sum": {"field": "n_chars"}},
                    "cum": {"cumulative_sum": {"buckets_path": "s"}},
                    "dx": {"derivative": {"buckets_path": "s"}},
                    "ratio": {
                        "bucket_script": {
                            "script": "x / doc_count",
                            "params": {"x": "s"},
                        }
                    },
                    "avg_s": {"avg_bucket": {"buckets_path": "s"}},
                    "stats_s": {"stats_bucket": {"buckets_path": "s"}},
                },
            }
        },
    )
    b = out["per_day"].toPandas().sort_values("per_day_key")
    exp = (
        scoped_pd.assign(day=scoped_pd["ts"].dt.floor("1D"))
        .groupby("day")["n_chars"]
        .sum()
        .sort_index()
    )
    assert np.allclose(b["cum"], exp.cumsum().values)
    assert np.isnan(b["dx"].iloc[0])
    assert np.allclose(b["dx"].iloc[1:], np.diff(exp.values))
    assert np.allclose(b["ratio"], b["s"] / b["doc_count"])
    assert np.isclose(
        out["per_day>avg_s"].toPandas()["value"][0], exp.mean()
    )
    st = out["per_day>stats_s"].toPandas()
    assert st["count"][0] == len(exp)
    assert st["sum"][0] == exp.sum()


def test_bucket_selector_and_sort(scoped, scoped_pd):
    out = compute_aggs(
        scoped,
        {
            "by_role": {
                "terms": {"field": "role", "size": 10},
                "aggs": {
                    "keep": {
                        "bucket_selector": {
                            "script": "c >= 10",
                            "params": {"c": "doc_count"},
                        }
                    },
                    "srt": {
                        "bucket_sort": {
                            "sort": [{"doc_count": "asc"}],
                            "size": 2,
                        }
                    },
                },
            }
        },
    )
    got = out["by_role"].toPandas()
    vc = scoped_pd["role"].value_counts()
    surviving = vc[vc >= 10]
    assert len(got) == min(2, len(surviving))
    assert got["doc_count"].is_monotonic_increasing


def test_significant_terms_and_sampler(scoped, scoped_pd):
    fg = scoped.filter(F.col("n_chars") >= 120)
    out = compute_aggs(
        fg,
        {
            "sig": {"significant_terms": {"field": "role", "size": 5}},
            "samp": {
                "sampler": {"shard_size": 50},
                "aggs": {"m": {"avg": {"field": "n_chars"}}},
            },
        },
        full=scoped,
    )
    sig = out["sig"].toPandas()
    fg_pd = scoped_pd[scoped_pd["n_chars"] >= 120]
    for _, row in sig.iterrows():
        fgp = (fg_pd["role"] == row["sig_key"]).sum() / len(fg_pd)
        bgp = (scoped_pd["role"] == row["sig_key"]).sum() / len(scoped_pd)
        assert fgp > bgp
        assert np.isclose(row["score"], (fgp - bgp) * (fgp / bgp))
    assert out["samp"].toPandas()["doc_count"][0] == 50
    samp_exp = (
        fg_pd.sort_values(["score", "doc_id"], ascending=[False, True])
        .head(50)["n_chars"]
        .mean()
    )
    assert np.isclose(out["samp>m"].toPandas()["m"][0], samp_exp)


def test_global_agg_escapes_scope(scoped, scoped_pd):
    fg = scoped.filter(F.col("role") == "user")
    out = compute_aggs(
        fg,
        {
            "in_scope": {"value_count": {"field": "doc_id"}},
            "everything": {
                "global": {},
                "aggs": {"n": {"value_count": {"field": "doc_id"}}},
            },
        },
        full=scoped,
    )
    n_user = (scoped_pd["role"] == "user").sum()
    assert out["in_scope"].toPandas()["in_scope"][0] == n_user
    assert out["everything"].toPandas()["doc_count"][0] == len(scoped_pd)
    assert out["everything>n"].toPandas()["n"][0] == len(scoped_pd)


def test_nested_and_scripted_metric(scoped, scoped_pd):
    # array<struct> column: one nested doc per 40-char span of the text
    with_spans = scoped.withColumn(
        "spans",
        F.expr(
            "transform(sequence(0, int(floor(n_chars / 40))), "
            "i -> struct(i AS span_idx, substring(text, i * 40 + 1, 40) "
            "AS span_text))"
        ),
    )
    out = compute_aggs(
        with_spans,
        {
            "sp": {
                "nested": {"path": "spans"},
                "aggs": {"mx": {"max": {"field": "span_idx"}}},
            },
            "sm": {
                "scripted_metric": {
                    "map_script": "n_chars * 2 + turn_idx",
                    "reduce_script": "sum",
                }
            },
        },
    )
    n_nested = (scoped_pd["n_chars"] // 40 + 1).sum()
    assert out["sp"].toPandas()["doc_count"][0] == n_nested
    assert out["sp>mx"].toPandas()["mx"][0] == (
        scoped_pd["n_chars"] // 40
    ).max()
    assert out["sm"].toPandas()["sm"][0] == (
        scoped_pd["n_chars"] * 2 + scoped_pd["turn_idx"]
    ).sum()
    # shadowing struct fields are an error, not a silent pick
    shadow = scoped.withColumn(
        "bad", F.expr("array(struct(1 AS role, 2 AS x))")
    )
    with pytest.raises(ValueError, match="shadow"):
        compute_aggs(shadow, {"b": {"nested": {"path": "bad"}}})


def test_engine_search_with_aggs_scoping(spark, transcripts_df):
    docs = transcripts_df.withColumn("doc_id", doc_id_col()).withColumn(
        "n_chars", F.length("text")
    )
    eng = Engine(spark, corpus=docs)
    spec = QuerySpec(query_type="match", query_text="tool call")
    hits, out = eng.search_with_aggs(
        spec, {"by_role": {"terms": {"field": "role"}}}, k=5
    )
    assert hits.count() == 5
    # agg scope == FULL matched set, not the page
    matched = eng._full_scored(spec).toPandas()
    got = out["by_role"].toPandas()
    assert got["doc_count"].sum() == len(matched)

    # hybrid: union of raw branch matches
    hspec = HybridSpec(
        sub_queries=[
            QuerySpec(query_type="match", query_text="tool call"),
            QuerySpec(query_type="match", query_text="model"),
        ]
    )
    _, hout = eng.search_with_aggs(
        hspec, {"n": {"value_count": {"field": "doc_id"}}}, k=5
    )
    a = set(eng._full_scored(hspec.sub_queries[0]).toPandas()["doc_id"])
    b = set(eng._full_scored(hspec.sub_queries[1]).toPandas()["doc_id"])
    assert hout["n"].toPandas()["n"][0] == len(a | b)

    # match_all scope without a query
    none_hits, nout = eng.search_with_aggs(
        None, {"n": {"value_count": {"field": "doc_id"}}}
    )
    assert none_hits is None
    assert nout["n"].toPandas()["n"][0] == docs.count()


def test_weighted_avg(scoped, scoped_pd):
    out = compute_aggs(
        scoped,
        {
            "wa": {
                "weighted_avg": {
                    "value": {"field": "n_chars"},
                    "weight": {"field": "turn_idx"},
                }
            }
        },
    )
    exp = (scoped_pd["n_chars"] * scoped_pd["turn_idx"]).sum() / scoped_pd[
        "turn_idx"
    ].sum()
    assert np.isclose(out["wa"].toPandas()["wa"][0], exp)


def test_composite_paging(scoped, scoped_pd):
    spec = {
        "cmp": {
            "composite": {
                "size": 4,
                "sources": [
                    {"r": {"terms": {"field": "role"}}},
                    {"len": {"histogram": {"field": "n_chars",
                                           "interval": 100}}},
                ],
            },
            "aggs": {"mx": {"max": {"field": "n_chars"}}},
        }
    }
    exp = (
        scoped_pd.assign(len=(scoped_pd["n_chars"] // 100 * 100).astype(float))
        .groupby(["role", "len"])
        .agg(doc_count=("role", "size"), mx=("n_chars", "max"))
        .reset_index()
        .sort_values(["role", "len"])
        .reset_index(drop=True)
    )
    pages = []
    after = None
    for _ in range(20):
        s = {"cmp": {"composite": dict(spec["cmp"]["composite"]),
                     "aggs": spec["cmp"]["aggs"]}}
        if after:
            s["cmp"]["composite"]["after"] = after
        page = compute_aggs(scoped, s)["cmp"].toPandas()
        if page.empty:
            break
        pages.append(page)
        last = page.iloc[-1]
        after = {"r": last["cmp_r"], "len": last["cmp_len"]}
    got = pd.concat(pages, ignore_index=True)
    # every page except possibly the last is exactly `size` buckets
    assert all(len(p) == 4 for p in pages[:-1])
    assert len(got) == len(exp)
    assert list(got["cmp_r"]) == list(exp["role"])
    assert list(got["cmp_len"]) == list(exp["len"])
    assert list(got["doc_count"]) == list(exp["doc_count"])
    assert list(got["mx"]) == list(exp["mx"])


def test_multi_terms(scoped, scoped_pd):
    out = compute_aggs(
        scoped,
        {
            "mt": {
                "multi_terms": {
                    "terms": [{"field": "role"}, {"field": "tool"}],
                    "size": 5,
                },
                "aggs": {"mean_len": {"avg": {"field": "n_chars"}}},
            }
        },
    )
    got = out["mt"].toPandas()
    exp = (
        scoped_pd.fillna({"tool": "__null__"})
        .groupby(["role", "tool"])
        .agg(doc_count=("role", "size"), mean_len=("n_chars", "mean"))
        .reset_index()
        .sort_values(["doc_count", "role", "tool"],
                     ascending=[False, True, True])
        .head(5)
        .reset_index(drop=True)
    )
    assert list(got["doc_count"]) == list(exp["doc_count"])
    got_keys = list(
        zip(got["mt_key_role"], got["mt_key_tool"].fillna("__null__"))
    )
    assert got_keys == list(zip(exp["role"], exp["tool"]))
    assert np.allclose(got["mean_len"], exp["mean_len"])


def test_rare_terms(scoped, scoped_pd):
    vc = scoped_pd["conv_id"].value_counts()
    mdc = int(vc.min()) + 1
    out = compute_aggs(
        scoped,
        {"rt": {"rare_terms": {"field": "conv_id",
                               "max_doc_count": mdc}}},
    )
    got = out["rt"].toPandas()
    exp = vc[vc <= mdc].reset_index()
    exp.columns = ["key", "doc_count"]
    exp = exp.sort_values(["doc_count", "key"]).reset_index(drop=True)
    assert list(got["rt_key"]) == list(exp["key"])
    assert list(got["doc_count"]) == list(exp["doc_count"])
    assert got["doc_count"].max() <= mdc


def test_top_metrics(scoped, scoped_pd):
    out = compute_aggs(
        scoped,
        {
            "tm": {
                "top_metrics": {
                    "metrics": [{"field": "n_chars"}],
                    "sort": [{"score": "desc"}],
                    "size": 1,
                }
            }
        },
    )
    got = out["tm"].toPandas()
    best = scoped_pd.sort_values(
        ["score", "doc_id"], ascending=[False, True]
    ).iloc[0]
    assert len(got) == 1
    assert got["n_chars"][0] == best["n_chars"]
    assert got["score"][0] == best["score"]


def test_diversified_sampler(scoped, scoped_pd):
    out = compute_aggs(
        scoped,
        {
            "ds": {
                "diversified_sampler": {
                    "shard_size": 5,
                    "field": "role",
                    "max_docs_per_value": 2,
                },
                "aggs": {"roles": {"terms": {"field": "role"}}},
            }
        },
    )
    assert out["ds"].toPandas()["doc_count"][0] == 5
    # replicate: at most 2 per role by (score desc, doc_id asc), then
    # global top 5 by the same order
    s = scoped_pd.sort_values(["score", "doc_id"],
                              ascending=[False, True])
    capped = s.groupby("role", group_keys=False).head(2)
    pool = capped.sort_values(["score", "doc_id"],
                              ascending=[False, True]).head(5)
    exp = pool["role"].value_counts()
    got = out["ds>roles"].toPandas().set_index("roles_key")["doc_count"]
    assert got.to_dict() == exp.to_dict()
    assert (got <= 2).all()


def test_composite_after_prefilters_before_groupby(scoped):
    # the cursor predicate must sit BELOW the Aggregate in the optimized
    # plan (pre-groupBy row filter -> scan-pushable), not above it
    out = compute_aggs(
        scoped,
        {
            "c": {
                "composite": {
                    "size": 2,
                    "sources": [{"r": {"terms": {"field": "role"}}}],
                    "after": {"r": "assistant"},
                }
            }
        },
    )
    plan = out["c"]._jdf.queryExecution().optimizedPlan().toString()
    agg_pos = plan.find("Aggregate")
    filt_pos = plan.find("Filter")
    assert agg_pos != -1 and filt_pos != -1 and filt_pos > agg_pos
    got = out["c"].toPandas()
    assert list(got["c_r"]) == ["tool", "user"]


def test_histogram_min_doc_count_zero_fills_gaps(spark):
    df = spark.createDataFrame(
        [(1, 10.0, 1.0), (2, 25.0, 1.0), (3, 305.0, 1.0)],
        "doc_id long, v double, score double",
    )
    out = compute_aggs(
        df,
        {"h": {"histogram": {"field": "v", "interval": 100,
                             "min_doc_count": 0},
               "aggs": {"mx": {"max": {"field": "v"}}}}},
    )["h"].toPandas()
    assert list(out["h_key"]) == [0.0, 100.0, 200.0, 300.0]
    assert list(out["doc_count"]) == [2, 0, 0, 1]
    # empty buckets carry NULL metrics
    assert pd.isna(out["mx"][1]) and pd.isna(out["mx"][2])
    assert out["mx"][0] == 25.0 and out["mx"][3] == 305.0


def test_date_histogram_extended_bounds_and_derivative(spark):
    df = spark.createDataFrame(
        [(1, "2026-01-01 00:10:00", 1.0),
         (2, "2026-01-01 00:20:00", 1.0),
         (3, "2026-01-01 03:05:00", 1.0)],
        "doc_id long, t string, score double",
    ).withColumn("t", F.col("t").cast("timestamp"))
    out = compute_aggs(
        df,
        {"dh": {"date_histogram": {
            "field": "t", "fixed_interval": "1h", "min_doc_count": 0,
            "extended_bounds": {"min": "2026-01-01 00:00:00",
                                "max": "2026-01-01 05:00:00"}},
            "aggs": {"d": {"derivative": {"buckets_path": "_count"}}}}},
    )["dh"].toPandas()
    assert len(out) == 6  # 00..05 inclusive, hours 4-5 from the bounds
    assert list(out["doc_count"]) == [2, 0, 0, 1, 0, 0]
    # derivative over the DENSE series: first NULL, then stepwise diffs
    assert pd.isna(out["d"][0])
    assert list(out["d"][1:]) == [-2, 0, 1, -1, 0]


def test_calendar_dense_fill(scoped, scoped_pd):
    out = compute_aggs(
        scoped,
        {"dm": {"date_histogram": {"field": "ts",
                                   "calendar_interval": "hour",
                                   "min_doc_count": 0}}},
    )["dm"].toPandas()
    exp = scoped_pd["ts"].dt.floor("h").value_counts().sort_index()
    full = pd.date_range(exp.index.min(), exp.index.max(), freq="h")
    dense = exp.reindex(full, fill_value=0)
    assert list(out["dm_key"]) == list(dense.index)
    assert list(out["doc_count"]) == list(dense.values)


def test_moving_fn_and_serial_diff(spark):
    df = spark.createDataFrame(
        [(i, float(100 + i), 1.0) for i in range(8)],
        "doc_id long, v double, score double",
    )
    out = compute_aggs(
        df,
        {"h": {"histogram": {"field": "v", "interval": 1},
               "aggs": {
                   "mavg": {"moving_fn": {"buckets_path": "_count",
                                          "window": 3}},
                   "mmax": {"moving_fn": {
                       "buckets_path": "_count", "window": 2, "shift": 2,
                       "script": "MovingFunctions.max(values)"}},
                   "sd": {"serial_diff": {"buckets_path": "_count",
                                          "lag": 2}},
               }}},
    )["h"].toPandas()
    # doc_count is 1 everywhere; default shift=0 → window ends at the
    # PREVIOUS bucket, so the first bucket has no window (NULL)
    assert pd.isna(out["mavg"][0])
    assert list(out["mavg"][1:4]) == [1.0, 1.0, 1.0]
    # shift=window → includes the current bucket
    assert list(out["mmax"]) == [1.0] * len(out)
    assert pd.isna(out["sd"][0]) and pd.isna(out["sd"][1])
    assert list(out["sd"][2:]) == [0.0] * (len(out) - 2)


def test_matrix_stats(scoped, scoped_pd):
    out = compute_aggs(
        scoped,
        {"ms": {"matrix_stats": {"fields": ["n_chars", "turn_idx"]}}},
    )["ms"].toPandas()
    a = scoped_pd["n_chars"].astype(float)
    b = scoped_pd["turn_idx"].astype(float)
    assert out["ms_n_chars_count"][0] == len(a)
    assert np.isclose(out["ms_n_chars_mean"][0], a.mean())
    assert np.isclose(out["ms_n_chars_variance"][0], a.var(ddof=0))
    assert np.isclose(
        out["ms_n_chars_turn_idx_covariance"][0], np.cov(a, b, bias=True)[0, 1]
    )
    assert np.isclose(
        out["ms_n_chars_turn_idx_correlation"][0], np.corrcoef(a, b)[0, 1]
    )


def test_significant_text(spark, transcripts_df):
    from neural_search_spark.index.build import doc_id_col
    from neural_search_spark.tokenizer import tokenize_py

    docs = transcripts_df.withColumn("doc_id", doc_id_col())
    full_pd = docs.toPandas()
    scoped = docs.filter(F.col("role") == "tool").withColumn(
        "score", F.lit(1.0)
    )
    out = compute_aggs(
        scoped,
        {"st": {"significant_text": {"field": "text", "size": 10,
                                     "min_doc_count": 3}}},
        full=docs,
    )["st"].toPandas()

    def doc_token_counts(frame_pd):
        from collections import Counter
        c = Counter()
        for t in frame_pd["text"]:
            c.update(set(tokenize_py(t)))
        return c

    fg_pd = full_pd[full_pd["role"] == "tool"]
    fgc, bgc = doc_token_counts(fg_pd), doc_token_counts(full_pd)
    fg_tot, bg_tot = len(fg_pd), len(full_pd)
    scores = {}
    for tok, dc in fgc.items():
        if dc < 3:
            continue
        fgp, bgp = dc / fg_tot, bgc[tok] / bg_tot
        if fgp > bgp:
            scores[tok] = (fgp - bgp) * (fgp / bgp)
    exp = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert list(out["st_key"]) == [k for k, _ in exp]
    assert np.allclose(out["score"], [v for _, v in exp])
    # tokens distinctive of tool turns should rank high
    assert len(out) == 10


def test_boxplot_exact_five_numbers(scoped, scoped_pd):
    out = compute_aggs(
        scoped,
        {
            "bp": {"boxplot": {"field": "n_chars"}},
            "by_role": {
                "terms": {"field": "role", "size": 10},
                "aggs": {"bp": {"boxplot": {"field": "n_chars"}}},
            },
        },
    )
    g = out["bp"].toPandas()
    col = scoped_pd["n_chars"].astype(float)
    for lab, q in (("min", 0.0), ("q1", 0.25), ("q2", 0.5),
                   ("q3", 0.75), ("max", 1.0)):
        assert np.isclose(
            g[f"bp_{lab}"][0],
            np.percentile(col, q * 100, method="linear"),
        ), lab
    b = out["by_role"].toPandas().set_index("by_role_key")
    for role, grp in scoped_pd.groupby("role"):
        assert np.isclose(
            b.loc[role, "bp_q2"],
            np.percentile(grp["n_chars"].astype(float), 50,
                          method="linear"),
        )


def test_median_absolute_deviation(scoped, scoped_pd):
    out = compute_aggs(
        scoped,
        {
            "mad": {"median_absolute_deviation": {"field": "n_chars"}},
            "by_role": {
                "terms": {"field": "role", "size": 10},
                "aggs": {
                    "mad": {
                        "median_absolute_deviation": {"field": "n_chars"}
                    }
                },
            },
        },
    )

    def pd_mad(s):
        s = s.astype(float)
        return (s - s.median()).abs().median()

    assert np.isclose(
        out["mad"].toPandas()["mad"][0], pd_mad(scoped_pd["n_chars"])
    )
    b = out["by_role>mad"].toPandas().set_index("by_role_key")
    for role, grp in scoped_pd.groupby("role"):
        assert np.isclose(b.loc[role, "mad"], pd_mad(grp["n_chars"]))


def test_string_stats_lengths_and_entropy(scoped, scoped_pd):
    out = compute_aggs(
        scoped,
        {
            "ss": {"string_stats": {"field": "role"}},
            "by_role": {
                "terms": {"field": "role", "size": 10},
                "aggs": {"ss": {"string_stats": {"field": "role"}}},
            },
        },
    )
    g = out["ss"].toPandas()
    lens = scoped_pd["role"].str.len()
    assert g["ss_count"][0] == len(scoped_pd)
    assert g["ss_min_length"][0] == lens.min()
    assert g["ss_max_length"][0] == lens.max()
    assert np.isclose(g["ss_avg_length"][0], lens.mean())
    # entropy over the character distribution of all values in the bucket
    import collections

    counts = collections.Counter("".join(scoped_pd["role"]))
    tot = sum(counts.values())
    exp_ent = -sum(
        (c / tot) * np.log2(c / tot) for c in counts.values()
    )
    assert np.isclose(g["ss_entropy"][0], exp_ent)
    # per-bucket: a single repeated value's entropy is that string's own
    # char distribution
    b = out["by_role>ss"].toPandas().set_index("by_role_key")
    for role, grp in scoped_pd.groupby("role"):
        cr = collections.Counter(role)
        tr = sum(cr.values())
        er = -sum((c / tr) * np.log2(c / tr) for c in cr.values())
        assert np.isclose(b.loc[role, "ss_entropy"], er)


def test_rate_fixed_and_calendar(scoped, scoped_pd):
    out = compute_aggs(
        scoped,
        {
            "per_12h": {
                "date_histogram": {"field": "ts", "fixed_interval": "12h"},
                "aggs": {
                    "chars_per_hour": {
                        "rate": {"field": "n_chars", "unit": "hour"}
                    },
                    "docs_per_day": {"rate": {"unit": "day"}},
                },
            },
            "per_day_cal": {
                "date_histogram": {"field": "ts",
                                   "calendar_interval": "day"},
                "aggs": {"per_hour": {"rate": {"unit": "hour"}}},
            },
        },
    )
    b = out["per_12h"].toPandas().sort_values("per_12h_key")
    exp = (
        scoped_pd.assign(k=scoped_pd["ts"].dt.floor("12h"))
        .groupby("k")
        .agg(s=("n_chars", "sum"), n=("n_chars", "size"))
        .sort_index()
    )
    assert np.allclose(b["chars_per_hour"], exp["s"].values / 12.0)
    assert np.allclose(b["docs_per_day"], exp["n"].values * 2.0)
    c = out["per_day_cal"].toPandas().sort_values("per_day_cal_key")
    expd = (
        scoped_pd.assign(k=scoped_pd["ts"].dt.floor("1D"))
        .groupby("k")["n_chars"].size().sort_index()
    )
    assert np.allclose(c["per_hour"], expd.values / 24.0)
    with pytest.raises(ValueError, match="date_histogram parent"):
        compute_aggs(
            scoped,
            {
                "t": {
                    "terms": {"field": "role"},
                    "aggs": {"r": {"rate": {"unit": "day"}}},
                }
            },
        )
    with pytest.raises(ValueError, match="calendar_interval"):
        compute_aggs(
            scoped,
            {
                "m": {
                    "date_histogram": {"field": "ts",
                                       "calendar_interval": "month"},
                    "aggs": {"r": {"rate": {"unit": "day"}}},
                }
            },
        )


def test_auto_date_histogram_picks_ladder_interval(scoped, scoped_pd):
    # the fixture spans 72 hours; target 10 buckets → 12h is the first
    # rung with ceil(span/interval) <= 10
    out = compute_aggs(
        scoped,
        {
            "auto": {
                "auto_date_histogram": {"field": "ts", "buckets": 10},
                "aggs": {"s": {"sum": {"field": "n_chars"}}},
            }
        },
    )
    b = out["auto"].toPandas().sort_values("auto_key")
    assert (b["interval"] == "12h").all()
    exp = (
        scoped_pd.assign(k=scoped_pd["ts"].dt.floor("12h"))
        .groupby("k")["n_chars"].sum().sort_index()
    )
    assert len(b) == len(exp)
    assert np.allclose(b["s"].values, exp.values)
    # a generous target picks the smallest rung that fits
    out2 = compute_aggs(
        scoped,
        {"a": {"auto_date_histogram": {"field": "ts", "buckets": 100}}},
    )
    assert (out2["a"].toPandas()["interval"] == "1h").all()


def test_extended_stats_and_percentiles_bucket(scoped, scoped_pd):
    out = compute_aggs(
        scoped,
        {
            "per_day": {
                "date_histogram": {"field": "ts", "fixed_interval": "1d"},
                "aggs": {
                    "s": {"sum": {"field": "n_chars"}},
                    "est": {"extended_stats_bucket": {"buckets_path": "s"}},
                    "pct": {
                        "percentiles_bucket": {
                            "buckets_path": "s",
                            "percents": [50.0, 99.0],
                        }
                    },
                },
            }
        },
    )
    exp = (
        scoped_pd.assign(k=scoped_pd["ts"].dt.floor("1D"))
        .groupby("k")["n_chars"].sum().sort_index().astype(float)
    )
    est = out["per_day>est"].toPandas()
    assert est["count"][0] == len(exp)
    assert np.isclose(est["variance"][0], exp.var(ddof=0))
    assert np.isclose(est["sum_of_squares"][0], (exp ** 2).sum())
    pct = out["per_day>pct"].toPandas()
    assert np.isclose(
        pct["p50"][0], np.percentile(exp.values, 50, method="linear")
    )
    assert np.isclose(
        pct["p99"][0], np.percentile(exp.values, 99, method="linear")
    )

"""Scroll (PIT + search_after keyset pagination): page disjointness,
concatenation == one global sort, resume tokens, score-sorted paging
over full scored frames."""

import pandas as pd
import pytest

from neural_search_spark.engine import Engine
from neural_search_spark.query.scroll import ScrollCursor


@pytest.fixture(scope="module")
def sc_setup(spark, transcripts_df):
    from neural_search_spark.index.build import doc_id_col

    docs = transcripts_df.withColumn("doc_id", doc_id_col())
    return Engine(spark, corpus=docs)


def _concat(cursor, max_pages=100):
    out = []
    for i, page in enumerate(cursor.pages()):
        if i >= max_pages:
            raise AssertionError("cursor failed to exhaust")
        out.append(page)
    return pd.concat(out, ignore_index=True) if out else pd.DataFrame()


def test_field_sort_pages_equal_global_sort(sc_setup, transcripts_df):
    eng = sc_setup
    cur = eng.scroll(
        sort=[("ts", "asc"), ("conv_id", "desc")], page_size=157
    )
    got = _concat(cur)
    from neural_search_spark.index.build import doc_id_col

    exp = transcripts_df.withColumn("doc_id", doc_id_col()).toPandas()
    # oracle ordering: ts asc, conv_id desc, doc_id asc
    exp = exp.sort_values(
        ["ts", "conv_id", "doc_id"], ascending=[True, False, True]
    ).reset_index(drop=True)
    assert len(got) == len(exp)
    assert list(got["doc_id"]) == list(exp["doc_id"])


def test_pages_are_disjoint_and_sized(sc_setup):
    eng = sc_setup
    cur = eng.scroll(sort=[("ts", "desc")], page_size=200)
    p1, p2, p3 = cur.next_page(), cur.next_page(), cur.next_page()
    assert len(p1) == len(p2) == len(p3) == 200
    ids = list(p1["doc_id"]) + list(p2["doc_id"]) + list(p3["doc_id"])
    assert len(set(ids)) == 600


def test_resume_token_restarts_exactly(sc_setup):
    eng = sc_setup
    cur = eng.scroll(sort=[("ts", "asc")], page_size=120)
    cur.next_page()
    tok = cur.resume_token
    expected = cur.next_page()
    resumed = eng.scroll(
        sort=[("ts", "asc")], page_size=120, search_after=tok
    ).next_page()
    assert list(resumed["doc_id"]) == list(expected["doc_id"])


def test_score_sorted_scroll_matches_search(sc_setup):
    eng = sc_setup
    spec = {"match": {"query_text": "tool call error"}}
    top = eng.search(spec, k=30).toPandas()
    cur = eng.scroll(spec, page_size=10)
    got = pd.concat(
        [cur.next_page(), cur.next_page(), cur.next_page()],
        ignore_index=True,
    )
    assert list(got["doc_id"]) == list(top["doc_id"])
    assert got["score"].tolist() == pytest.approx(top["score"].tolist())


def test_score_sorted_scroll_exhausts_matched_set(sc_setup):
    # moderate-df terms keep the matched set small enough to page out
    eng = sc_setup
    spec = {"match": {"query_text": "w0962 w1394"}}
    got = _concat(eng.scroll(spec, page_size=40), max_pages=10)
    from neural_search_spark.engine import spec_from_json

    n = eng._full_scored(spec_from_json(spec)).count()
    assert n > 40  # multiple pages actually exercised
    assert len(got) == n
    assert got["doc_id"].is_unique


def test_spec_prefilters_field_sort(sc_setup):
    eng = sc_setup
    spec = {"match": {"query_text": "tool call error"}}
    cur = eng.scroll(spec, sort=[("ts", "asc")], page_size=5000)
    got = _concat(cur)
    n = eng._full_scored(
        __import__(
            "neural_search_spark.engine", fromlist=["spec_from_json"]
        ).spec_from_json(spec)
    ).count()
    assert len(got) == n


def test_validation(sc_setup, spark):
    eng = sc_setup
    with pytest.raises(ValueError, match="needs a query spec"):
        eng.scroll(page_size=10)
    with pytest.raises(ValueError, match="pagination_depth"):
        eng.scroll(
            {"hybrid": {"queries": [{"match": {"query_text": "x"}}]}},
            page_size=10,
        )
    with pytest.raises(ValueError, match="asc|desc"):
        ScrollCursor(
            spark.range(1), [("id", "up")], page_size=1, tiebreak="id"
        )
    with pytest.raises(ValueError, match="positive"):
        ScrollCursor(
            spark.range(1), [("id", "asc")], page_size=0, tiebreak="id"
        )

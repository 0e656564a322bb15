"""Semantic highlighter (reference highlight/SemanticHighlighterEngine.java:29-298).

The reference sends (query, document) to a QA model that returns
``highlights: [{start, end}]`` spans, then wraps them in pre/post tags.
The QA model is STUBBED here (none is available in this container) with a
deterministic lexical span finder — every occurrence of a query term in the
document text — while the span → tag formatting and the fetch-phase shape
(a post-retrieval transform over the top-k rows only) are real.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..tokenizer import tokenize_py

DEFAULT_PRE_TAG = "<em>"
DEFAULT_POST_TAG = "</em>"

SPAN_SCHEMA = T.ArrayType(
    T.StructType(
        [T.StructField("start", T.IntegerType()), T.StructField("end", T.IntegerType())]
    )
)


def find_spans(text: str, query_terms: set[str]) -> list[tuple[int, int]]:
    """Stub 'model': character spans of query-term occurrences (the
    deterministic stand-in for the QA model's answer spans)."""
    if not text:
        return []
    spans = []
    for m in re.finditer(r"[a-z0-9]+", text.lower()):
        if m.group() in query_terms:
            spans.append((m.start(), m.end()))
    return spans


def format_spans(
    text: str,
    spans: list[tuple[int, int]],
    pre_tag: str = DEFAULT_PRE_TAG,
    post_tag: str = DEFAULT_POST_TAG,
) -> str:
    """Insert tags around spans (reference applies pre/post tags per span)."""
    out = []
    last = 0
    for s, e in spans:
        out.append(text[last:s])
        out.append(pre_tag)
        out.append(text[s:e])
        out.append(post_tag)
        last = e
    out.append(text[last:])
    return "".join(out)


def highlight_topk(
    topk: DataFrame,
    query_text: str,
    text_col: str = "text",
    pre_tag: str = DEFAULT_PRE_TAG,
    post_tag: str = DEFAULT_POST_TAG,
) -> DataFrame:
    """Fetch-phase highlighter: adds ``highlights`` (spans) and
    ``highlighted`` (tagged text) to an already-retrieved top-k DataFrame.
    Runs as an Arrow pandas UDF over the k rows only — never the corpus."""
    terms = set(tokenize_py(query_text))

    @F.pandas_udf(SPAN_SCHEMA)
    def _spans(texts: pd.Series) -> pd.Series:
        return texts.map(
            lambda t: [
                {"start": s, "end": e} for s, e in find_spans(t or "", terms)
            ]
        )

    @F.pandas_udf(T.StringType())
    def _fmt(texts: pd.Series) -> pd.Series:
        return texts.map(
            lambda t: format_spans(t or "", find_spans(t or "", terms), pre_tag, post_tag)
        )

    return topk.withColumn("highlights", _spans(F.col(text_col))).withColumn(
        "highlighted", _fmt(F.col(text_col))
    )

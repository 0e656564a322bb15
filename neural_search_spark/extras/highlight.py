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


def best_fragments(
    text: str,
    query_terms: set[str],
    fragment_size: int = 100,
    number_of_fragments: int = 3,
    term_weights: dict[str, float] | None = None,
    pre_tag: str = DEFAULT_PRE_TAG,
    post_tag: str = DEFAULT_POST_TAG,
) -> list[str]:
    """Passage fragmenting, the UnifiedHighlighter analog: greedy
    passages of ``fragment_size`` chars opened at the first uncovered
    match span, scored by the sum of UNIQUE matched terms' weights
    (weight = idf when ``term_weights`` given, else 1 — Lucene passage
    scoring sums per-unique-term weights), returned best-first with
    start-offset tiebreak, spans tagged within each fragment."""
    spans = find_spans(text, query_terms)
    if not spans:
        return []
    passages: list[tuple[float, int, int, list[tuple[int, int]]]] = []
    i = 0
    while i < len(spans):
        start = spans[i][0]
        end = min(len(text), start + fragment_size)
        inside = []
        while i < len(spans) and spans[i][1] <= end:
            inside.append(spans[i])
            i += 1
        if not inside:  # a single span longer than the fragment
            inside = [spans[i]]
            end = spans[i][1]
            i += 1
        uniq = {text[s:e].lower() for s, e in inside}
        score = sum((term_weights or {}).get(t, 1.0) for t in uniq)
        passages.append((score, start, end, inside))
    passages.sort(key=lambda p: (-p[0], p[1]))
    out = []
    for score, start, end, inside in passages[:number_of_fragments]:
        shifted = [(s - start, e - start) for s, e in inside]
        out.append(format_spans(text[start:end], shifted, pre_tag, post_tag))
    return out


def highlight_topk(
    topk: DataFrame,
    query_text: str,
    text_col: str = "text",
    pre_tag: str = DEFAULT_PRE_TAG,
    post_tag: str = DEFAULT_POST_TAG,
    fragment_size: int | None = None,
    number_of_fragments: int = 3,
    term_weights: dict[str, float] | None = None,
) -> DataFrame:
    """Fetch-phase highlighter: adds ``highlights`` (spans) and
    ``highlighted`` (tagged text) to an already-retrieved top-k DataFrame.
    Runs as an Arrow pandas UDF over the k rows only — never the corpus.
    With ``fragment_size`` set, also adds ``fragments``: the
    best-scoring tagged passages (UnifiedHighlighter semantics; pass the
    query terms' idf as ``term_weights`` to rank rare-term passages
    first, the Lucene passage-scoring weight)."""
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

    out = topk.withColumn("highlights", _spans(F.col(text_col))).withColumn(
        "highlighted", _fmt(F.col(text_col))
    )
    if fragment_size is not None:

        @F.pandas_udf(T.ArrayType(T.StringType()))
        def _frags(texts: pd.Series) -> pd.Series:
            return texts.map(
                lambda t: best_fragments(
                    t or "", terms, fragment_size, number_of_fragments,
                    term_weights, pre_tag, post_tag,
                )
            )

        out = out.withColumn("fragments", _frags(F.col(text_col)))
    return out

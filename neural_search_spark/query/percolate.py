"""Percolate queries — reverse search: register queries, then ask which
registered queries match a given document (the host `percolate` query /
percolator field type; alerting and saved-search fan-out are its two
production uses, both natural over a transcript stream).

Architecture parity. Lucene's percolator extracts the terms of every
registered query at index time (``QueryAnalyzer``), stores them as an
inverted index OVER QUERIES, answers a percolation by building a
candidate query from the document's terms, and verifies candidates by
running each against a one-doc ``MemoryIndex``. This engine keeps that
candidate-then-verify shape but makes the verify step *closed-form*:
the registered-query surface is the coverage-decidable family —

* ``match`` (operator or/and, ``minimum_should_match``) — matches iff
  ≥ min_match DISTINCT query terms appear in the document,
* ``term`` / ``terms`` — un-analyzed membership (≥ 1),

so "matches" is exactly ``count(distinct matched terms) >= min_match``
and no per-query re-execution is needed. Positional kinds
(match_phrase) and scoring-threshold kinds are NOT registered — they
would need the MemoryIndex-style verify; rejecting them loudly keeps
the operator honest (Lucene's extraction marks such queries
verified-by-rerun for the same reason).

Scale shape (100 TB): the registered-query table is a tall
(query_id, term, min_match) frame — thousands of queries ≪ any corpus,
so it BROADCASTS; percolating a document stream is tokenize (map-side)
→ explode distinct terms → broadcast-hash-join on term → one
(doc, query) aggregation. One shuffle, keyed by (doc_id, query_id);
per-doc work is independent of the registry size beyond true term
overlaps. The same plan serves a Structured Streaming micro-batch
unchanged (stateless map + join + per-batch aggregation).

Reference trail: OpenSearch percolator module
(PercolateQueryBuilder, PercolatorFieldMapper's query-term extraction);
Lucene memory/MemoryIndex — semantics source, not ported code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tokenizer import tokenize_expr, tokenize_py
from .bm25 import parse_min_match

_SUPPORTED = ("match", "term", "terms")


def _extract(query_id: str, spec: dict) -> list[tuple[str, str, int]]:
    """(query_id, term, min_match) rows for one registered query body."""
    if not isinstance(spec, dict) or len(spec) != 1:
        raise ValueError(
            f"registered query {query_id!r} must have exactly one kind"
        )
    (kind, body), = spec.items()
    if kind not in _SUPPORTED:
        raise ValueError(
            f"registered query {query_id!r}: kind {kind!r} is not "
            f"coverage-decidable; supported: {_SUPPORTED} (positional/"
            "scoring kinds need a per-query verify, see module docstring)"
        )
    if kind == "match":
        terms = sorted(set(tokenize_py(str(body.get("query_text", "")))))
        if not terms:
            raise ValueError(f"registered query {query_id!r} is empty")
        mm = parse_min_match(
            body.get("operator", "or"),
            body.get("minimum_should_match"),
            len(terms),
        )
        if mm > len(terms):  # unmatchable, Lucene semantics
            return []
    elif kind == "term":
        terms = [str(body.get("value", ""))]
        if not terms[0]:
            raise ValueError(f"registered query {query_id!r} is empty")
        mm = 1
    else:  # terms: any-of membership
        terms = sorted({str(v) for v in body.get("values", []) if v})
        if not terms:
            raise ValueError(f"registered query {query_id!r} is empty")
        mm = 1
    return [(query_id, t, mm) for t in terms]


class PercolatorIndex:
    """The registered-query registry: a broadcastable tall
    (query_id, term, min_match) frame plus a driver-side twin for
    single-document percolation."""

    def __init__(
        self, spark: SparkSession, queries: dict[str, dict]
    ):
        if not queries:
            raise ValueError("percolator needs at least one query")
        rows: list[tuple[str, str, int]] = []
        for qid, spec in queries.items():
            rows.extend(_extract(qid, spec))
        self.spark = spark
        self._rows = rows
        self.qterms = spark.createDataFrame(
            rows, schema="query_id string, term string, min_match int"
        )

    def percolate_df(
        self,
        docs: DataFrame,
        id_col: str = "doc_id",
        text_col: str = "text",
    ) -> DataFrame:
        """(id_col, query_id) — every (document, registered query) match
        in one broadcast join + one aggregation (see module docstring)."""
        terms = docs.select(
            id_col,
            F.explode(
                F.array_distinct(tokenize_expr(text_col))
            ).alias("term"),
        )
        j = terms.join(F.broadcast(self.qterms), "term")
        # doc terms are distinct, so count(*) = distinct matched terms
        return (
            j.groupBy(id_col, "query_id", "min_match")
            .agg(F.count("*").alias("n_matched"))
            .filter(F.col("n_matched") >= F.col("min_match"))
            .select(id_col, "query_id", "n_matched")
        )

    def percolate(self, text: str) -> list[str]:
        """Driver fast path for ONE document: the registry is
        driver-resident by construction, so a single percolation is a
        set intersection, no Spark job."""
        toks = set(tokenize_py(text))
        hit: dict[str, int] = {}
        need: dict[str, int] = {}
        for qid, term, mm in self._rows:
            need[qid] = mm
            if term in toks:
                hit[qid] = hit.get(qid, 0) + 1
        return sorted(q for q, n in hit.items() if n >= need[q])

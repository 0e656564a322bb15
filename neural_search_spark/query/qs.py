"""query_string: the classic Lucene query syntax over the engine's leaf
scorers (host QueryStringQueryBuilder → Lucene's classic QueryParser).

Grammar supported (the classic-parser core):

* bare words          → analyzed term clauses (BM25 per term)
* ``"quoted"~N``      → match_phrase (+slop)
* ``AND OR NOT`` / ``&& || !`` — boolean conjunctions/negation
* ``+term`` / ``-term`` — required / prohibited modifiers
* ``( ... )``         → grouping (a nested BooleanQuery)
* ``field:term``, ``field:"phrase"``, ``field:( ... )`` — field
  qualification; analyzed fields score BM25 over that column, any other
  corpus column is keyword-matched (exact equality, constant score)
* ``term~`` / ``term~1`` — fuzzy (edit-distance expansion, ~ alone = 2)
* ``te?m`` / ``te*m`` / ``term*`` — wildcard / prefix (constant score)
* ``/regex/``         → regexp (constant score)
* ``field:[a TO b]`` / ``{a TO b}`` — range, inclusive / exclusive ends,
  ``*`` as an open end (constant score)
* ``_exists_:field``  → exists (constant score)
* ``clause^2.5``      → boost (multiplies the clause's scores)

Occur resolution is the classic parser's ``addClause`` verbatim
(org.apache.lucene.queryparser.classic.QueryParserBase#addClause):

* ``conj == AND`` promotes the PREVIOUS clause to MUST (unless
  prohibited) and makes the next clause MUST;
* under ``default_operator='and'`` a ``conj == OR`` demotes the
  previous clause to SHOULD and the next is SHOULD;
* ``+`` forces MUST, ``-``/``NOT`` force MUST_NOT;
* so ``a AND b OR c`` is the (famously flat) ``+a +b c``.

Evaluation contract matches ``bool``: every scoring leaf scores the
FULL scoped corpus with its own stats; a level combines as one tall
union → ONE doc-keyed aggregation (required-count gate + optional-count
msm + score sum), then anti-joins for prohibited clauses — the same
shuffle shape as ``Engine._bool_scored``, so a 100-TB level costs its
leaf scans plus one keyed exchange. A level with ONLY prohibited
clauses matches nothing (Lucene BooleanQuery semantics — note this
differs from simple_query_string's MatchAllDocs negation wrapper).

Unlike simple_query_string, the classic parser is STRICT: unbalanced
quotes/parens, dangling operators, a bad range, or an unknown field
raise ValueError (the host surfaces these as parse_exception).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field as dc_field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..tokenizer import tokenize_py

MUST, SHOULD, MUST_NOT = "must", "should", "must_not"


@dataclass
class QLeaf:
    kind: str  # term|phrase|prefix|wildcard|regexp|fuzzy|range|exists
    field: str | None = None  # None = default field
    text: str = ""
    slop: int = 0
    fuzziness: int = 2
    boost: float = 1.0
    # range only
    lo: str | None = None
    hi: str | None = None
    lo_inc: bool = True
    hi_inc: bool = True


@dataclass
class QGroup:
    clauses: list = dc_field(default_factory=list)  # [(occur, node)]
    boost: float = 1.0


# ---------------------------------------------------------------------------
# lexer
# ---------------------------------------------------------------------------

_FIELD_RE = re.compile(r"(\\.|[^\s:()\[\]{}\"/^~\\])+:")
_TERM_CHARS = re.compile(r"(\\.|[^\s()\[\]{}\"^~\\])+")
_BOOST_RE = re.compile(r"\^(\d+(?:\.\d+)?)")
_FUZZ_RE = re.compile(r"~(\d+(?:\.\d+)?)?")
_RANGE_RE = re.compile(
    r"([\[{])\s*([^\s\]}]+)\s+TO\s+([^\s\]}]+)\s*([\]}])", re.IGNORECASE
)


def _unescape(s: str) -> str:
    return re.sub(r"\\(.)", r"\1", s)


def tokenize_qs(q: str) -> list[tuple[str, object]]:
    """Lex into (type, payload) tokens. Strict: unbalanced quotes and
    malformed ranges raise."""
    out: list[tuple[str, object]] = []
    pos, n = 0, len(q)
    while pos < n:
        ch = q[pos]
        if ch.isspace():
            pos += 1
            continue
        if ch == "(":
            out.append(("LP", None))
            pos += 1
            continue
        if ch == ")":
            out.append(("RP", None))
            pos += 1
            continue
        if ch == "+":
            out.append(("PLUS", None))
            pos += 1
            continue
        if ch == "-":
            out.append(("MINUS", None))
            pos += 1
            continue
        if ch == "!":
            out.append(("NOT", None))
            pos += 1
            continue
        if q.startswith("&&", pos):
            out.append(("AND", None))
            pos += 2
            continue
        if q.startswith("||", pos):
            out.append(("OR", None))
            pos += 2
            continue
        if ch == '"':
            end = pos + 1
            while end < n and q[end] != '"':
                end += 2 if q[end] == "\\" else 1
            if end >= n:
                raise ValueError("query_string: unbalanced quote")
            body = _unescape(q[pos + 1 : end])
            pos = end + 1
            slop = 0
            m = _FUZZ_RE.match(q, pos)
            if m and m.group(0):
                slop = int(float(m.group(1) or 0))
                pos = m.end()
            out.append(("PHRASE", (body, slop)))
            continue
        if ch == "/":
            end = pos + 1
            while end < n and q[end] != "/":
                end += 2 if q[end] == "\\" else 1
            if end >= n:
                raise ValueError("query_string: unbalanced /regex/")
            out.append(("REGEX", _unescape(q[pos + 1 : end])))
            pos = end + 1
            continue
        if ch == "^":
            m = _BOOST_RE.match(q, pos)
            if not m:
                raise ValueError("query_string: malformed boost")
            out.append(("BOOST", float(m.group(1))))
            pos = m.end()
            continue
        if ch in "[{":
            m = _RANGE_RE.match(q, pos)
            if not m:
                raise ValueError(
                    f"query_string: malformed range at {q[pos:pos + 20]!r}"
                )
            out.append(
                (
                    "RANGE",
                    (
                        m.group(2),
                        m.group(3),
                        m.group(1) == "[",
                        m.group(4) == "]",
                    ),
                )
            )
            pos = m.end()
            continue
        m = _FIELD_RE.match(q, pos)
        if m:
            out.append(("FIELD", _unescape(m.group(0)[:-1])))
            pos = m.end()
            continue
        m = _TERM_CHARS.match(q, pos)
        if m:
            word = m.group(0)
            pos = m.end()
            if word in ("AND", "OR", "NOT"):
                out.append((word, None))
                continue
            fuzz = None
            fm = _FUZZ_RE.match(q, pos)
            if fm and fm.group(0):
                fuzz = int(float(fm.group(1))) if fm.group(1) else 2
                pos = fm.end()
            out.append(("TERM", (_unescape(word), fuzz)))
            continue
        raise ValueError(f"query_string: cannot lex at {q[pos:pos + 10]!r}")
    return out


# ---------------------------------------------------------------------------
# parser (recursive descent over the token stream)
# ---------------------------------------------------------------------------


class _Parser:
    def __init__(self, toks, default_operator: str):
        self.toks = toks
        self.i = 0
        self.default_and = default_operator == "and"

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else ("EOF", None)

    def take(self):
        t = self.peek()
        self.i += 1
        return t

    def parse(self) -> QGroup:
        g = self._group(top=True)
        if self.peek()[0] == "RP":
            raise ValueError("query_string: unbalanced ')'")
        return g

    def _group(self, top: bool = False) -> QGroup:
        # Lucene addClause state machine
        clauses: list[list] = []  # mutable [occur, node]
        conj = None  # None | 'and' | 'or'
        mods = None  # None | '+' | '-'
        while True:
            tt, payload = self.peek()
            if tt == "EOF":
                break
            if tt == "RP":
                if top:
                    raise ValueError("query_string: unbalanced ')'")
                break
            if tt in ("AND", "OR"):
                self.take()
                conj = "and" if tt == "AND" else "or"
                continue
            if tt == "NOT":
                self.take()
                mods = "-"
                continue
            if tt == "PLUS":
                self.take()
                mods = "+"
                continue
            if tt == "MINUS":
                self.take()
                mods = "-"
                continue
            node = self._clause()
            if node is None:
                continue
            # --- QueryParserBase.addClause ---
            if clauses and conj == "and":
                prev = clauses[-1]
                if prev[0] != MUST_NOT:
                    prev[0] = MUST
            if clauses and self.default_and and conj == "or":
                prev = clauses[-1]
                if prev[0] != MUST_NOT:
                    prev[0] = SHOULD
            if not self.default_and:
                prohibited = mods == "-"
                required = mods == "+" or (conj == "and" and not prohibited)
            else:
                prohibited = mods == "-"
                required = not prohibited and conj != "or"
            occ = MUST_NOT if prohibited else (MUST if required else SHOULD)
            clauses.append([occ, node])
            conj, mods = None, None
        return QGroup(clauses=[(o, nd) for o, nd in clauses])

    def _clause(self):
        """One clause: optional FIELD prefix, then term/phrase/range/
        regex/group, then optional glued ^boost (the lexer keeps '^' out
        of term chars, so a boost appears as '^N' at the term's tail —
        we split it here)."""
        tt, payload = self.peek()
        fname = None
        if tt == "FIELD":
            self.take()
            fname = payload
            tt, payload = self.peek()
        if tt == "LP":
            self.take()
            sub = self._group()
            if self.peek()[0] != "RP":
                raise ValueError("query_string: unbalanced '('")
            self.take()
            sub.boost = self._take_boost()
            if fname is not None:
                _push_field(sub, fname)
            if not sub.clauses:
                return None
            return sub
        if tt == "PHRASE":
            self.take()
            body, slop = payload
            boost = self._take_boost()
            if not tokenize_py(body):
                return None
            return QLeaf(
                "phrase", field=fname, text=body, slop=slop, boost=boost
            )
        if tt == "REGEX":
            self.take()
            return QLeaf(
                "regexp", field=fname, text=payload,
                boost=self._take_boost(),
            )
        if tt == "RANGE":
            self.take()
            lo, hi, lo_inc, hi_inc = payload
            if fname is None:
                raise ValueError("query_string: range needs a field")
            return QLeaf(
                "range", field=fname,
                lo=None if lo == "*" else lo,
                hi=None if hi == "*" else hi,
                lo_inc=lo_inc, hi_inc=hi_inc,
                boost=self._take_boost(),
            )
        if tt == "TERM":
            self.take()
            word, fuzz = payload
            boost = self._take_boost()
            if fname == "_exists_":
                return QLeaf("exists", field=word, boost=boost)
            if fuzz is not None:
                return QLeaf(
                    "fuzzy", field=fname, text=word,
                    fuzziness=min(fuzz, 2), boost=boost,
                )
            if "*" in word or "?" in word:
                if (
                    word.endswith("*")
                    and "?" not in word
                    and "*" not in word[:-1]
                    and len(word) > 1
                ):
                    return QLeaf(
                        "prefix", field=fname, text=word[:-1].lower(),
                        boost=boost,
                    )
                return QLeaf(
                    "wildcard", field=fname, text=word.lower(), boost=boost
                )
            return QLeaf("term", field=fname, text=word, boost=boost)
        raise ValueError(f"query_string: unexpected {tt}")

    def _take_boost(self) -> float:
        tt, payload = self.peek()
        if tt == "BOOST":
            self.take()
            return float(payload)
        return 1.0


def _push_field(g: QGroup, fname: str) -> None:
    for _, nd in g.clauses:
        if isinstance(nd, QGroup):
            _push_field(nd, fname)
        elif nd.field is None:
            nd.field = fname


def parse_query_string(q: str, default_operator: str = "or") -> QGroup:
    if default_operator not in ("or", "and"):
        raise ValueError("default_operator must be 'or' or 'and'")
    return _Parser(tokenize_qs(q or ""), default_operator).parse()


# ---------------------------------------------------------------------------
# evaluator
# ---------------------------------------------------------------------------


def _eval_leaf(
    leaf: QLeaf,
    docs: DataFrame,
    id_col: str,
    default_field: str,
    analyzed: set[str],
) -> DataFrame:
    fname = leaf.field or default_field
    cols = set(docs.columns)
    if leaf.kind == "exists":
        if leaf.field not in cols:
            raise ValueError(f"query_string: unknown field {leaf.field!r}")
        out = docs.filter(F.col(leaf.field).isNotNull()).select(
            F.col(id_col).alias("doc_id"), F.lit(1.0).alias("score")
        )
        return out.withColumn("score", F.col("score") * leaf.boost)
    if fname not in cols:
        raise ValueError(f"query_string: unknown field {fname!r}")
    if leaf.kind == "range":
        dt = docs.schema[fname].dataType
        pred = None
        for v, op in (
            (leaf.lo, "__ge__" if leaf.lo_inc else "__gt__"),
            (leaf.hi, "__le__" if leaf.hi_inc else "__lt__"),
        ):
            if v is None:
                continue
            p = getattr(F.col(fname), op)(F.lit(v).cast(dt))
            pred = p if pred is None else (pred & p)
        if pred is None:
            pred = F.lit(True)  # [* TO *] = exists-with-value
        return docs.filter(pred & F.col(fname).isNotNull()).select(
            F.col(id_col).alias("doc_id"),
            F.lit(float(leaf.boost)).alias("score"),
        )
    if fname not in analyzed:
        # keyword column: exact un-analyzed equality, constant score
        # (prefix/wildcard still pattern-match the raw value)
        if leaf.kind in ("prefix", "wildcard", "regexp"):
            from .multiterm import wildcard_regex

            if leaf.kind == "prefix":
                pred = F.col(fname).startswith(leaf.text)
            elif leaf.kind == "wildcard":
                pred = F.col(fname).rlike(wildcard_regex(leaf.text))
            else:
                from .multiterm import check_regexp_pattern

                check_regexp_pattern(leaf.text)
                pred = F.col(fname).rlike(f"^(?:{leaf.text})$")
        elif leaf.kind in ("term", "phrase", "fuzzy"):
            pred = F.col(fname) == F.lit(leaf.text)
        else:  # pragma: no cover
            raise ValueError(f"query_string: {leaf.kind} on keyword field")
        return docs.filter(pred).select(
            F.col(id_col).alias("doc_id"),
            F.lit(float(leaf.boost)).alias("score"),
        )
    # analyzed field
    base = docs
    if fname != "text":
        base = base.drop("text") if "text" in cols else base
        base = base.withColumnRenamed(fname, "text")
    if leaf.kind == "term":
        from ..gate import bm25_scored

        out = bm25_scored(
            base.withColumnRenamed(id_col, "doc_id")
            if id_col != "doc_id"
            else base,
            ["doc_id"],
            leaf.text,
            ndp=None,
        )
    elif leaf.kind == "phrase":
        from .phrase import phrase_scored_scan

        out = phrase_scored_scan(
            base, leaf.text, id_col=id_col, text_col="text", slop=leaf.slop
        )
    elif leaf.kind in ("prefix", "wildcard", "regexp"):
        from .multiterm import multiterm_scored_scan

        out = multiterm_scored_scan(
            base, leaf.text, kind=leaf.kind, id_col=id_col, text_col="text"
        )
    elif leaf.kind == "fuzzy":
        from .fuzzy import fuzzy_match_scored_scan

        out = fuzzy_match_scored_scan(
            base, leaf.text, fuzziness=leaf.fuzziness,
            id_col=id_col, text_col="text",
        )
    else:  # pragma: no cover
        raise ValueError(f"query_string: unknown leaf kind {leaf.kind}")
    if leaf.boost != 1.0:
        out = out.select(
            "doc_id", (F.col("score") * leaf.boost).alias("score")
        )
    return out


def _eval_group(
    g: QGroup,
    docs: DataFrame,
    id_col: str,
    default_field: str,
    analyzed: set[str],
    minimum_should_match=None,
) -> DataFrame | None:
    """One BooleanQuery level → one tall union + ONE doc-keyed
    aggregation (required-count + optional msm + score sum), then
    prohibited anti-joins — Engine._bool_scored's shuffle shape."""
    from .bm25 import parse_min_match

    scoring = [(o, nd) for o, nd in g.clauses if o != MUST_NOT]
    negs = [nd for o, nd in g.clauses if o == MUST_NOT]
    if not scoring:
        return None  # only-prohibited level matches nothing (Lucene)

    def _one(nd) -> DataFrame:
        if isinstance(nd, QGroup):
            sub = _eval_group(nd, docs, id_col, default_field, analyzed)
            if sub is None:
                return docs.sparkSession.range(0).select(
                    F.col("id").alias("doc_id"),
                    F.lit(0.0).cast("double").alias("score"),
                )
            if nd.boost != 1.0:
                sub = sub.select(
                    "doc_id", (F.col("score") * nd.boost).alias("score")
                )
            return sub
        return _eval_leaf(nd, docs, id_col, default_field, analyzed)

    n_must = sum(1 for o, _ in scoring if o == MUST)
    n_should = len(scoring) - n_must
    if minimum_should_match is not None and n_should:
        msm = parse_min_match("or", minimum_should_match, n_should)
    else:
        msm = 0 if n_must else (1 if n_should else 0)
    tall = None
    for o, nd in scoring:
        part = _one(nd).select(
            "doc_id",
            F.col("score").cast("double").alias("score"),
            F.lit(1 if o == MUST else 0).alias("is_must"),
        )
        tall = part if tall is None else tall.unionAll(part)
    out = (
        tall.groupBy("doc_id")
        .agg(
            F.sum("score").alias("score"),
            F.sum("is_must").alias("n_must"),
            F.sum(F.lit(1) - F.col("is_must")).alias("n_should"),
        )
        .filter(
            (F.col("n_must") == n_must) & (F.col("n_should") >= msm)
        )
        .select("doc_id", "score")
    )
    for nd in negs:
        out = out.join(_one(nd).select("doc_id"), "doc_id", "left_anti")
    return out


def query_string_scored(
    docs: DataFrame,
    query: str,
    default_operator: str = "or",
    default_field: str = "text",
    analyzed_fields: set[str] | None = None,
    minimum_should_match=None,
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, score double) for a query_string over the scoped corpus.
    analyzed_fields: columns scored with the analyzer/BM25 (default
    {default_field}); every other referenced column is keyword-matched.
    minimum_should_match applies to the TOP level's optional clauses
    (host behavior)."""
    ast = parse_query_string(query, default_operator)
    analyzed = analyzed_fields or {default_field}
    out = _eval_group(
        ast, docs, id_col, default_field, analyzed,
        minimum_should_match=minimum_should_match,
    )
    if out is None:
        return docs.sparkSession.range(0).select(
            F.col("id").alias("doc_id"),
            F.lit(0.0).cast("double").alias("score"),
        )
    return out

"""intervals query — minimal-interval semantics (host
IntervalQueryBuilder → Lucene ``IntervalQuery`` / the ``intervals``
DSL; Clarke & Cormack's minimal-interval algebra, which Lucene's
queries/intervals package implements).

An interval is an inclusive position range [s, e]. Every node
enumerates, per doc, its set of MINIMAL matching intervals — no
enumerated interval properly contains another — which makes the result
set canonical: it is exactly {windows w : w contains a match and no
proper sub-window of w does}, independent of enumeration order. Rules
(the host DSL):

* match     — terms of an analyzed query; ``ordered`` requires the
              terms in order without overlap, unordered is a covering
              window; ``max_gaps`` (default -1 = unlimited) filters the
              minimal set by internal gaps
* all_of    — the same conjunction over arbitrary sub-rules
* any_of    — union of the sub-rules' intervals, re-minimized
* prefix / wildcard — dictionary expansion (lexicographically first
              ≤128 matches, Lucene's Intervals.prefix cap) → any_of
* filter    — containing / contained_by / not_containing /
              not_contained_by / not_overlapping / before / after
              against a reference rule's minimal intervals

Gaps of a conjunction interval = width − Σ direct children's widths
(clamped at 0 for unordered overlap); a term's gaps are 0; any_of and
filters pass the child's gaps through. Scoring follows
``IntervalScorer``: per-doc freq = Σ over minimal intervals of
1/(1 + gaps), the same sloppy shape as SpanScorer, scored
BM25-saturated with idf summed over the rule's DISTINCT terms — so an
ordered max_gaps=0 match over unique terms scores identically to the
exact phrase and the span_near slop-0 form.

Enumeration relies on a property of minimal sets: sorted by start,
their ends are strictly increasing (containment-freedom), so greedy
earliest-start chaining is also earliest-end — the ordered walk over
the first child's intervals followed by one minimality sweep is exact.
The unordered walk advances the min-start cell of a k-way front,
emitting one covering window per step, then minimizes. Both are
O(n·k + n log n) per doc over n child intervals.

Serving reuses the span kernels verbatim (``span_topk`` accepts any
clause implementing the adapter protocol: ``scoring_terms()`` /
``all_terms()`` / ``required_groups()`` / ``freq(pos_by_term)`` /
``expand(index)``): positions-sidecar scan pruned to the rule's term
buckets, required-group conjunction bound before per-doc work, driver
and distributed kernels, local top-k bounding the exchange.

Reference trail: Lucene queries/intervals (IntervalQuery,
Intervals.ordered/unordered/or/maxgaps/containing/…,
OrderedIntervalsSource, UnorderedIntervalsSource,
DisjunctionIntervalsSource), OpenSearch IntervalQueryBuilder DSL; the
reference plugin relies on the host for these (no interval code of its
own) — cited as the semantics source, not ported code.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..tokenizer import tokenize_py

_FILTER_KINDS = (
    "containing",
    "contained_by",
    "not_containing",
    "not_contained_by",
    "not_overlapping",
    "before",
    "after",
)

_EMPTY = np.empty(0, dtype=np.int64)


# ---------------------------------------------------------------------------
# rule tree
# ---------------------------------------------------------------------------
@dataclass(frozen=True)
class IMatch:
    terms: tuple
    max_gaps: int = -1
    ordered: bool = False
    ifilter: object = None  # (kind, rule) or None


@dataclass(frozen=True)
class IAllOf:
    sources: tuple
    max_gaps: int = -1
    ordered: bool = False
    ifilter: object = None


@dataclass(frozen=True)
class IAnyOf:
    sources: tuple
    ifilter: object = None


@dataclass(frozen=True)
class IExpand:
    """prefix/wildcard/regexp awaiting dictionary expansion → IAnyOf of
    single-term matches (Intervals.prefix's 128-expansion cap)."""

    kind: str
    value: str
    max_expansions: int = 128


def rule_from_json(obj: dict):
    """Host rule body → node tree. The top-level field nesting
    ({"intervals": {"text": {<rule>}}}) is unwrapped by the engine."""
    if not isinstance(obj, dict) or len(obj) != 1:
        raise ValueError("an intervals rule must have exactly one key")
    (kind, body), = obj.items()
    flt = None
    if isinstance(body, dict) and "filter" in body:
        fbody = body["filter"]
        if not isinstance(fbody, dict) or len(fbody) != 1:
            raise ValueError("intervals filter must have exactly one kind")
        (fkind, frule), = fbody.items()
        if fkind not in _FILTER_KINDS:
            raise ValueError(
                f"unknown intervals filter {fkind!r}; valid: {_FILTER_KINDS}"
            )
        flt = (fkind, rule_from_json(frule))
    if kind == "match":
        toks = tuple(tokenize_py(str(body.get("query", ""))))
        if not toks:
            raise ValueError("intervals match needs a non-empty query")
        return IMatch(
            toks,
            max_gaps=int(body.get("max_gaps", -1)),
            ordered=bool(body.get("ordered", False)),
            ifilter=flt,
        )
    if kind in ("all_of", "any_of"):
        subs = tuple(rule_from_json(r) for r in body.get("intervals", []))
        if not subs:
            raise ValueError(f"intervals {kind} needs sub-rules")
        if kind == "any_of":
            return IAnyOf(subs, ifilter=flt)
        return IAllOf(
            subs,
            max_gaps=int(body.get("max_gaps", -1)),
            ordered=bool(body.get("ordered", False)),
            ifilter=flt,
        )
    if kind in ("prefix", "wildcard", "regexp"):
        if isinstance(body, str):
            body = {"value": body}
        val = body.get("value", body.get(kind))
        if not val:
            raise ValueError(f"intervals {kind} needs a value")
        return IExpand(
            kind, str(val), int(body.get("max_expansions", 128))
        )
    raise ValueError(
        f"unknown intervals rule {kind!r}; valid: match/all_of/any_of/"
        "prefix/wildcard/regexp"
    )


# ---------------------------------------------------------------------------
# per-doc minimal-interval enumeration: lists of (start, end, gaps),
# inclusive ends, sorted by (start, end)
# ---------------------------------------------------------------------------
def _minimal(iv: list) -> list:
    """Containment sweep: keep exactly the minimal intervals. Sorted by
    (start asc, end desc), an interval survives iff its end is strictly
    below every survivor to its right (equal (s, e) collapse to one)."""
    if len(iv) <= 1:
        return sorted(iv, key=lambda x: (x[0], x[1]))
    iv = sorted(iv, key=lambda x: (x[0], -x[1]))
    out = []
    min_end = None
    for s, e, g in reversed(iv):
        if min_end is None or e < min_end:
            out.append((s, e, g))
            min_end = e
    out.reverse()
    return out


def _ordered(subs: list) -> list:
    """Minimal ordered conjunction: for each first-child interval, the
    greedy chain (each next child's earliest interval starting after the
    previous end — earliest start is earliest end on a minimal list),
    then one minimality sweep. gaps = width − Σ child widths."""
    k = len(subs)
    out = []
    starts = [np.asarray([x[0] for x in s], dtype=np.int64) for s in subs]
    for a in subs[0]:
        chain = [a]
        ok = True
        for j in range(1, k):
            i = int(np.searchsorted(starts[j], chain[-1][1] + 1, side="left"))
            if i >= len(subs[j]):
                ok = False
                break
            chain.append(subs[j][i])
        if not ok:
            break  # later first-intervals end even later — no chain either
        s, e = chain[0][0], chain[-1][1]
        gaps = (e - s + 1) - sum(c[1] - c[0] + 1 for c in chain)
        out.append((s, e, max(0, gaps)))
    return _minimal(out)


def _unordered(subs: list) -> list:
    """Minimal covering windows (one interval from each child, any
    arrangement, overlap allowed): k-way front advancing the min-start
    cell, one candidate window per step, then a minimality sweep.
    gaps = width − Σ child widths, clamped at 0 under overlap."""
    idx = [0] * len(subs)
    out = []
    while True:
        cells = [subs[j][idx[j]] for j in range(len(subs))]
        s = min(c[0] for c in cells)
        e = max(c[1] for c in cells)
        gaps = (e - s + 1) - sum(c[1] - c[0] + 1 for c in cells)
        out.append((s, e, max(0, gaps)))
        j_min = min(range(len(subs)), key=lambda j: cells[j][0])
        idx[j_min] += 1
        if idx[j_min] >= len(subs[j_min]):
            return _minimal(out)


def _overlaps(s, e, fs, fe) -> bool:
    return s <= fe and fs <= e


def _apply_filter(iv: list, ifilter, pos_by_term: dict) -> list:
    if ifilter is None:
        return iv
    kind, rule = ifilter
    ref = enumerate_intervals(rule, pos_by_term)
    if kind == "containing":
        return [x for x in iv if any(x[0] <= r[0] and r[1] <= x[1] for r in ref)]
    if kind == "contained_by":
        return [x for x in iv if any(r[0] <= x[0] and x[1] <= r[1] for r in ref)]
    if kind == "not_containing":
        return [
            x for x in iv if not any(x[0] <= r[0] and r[1] <= x[1] for r in ref)
        ]
    if kind == "not_contained_by":
        return [
            x for x in iv if not any(r[0] <= x[0] and x[1] <= r[1] for r in ref)
        ]
    if kind == "not_overlapping":
        return [
            x
            for x in iv
            if not any(_overlaps(x[0], x[1], r[0], r[1]) for r in ref)
        ]
    if kind == "before":
        # source intervals ending before some reference interval begins
        if not ref:
            return []
        last_start = max(r[0] for r in ref)
        return [x for x in iv if x[1] < last_start]
    # after: source intervals starting after some reference interval ends
    if not ref:
        return []
    first_end = min(r[1] for r in ref)
    return [x for x in iv if x[0] > first_end]


def enumerate_intervals(rule, pos_by_term: dict) -> list:
    """Minimal intervals of ``rule`` in one doc → [(start, end, gaps)]."""
    if isinstance(rule, IExpand):
        raise ValueError(
            "unexpanded intervals prefix/wildcard — serve through "
            "intervals_topk (it expands against the index dictionary)"
        )
    if isinstance(rule, IMatch):
        subs = []
        for t in rule.terms:
            ps = pos_by_term.get(t, _EMPTY)
            if ps.size == 0:
                return []
            subs.append([(int(p), int(p), 0) for p in ps])
        if len(subs) == 1:
            iv = subs[0]
        elif rule.ordered:
            iv = _ordered(subs)
        else:
            iv = _unordered(subs)
        if rule.max_gaps >= 0:
            iv = [x for x in iv if x[2] <= rule.max_gaps]
        return _apply_filter(iv, rule.ifilter, pos_by_term)
    if isinstance(rule, IAllOf):
        subs = [enumerate_intervals(r, pos_by_term) for r in rule.sources]
        if any(not s for s in subs):
            return []
        if len(subs) == 1:
            iv = subs[0]
        elif rule.ordered:
            iv = _ordered(subs)
        else:
            iv = _unordered(subs)
        if rule.max_gaps >= 0:
            iv = [x for x in iv if x[2] <= rule.max_gaps]
        return _apply_filter(iv, rule.ifilter, pos_by_term)
    # IAnyOf: re-minimized union, children's gaps pass through
    merged: list = []
    for r in rule.sources:
        merged.extend(enumerate_intervals(r, pos_by_term))
    return _apply_filter(_minimal(merged), rule.ifilter, pos_by_term)


# ---------------------------------------------------------------------------
# span-kernel adapter + serving
# ---------------------------------------------------------------------------
def _walk_terms(rule, include_filters: bool) -> set:
    if isinstance(rule, IExpand):
        raise ValueError("unexpanded intervals prefix/wildcard")
    out: set = set()
    if isinstance(rule, IMatch):
        out |= set(rule.terms)
    else:
        for r in rule.sources:
            out |= _walk_terms(r, include_filters)
    if include_filters and rule.ifilter is not None:
        out |= _walk_terms(rule.ifilter[1], include_filters)
    return out


def _walk_groups(rule) -> list:
    """Required-term conjunction bound (candidate pruning only): positive
    filters (containing/contained_by) also require their reference;
    negative/positional ones don't."""
    if isinstance(rule, IExpand):
        raise ValueError("unexpanded intervals prefix/wildcard")
    if isinstance(rule, IMatch):
        out = [frozenset([t]) for t in rule.terms]
    elif isinstance(rule, IAllOf):
        out = []
        for r in rule.sources:
            out.extend(_walk_groups(r))
    else:  # any_of: one any-member group over the whole subtree
        terms = _walk_terms(rule, include_filters=False)
        out = [frozenset(terms)] if terms else []
    if rule.ifilter is not None and rule.ifilter[0] in (
        "containing",
        "contained_by",
        "before",
        "after",
    ):
        out = out + _walk_groups(rule.ifilter[1])
    return out


def _expand_rule(rule, index):
    """IExpand → IAnyOf over the dictionary matches (None when empty)."""
    from .multiterm import expand_pattern

    if isinstance(rule, IExpand):
        exps = expand_pattern(index, rule.value, rule.kind)
        exps = exps[: max(0, rule.max_expansions)]
        if not exps:
            return None
        return IAnyOf(tuple(IMatch((t,)) for t, _df in exps))
    if isinstance(rule, IMatch):
        if rule.ifilter is None:
            return rule
        fr = _expand_rule(rule.ifilter[1], index)
        if fr is None:
            # a positive filter that can't match kills the rule; a
            # negative one just stops filtering
            return None if rule.ifilter[0] in (
                "containing", "contained_by", "before", "after"
            ) else IMatch(rule.terms, rule.max_gaps, rule.ordered, None)
        return IMatch(rule.terms, rule.max_gaps, rule.ordered,
                      (rule.ifilter[0], fr))
    subs = [_expand_rule(r, index) for r in rule.sources]
    flt = rule.ifilter
    if flt is not None:
        fr = _expand_rule(flt[1], index)
        if fr is None:
            if flt[0] in ("containing", "contained_by", "before", "after"):
                return None
            flt = None
        else:
            flt = (flt[0], fr)
    if isinstance(rule, IAnyOf):
        subs = [s for s in subs if s is not None]
        return IAnyOf(tuple(subs), ifilter=flt) if subs else None
    if any(s is None for s in subs):
        return None
    return IAllOf(tuple(subs), rule.max_gaps, rule.ordered, ifilter=flt)


class IntervalClause:
    """Adapter giving an intervals rule the span-kernel protocol, so
    ``span_topk`` serves it unchanged (same candidate bound, same
    driver/distributed kernels, same BM25-over-sloppy-freq scoring)."""

    def __init__(self, rule):
        self.rule = rule

    def expand(self, index):
        r = _expand_rule(self.rule, index)
        return None if r is None else IntervalClause(r)

    def scoring_terms(self) -> set:
        # IntervalQuery's weight gathers every term the source pulls
        # (filters included — they carry termStates too)
        return _walk_terms(self.rule, include_filters=True)

    def all_terms(self) -> set:
        return _walk_terms(self.rule, include_filters=True)

    def required_groups(self) -> list:
        return _walk_groups(self.rule)

    def freq(self, pos_by_term: dict) -> float:
        return float(
            sum(
                1.0 / (1.0 + max(0, g))
                for _s, _e, g in enumerate_intervals(self.rule, pos_by_term)
            )
        )


def intervals_topk(index, rule, k: int = 10, mode: str = "auto"):
    """Top-k docs for an intervals rule (dict or node tree), served from
    the positions sidecar through the span kernels."""
    from .spans import span_topk

    if isinstance(rule, dict):
        rule = rule_from_json(rule)
    return span_topk(index, IntervalClause(rule), k=k, mode=mode)


def intervals_topk_batch(index, rules, k: int = 10):
    """Batched intervals serving: [(query_id, rule-or-dict), ...] → one
    (query_id, doc_id, score, rank) frame from ONE positions pass; the
    adapter rides ``spans.span_topk_batch`` unchanged (batches may also
    mix span clauses and interval rules by calling it directly)."""
    from .spans import span_topk_batch

    qs = []
    for qid, rule in rules:
        if isinstance(rule, dict):
            rule = rule_from_json(rule)
        qs.append((qid, IntervalClause(rule)))
    return span_topk_batch(index, qs, k=k)

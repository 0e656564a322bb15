"""Term suggester (did-you-mean) — the reference host's `term` suggester
(Lucene DirectSpellChecker semantics, simplified where documented):

* per analyzed token, candidate corrections are dictionary terms within
  ``max_edits`` (≤2) sharing the first ``prefix_length`` characters;
* score = 1 − distance/min(len(candidate), len(token)) — the same
  similarity FuzzyTermsEnum uses for boosts;
* ``suggest_mode='missing'`` (default) only suggests for tokens absent
  from the index; 'popular' keeps candidates with df greater than the
  token's own; 'always' suggests regardless;
* sort 'score' = (similarity desc, df desc, term asc) —
  DirectSpellChecker's scoreFirst comparator; 'frequency' puts df first.

Entirely driver-side: the dictionary is vocabulary-sized and cached on
the index handle, so a suggest call is a few in-memory DP scans — the
coordinator-cheap pattern, no Spark job at all.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..tokenizer import tokenize_py
from .bm25 import BM25Index
from .fuzzy import _guard_unpruned_walk, levenshtein, osa_distance


@dataclass
class Suggestion:
    term: str
    score: float
    freq: int


def term_suggest(
    index: BM25Index,
    text: str,
    size: int = 5,
    max_edits: int = 2,
    prefix_length: int = 1,
    suggest_mode: str = "missing",
    sort: str = "score",
    transpositions: bool = True,
    allow_unpruned_dictionary: bool = False,
) -> dict[str, list[Suggestion]]:
    """{token: [Suggestion, ...]} for every analyzed token of ``text``.
    Tokens needing no correction (per suggest_mode) map to [].

    prefix_length=0 walks the full dictionary per token and is guarded by
    ``fuzzy.UNPRUNED_DICT_LIMIT`` (override with
    ``allow_unpruned_dictionary=True``); the default prefix_length=1 is a
    row-group range read, safe at any vocabulary size."""
    if suggest_mode not in ("missing", "popular", "always"):
        raise ValueError("suggest_mode must be missing|popular|always")
    if sort not in ("score", "frequency"):
        raise ValueError("sort must be score|frequency")
    if prefix_length <= 0:
        _guard_unpruned_walk(index, "term_suggest", allow_unpruned_dictionary)
    max_edits = min(int(max_edits), 2)
    dist = osa_distance if transpositions else levenshtein
    tokens = tokenize_py(text)
    stats = index.term_stats(sorted(set(tokens)))
    out: dict[str, list[Suggestion]] = {}
    for tok in tokens:
        if tok in out:
            continue
        own_df = stats.get(tok, 0)
        if suggest_mode == "missing" and own_df > 0:
            out[tok] = []
            continue
        pre = tok[:prefix_length]
        vocab = index.dictionary(prefix=pre or None)
        cands: list[Suggestion] = []
        for term, df in vocab:
            if term == tok or abs(len(term) - len(tok)) > max_edits:
                continue
            d = dist(term, tok)
            if d > max_edits:
                continue
            if suggest_mode == "popular" and df <= own_df:
                continue
            cands.append(
                Suggestion(term, 1.0 - d / min(len(term), len(tok)), df)
            )
        if sort == "score":
            cands.sort(key=lambda s: (-s.score, -s.freq, s.term))
        else:
            cands.sort(key=lambda s: (-s.freq, -s.score, s.term))
        out[tok] = cands[: max(int(size), 0)]
    return out

"""Pure-Python/numpy BM25 oracle — the in-process "reference engine".

Plays the role of Lucene's BM25 scorer that the reference plugin orchestrates
(cf. reference query/HybridQueryScorer.java consuming Lucene Scorers): the
Spark engine's top-k output must be rank-identical to this oracle on the
reference query set (BASELINE.json north rule).

Formulas (Lucene BM25Similarity, public):
    idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))
    tfnorm  = tf / (tf + k1 * (1 - b + b * dl / avgdl))
    score   = sum over query terms of idf(t) * tfnorm(t, d)

Score dtype contract (SURVEY.md §7 risk 1 — float drift must not break
rank-identity): per-(term, doc) contributions and the per-doc sum are
computed in float64, the final score is cast to float32. The float64 sum
makes the result independent of term evaluation order (the engine's MaxScore
path processes terms in upper-bound order, not alphabetical order), and the
float32 cast mirrors Lucene's float scores. Tie-break: score desc, then
doc_id asc (reference processor/combination/ScoreCombiner.java:43-56
SORTING_TIE_BREAKER).
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd

from . import BM25_B, BM25_K1
from .tokenizer import tokenize_py


class BM25Oracle:
    def __init__(self, docs: pd.DataFrame, k1: float = BM25_K1, b: float = BM25_B):
        """docs: DataFrame with columns (doc_id int64, text string)."""
        self.k1 = float(k1)
        self.b = float(b)
        self.doc_ids = docs["doc_id"].to_numpy(dtype=np.int64)
        tokens = [tokenize_py(t) for t in docs["text"].tolist()]
        self.dl = np.array([len(t) for t in tokens], dtype=np.float64)
        self.N = len(tokens)
        self.avgdl = float(self.dl.mean()) if self.N else 0.0
        # term -> (doc_row_indices, tfs)
        self.postings: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        acc: dict[str, list[tuple[int, int]]] = {}
        for row, toks in enumerate(tokens):
            for term, tf in Counter(toks).items():
                acc.setdefault(term, []).append((row, tf))
        for term, pairs in acc.items():
            rows = np.array([p[0] for p in pairs], dtype=np.int64)
            tfs = np.array([p[1] for p in pairs], dtype=np.float64)
            self.postings[term] = (rows, tfs)

    def idf(self, term: str) -> float:
        df = len(self.postings[term][0]) if term in self.postings else 0
        return float(np.log(1.0 + (self.N - df + 0.5) / (df + 0.5)))

    def score_all(
        self, query_text: str, min_match: int = 1
    ) -> tuple[np.ndarray, np.ndarray]:
        """Return (doc_ids, scores float32) for all docs matching ≥
        min_match distinct query terms (scores always sum over every
        matched term — the Lucene BooleanQuery coverage contract)."""
        terms = sorted(set(tokenize_py(query_text)))
        scores = np.zeros(self.N, dtype=np.float64)
        n_matched = np.zeros(self.N, dtype=np.int64)
        for t in terms:
            if t not in self.postings:
                continue
            rows, tfs = self.postings[t]
            denom = tfs + self.k1 * (1.0 - self.b + self.b * self.dl[rows] / self.avgdl)
            scores[rows] += self.idf(t) * (tfs / denom)
            n_matched[rows] += 1
        idx = np.flatnonzero(n_matched >= max(min_match, 1))
        return self.doc_ids[idx], scores[idx].astype(np.float32)

    def topk(
        self, query_text: str, k: int = 10, min_match: int = 1
    ) -> pd.DataFrame:
        ids, scores = self.score_all(query_text, min_match=min_match)
        # sort: score desc, doc_id asc
        order = np.lexsort((ids, -scores.astype(np.float64)))[:k]
        return pd.DataFrame(
            {
                "doc_id": ids[order],
                "score": scores[order],
                "rank": np.arange(1, len(order) + 1, dtype=np.int32),
            }
        )

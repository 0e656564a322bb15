"""Phrase suggester — the reference host's `phrase` suggest API
(Lucene's noisy-channel PhraseSuggester): whole-phrase did-you-mean
built from per-token candidate corrections re-ranked by a word n-gram
language model over the index's own text.

Two pieces, split the way a 100-TB deployment needs them split:

* **`BigramLM`** — the language-model asset. `BigramLM.build` is one
  distributed pass over the corpus (tokenize → posexplode adjacency →
  two groupBy counts, all Catalyst; the same shape as the index's term
  dictionary build) writing unigram and bigram count parquet sorted by
  leading word. The handle then serves **driver-side pyarrow point
  reads with predicate pushdown** — a suggest call touches only the
  row groups covering its candidate words, never the full table, so
  serving cost is independent of corpus size (the dictionary-read
  pattern from `query/bm25.py:190`).
* **`phrase_suggest`** — per-token candidates from the term
  suggester's dictionary expansion (DirectSpellChecker semantics),
  whole-phrase enumeration bounded by ``max_errors``, scored by
  channel × LM and gated by ``confidence``.

Scoring model (documented simplification of Lucene's NoisyChannel
internals — same factors, flattened weighting):

* LM(phrase) = P(w₁) · Π P(wᵢ | wᵢ₋₁) with ``stupid_backoff``
  (default, discount 0.4: P(w|v) = c(v,w)/c(v), else
  discount·c(w)/N) or ``laplace`` (α-add over the bigram row:
  (c(v,w)+α)/(c(v)+α·V)).
* channel per token: an UNCHANGED in-vocabulary token contributes
  ``real_word_error_likelihood`` (default 0.95 — the API's prior that
  an existing word is nonetheless correct-as-typed); an unchanged
  out-of-vocabulary token contributes 1−rwel; a CORRECTION contributes
  the DirectSpellChecker similarity 1 − d/min(len). Lucene splits
  these factors across generator and scorer; the product here keeps
  the same ordering on every single-error case.
* a suggestion is kept only if score > ``confidence`` × score of the
  unchanged phrase (confidence=0 keeps everything).

The reference plugin has no suggester code of its own — this is the
host-API surface its users exercise (the OpenSearch `phrase` suggester
documentation defines the knobs reproduced here).
"""

from __future__ import annotations

import json
import math
import os
from dataclasses import dataclass
from itertools import combinations, product

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tokenizer import tokenize_expr, tokenize_py
from .bm25 import BM25Index
from .suggest import term_suggest

__all__ = ["BigramLM", "phrase_suggest", "PhraseSuggestion"]

# hard ceiling on enumerated phrase combinations — max_errors times
# num_candidates is user-bounded, but a pathological 30-token input
# with errors everywhere must degrade loudly, not hang the driver
_MAX_COMBOS = 20_000


@dataclass
class PhraseSuggestion:
    text: str
    score: float


class BigramLM:
    """Unigram + bigram count asset under ``path``:
    ``unigrams/`` (term, cnt) and ``bigrams/`` (w1, w2, cnt) parquet,
    each sorted by leading word within one file per shuffle partition
    so pyarrow row-group stats prune point reads; ``meta.json`` holds
    the corpus totals."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        with open(os.path.join(path, "meta.json")) as f:
            meta = json.load(f)
        self.n_tokens = int(meta["n_tokens"])
        self.vocab_size = int(meta["vocab_size"])
        self._uni_ds = None
        self._bi_ds = None

    # ---- build --------------------------------------------------------
    @staticmethod
    def build(
        spark: SparkSession,
        corpus: DataFrame,
        path: str,
        text_col: str = "text",
        partitions: int = 8,
    ) -> "BigramLM":
        toks = corpus.select(
            tokenize_expr(F.col(text_col)).alias("t")
        ).filter(F.size("t") > 0)
        toks = toks.persist()
        try:
            uni = (
                toks.select(F.explode("t").alias("term"))
                .groupBy("term")
                .agg(F.count("*").alias("cnt"))
            )
            # adjacency without a self-join: slice off the last token,
            # pair each with its successor positionally — stays inside
            # whole-stage codegen, one shuffle for the count
            bi = (
                toks.filter(F.size("t") > 1)
                .select(
                    F.explode(
                        F.expr(
                            "transform(slice(t, 1, size(t) - 1),"
                            " (x, i) -> struct(x AS w1, t[i + 1] AS w2))"
                        )
                    ).alias("p")
                )
                .select("p.w1", "p.w2")
                .groupBy("w1", "w2")
                .agg(F.count("*").alias("cnt"))
            )
            (
                uni.repartitionByRange(partitions, "term")
                .sortWithinPartitions("term")
                .write.mode("overwrite")
                .parquet(os.path.join(path, "unigrams"))
            )
            (
                bi.repartitionByRange(partitions, "w1")
                .sortWithinPartitions("w1", "w2")
                .write.mode("overwrite")
                .parquet(os.path.join(path, "bigrams"))
            )
            totals = toks.select(
                F.sum(F.size("t")).alias("n"),
            ).collect()[0]
            vocab = uni.count()
        finally:
            toks.unpersist()
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(
                {"n_tokens": int(totals["n"] or 0), "vocab_size": int(vocab)},
                f,
            )
        return BigramLM(spark, path)

    # ---- pruned point reads --------------------------------------------
    def unigram_counts(self, terms: set[str]) -> dict[str, int]:
        import pyarrow.dataset as ds

        if not terms:
            return {}
        if self._uni_ds is None:
            self._uni_ds = ds.dataset(
                os.path.join(self.path, "unigrams"), format="parquet"
            )
        tbl = self._uni_ds.to_table(
            filter=ds.field("term").isin(sorted(terms))
        )
        return dict(
            zip(tbl["term"].to_pylist(), (int(c) for c in tbl["cnt"].to_pylist()))
        )

    def bigram_counts(
        self, pairs: set[tuple[str, str]]
    ) -> dict[tuple[str, str], int]:
        import pyarrow.dataset as ds

        if not pairs:
            return {}
        if self._bi_ds is None:
            self._bi_ds = ds.dataset(
                os.path.join(self.path, "bigrams"), format="parquet"
            )
        lead = sorted({w1 for w1, _ in pairs})
        tbl = self._bi_ds.to_table(filter=ds.field("w1").isin(lead))
        out = {}
        for w1, w2, c in zip(
            tbl["w1"].to_pylist(), tbl["w2"].to_pylist(), tbl["cnt"].to_pylist()
        ):
            if (w1, w2) in pairs:
                out[(w1, w2)] = int(c)
        return out


def _lm_logscore(
    words: list[str],
    uni: dict[str, int],
    bi: dict[tuple[str, str], int],
    lm: BigramLM,
    smoothing: str,
    discount: float,
    alpha: float,
) -> float:
    n = max(lm.n_tokens, 1)
    # OOV unigram floor: half a count — keeps log finite without
    # letting an absent word outscore any attested one
    def p_uni(w: str) -> float:
        return max(uni.get(w, 0), 0.5) / n

    s = math.log(p_uni(words[0]))
    for v, w in zip(words, words[1:]):
        cvw = bi.get((v, w), 0)
        cv = uni.get(v, 0)
        if smoothing == "laplace":
            p = (cvw + alpha) / (cv + alpha * max(lm.vocab_size, 1))
        else:  # stupid_backoff
            p = cvw / cv if cvw > 0 and cv > 0 else discount * p_uni(w)
        s += math.log(p)
    return s


def phrase_suggest(
    index: BM25Index,
    lm: BigramLM,
    text: str,
    size: int = 5,
    max_edits: int = 2,
    prefix_length: int = 1,
    num_candidates: int = 5,
    max_errors: float = 1.0,
    confidence: float = 1.0,
    real_word_error_likelihood: float = 0.95,
    smoothing: str = "stupid_backoff",
    discount: float = 0.4,
    alpha: float = 0.5,
    separator: str = " ",
    transpositions: bool = True,
) -> list[PhraseSuggestion]:
    """Top-``size`` corrected phrases, score-descending (ties by text
    ascending for determinism). The unchanged phrase is never returned
    as a suggestion — only rewrites beating ``confidence`` × its score.

    ``max_errors`` ≥ 1 is an absolute cap (default 1.0 = at most one
    corrected term), values in [0..1) a fraction of the token count —
    the API's dual reading."""
    if smoothing not in ("stupid_backoff", "laplace"):
        raise ValueError("smoothing must be stupid_backoff|laplace")
    tokens = tokenize_py(text)
    if not tokens:
        return []
    n = len(tokens)
    # per the API: >= 1 is an absolute count (default 1.0 = at most one
    # misspelled term), [0..1) is a fraction of the query terms
    e_max = (
        int(max_errors)
        if max_errors >= 1
        else max(1, int(max_errors * n))
    )
    e_max = min(e_max, n)

    # per-token correction candidates through the term suggester
    # (suggest_mode='always': real-word errors are this API's point)
    per_tok = term_suggest(
        index,
        text,
        size=num_candidates,
        max_edits=max_edits,
        prefix_length=prefix_length,
        suggest_mode="always",
        transpositions=transpositions,
    )
    dict_terms = {t for t, _df in index.dictionary()} if tokens else set()
    cands: list[list[tuple[str, float]]] = []
    rwel = float(real_word_error_likelihood)
    for tok in tokens:
        # (word, channel score); slot 0 is always the unchanged token
        keep = rwel if tok in dict_terms else 1.0 - rwel
        opts = [(tok, keep)]
        for s in per_tok.get(tok, []):
            # similarity 0 (d == min length) would be log(0) in the
            # channel — Lucene's DirectSpellChecker accuracy floor
            # discards such candidates before they reach the scorer
            if s.term != tok and s.score > 0:
                opts.append((s.term, s.score))
        cands.append(opts)

    combos: list[tuple[tuple[int, ...], tuple[int, ...]]] = []
    for e in range(1, e_max + 1):
        for positions in combinations(range(n), e):
            if all(len(cands[p]) > 1 for p in positions):
                combos.append(positions)
    # enumerate bounded: Σ Π (len(cands[p]) − 1) over chosen positions
    total = sum(
        math.prod(len(cands[p]) - 1 for p in ps) for ps in combos
    )
    if total > _MAX_COMBOS:
        raise ValueError(
            f"phrase_suggest would enumerate {total} rewrites "
            f"(cap {_MAX_COMBOS}); lower max_errors or num_candidates"
        )

    phrases: list[tuple[list[str], float]] = []  # (words, Σ log channel)
    base_channel = sum(math.log(c) for _, c in (o[0] for o in cands))
    phrases.append(([o[0][0] for o in cands], base_channel))
    for ps in combos:
        pools = [
            [(w, c) for w, c in cands[p][1:]] for p in ps
        ]
        for choice in product(*pools):
            words = [o[0][0] for o in cands]
            chan = base_channel
            for p, (w, c) in zip(ps, choice):
                words[p] = w
                chan += math.log(c) - math.log(cands[p][0][1])
            phrases.append((words, chan))

    needed_terms = {w for ws, _ in phrases for w in ws}
    needed_pairs = {
        (v, w) for ws, _ in phrases for v, w in zip(ws, ws[1:])
    }
    uni = lm.unigram_counts(needed_terms)
    bi = lm.bigram_counts(needed_pairs)

    def total_log(ws: list[str], chan: float) -> float:
        return chan + _lm_logscore(
            ws, uni, bi, lm, smoothing, discount, alpha
        )

    base_score = total_log(phrases[0][0], phrases[0][1])
    out: list[PhraseSuggestion] = []
    seen: set[str] = set()
    original = separator.join(tokens)
    for ws, chan in phrases[1:]:
        txt = separator.join(ws)
        if txt == original or txt in seen:
            continue
        seen.add(txt)
        score = total_log(ws, chan)
        if score > base_score + math.log(max(confidence, 1e-12)):
            out.append(PhraseSuggestion(txt, math.exp(score)))
    out.sort(key=lambda s: (-s.score, s.text))
    return out[: max(int(size), 0)]

"""Payload-weight WordPiece analyzer for neural_sparse queries.

The reference's neural_sparse query accepts an ``analyzer`` name
(``NeuralSparseQueryBuilder.java:93-95``, default ``bert-uncased``) as an
alternative to model inference: the named Lucene analyzer tokenizes the
query text and each emitted token carries an optional payload float that
becomes the token's query weight — absent payload means weight 1.0, and
only weights > 0 enter the token map
(``NeuralSparseQueryBuilder.java:453-494`` ``getQueryTokens``).  The
``bert-uncased`` analyzer there is a WordPiece tokenizer whose payload
weights come from a bundled token-weight table.

This module is the Spark-native analog, built from the *published*
WordPiece algorithm (BERT; HuggingFace ``tokenizers`` semantics — greedy
longest-match-first with ``##`` continuation pieces), with the weight
table an explicit, user-supplied mapping:

* :class:`WordPieceAnalyzer` — lowercase + accent-strip + punctuation
  split basic tokenization, then greedy WordPiece against a vocab;
  ``analyze(text)`` returns the ``{token: weight}`` map the sparse query
  kernels consume (``query/sparse.py``, ``index/sparse.py``).
* :func:`vocab_from_corpus` — deterministic vocab builder (top whole
  words by document frequency + single-char pieces so every alphanumeric
  word decomposes instead of collapsing to ``[UNK]``).
* :func:`weights_from_idf` — an IDF-shaped weight table over a corpus,
  playing the role of the reference analyzer's bundled weight file.
* :func:`analyze_features` — doc-side encoding: one Arrow-batched pandas
  UDF producing the ``map<string,float>`` features column that
  ``SparseIndexBuilder`` / ``sparse_topk`` already accept.

No model downloads, no external vocab files: vocabularies and weight
tables are derived from the corpus (or supplied by the caller), which
keeps the whole path deterministic and oracle-replayable.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "WordPieceAnalyzer",
    "analyze_features",
    "vocab_from_corpus",
    "weights_from_idf",
]


def _is_punctuation(ch: str) -> bool:
    """BERT BasicTokenizer punctuation test: ASCII symbol ranges are
    treated as punctuation even where Unicode disagrees (e.g. ``$``,
    ``^``), plus every Unicode P* category."""
    cp = ord(ch)
    if (
        33 <= cp <= 47
        or 58 <= cp <= 64
        or 91 <= cp <= 96
        or 123 <= cp <= 126
    ):
        return True
    return unicodedata.category(ch).startswith("P")


def _strip_accents(text: str) -> str:
    return "".join(
        ch
        for ch in unicodedata.normalize("NFD", text)
        if unicodedata.category(ch) != "Mn"
    )


def basic_tokenize(text: str) -> list[str]:
    """BERT-uncased basic tokenization: lowercase, strip accents, split on
    whitespace, then split punctuation characters into their own tokens.
    Control characters are dropped. (CJK per-character splitting is out of
    scope for this engine's corpora and intentionally not implemented.)"""
    if not text:
        return []
    text = _strip_accents(text.lower())
    out: list[str] = []
    for word in text.split():
        buf: list[str] = []
        for ch in word:
            cat = unicodedata.category(ch)
            if cat.startswith("C"):  # control chars
                continue
            if _is_punctuation(ch):
                if buf:
                    out.append("".join(buf))
                    buf = []
                out.append(ch)
            else:
                buf.append(ch)
        if buf:
            out.append("".join(buf))
    return out


class WordPieceAnalyzer:
    """Greedy longest-match-first WordPiece over an explicit vocab, with a
    payload-weight table.

    ``analyze(text)`` mirrors the reference's analyzer token loop
    (``NeuralSparseQueryBuilder.java:460-472``): each emitted piece gets
    ``token_weights[piece]`` (default 1.0 when the table has no entry —
    the "payload absent" case), pieces with weight <= 0 are dropped, and
    repeated pieces collapse to one map entry exactly as the reference's
    ``HashMap.put`` does.
    """

    def __init__(
        self,
        vocab,
        token_weights: dict[str, float] | None = None,
        unk_token: str = "[UNK]",
        max_input_chars_per_word: int = 100,
    ):
        self.vocab = frozenset(vocab)
        self.token_weights = dict(token_weights or {})
        self.unk_token = unk_token
        self.max_input_chars_per_word = int(max_input_chars_per_word)

    # -- tokenization --------------------------------------------------
    def _pieces(self, word: str) -> list[str]:
        if len(word) > self.max_input_chars_per_word:
            return [self.unk_token]
        pieces: list[str] = []
        start = 0
        while start < len(word):
            end = len(word)
            cur = None
            while start < end:
                sub = word[start:end]
                if start > 0:
                    sub = "##" + sub
                if sub in self.vocab:
                    cur = sub
                    break
                end -= 1
            if cur is None:
                return [self.unk_token]  # whole word becomes one UNK
            pieces.append(cur)
            start = end
        return pieces

    def tokenize(self, text: str) -> list[str]:
        out: list[str] = []
        for word in basic_tokenize(text):
            out.extend(self._pieces(word))
        return out

    # -- the analyzer surface -------------------------------------------
    def analyze(self, text: str) -> dict[str, float]:
        """Token→weight map for a query (or document) text."""
        tokens: dict[str, float] = {}
        for piece in self.tokenize(text):
            w = float(self.token_weights.get(piece, 1.0))
            if w > 0:
                tokens[piece] = w
        return tokens


def vocab_from_corpus(
    df: DataFrame, text_col: str = "text", max_terms: int = 30000
) -> list[str]:
    """Deterministic WordPiece vocab from a corpus: the ``max_terms`` most
    document-frequent whole words (ties broken by token asc) plus every
    single character and its ``##`` continuation, so unseen alphanumeric
    words decompose into char pieces instead of ``[UNK]``.  One distinct +
    groupBy pass; the result is vocab-bounded, so collecting it to the
    driver is the same contract as ``BM25Index.dictionary()``."""
    from .tokenizer import tokenize_expr

    rows = (
        df.select(F.explode(tokenize_expr(text_col)).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("df"))
        .orderBy(F.desc("df"), F.asc("tok"))
        .limit(int(max_terms))
        .collect()
    )
    vocab = {r["tok"] for r in rows}
    chars = set("abcdefghijklmnopqrstuvwxyz0123456789")
    for w in list(vocab):
        chars.update(w)
    vocab.update(chars)
    vocab.update("##" + c for c in chars)
    vocab.add("[UNK]")
    return sorted(vocab)


def weights_from_idf(
    df: DataFrame, text_col: str = "text", vocab=None
) -> dict[str, float]:
    """IDF-shaped payload-weight table (the stand-in for the reference
    analyzer's bundled token-weight file): BM25-style
    ``ln(1 + (N - df + 0.5)/(df + 0.5))`` per whole-word token.  Pieces
    not in the table analyze at weight 1.0."""
    import math

    from .tokenizer import tokenize_expr

    n_docs = df.count()
    rows = (
        df.select(
            F.explode(F.array_distinct(tokenize_expr(text_col))).alias("tok")
        )
        .groupBy("tok")
        .agg(F.count("*").alias("df"))
        .collect()
    )
    keep = None if vocab is None else frozenset(vocab)
    return {
        r["tok"]: math.log(
            1.0 + (n_docs - r["df"] + 0.5) / (r["df"] + 0.5)
        )
        for r in rows
        if keep is None or r["tok"] in keep
    }


def analyze_features(
    df: DataFrame,
    analyzer: WordPieceAnalyzer,
    text_col: str = "text",
    out_col: str = "features",
) -> DataFrame:
    """Doc-side sparse encoding through the analyzer: adds a
    ``map<string,float>`` column compatible with ``SparseIndexBuilder``
    and ``query.sparse.sparse_topk``.  One Arrow-batched pandas UDF; the
    (vocab, weights) closure ships once per task, not per row."""
    vocab = analyzer.vocab
    weights = analyzer.token_weights
    unk = analyzer.unk_token
    maxw = analyzer.max_input_chars_per_word

    @F.pandas_udf(T.MapType(T.StringType(), T.FloatType()))
    def _encode(texts: pd.Series) -> pd.Series:
        an = WordPieceAnalyzer(
            vocab, weights, unk_token=unk, max_input_chars_per_word=maxw
        )
        return texts.fillna("").map(an.analyze)

    return df.withColumn(out_col, _encode(F.col(text_col)))

"""match_phrase: exact-phrase top-k over the positions sidecar.

Lucene semantics (`PhraseQuery` + `ExactPhraseScorer`, the OpenSearch
`match_phrase` execution path the reference plugin's text sub-queries can
carry inside hybrid requests):

* phrase frequency = number of positions p such that token_j occurs at
  p + j for every j in the phrase (duplicate tokens allowed — "a b a"
  requires the SAME term at offsets 0 and 2);
* score = idf_total · freq / (freq + k1·(1 − b + b·dl/avgdl)) where
  idf_total sums the Lucene idf of every token IN SEQUENCE (duplicates
  counted per occurrence, matching PhraseWeight building one TermStatistics
  per term in the phrase array);
* a phrase with any out-of-vocabulary token matches nothing.

Execution shapes, mirroring the BM25 serve paths:

* driver mode (Σdf under ``DRIVER_MAX_POSTINGS``): pyarrow
  predicate-pushdown read of the phrase terms' position rows (term_bucket
  partition pruning + tid filter), candidate docs = sorted-array
  intersection starting from the RAREST term, freq via vectorized
  np.intersect1d chains — the coordinator-cheap-query pattern;
* distributed mode: partition-pruned scan → left-semi join against the
  rarest term's doc set (bounds the shuffle at min-df × phrase length,
  the classic leading-term optimization) → doc-sharded
  ``applyInPandas`` verify/score kernel → TakeOrderedAndProject top-k.

Query-time tombstones (``BM25Index.with_deletes``) are honored with the
same stale-stats contract as BM25: deleted docs vanish, live scores keep
full-corpus idf/avgdl.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..index.build import N_TERM_BUCKETS, tid_py
from ..index.positions import has_positions
from ..ranking import topk_rank_window
from ..tokenizer import tokenize_expr, tokenize_py
from .bm25 import DRIVER_MAX_POSTINGS, BM25Index, _live_mask, lucene_idf


def phrase_freq(pos_by_offset: list[np.ndarray]) -> int:
    """|{p : token_j at p+j ∀j}| via sorted-intersect chains (arrays come
    sorted off the index; early-exits on the first empty intersection)."""
    P = np.asarray(pos_by_offset[0], dtype=np.int64)
    for j in range(1, len(pos_by_offset)):
        if P.size == 0:
            return 0
        P = np.intersect1d(
            P,
            np.asarray(pos_by_offset[j], dtype=np.int64) - j,
            assume_unique=True,
        )
    return int(P.size)


def _empty_topk(spark) -> DataFrame:
    return spark.range(0).select(
        F.col("id").alias("doc_id"),
        F.lit(0.0).cast("float").alias("score"),
        F.lit(0).cast("int").alias("rank"),
    )


def _score_docs(
    doc_ids: np.ndarray,
    freqs: np.ndarray,
    dls: np.ndarray,
    idf_total: float,
    k1: float,
    b: float,
    avgdl: float,
) -> pd.DataFrame:
    f = freqs.astype(np.float64)
    tfn = f / (f + k1 * (1.0 - b + b * dls.astype(np.float64) / avgdl))
    return pd.DataFrame(
        {
            "doc_id": doc_ids,
            "score": (idf_total * tfn).astype(np.float32),
        }
    )


def phrase_scored_scan(
    docs: DataFrame,
    phrase_text: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-scan exact-phrase scores → (doc_id, score double) — the
    index-free plan ``Engine`` routes to when no positions sidecar is
    attached (or a pre-scoring filter / collect-time allowed-set makes the
    index kernels' pre-truncated top-k unusable).

    Pure Catalyst: tokenize → posexplode → per-offset positional
    equi-joins keyed on (doc_id, aligned pos) → count = phrase freq. The
    join chain is doc-keyed so hot terms spread across partitions; each
    join's build side is one phrase token's postings (corpus-frequency
    bounded, never the whole corpus). Stats (n_docs/avgdl/df) come from
    the SAME scoped frame, matching ``bm25_scored``'s convention for
    filtered sub-queries."""
    tokens = tokenize_py(phrase_text)
    spark = docs.sparkSession
    if not tokens:
        return spark.range(0).select(
            F.col("id").alias("doc_id"), F.lit(0.0).alias("score")
        )
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        tokenize_expr(text_col).alias("toks"),
    ).withColumn("dl", F.size("toks"))
    srow = toks.agg(
        F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl")
    ).collect()[0]
    n_docs, avgdl = int(srow["n"]), float(srow["avgdl"] or 1.0)
    tokpos = toks.select(
        "doc_id", "dl", F.posexplode("toks").alias("pos", "term")
    ).filter(F.col("term").isin(sorted(set(tokens))))
    dfreq = {
        r["term"]: int(r["df"])
        for r in tokpos.groupBy("term")
        .agg(F.countDistinct("doc_id").alias("df"))
        .collect()
    }
    if any(t not in dfreq for t in tokens):
        return spark.range(0).select(
            F.col("id").alias("doc_id"), F.lit(0.0).alias("score")
        )
    idf_total = sum(lucene_idf(n_docs, dfreq[t]) for t in tokens)
    from .. import BM25_B, BM25_K1

    chain = tokpos.filter(F.col("term") == tokens[0]).select(
        "doc_id", "dl", "pos"
    )
    for j in range(1, len(tokens)):
        pj = tokpos.filter(F.col("term") == tokens[j]).select(
            "doc_id", (F.col("pos") - j).alias("pos")
        )
        chain = chain.join(pj, ["doc_id", "pos"])
    fr = chain.groupBy("doc_id", "dl").agg(F.count(F.lit(1)).alias("freq"))
    return fr.select(
        "doc_id",
        (
            F.lit(idf_total)
            * F.col("freq")
            / (
                F.col("freq")
                + F.lit(BM25_K1)
                * (1.0 - BM25_B + BM25_B * F.col("dl") / F.lit(avgdl))
            )
        ).alias("score"),
    )


def phrase_topk(
    index: BM25Index, phrase_text: str, k: int = 10, mode: str = "auto"
) -> DataFrame:
    """Top-k exact-phrase matches. Returns (doc_id, score, rank).

    mode: 'auto' | 'driver' | 'distributed' — same contract as
    ``bm25_topk``. Requires ``build_positions`` to have been run on the
    index (raises otherwise: positions are an opt-in sidecar)."""
    spark = index.spark
    if not has_positions(index.path):
        raise ValueError(
            f"index at {index.path} has no positions sidecar — run "
            "index.positions.build_positions first (phrase queries read "
            "positions, which the BM25-only build does not store)"
        )
    tokens = tokenize_py(phrase_text)
    if not tokens:
        return _empty_topk(spark)
    stats = index.term_stats(sorted(set(tokens)))
    if any(t not in stats for t in tokens):
        return _empty_topk(spark)  # OOV token ⇒ phrase cannot match
    idf_total = sum(lucene_idf(index.n_docs, stats[t]) for t in tokens)
    # offsets per DISTINCT tid: duplicate tokens share one posting fetch
    offsets: dict[int, list[int]] = {}
    for j, t in enumerate(tokens):
        offsets.setdefault(tid_py(t), []).append(j)
    rarest = tid_py(min(set(tokens), key=lambda t: stats[t]))
    sum_df = sum(stats[t] for t in set(tokens))

    if mode == "driver" or (mode == "auto" and sum_df <= DRIVER_MAX_POSTINGS):
        pdf = _phrase_topk_driver(index, offsets, rarest, idf_total, k)
        return spark.createDataFrame(
            pdf, schema="doc_id long, score float, rank int"
        )
    return _phrase_topk_distributed(index, offsets, rarest, idf_total, k)


def _positions_path(index: BM25Index) -> str:
    return os.path.join(index.path, "positions")


def _phrase_topk_driver(
    index: BM25Index,
    offsets: dict[int, list[int]],
    rarest: int,
    idf_total: float,
    k: int,
) -> pd.DataFrame:
    import pyarrow.dataset as ds

    tids = sorted(offsets)
    buckets = sorted({t % N_TERM_BUCKETS for t in tids})
    tbl = ds.dataset(
        _positions_path(index), format="parquet", partitioning="hive"
    ).to_table(
        columns=["tid", "doc_id", "dl", "positions"],
        filter=ds.field("term_bucket").isin(buckets)
        & ds.field("tid").isin(tids),
    )
    tid_arr = tbl["tid"].to_numpy()
    doc_arr = tbl["doc_id"].to_numpy()
    dl_arr = tbl["dl"].to_numpy()
    # positions stay an arrow ListArray: flat value buffer + row offsets,
    # no per-row python materialization (to_pylist was the kernel's cost
    # at stopword-bigram scale)
    pos_list = tbl.column("positions").combine_chunks()
    pos_flat = pos_list.values.to_numpy(zero_copy_only=False).astype(np.int64)
    pos_offs = np.asarray(pos_list.offsets).astype(np.int64)
    # per-tid sorted doc views (row order within a tid is doc-sorted on
    # disk but fragments may interleave — argsort to be layout-independent)
    per_tid: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    for t in tids:
        rows = np.flatnonzero(tid_arr == t)
        order = np.argsort(doc_arr[rows], kind="mergesort")
        per_tid[t] = (doc_arr[rows[order]], rows[order])
    cand, cand_rows = per_tid[rarest]
    live = _live_mask(cand, index.deletes)
    if live is not None:
        cand, cand_rows = cand[live], cand_rows[live]
    # conjunction: docs present for EVERY distinct term (sorted-array isin)
    row_ix = {rarest: cand_rows}
    for t in tids:
        if t == rarest:
            continue
        docs_t, rows_t = per_tid[t]
        if docs_t.size == 0 or cand.size == 0:
            cand = cand[:0]
            break
        pos = np.searchsorted(docs_t, cand)
        ok = (pos < len(docs_t)) & (
            docs_t[np.minimum(pos, max(len(docs_t) - 1, 0))] == cand
        )
        cand = cand[ok]
        for tt in row_ix:
            row_ix[tt] = row_ix[tt][ok]
        row_ix[t] = rows_t[pos[ok]]
    empty = pd.DataFrame(
        {
            "doc_id": pd.Series(dtype="int64"),
            "score": pd.Series(dtype="float32"),
            "rank": pd.Series(dtype="int32"),
        }
    )
    if cand.size == 0:
        return empty
    # vectorized phrase freq across ALL candidates at once: tag every
    # position with candidate_index·STRIDE, run ONE sorted-intersection
    # chain over the tagged streams (per-doc position lists are ascending
    # and strides separate docs, so each stream is strictly increasing),
    # then bincount the surviving tags. Replaces a python loop of
    # per-candidate intersect1d calls — the dominant cost for common-term
    # phrases (tens of thousands of candidates).
    STRIDE = np.int64(1) << 40  # > any dl; cand.size < 2^23 by DRIVER cap
    tagged: dict[int, np.ndarray] = {}
    for t in tids:
        rows = row_ix[t]
        starts = pos_offs[rows]
        lens = pos_offs[rows + 1] - starts
        total = int(lens.sum())
        if total == 0:
            tagged[t] = np.empty(0, dtype=np.int64)
            continue
        cum_prev = np.concatenate(([0], np.cumsum(lens)[:-1]))
        gather = (
            np.arange(total, dtype=np.int64)
            - np.repeat(cum_prev, lens)
            + np.repeat(starts, lens)
        )
        tagged[t] = pos_flat[gather] + np.repeat(
            np.arange(cand.size, dtype=np.int64) * STRIDE, lens
        )
    P: np.ndarray | None = None
    for t, js in offsets.items():
        for j in js:
            Q = tagged[t] - j
            P = Q if P is None else np.intersect1d(P, Q, assume_unique=True)
            if P.size == 0:
                break
        if P is not None and P.size == 0:
            break
    freqs = (
        np.bincount(P // STRIDE, minlength=cand.size)
        if P is not None and P.size
        else np.zeros(cand.size, dtype=np.int64)
    )
    hit = freqs > 0
    if not hit.any():
        return empty
    scored = _score_docs(
        cand[hit],
        freqs[hit],
        dl_arr[row_ix[rarest][hit]],
        idf_total,
        index.k1,
        index.b,
        index.avgdl,
    )
    scored = scored.sort_values(
        ["score", "doc_id"], ascending=[False, True], kind="mergesort"
    ).head(k)
    scored["rank"] = np.arange(1, len(scored) + 1, dtype=np.int32)
    return scored.reset_index(drop=True)


def _phrase_topk_distributed(
    index: BM25Index,
    offsets: dict[int, list[int]],
    rarest: int,
    idf_total: float,
    k: int,
) -> DataFrame:
    spark = index.spark
    tids = sorted(offsets)
    buckets = sorted({t % N_TERM_BUCKETS for t in tids})
    pos = spark.read.parquet(_positions_path(index)).filter(
        F.col("term_bucket").isin(buckets) & F.col("tid").isin(tids)
    )
    # leading-term bound: only docs containing the rarest term shuffle
    rare_docs = pos.filter(F.col("tid") == rarest).select("doc_id")
    cand = pos.join(rare_docs, "doc_id", "left_semi").withColumn(
        "doc_shard",
        F.pmod(F.xxhash64("doc_id", F.lit(13)), F.lit(index.n_shards)).cast(
            "int"
        ),
    )
    k1, b, avgdl = index.k1, index.b, index.avgdl
    deletes = index.deletes
    offs = {t: list(js) for t, js in offsets.items()}
    n_terms = len(offs)
    L = 1 + max(j for js in offs.values() for j in js)

    def verify_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        if len(pdf):
            pdf = pdf.sort_values(["doc_id", "tid"], kind="mergesort")
            docs = pdf["doc_id"].to_numpy()
            tid_a = pdf["tid"].to_numpy()
            dl_a = pdf["dl"].to_numpy()
            pos_a = pdf["positions"].to_numpy()
            starts = np.flatnonzero(
                np.concatenate(([True], docs[1:] != docs[:-1]))
            )
            ends = np.concatenate((starts[1:], [len(docs)]))
            o_doc, o_freq, o_dl = [], [], []
            for s, e in zip(starts, ends):
                if e - s != n_terms:
                    continue  # some phrase term absent from this doc
                by_tid = {int(tid_a[i]): pos_a[i] for i in range(s, e)}
                by_off: list[np.ndarray] = [None] * L  # type: ignore
                for t, js in offs.items():
                    p = np.asarray(by_tid[t], dtype=np.int64)
                    for j in js:
                        by_off[j] = p
                fr = phrase_freq(by_off)
                if fr:
                    o_doc.append(docs[s])
                    o_freq.append(fr)
                    o_dl.append(dl_a[s])
            if o_doc:
                ids = np.asarray(o_doc, dtype=np.int64)
                live = _live_mask(ids, deletes)
                fr = np.asarray(o_freq, dtype=np.int64)
                dls = np.asarray(o_dl, dtype=np.int64)
                if live is not None:
                    ids, fr, dls = ids[live], fr[live], dls[live]
                if ids.size:
                    out.append(
                        _score_docs(ids, fr, dls, idf_total, k1, b, avgdl)
                    )
        if not out:
            return pd.DataFrame(
                {
                    "doc_id": pd.Series(dtype="int64"),
                    "score": pd.Series(dtype="float32"),
                }
            )
        return pd.concat(out, ignore_index=True)

    scored = cand.groupBy("doc_shard").applyInPandas(
        verify_shard, "doc_id long, score float"
    )
    w = topk_rank_window(F.desc("score"), F.asc("doc_id"))
    return (
        scored.orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
        .withColumn("rank", F.row_number().over(w).cast("int"))
    )

"""Per-partition HNSW graphs — the Lucene-segment model on Spark.

The reference delegates dense retrieval to the k-NN plugin
(query/NeuralKNNQueryBuilder.java:52-120), whose default engine builds
one HNSW graph PER LUCENE SEGMENT and merges per-segment top-k at the
collector. The Spark-native analog of a segment is a partition:

* build  — hash-partition the vectors into ``n_graphs`` groups; one
  ``applyInPandas`` task per group builds an in-memory numpy HNSW
  (Malkov & Yashunin 2016: exponential level assignment, greedy upper-
  level descent, ef-bounded beam at each level) and emits the graph as
  adjacency rows. Build is embarrassingly parallel — graphs never talk.
* search — each graph group beam-searches all queries of the batch
  (``applyInPandas`` again), emitting its local top-k; a global
  TakeOrdered/rank merges them, exactly the per-segment merge shape.

Scale positioning (honest): per-query compute inside a graph is
O(ef·M·log n) distance evals instead of the O(n) flat scan, but a
batch-serving query still *reads* every graph partition — so HNSW here
is the compute-pruning path for high-recall serving over persisted
(memory-resident) segments and for large query batches, while the
bucket/list-partitioned LSH/IVF stores (similarity.py) remain the
IO-pruning path for selective probes. That division matches the
reference deployment, where graphs live in segment memory.

Determinism: level assignment and insertion order derive from md5 of
the vec_id (no RNG state), so a rebuilt graph is bit-identical and the
recall tests are stable.
"""

from __future__ import annotations

import heapq
import json
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..ranking import topk_rank_window
from .hashing import H60_MAX

GRAPH_SCHEMA = T.StructType(
    [
        T.StructField("graph_id", T.IntegerType()),
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("level", T.IntegerType()),
        # nbrs[l] = neighbor vec_ids at level l (0 .. level)
        T.StructField("nbrs", T.ArrayType(T.ArrayType(T.LongType()))),
    ]
)

_HIT_SCHEMA = T.StructType(
    [
        T.StructField("query_id", T.StringType()),
        T.StructField("vec_id", T.LongType()),
        T.StructField("cosine", T.DoubleType()),
    ]
)


def _level_for(vec_id: int, m_l: float, cap: int = 16) -> int:
    """Deterministic exponential level: u = md5(vec_id)/2^60 ∈ (0,1],
    level = floor(-ln(u)·mL) — the Malkov assignment without RNG state."""
    import hashlib

    hx = hashlib.md5(f"hnsw-lvl-{vec_id}".encode()).hexdigest()[:15]
    u = (int(hx, 16) + 1) / (H60_MAX + 1)
    return min(int(-np.log(u) * m_l), cap)


def _greedy_descend(V, nbrs, q, ep, lev):
    """Greedy walk at one level: move to the best neighbor while it
    improves. Distances are vectorized over each node's adjacency."""
    best = ep
    best_sim = float(V[best] @ q)
    improved = True
    while improved:
        improved = False
        cand = nbrs[best][lev]
        if not cand:
            break
        sims = V[cand] @ q
        j = int(np.argmax(sims))
        if sims[j] > best_sim:
            best, best_sim = cand[j], float(sims[j])
            improved = True
    return best


def _beam_search(V, nbrs, q, eps, ef, lev):
    """ef-bounded best-first search at one level. Returns [(sim, idx)]
    of the ef best found, sim descending."""
    visited = set(eps)
    # max-heap of candidates by sim (python heapq is a min-heap → negate)
    cand = [(-float(V[e] @ q), e) for e in eps]
    heapq.heapify(cand)
    # min-heap of current bests (sim, idx), size ≤ ef
    best = [(-s, e) for s, e in cand]
    heapq.heapify(best)
    while cand:
        negs, c = heapq.heappop(cand)
        if best and -negs < best[0][0] and len(best) >= ef:
            break  # nearest unexplored candidate can't improve the worst best
        fresh = [n for n in nbrs[c][lev] if n not in visited]
        if not fresh:
            continue
        visited.update(fresh)
        sims = V[fresh] @ q
        worst = best[0][0] if len(best) >= ef else -np.inf
        for s, n in zip(sims, fresh):
            s = float(s)
            if len(best) < ef or s > worst:
                heapq.heappush(best, (s, n))
                if len(best) > ef:
                    heapq.heappop(best)
                worst = best[0][0]
                heapq.heappush(cand, (-s, n))
    return sorted(((s, e) for s, e in best), reverse=True)


def _build_graph(pdf: pd.DataFrame, M: int, ef_construction: int):
    """Construct one HNSW graph over a pandas group. Returns the group's
    graph rows. Insertion order = vec_id ascending (deterministic)."""
    pdf = pdf.sort_values("vec_id").reset_index(drop=True)
    ids = pdf["vec_id"].to_numpy(dtype=np.int64)
    V = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
    V = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-30)
    n = len(ids)
    m_l = 1.0 / np.log(M)
    levels = [_level_for(int(i), m_l) for i in ids]
    # nbrs[i][l] = list of neighbor row-indices at level l
    nbrs = [[[] for _ in range(levels[i] + 1)] for i in range(n)]
    cap0, cap = 2 * M, M  # level-0 keeps 2M links (Lucene/Malkov default)

    ep, L = 0, levels[0]
    for i in range(1, n):
        q = V[i]
        l = levels[i]
        cur = ep
        for lev in range(L, l, -1):
            cur = _greedy_descend(V, nbrs, q, cur, lev)
        for lev in range(min(l, L), -1, -1):
            found = _beam_search(V, nbrs, q, [cur], ef_construction, lev)
            sel = found[:M]
            limit = cap0 if lev == 0 else cap
            for s, e in sel:
                nbrs[i][lev].append(e)
                nbrs[e][lev].append(i)
                if len(nbrs[e][lev]) > limit:  # prune weakest back-link
                    sims = V[nbrs[e][lev]] @ V[e]
                    keep = np.argsort(-sims, kind="stable")[:limit]
                    nbrs[e][lev] = [nbrs[e][lev][j] for j in keep]
            cur = sel[0][1] if sel else cur
        if l > L:
            ep, L = i, l
    return ids, levels, nbrs


def build_graphs(
    emb: DataFrame,
    n_graphs: int = 8,
    M: int = 16,
    ef_construction: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Distributed build: one HNSW graph per hash partition of the ids.
    Returns the adjacency table (GRAPH_SCHEMA). One shuffle (the groupBy),
    then fully parallel construction — graphs are independent, so the
    build scales with ``n_graphs`` regardless of corpus size; n_graphs is
    chosen so one graph's vectors fit a task's memory (the same sizing
    rule as Lucene segment flushes)."""

    def one_graph(key, pdf):
        gid = int(key[0])
        ids, levels, nbrs = _build_graph(pdf, M=M, ef_construction=ef_construction)
        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        return pd.DataFrame(
            {
                "graph_id": gid,
                "vec_id": ids,
                "embedding": pdf["embedding"],
                "level": pd.array(levels, dtype="int32"),
                "nbrs": [
                    [[int(ids[e]) for e in lvl] for lvl in nbrs[i]]
                    for i in range(len(ids))
                ],
            }
        )

    tagged = emb.select(
        F.col(id_col).cast("long").alias("vec_id"), F.col(vec_col).alias("embedding")
    ).withColumn(
        "graph_id", F.pmod(F.xxhash64(F.col("vec_id")), F.lit(n_graphs)).cast("int")
    )
    return tagged.groupBy("graph_id").applyInPandas(one_graph, GRAPH_SCHEMA)


def _search_graph(pdf: pd.DataFrame, queries, k: int, ef_search: int):
    """Beam-search every query of the batch against one graph group."""
    pdf = pdf.sort_values("vec_id").reset_index(drop=True)
    ids = pdf["vec_id"].to_numpy(dtype=np.int64)
    V = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
    norms = np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-30)
    V = V / norms
    levels = pdf["level"].to_numpy()
    id2row = {int(v): i for i, v in enumerate(ids)}
    nbrs = [
        [[id2row[int(e)] for e in lvl] for lvl in row] for row in pdf["nbrs"]
    ]
    # entry point: the max-level node, smallest vec_id on ties
    L = int(levels.max())
    ep = int(np.flatnonzero(levels == L)[0])
    out = []
    for qid, qv in queries:
        q = np.asarray(qv, dtype=np.float64)
        q = q / max(np.linalg.norm(q), 1e-30)
        cur = ep
        for lev in range(L, 0, -1):
            cur = _greedy_descend(V, nbrs, q, cur, lev)
        found = _beam_search(V, nbrs, q, [cur], max(ef_search, k), 0)
        for s, e in found[:k]:
            # normalized-dot can round a hair past ±1 for identical vectors
            out.append((qid, int(ids[e]), float(np.clip(s, -1.0, 1.0))))
    return pd.DataFrame(out, columns=["query_id", "vec_id", "cosine"])


def hnsw_topk_batch(
    graphs: DataFrame,
    queries: dict[str, list[float]],
    k: int = 10,
    ef_search: int = 64,
) -> DataFrame:
    """Batched ANN serving: every graph partition scores all queries in
    one pass (the batch amortizes the graph scan), then one global
    per-query rank bounded to k. Returns (query_id, vec_id, cosine, rank)."""
    qitems = sorted((str(a), [float(x) for x in b]) for a, b in queries.items())

    def search(key, pdf):
        return _search_graph(pdf, qitems, k=k, ef_search=ef_search)

    local = graphs.groupBy("graph_id").applyInPandas(search, _HIT_SCHEMA)
    w = topk_rank_window(
        F.desc("cosine"), F.asc("vec_id"), partition_cols=["query_id"]
    )
    return (
        local.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


class HnswAnnIndex:
    """Attachable HNSW asset with the same ``.topk(query_vec, k)``
    contract as LshAnnIndex/IvfAnnIndex, so ``Engine`` can delegate
    neural/knn queries to it unchanged. ``write``/``load`` persist the
    adjacency table partitioned by graph_id (a serving executor maps
    graph partitions 1:1 onto tasks)."""

    def __init__(
        self,
        graphs: DataFrame,
        ef_search: int = 64,
        vec_col: str = "embedding",
    ):
        self.graphs = graphs
        self.ef_search = ef_search
        # the source column the graphs were built over — Engine's ANN-
        # delegation guard compares it to the query spec's field so a query
        # against a different vector column falls back to the corpus scan
        # instead of being silently answered from the wrong graph
        self.vec_col = vec_col

    @staticmethod
    def write(
        emb: DataFrame,
        path: str,
        n_graphs: int = 8,
        M: int = 16,
        ef_construction: int = 100,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> None:
        g = build_graphs(
            emb,
            n_graphs=n_graphs,
            M=M,
            ef_construction=ef_construction,
            id_col=id_col,
            vec_col=vec_col,
        )
        g.write.mode("overwrite").partitionBy("graph_id").parquet(
            os.path.join(path, "graphs")
        )
        with open(os.path.join(path, "hnsw_config.json"), "w") as f:
            json.dump(
                {
                    "n_graphs": n_graphs,
                    "M": M,
                    "ef_construction": ef_construction,
                    "vec_col": vec_col,
                },
                f,
            )

    @classmethod
    def load(cls, spark: SparkSession, path: str, ef_search: int = 64) -> "HnswAnnIndex":
        with open(os.path.join(path, "hnsw_config.json")) as f:
            cfg = json.load(f)
        graphs = spark.read.parquet(os.path.join(path, "graphs"))
        return cls(
            graphs, ef_search=ef_search, vec_col=cfg.get("vec_col", "embedding")
        )

    def topk(self, query_vec: list[float], k: int) -> DataFrame:
        hits = hnsw_topk_batch(
            self.graphs, {"q": list(query_vec)}, k=k, ef_search=self.ef_search
        )
        return hits.select("vec_id", "cosine", "rank")

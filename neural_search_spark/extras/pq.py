"""Product quantization: the 100 TB memory tier for vector serving.

The reference's k-NN plugin offers PQ through its faiss engine (IVF_PQ
index type) for corpora whose raw vectors don't fit memory; this module
is the Spark-native analog (Jégou, Douze, Schmid 2011):

* ``train_codebooks`` — per-subspace k-means on a deterministic
  hash-sample of the corpus, driver-side numpy (codebooks are tiny:
  m·ksub·dsub floats; the sample is bounded, never the corpus).
* ``pq_encode``       — one map-side Arrow pass: each vector becomes an
  m-byte code (argmin centroid per subspace) + a float reconstruction
  norm. 64-dim float32 (256 B + overhead) → 8 B code + 4 B norm: ~21×
  less scan IO and state than raw vectors.
* ``pq_topk``         — asymmetric-distance (ADC) scan: the query builds
  an (m × ksub) lookup table of subspace dot products driver-side; each
  row's approximate dot is m byte-indexed adds (vectorized numpy over
  Arrow batches). Optional exact re-rank of the top ``refine`` rows
  against the raw vectors (the standard PQ + refine serving shape).

Composes with the IVF layout (similarity.ivf_assign): encode the
assigned table, partition by list_id, and probe queries scan nprobe
partitions of 8-byte codes — IVF-PQ, the canonical billion-scale form.

Determinism: the training sample is the ksub vectors with smallest
h60(vec_id) per fixed ordering, k-means init is the first ksub sample
points, and iteration count is fixed — retraining is bit-identical, so
codes and test recalls are stable across runs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..ranking import topk_rank_window
from .hashing import h60
from .similarity import cosine_expr, _qvec_col


def _sample_vectors(
    emb: DataFrame, n_sample: int, id_col: str, vec_col: str
) -> np.ndarray:
    """Deterministic pseudo-random sample: the n_sample vectors with the
    smallest h60(id). One TakeOrdered job; the sample is the only data
    that ever reaches the driver."""
    rows = (
        emb.select(id_col, vec_col)
        .withColumn("_h", h60(F.col(id_col).cast("string")))
        .orderBy("_h", id_col)
        .limit(n_sample)
        .collect()
    )
    return np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in rows])


def kmeans_codebooks(X: np.ndarray, m: int, ksub: int, n_iter: int) -> np.ndarray:
    """Pure-numpy per-subspace k-means → (m, ksub, dsub) codebooks.
    Deterministic: fixed init (first ksub sample rows), fixed iteration
    count, stable argmin tie-break. Shared verbatim by the Spark trainer
    and the DuckDB oracle's driver-side replay, so both derive bit-
    identical codebooks from the same sample."""
    n, dim = X.shape
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    if n < ksub:
        raise ValueError(f"sample {n} smaller than ksub={ksub}")
    dsub = dim // m
    books = np.empty((m, ksub, dsub), dtype=np.float64)
    for s in range(m):
        Xs = X[:, s * dsub : (s + 1) * dsub]
        C = Xs[:ksub].copy()
        for _ in range(n_iter):
            # assign: argmin squared L2 (numpy broadcasting, n×ksub)
            d2 = ((Xs[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            a = np.argmin(d2, axis=1)
            for c in range(ksub):
                mask = a == c
                if mask.any():
                    C[c] = Xs[mask].mean(axis=0)
        books[s] = C
    return books


def encode_np(V: np.ndarray, codebooks: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Encode a (n, dim) float64 block → (codes uint8 (n, m), recon-norm
    float32 (n,)). The single encode kernel: executors call it per Arrow
    batch, the oracle replay calls it once over the corpus — per-row
    arithmetic only, so batch boundaries can't change a single code."""
    m, ksub, dsub = codebooks.shape
    n = len(V)
    codes = np.empty((n, m), dtype=np.uint8)
    rec = np.empty_like(V)
    for s in range(m):
        Vs = V[:, s * dsub : (s + 1) * dsub]
        d2 = ((Vs[:, None, :] - codebooks[None, s]) ** 2).sum(axis=2)
        a = np.argmin(d2, axis=1)
        codes[:, s] = a
        rec[:, s * dsub : (s + 1) * dsub] = codebooks[s][a]
    return codes, np.linalg.norm(rec, axis=1).astype(np.float32)


def adc_lut(codebooks: np.ndarray, query_vec) -> np.ndarray:
    """(m, ksub) lookup table of subspace dot products — built once,
    driver-side, per query."""
    m, ksub, dsub = codebooks.shape
    q = np.asarray(query_vec, dtype=np.float64)
    return np.stack(
        [codebooks[s] @ q[s * dsub : (s + 1) * dsub] for s in range(m)]
    )


def adc_scores_np(
    codes: np.ndarray, norms: np.ndarray, lut: np.ndarray, qnorm: float
) -> np.ndarray:
    """Approximate cosine per row: LUT-sum dot / (|q|·pq_norm). Per-row
    reduction over the m byte indices — bit-identical for any row batching,
    which is what lets the oracle replay reproduce executor ADC scores."""
    m = lut.shape[0]
    dots = lut[np.arange(m)[None, :], codes].sum(axis=1)
    denom = qnorm * np.maximum(norms.astype(np.float64), 1e-30)
    return dots / denom


def train_codebooks(
    emb: DataFrame,
    m: int = 8,
    ksub: int = 256,
    n_sample: int = 4096,
    n_iter: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Per-subspace k-means over a bounded deterministic sample →
    (m, ksub, dsub) codebooks (see ``kmeans_codebooks``)."""
    X = _sample_vectors(emb, n_sample, id_col, vec_col)
    return kmeans_codebooks(X, m, ksub, n_iter)


PQ_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("pq_code", T.BinaryType()),
        T.StructField("pq_norm", T.FloatType()),
    ]
)


def pq_encode(
    emb: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Map-side encode: (vec_id, pq_code binary[m], pq_norm float, *keep).
    The codebooks ride the closure (m·ksub·dsub floats — a broadcast
    literal by construction); no shuffle."""
    m, ksub, dsub = codebooks.shape
    books = codebooks.copy()
    keep = list(keep_cols or [])
    fields = [PQ_SCHEMA[0], PQ_SCHEMA[1], PQ_SCHEMA[2]]
    src = emb.select(
        F.col(id_col).cast("long").alias("vec_id"),
        F.col(vec_col).alias("_vec"),
        *keep,
    )
    out_schema = T.StructType(
        fields + [src.schema[c] for c in keep]
    )

    def encode(batches):
        for pdf in batches:
            V = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf["_vec"]]
            )
            codes, norms = encode_np(V, books)
            out = pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "pq_code": [c.tobytes() for c in codes],
                    "pq_norm": norms,
                }
            )
            for c in keep:
                out[c] = pdf[c].to_numpy()
            yield out

    return src.mapInPandas(encode, out_schema)


def pq_topk(
    codes: DataFrame,
    codebooks: np.ndarray,
    query_vec: list[float],
    k: int = 10,
    refine: int | None = None,
    emb: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC top-k over the code table: approximate cosine = LUT-sum dot /
    (|q|·pq_norm). With ``refine`` R (and the raw ``emb`` table), the top
    R ADC candidates are exactly re-scored and re-ranked — candidate
    generation reads only the 12-byte code rows; the raw vectors are
    touched for R rows, not the corpus.

    Recall caveat (measured, bench.py ``recall_at_10``, uniform-random
    synthetic embeddings, m=8/ksub=64 over dim 64): ADC-only ≈ 0.35,
    refine=50 ≈ 0.6-0.8, refine=100 ≈ 0.8, refine=200 ≈ 0.95 @10; m=16
    codes reach 0.9 at refine=50. Uniform vectors maximize quantization
    distortion relative to neighbor gaps, so these are floors. Size the
    refine window (absolute rows, independent of corpus size) or m to the
    recall target — the scan-state saving (m bytes vs 4·dim) is the
    knob's cost axis."""
    m, ksub, dsub = codebooks.shape
    q = np.asarray(query_vec, dtype=np.float64)
    qn = float(np.linalg.norm(q))
    lut = adc_lut(codebooks, q)

    def adc(batches):
        for pdf in batches:
            C = np.frombuffer(
                b"".join(pdf["pq_code"]), dtype=np.uint8
            ).reshape(len(pdf), m)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "cosine": adc_scores_np(
                        C, pdf["pq_norm"].to_numpy(), lut, qn
                    ),
                }
            )

    scored = codes.select("vec_id", "pq_code", "pq_norm").mapInPandas(
        adc, "vec_id long, cosine double"
    )
    bound = refine if refine else k
    top = scored.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(bound)
    if refine:
        if emb is None:
            raise ValueError("refine needs the raw `emb` table")
        qcol = _qvec_col([float(x) for x in query_vec])
        # candidate side is <= refine rows by construction — pin the
        # broadcast so the exact re-rank never shuffles the raw vectors
        top = (
            F.broadcast(top.select("vec_id"))
            .join(
                emb.select(
                    F.col(id_col).cast("long").alias("vec_id"),
                    F.col(vec_col).alias("_vec"),
                ),
                "vec_id",
            )
            .select(
                "vec_id", cosine_expr(F.col("_vec"), qcol).alias("cosine")
            )
            .orderBy(F.desc("cosine"), F.asc("vec_id"))
            .limit(k)
        )
    w = topk_rank_window(F.desc("cosine"), F.asc("vec_id"))
    return top.withColumn("rank", F.row_number().over(w).cast("int"))


def ivf_pq_encode(
    emb: DataFrame,
    codebooks: np.ndarray,
    n_lists: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, pd.DataFrame]:
    """IVF-PQ layout: nearest-centroid list assignment (one map-side pass,
    centroids are broadcast literals) then PQ encode, keeping ``list_id``
    — the canonical billion-scale serving shape. Written partitioned by
    list_id, a query scans nprobe partitions of 8-byte codes: partition
    pruning × ~21× code compression compose multiplicatively."""
    from .similarity import ivf_assign

    assigned, cents = ivf_assign(
        emb, n_lists=n_lists, id_col=id_col, vec_col=vec_col
    )
    codes = pq_encode(
        assigned, codebooks, id_col=id_col, vec_col=vec_col,
        keep_cols=["list_id"],
    )
    return codes, cents


def ivf_pq_topk(
    codes: DataFrame,
    centroids: pd.DataFrame,
    codebooks: np.ndarray,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 4,
    refine: int | None = None,
    emb: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe the nprobe nearest centroid lists (driver-side pick, same rule
    as similarity.ivf_topk), ADC-scan only their codes, optionally exact-
    refine the survivors against the raw vectors."""
    from .similarity import _centroid_list_ids

    qv = np.asarray(query_vec, dtype=np.float64)
    qn = qv / np.linalg.norm(qv)
    centroids, list_ids = _centroid_list_ids(centroids)
    cents = np.array(
        [np.asarray(v, dtype=np.float64) for v in centroids[vec_col]]
    )
    cents = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    probe_lists = [
        int(list_ids[i])
        for i in np.argsort(-(cents @ qn), kind="stable")[:nprobe]
    ]
    probed = codes.filter(F.col("list_id").isin(probe_lists))
    return pq_topk(
        probed, codebooks, list(query_vec), k=k, refine=refine, emb=emb,
        id_col=id_col, vec_col=vec_col,
    )


class PqAnnIndex:
    """Attachable IVF-PQ asset: a list_id-partitioned code table plus
    centroids and codebooks — the 100 TB vector-serving store. The codes
    directory holds ~12 B/vector instead of the raw float32 array, probe
    queries prune to nprobe list partitions, and exact refine (optional)
    joins the raw corpus only for the top-R candidates.

    Same attach surface as LshAnnIndex / IvfAnnIndex / HnswAnnIndex
    (``topk(query_vec, k)``), so ``Engine`` can route neural/knn queries
    through it and the CLI auto-detects it from ``pq_config.json``.
    """

    def __init__(
        self,
        codes: DataFrame,
        centroids: pd.DataFrame,
        codebooks: np.ndarray,
        nprobe: int = 4,
        refine: int | None = None,
        raw: DataFrame | None = None,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ):
        self.codes = codes
        self.centroids = centroids
        self.codebooks = codebooks
        self.nprobe = nprobe
        self.refine = refine
        self.raw = raw
        self.id_col = id_col
        self.vec_col = vec_col

    @staticmethod
    def write(
        emb: DataFrame,
        path: str,
        m: int = 8,
        ksub: int = 256,
        n_lists: int = 16,
        n_sample: int = 4096,
        n_iter: int = 10,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> None:
        import json
        import os

        books = train_codebooks(
            emb, m=m, ksub=ksub, n_sample=n_sample, n_iter=n_iter,
            id_col=id_col, vec_col=vec_col,
        )
        codes, cents = ivf_pq_encode(
            emb, books, n_lists=n_lists, id_col=id_col, vec_col=vec_col
        )
        codes.write.mode("overwrite").partitionBy("list_id").parquet(
            os.path.join(path, "codes")
        )
        cents.to_parquet(os.path.join(path, "centroids.parquet"), index=False)
        mm, kk, dsub = books.shape
        pd.DataFrame(
            {
                "subspace": np.repeat(np.arange(mm), kk),
                "centroid": np.tile(np.arange(kk), mm),
                "values": list(books.reshape(mm * kk, dsub)),
            }
        ).to_parquet(os.path.join(path, "codebooks.parquet"), index=False)
        with open(os.path.join(path, "pq_config.json"), "w") as f:
            json.dump(
                {"m": mm, "ksub": kk, "dsub": dsub, "n_lists": n_lists}, f
            )

    @classmethod
    def load(
        cls,
        spark,
        path: str,
        nprobe: int = 4,
        refine: int | None = None,
        raw: DataFrame | None = None,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> "PqAnnIndex":
        import json
        import os

        with open(os.path.join(path, "pq_config.json")) as f:
            cfg = json.load(f)
        bpdf = pd.read_parquet(os.path.join(path, "codebooks.parquet"))
        bpdf = bpdf.sort_values(["subspace", "centroid"])
        books = np.stack([np.asarray(v, dtype=np.float64) for v in bpdf["values"]])
        books = books.reshape(cfg["m"], cfg["ksub"], cfg["dsub"])
        from .similarity import _centroid_list_ids

        codes = spark.read.parquet(os.path.join(path, "codes"))
        cents, _ = _centroid_list_ids(
            pd.read_parquet(os.path.join(path, "centroids.parquet"))
        )
        return cls(
            codes, cents, books, nprobe=nprobe, refine=refine, raw=raw,
            id_col=id_col, vec_col=vec_col,
        )

    def topk(self, query_vec: list[float], k: int) -> DataFrame:
        return ivf_pq_topk(
            self.codes,
            self.centroids,
            self.codebooks,
            query_vec,
            k=k,
            nprobe=self.nprobe,
            refine=self.refine,
            emb=self.raw,
            id_col=self.id_col,
            vec_col=self.vec_col,
        )

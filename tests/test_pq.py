"""Product quantization (extras/pq.py): codebook determinism, the single
encode kernel, ADC recall, and refine-path exactness.

Reference parity: the k-NN plugin's faiss PQ tier (IVF_PQ / PQ encoders)
is the memory-bound serving path; here the contract under test is the
Spark-native analog — bounded driver-side training, map-side encode,
LUT-scan top-k with optional exact refine."""

import numpy as np
import pandas as pd
import pytest

from neural_search_spark.extras import pq


@pytest.fixture(scope="module")
def emb_df(spark):
    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(240, 32)).astype(np.float32)
    pdf = pd.DataFrame({"vec_id": range(240), "embedding": list(map(list, vecs))})
    return spark.createDataFrame(pdf), vecs


def _exact_topk(vecs, q, k):
    q = np.asarray(q, dtype=np.float64)
    v = vecs.astype(np.float64)
    cos = (v @ q) / (np.linalg.norm(v, axis=1) * np.linalg.norm(q))
    return list(np.lexsort((np.arange(len(v)), -cos))[:k]), cos


def test_train_deterministic_and_shaped(emb_df):
    df, _ = emb_df
    b1 = pq.train_codebooks(df, m=4, ksub=16, n_sample=128, n_iter=5)
    b2 = pq.train_codebooks(df, m=4, ksub=16, n_sample=128, n_iter=5)
    assert b1.shape == (4, 16, 8)
    np.testing.assert_array_equal(b1, b2)


def test_train_validates_shapes(emb_df):
    df, _ = emb_df
    with pytest.raises(ValueError, match="not divisible"):
        pq.train_codebooks(df, m=5, ksub=16, n_sample=128)
    with pytest.raises(ValueError, match="smaller than ksub"):
        pq.train_codebooks(df, m=4, ksub=64, n_sample=32)


def test_spark_encode_matches_numpy_kernel(emb_df):
    """Distributed encode == one local encode_np call: per-row arithmetic
    means Arrow batch boundaries can't change codes or norms."""
    df, vecs = emb_df
    books = pq.train_codebooks(df, m=4, ksub=16, n_sample=128, n_iter=5)
    got = pq.pq_encode(df, books).toPandas().sort_values("vec_id")
    codes, norms = pq.encode_np(vecs.astype(np.float64), books)
    assert [c for c in got.pq_code] == [c.tobytes() for c in codes]
    np.testing.assert_array_equal(got.pq_norm.to_numpy(), norms)
    assert all(len(c) == 4 for c in got.pq_code)  # m bytes per vector


def test_adc_topk_recall(emb_df):
    df, vecs = emb_df
    books = pq.train_codebooks(df, m=8, ksub=32, n_sample=240, n_iter=8)
    codes = pq.pq_encode(df, books)
    q = [float(x) for x in vecs[7]]
    got = pq.pq_topk(codes, books, q, k=10).toPandas()
    exact, _ = _exact_topk(vecs, q, 10)
    # 8×32 codebooks on 32-dim data: coarse by design, but the self vector
    # and most true neighbours must surface
    assert got.vec_id.iloc[0] == 7
    assert len(set(got.vec_id) & set(exact)) >= 5
    assert list(got["rank"]) == list(range(1, 11))


def test_refine_recovers_exact_topk(emb_df):
    """refine == corpus size → candidate set is everything → the refine
    pass IS exact brute force: ids and scores must match numpy exactly."""
    df, vecs = emb_df
    books = pq.train_codebooks(df, m=4, ksub=16, n_sample=128, n_iter=5)
    codes = pq.pq_encode(df, books)
    q = [float(x) for x in vecs[3]]
    got = pq.pq_topk(codes, books, q, k=5, refine=240, emb=df).toPandas()
    exact, cos = _exact_topk(vecs, q, 5)
    assert list(got.vec_id) == exact
    np.testing.assert_allclose(got.cosine, cos[exact], rtol=1e-6)


def test_refine_requires_emb(emb_df):
    df, vecs = emb_df
    books = pq.train_codebooks(df, m=4, ksub=16, n_sample=128, n_iter=5)
    codes = pq.pq_encode(df, books)
    with pytest.raises(ValueError, match="refine"):
        pq.pq_topk(codes, books, [0.0] * 32, k=5, refine=20).count()


def test_adc_replay_matches_spark_scores(emb_df):
    """The oracle foundation: driver-side replay (encode_np + adc_scores_np)
    reproduces the distributed ADC scores bit-for-bit."""
    df, vecs = emb_df
    books = pq.train_codebooks(df, m=4, ksub=16, n_sample=128, n_iter=5)
    spark_codes = pq.pq_encode(df, books)
    q = [float(x) for x in vecs[0]]
    got = (
        pq.pq_topk(spark_codes, books, q, k=240)
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    codes, norms = pq.encode_np(vecs.astype(np.float64), books)
    lut = pq.adc_lut(books, q)
    local = pq.adc_scores_np(codes, norms, lut, float(np.linalg.norm(q)))
    np.testing.assert_array_equal(got.cosine.to_numpy(), local)


def test_compression_ratio_docstringed(emb_df):
    df, _ = emb_df
    books = pq.train_codebooks(df, m=4, ksub=16, n_sample=128, n_iter=5)
    row = pq.pq_encode(df, books).first()
    # 32-dim float32 vector (128 B) → 4 B code + 4 B norm
    assert len(row.pq_code) + 4 == 8


def test_ivf_pq_topk(emb_df):
    """IVF-PQ composition: nprobe = n_lists + full refine → exact top-k
    (probe everything, ADC candidates cover the corpus, refine is brute
    force); small nprobe still surfaces the self vector."""
    df, vecs = emb_df
    books = pq.train_codebooks(df, m=4, ksub=16, n_sample=128, n_iter=5)
    codes, cents = pq.ivf_pq_encode(df, books, n_lists=8)
    assert "list_id" in codes.columns
    q = [float(x) for x in vecs[9]]
    got = pq.ivf_pq_topk(
        codes, cents, books, q, k=5, nprobe=8, refine=240, emb=df
    ).toPandas()
    exact, _ = _exact_topk(vecs, q, 5)
    assert list(got.vec_id) == exact

    narrow = pq.ivf_pq_topk(codes, cents, books, q, k=5, nprobe=2).toPandas()
    assert 9 in set(narrow.vec_id)


def test_pq_ann_index_disk_roundtrip(emb_df, spark, tmp_path):
    """On-disk IVF-PQ store: identical results to the in-memory pipeline,
    list-partitioned code scan, CLI marker detection, Engine attach."""
    df, vecs = emb_df
    path = str(tmp_path / "pq_store")
    pq.PqAnnIndex.write(df, path, m=4, ksub=16, n_lists=8, n_sample=128, n_iter=5)

    disk = pq.PqAnnIndex.load(spark, path, nprobe=8, refine=240, raw=df)
    q = [float(x) for x in vecs[5]]
    got = disk.topk(q, k=5).toPandas()
    exact, _ = _exact_topk(vecs, q, 5)
    assert list(got.vec_id) == exact  # nprobe=all + full refine = exact

    # codebooks survive the parquet roundtrip bit-for-bit
    books = pq.train_codebooks(df, m=4, ksub=16, n_sample=128, n_iter=5)
    np.testing.assert_array_equal(disk.codebooks, books)

    # the probe scan is partition-pruned on list_id
    import contextlib
    import io

    narrow = pq.PqAnnIndex.load(spark, path, nprobe=2)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        narrow.topk(q, k=5).explain("formatted")
    assert "PartitionFilters" in buf.getvalue()

    # CLI auto-detect: pq_config.json wins over the centroids marker
    from neural_search_spark.cli import _load_ann_store

    assert isinstance(_load_ann_store(spark, path), pq.PqAnnIndex)

    # Engine routes neural_knn through the attached PQ asset
    from neural_search_spark.engine import Engine

    eng = Engine(spark, ann_index=disk)
    hits = eng.search({"neural_knn": {"field": "embedding", "vector": q}}, k=5)
    assert list(hits.toPandas().doc_id) == exact


def test_pq_store_rebuild_determinism(emb_df, spark, tmp_path):
    """PqAnnIndex rebuilt from the same corpus is content-identical —
    codebooks, centroids and per-list code files all match (the
    determinism claim in the module docstring: hash-sampled kmeans seeds,
    no RNG)."""
    import hashlib
    import os

    df, _ = emb_df
    one = df.coalesce(1)  # stable file layout → content comparison is exact

    def tree_hash(root):
        entries = []
        for dirpath, dirnames, filenames in sorted(os.walk(root)):
            dirnames.sort()
            for fn in sorted(filenames):
                if fn.startswith(("_", ".")) or fn.endswith(".crc"):
                    continue
                p = os.path.join(dirpath, fn)
                entries.append(
                    os.path.relpath(dirpath, root)
                    + ":"
                    + hashlib.sha256(open(p, "rb").read()).hexdigest()
                )
        return hashlib.sha256("\n".join(sorted(entries)).encode()).hexdigest()

    a, b = str(tmp_path / "pq_a"), str(tmp_path / "pq_b")
    kw = dict(m=4, ksub=16, n_lists=8, n_sample=128, n_iter=5)
    pq.PqAnnIndex.write(one, a, **kw)
    pq.PqAnnIndex.write(one, b, **kw)
    assert tree_hash(a) == tree_hash(b)

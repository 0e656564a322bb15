"""Tests for the training-data-pipeline extras: dedup, similarity, text
analysis, multimodal plumbing. Oracles are plain numpy/python re-derivations
of each operator's contract."""

import hashlib
import os

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from neural_search_spark.extras import dedup, multimodal, similarity, textstats
from neural_search_spark.extras.hashing import h60
from neural_search_spark.tokenizer import tokenize_py


def _h60_py(s: str, seed=None) -> int:
    if seed is not None:
        s = f"{s}#{seed}"
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


@pytest.fixture(scope="module")
def docs_df(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
        (2, "The quick brown fox JUMPS over the lazy dog!!"),  # norm dup of 0
        (3, "the quick brown fox leaps over the lazy dog"),  # near dup
        (4, "completely different content about spark engines"),
        (5, "der hund und die katze sind nicht da und das ist gut"),
        (6, "le chat est dans la maison et il est content"),
        (7, "xyzzy qwerty plugh"),  # unknown language
        (8, "spark engines process completely different content about"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_h60_matches_python(spark):
    df = spark.createDataFrame([("hello",), ("a b c",)], "s string")
    got = {r["s"]: r["h"] for r in df.select("s", h60("s", seed=3).alias("h")).collect()}
    for s in ["hello", "a b c"]:
        assert got[s] == _h60_py(s, 3)


# ---------------------------------------------------------------------------
# dedup
# ---------------------------------------------------------------------------
def test_exact_dedup(docs_df):
    out = dedup.exact_dedup(docs_df).toPandas().set_index("doc_id")
    # 0,1,2 normalize to identical content → rep 0, group size 3
    assert out.loc[0, "rep_id"] == 0 and out.loc[0, "group_size"] == 3
    assert out.loc[1, "rep_id"] == 0
    assert out.loc[2, "rep_id"] == 0
    assert out.loc[4, "rep_id"] == 4 and out.loc[4, "group_size"] == 1


def test_shingles_and_jaccard(docs_df):
    sh = dedup.shingles(docs_df, n=3)
    pdf = sh.toPandas()
    # doc 0: 9 tokens → 7 trigrams, all distinct
    assert len(pdf[pdf.doc_id == 0]) == 7
    jac = dedup.jaccard_pairs(sh).toPandas()
    pair = jac[(jac.doc_a == 0) & (jac.doc_b == 1)]
    assert len(pair) == 1 and pair.iloc[0]["jaccard"] == 1.0
    # numpy oracle for (0, 3)
    s0 = set(" ".join(t) for t in zip(*[tokenize_py(
        "the quick brown fox jumps over the lazy dog")[i:] for i in range(3)]))
    s3 = set(" ".join(t) for t in zip(*[tokenize_py(
        "the quick brown fox leaps over the lazy dog")[i:] for i in range(3)]))
    expect = len(s0 & s3) / len(s0 | s3)
    got = jac[(jac.doc_a == 0) & (jac.doc_b == 3)].iloc[0]["jaccard"]
    assert got == pytest.approx(expect)


def test_minhash_signature_matches_oracle(docs_df):
    """Signatures equal the python replay of the affine family: ONE md5
    per shingle, g_i = (a_i*h + b_i) mod 2^61-1."""
    from neural_search_spark.extras.hashing import MERSENNE61, affine_coeffs

    sigs = dedup.minhash_signatures(dedup.shingles(docs_df, n=3), num_hashes=8)
    row = sigs.filter(F.col("doc_id") == 0).collect()[0]
    toks = tokenize_py("the quick brown fox jumps over the lazy dog")
    shset = {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
    bases = [_h60_py(s) % (1 << 30) for s in shset]
    for i in range(8):
        a, b = affine_coeffs(i)
        assert row[f"mh{i}"] == min((a * h + b) % MERSENNE61 for h in bases)


def test_minhash_lsh_finds_near_dups(docs_df):
    out = dedup.minhash_near_dups(docs_df, threshold=0.5).toPandas()
    pairs = set(zip(out.doc_a, out.doc_b))
    assert (0, 1) in pairs and (0, 2) in pairs
    # near-dup 0-3 shares 4/10 trigrams = 0.4 < 0.5 → excluded by verify
    assert (0, 3) not in pairs
    assert (0, 4) not in pairs


def test_simhash_dup_and_distance(docs_df):
    sigs = dedup.simhash(docs_df)
    pdf = sigs.toPandas().set_index("doc_id")
    assert pdf.loc[0, "simhash"] == pdf.loc[1, "simhash"] == pdf.loc[2, "simhash"]
    near = dedup.simhash_near_dups(sigs, max_hamming=16).toPandas()
    pairs = set(zip(near.doc_a, near.doc_b))
    assert (0, 1) in pairs
    # candidate generation requires a shared 16-bit region (pigeonhole is
    # only a guarantee for hamming ≤ 3); verify filter enforces the bound
    x03 = (int(pdf.loc[0, "simhash"]) ^ int(pdf.loc[3, "simhash"])) & (
        (1 << 64) - 1
    )
    d03 = bin(x03).count("1")
    region_match = any(
        (x03 >> (16 * r)) & 0xFFFF == 0 for r in range(4)
    )
    assert ((0, 3) in pairs) == (d03 <= 16 and region_match)


def test_embedding_near_dups(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.99, 0.01, 0.0]),
        (2, [0.0, 1.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = dedup.embedding_near_dups(emb, threshold=0.95).toPandas()
    assert set(zip(out.id_a, out.id_b)) == {(0, 1)}


# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def emb_df(spark):
    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(200, 16)).astype(np.float32)
    pdf = pd.DataFrame({"vec_id": range(200), "embedding": list(map(list, vecs))})
    return spark.createDataFrame(pdf), vecs


def _np_topk(vecs, q, k):
    q = np.asarray(q, dtype=np.float64)
    v = vecs.astype(np.float64)
    cos = (v @ q) / (np.linalg.norm(v, axis=1) * np.linalg.norm(q))
    order = np.lexsort((np.arange(len(v)), -cos))[:k]
    return list(order), cos


def test_brute_force_topk_matches_numpy(emb_df):
    df, vecs = emb_df
    q = [float(x) for x in vecs[0]]
    got = similarity.brute_force_topk(df, q, k=10).toPandas()
    ids, cos = _np_topk(vecs, q, 10)
    assert list(got.vec_id) == ids
    np.testing.assert_allclose(got.cosine, cos[ids], rtol=1e-6)


def test_lsh_topk_recall(emb_df):
    df, vecs = emb_df
    q = [float(x) for x in vecs[3]]
    exact, _ = _np_topk(vecs, q, 10)
    got = similarity.lsh_topk(df, q, k=10, n_planes=8, probe_hamming=2).toPandas()
    # self vector always lands in the query's own bucket
    assert got.vec_id.iloc[0] == 3
    recall = len(set(got.vec_id) & set(exact)) / 10
    assert recall >= 0.3  # approximate by design; multi-probe recovers more


def test_ivf_topk_probes(emb_df):
    df, vecs = emb_df
    q = [float(x) for x in vecs[5]]
    assigned, cents = similarity.ivf_assign(df, n_lists=8)
    got = similarity.ivf_topk(assigned, cents, q, k=5, nprobe=8).toPandas()
    # nprobe = n_lists → exhaustive → exact
    exact, _ = _np_topk(vecs, q, 5)
    assert list(got.vec_id) == exact


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------
def test_lang_id(docs_df):
    out = (
        docs_df.select("doc_id", textstats.lang_id("text").alias("lang"))
        .toPandas()
        .set_index("doc_id")["lang"]
    )
    assert out[0] == "en"
    assert out[5] == "de"
    assert out[6] == "fr"
    assert out[7] == "unknown"


def test_quality_features(docs_df, spark):
    out = textstats.quality_features(docs_df).toPandas().set_index("doc_id")
    assert out.loc[0, "n_tokens"] == 9
    assert bool(out.loc[0, "quality_ok"])
    assert out.loc[0, "stopword_ratio"] == pytest.approx(2 / 9)  # 'the' ×2
    short = spark.createDataFrame([(99, "hi")], "doc_id long, text string")
    s = textstats.quality_features(short).toPandas()
    assert not bool(s.loc[0, "quality_ok"])  # < 5 tokens


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [(0, "Hello,  World!"), (1, "hello world"), (2, "hello worlds")],
        "doc_id long, text string",
    )
    out = df.select("doc_id", textstats.fingerprint("text").alias("fp")).toPandas()
    assert out.fp[0] == out.fp[1]
    assert out.fp[0] != out.fp[2]


def test_token_count(docs_df):
    out = docs_df.select(
        "doc_id", textstats.token_count("text").alias("n")
    ).toPandas().set_index("doc_id")["n"]
    assert out[0] == 9 and out[7] == 3


# ---------------------------------------------------------------------------
# multimodal plumbing
# ---------------------------------------------------------------------------
def test_multimodal_features(spark):
    media = multimodal.make_media_df(spark, n=30)
    feats = multimodal.extract_features(media, dim=8).toPandas()
    assert len(feats) == 30
    assert all(len(f) == 8 for f in feats.feature)
    # deterministic: same payload → same feature
    p = hashlib.sha256(b"media-0").digest() * 1
    expect = multimodal._fake_decode(p, 8)
    got = feats[feats.media_id == 0].iloc[0]["feature"]
    np.testing.assert_allclose(got, expect, rtol=1e-6)


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"xx", fake=False)


def test_frame_sample(spark):
    media = multimodal.make_media_df(spark, n=30)
    frames = multimodal.frame_sample(media, every_ms=500).toPandas()
    assert (frames.ts_ms % 500 == 0).all()
    vids = media.filter("kind = 'video'").select("media_id", "meta.duration_ms").toPandas()
    for _, r in vids.iterrows():
        n = len(frames[frames.media_id == r.media_id])
        assert n == max(r.duration_ms - 1, 0) // 500 + 1


def test_connected_components(spark):
    # two chains, a triangle, and an isolated pair (node ids chosen so the
    # chain is long enough to need pointer jumping, not one-hop propagation)
    pairs = [
        (9, 8), (8, 7), (7, 6), (6, 5),          # chain → comp 5
        (20, 21), (21, 22), (20, 22),            # triangle → comp 20
        (100, 101),                              # pair → comp 100
    ]
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    out = dedup.connected_components(df).toPandas()
    got = dict(zip(out.doc_id, out.component))
    assert got == {
        9: 5, 8: 5, 7: 5, 6: 5, 5: 5,
        20: 20, 21: 20, 22: 20,
        100: 100, 101: 100,
    }


def test_connected_components_from_minhash(docs_df):
    near = dedup.minhash_near_dups(docs_df, threshold=0.3)
    comp = dedup.connected_components(near).toPandas()
    got = dict(zip(comp.doc_id, comp.component))
    # docs 0,1,2 are (near-)dups of each other → one component rooted at 0
    assert got[0] == got[1] == got[2] == 0


def test_deterministic_sample(docs_df):
    a = textstats.deterministic_sample(docs_df, 0.5, salt="s1").toPandas()
    b = textstats.deterministic_sample(docs_df, 0.5, salt="s1").toPandas()
    assert sorted(a.doc_id) == sorted(b.doc_id)  # stable across runs
    c = textstats.deterministic_sample(docs_df, 0.5, salt="s2").toPandas()
    # different salt → independent membership (may coincide on 9 docs, but
    # rate-1.0 / rate-0.0 bounds must hold exactly)
    assert len(textstats.deterministic_sample(docs_df, 1.0).toPandas()) == 9
    assert len(textstats.deterministic_sample(docs_df, 0.0).toPandas()) == 0
    # nesting property: a rate-0.2 sample is a subset of the rate-0.5 one
    s02 = set(textstats.deterministic_sample(docs_df, 0.2, salt="s1").toPandas().doc_id)
    assert s02 <= set(a.doc_id)
    with pytest.raises(ValueError, match="rate"):
        textstats.deterministic_sample(docs_df, 1.5)


def test_lsh_ann_index_disk_matches_inmemory(emb_df, spark, tmp_path):
    """On-disk bucket-partitioned LSH store: identical results to the
    on-the-fly asset, and the probe scan is PARTITION-pruned."""
    df, vecs = emb_df
    q = [float(x) for x in vecs[3]]
    mem = similarity.LshAnnIndex(df, n_planes=6, probe_hamming=1)
    path = str(tmp_path / "lsh_store")
    similarity.LshAnnIndex.write(df, path, n_planes=6)
    disk = similarity.LshAnnIndex.load(spark, path, probe_hamming=1)
    got_m = mem.topk(q, k=10).toPandas()
    got_d = disk.topk(q, k=10).toPandas()
    assert list(got_d.vec_id) == list(got_m.vec_id)
    np.testing.assert_allclose(got_d.cosine, got_m.cosine, rtol=0, atol=0)
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        disk.topk(q, k=10).explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "bucket" in plan


def test_probe_bucket_enumeration():
    got = similarity._probe_buckets(0b101, 4, 1)
    assert got == sorted({0b101, 0b100, 0b111, 0b001, 0b1101})
    assert similarity._probe_buckets(0, 4, 0) == [0]


def test_ivf_ann_index_disk_roundtrip(emb_df, spark, tmp_path):
    df, vecs = emb_df
    q = [float(x) for x in vecs[5]]
    path = str(tmp_path / "ivf_store")
    similarity.IvfAnnIndex.write(df, path, n_lists=8)
    disk = similarity.IvfAnnIndex.load(spark, path, nprobe=8)
    got = disk.topk(q, k=5).toPandas()
    exact, _ = _np_topk(vecs, q, 5)
    assert list(got.vec_id) == exact


def test_lsh_store_rejects_wrong_dim(emb_df, spark, tmp_path):
    """A query vector of the wrong dimensionality would bucket under a
    DIFFERENT hyperplane family and silently probe wrong partitions — the
    store must fail fast instead (lsh_config.json records dim)."""
    df, vecs = emb_df
    path = str(tmp_path / "lsh_dim_store")
    similarity.LshAnnIndex.write(df, path, n_planes=6)
    disk = similarity.LshAnnIndex.load(spark, path, probe_hamming=1)
    with pytest.raises(ValueError, match="dim"):
        disk.topk([1.0] * 8, k=5)
    # the right dim still serves
    assert len(disk.topk([float(x) for x in vecs[0]], k=5).toPandas()) == 5


def test_ivf_centroids_reorder_safe(emb_df, spark, tmp_path):
    """centroids.parquet carries an explicit list_id key: shuffling the
    file's row order must not change which lists a query probes."""
    df, vecs = emb_df
    q = [float(x) for x in vecs[11]]
    path = str(tmp_path / "ivf_reorder")
    similarity.IvfAnnIndex.write(df, path, n_lists=8)
    before = similarity.IvfAnnIndex.load(spark, path, nprobe=3).topk(q, k=5).toPandas()
    cpath = os.path.join(path, "centroids.parquet")
    cents = pd.read_parquet(cpath)
    assert "list_id" in cents.columns
    cents.sample(frac=1.0, random_state=3).to_parquet(cpath, index=False)
    after = similarity.IvfAnnIndex.load(spark, path, nprobe=3).topk(q, k=5).toPandas()
    assert list(after.vec_id) == list(before.vec_id)
    np.testing.assert_allclose(after.cosine, before.cosine, rtol=0, atol=0)


def test_ann_store_rebuild_determinism(emb_df, spark, tmp_path):
    """Rebuilding a store from the same corpus is bit-identical (the
    determinism contract in the store docstrings): hash-of-files equality
    for LSH and IVF, and identical centroid/assignment content."""
    df, vecs = emb_df

    def tree_hash(root: str) -> str:
        # Spark part-file NAMES embed a per-job UUID; the determinism
        # contract is about CONTENT — hash (partition-dir, file bytes)
        # pairs, order-normalized
        entries = []
        for dirpath, dirnames, filenames in sorted(os.walk(root)):
            dirnames.sort()
            for fn in sorted(filenames):
                if fn.startswith(("_", ".")) or fn.endswith(".crc"):
                    continue  # _SUCCESS markers / checksums
                p = os.path.join(dirpath, fn)
                entries.append(
                    os.path.relpath(dirpath, root)
                    + ":"
                    + hashlib.sha256(open(p, "rb").read()).hexdigest()
                )
        return hashlib.sha256("\n".join(sorted(entries)).encode()).hexdigest()

    a, b = str(tmp_path / "lsh_a"), str(tmp_path / "lsh_b")
    # one partition per write → stable file layout; parquet bytes are
    # deterministic given identical rows per partition
    one = df.coalesce(1)
    similarity.LshAnnIndex.write(one, a, n_planes=6)
    similarity.LshAnnIndex.write(one, b, n_planes=6)
    assert tree_hash(a) == tree_hash(b)

    ia, ib = str(tmp_path / "ivf_a"), str(tmp_path / "ivf_b")
    similarity.IvfAnnIndex.write(one, ia, n_lists=8)
    similarity.IvfAnnIndex.write(one, ib, n_lists=8)
    assert tree_hash(ia) == tree_hash(ib)


def test_decontaminate(spark, docs_df):
    """Benchmark decontamination: docs sharing >= min_overlap distinct
    n-gram shingles with the eval set are flagged with the right count;
    unrelated docs never appear."""
    from neural_search_spark.extras import dedup

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    got = (
        dedup.decontaminate(docs_df, bench, n=3, min_overlap=1)
        .orderBy("doc_id")
        .toPandas()
    )
    # docs 0/1/2 are exact/normalized copies: ALL 7 trigram shingles hit;
    # doc 3 (one word changed) shares the grams not covering 'leaps'
    flagged = dict(zip(got.doc_id, got.n_overlap))
    assert flagged[0] == flagged[1] == flagged[2] == 7
    assert 0 < flagged[3] < 7
    assert set(flagged) == {0, 1, 2, 3}
    # threshold excludes the near-dup but keeps the copies
    strict = dedup.decontaminate(docs_df, bench, n=3, min_overlap=7)
    assert sorted(
        r.doc_id for r in strict.select("doc_id").collect()
    ) == [0, 1, 2]


def test_repetition_features(spark):
    from neural_search_spark.extras import textstats

    rows = [
        (0, "a b c d e"),                 # all distinct
        (1, "a a a a"),                   # maximal repetition
        (2, "x y x y x y"),               # alternating: bigrams xy/yx repeat
        (3, ""),                          # empty
        (4, "solo"),                      # one token, no bigrams
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r.asDict()
        for r in textstats.repetition_features(df).collect()
    }
    assert got[0]["dup_token_frac"] == 0.0
    assert got[0]["dup_bigram_frac"] == 0.0
    assert got[0]["top_bigram_frac"] == pytest.approx(0.25)  # 4 distinct of 4
    assert got[1]["dup_token_frac"] == pytest.approx(0.75)   # 1 distinct of 4
    assert got[1]["dup_bigram_frac"] == pytest.approx(2 / 3)
    assert got[1]["top_bigram_frac"] == 1.0                  # 'a a' x3
    # 'x y x y x y': bigrams = xy yx xy yx xy -> top 'x y' = 3/5
    assert got[2]["top_bigram_frac"] == pytest.approx(3 / 5)
    assert got[3]["dup_token_frac"] == 0.0 and got[3]["top_bigram_frac"] == 0.0
    assert got[4]["dup_bigram_frac"] == 0.0


def test_pii_redact(spark):
    from neural_search_spark.extras import textstats

    rows = [
        (0, "email Bob.Smith+x@Example.COM and ip 10.1.2.3 card 4111111111111111"),
        (1, "nothing sensitive here"),
        (2, "two mails a@b.io c@d.org, short num 123"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in textstats.pii_redact(df).collect()}
    assert got[0]["n_email"] == 1 and got[0]["n_ipv4"] == 1
    assert got[0]["n_long_number"] == 1
    assert "<EMAIL>" in got[0]["redacted"]
    assert "<IP>" in got[0]["redacted"] and "<NUM>" in got[0]["redacted"]
    assert "example.com" not in got[0]["redacted"]
    assert got[1]["n_email"] == 0 and got[1]["redacted"] == rows[1][1]
    assert got[2]["n_email"] == 2 and got[2]["n_long_number"] == 0


def test_unigram_logprob(spark):
    """Self-trained unigram LM quality proxy: hand-computable on a tiny
    corpus; rarer vocabulary scores lower (more negative)."""
    import math

    from neural_search_spark.extras import textstats

    rows = [(0, "a a b"), (1, "a a a"), (2, "c")]
    # counts: a=5, b=1, c=1, total=7
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["unigram_logprob"]
        for r in textstats.unigram_logprob(df).collect()
    }
    la, lb, lc = (math.log10(x / 7) for x in (5, 1, 1))
    assert got[0] == pytest.approx((2 * la + lb) / 3)
    assert got[1] == pytest.approx(la)
    assert got[2] == pytest.approx(lc)
    assert got[1] > got[0] > got[2]  # common > mixed > rare


def test_bpe_token_count(spark):
    from neural_search_spark.extras import textstats

    rows = [
        (0, "hello world"),            # 2 word runs
        (1, "don't stop"),             # don + 't + stop
        (2, "x2 3.14!"),               # x + 2, space+3 + . + 14 + !
        (3, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["n"]
        for r in df.select(
            "doc_id", textstats.bpe_token_count("text").alias("n")
        ).collect()
    }
    assert got[0] == 2
    assert got[1] == 3      # don | 't | stop
    assert got[2] == 6      # x | 2 | ' 3' | . | 14 | !
    assert got[3] == 0

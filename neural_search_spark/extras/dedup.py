"""Deduplication operators for web-scale training-data pipelines.

Five families, all expressed as declarative DataFrame plans (Catalyst
optimizes; no per-row Python anywhere):

* exact          — content-hash groupBy (md5 of normalized text)
* minhash + LSH  — word-shingle MinHash signatures, banded LSH bucket
                   join producing candidate pairs, exact-Jaccard verify
* simhash        — 64-bit sign-aggregated fingerprint, near-dup by
                   Hamming distance on bucket join
* n-gram Jaccard — exact shingle-set Jaccard via self-join (small scale /
                   verification path; LSH is the 100 TB path)
* embedding cosine — near-dup pairs over an embedding column (see
                   similarity.py for the ANN scale path)

Scale notes: every pair-producing operator joins on a *bucket* key first
(band hash, simhash prefix, LSH bucket) so the shuffle is keyed and the
quadratic blowup is confined to within-bucket candidates. Hash functions
are the cross-engine ``h60`` family so the DuckDB oracle can reproduce
every intermediate value exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..tokenizer import tokenize_expr
from .hashing import h60

DEFAULT_NUM_HASHES = 16
DEFAULT_BANDS = 4
DEFAULT_SHINGLE = 3


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------
def content_key(col: Column | str) -> Column:
    """Normalized content hash: md5 over the token stream (case/punct
    insensitive). Exact-dup docs get identical keys."""
    return F.md5(F.array_join(tokenize_expr(col), " ").cast("binary"))


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, rep_id, group_size): every doc mapped to its group's
    representative (min id) — keep rows where doc_id == rep_id to dedup.
    One hash-partitioned groupBy; no skew risk (md5 keys are uniform)."""
    keyed = df.select(
        F.col(id_col).alias("doc_id"), content_key(text_col).alias("ckey")
    )
    groups = keyed.groupBy("ckey").agg(
        F.min("doc_id").alias("rep_id"), F.count("*").alias("group_size")
    )
    return keyed.join(groups, "ckey").select("doc_id", "rep_id", "group_size")


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    min_overlap: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination — the training-data staple of flagging
    corpus docs that share word n-grams with an evaluation set (the
    GPT-3/PaLM-style 'n-gram overlap with the benchmark' filter):
    returns (doc_id, n_overlap) for corpus docs sharing ≥ ``min_overlap``
    DISTINCT n-gram shingles with ANY benchmark doc.

    100-TB shape: the benchmark side is eval-set-sized (tiny vs the
    corpus), so its distinct shingle set broadcasts; the corpus-side
    shingle stream is the only big scan and it carries int64 h60
    identities, never gram strings. One broadcast semi-structured join +
    one doc-keyed count — no corpus×corpus pairing anywhere."""
    c_sh = shingles(corpus, text_col=text_col, id_col=id_col, n=n)
    b_sh = (
        shingles(benchmark, text_col=text_col, id_col=id_col, n=n)
        .select("shingle")
        .distinct()
    )
    return (
        c_sh.join(F.broadcast(b_sh), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
        .filter(F.col("n_overlap") >= int(min_overlap))
    )


# ---------------------------------------------------------------------------
# shingles
# ---------------------------------------------------------------------------
def shingles(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = DEFAULT_SHINGLE,
) -> DataFrame:
    """Distinct word n-gram shingles per doc: (doc_id, shingle) where
    ``shingle`` is the gram's int64 h60 HASH, not its text. Every consumer
    (MinHash, band keys, Jaccard intersection) needs only shingle
    IDENTITY, so the distinct and all downstream joins shuffle 8-byte
    longs instead of ~25-byte gram strings — at 10^12-turn scale the
    shingle stream is the pipeline's biggest shuffle. Cross-engine exact:
    the oracle hashes the same gram text with the same h60. Built with
    pure Catalyst array ops (sequence + transform + slice)."""
    toks = tokenize_expr(text_col)
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1)),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(
        # short doc: the whole token stream is its one shingle
        F.array(F.array_join(toks, " "))
    )
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.transform(grams, lambda g: h60(g))).alias("shingle"),
        )
        .distinct()
    )


# ---------------------------------------------------------------------------
# MinHash + banded LSH
# ---------------------------------------------------------------------------
def minhash_signatures(
    sh: DataFrame, num_hashes: int = DEFAULT_NUM_HASHES
) -> DataFrame:
    """(doc_id, mh0..mh{H-1}) — one aggregation pass: per doc, the min of
    each hash over its shingle set. Single shuffle keyed by doc_id.

    ONE md5 per shingle (already paid inside ``shingles`` — the shingle
    column IS the h60) feeds the whole family via affine derivation
    (hashing.minhash_affine: g_i = (a_i·h + b_i) mod 2^61-1 — the classic
    MinHash permutation family); a seeded md5 per function was
    ``num_hashes``× the per-row hashing cost, the dominant term of the
    signature stage at corpus scale."""
    from .hashing import _BASE_MOD, minhash_affine

    tall = sh.select(
        "doc_id", F.pmod(F.col("shingle"), F.lit(_BASE_MOD)).alias("_h")
    )
    aggs = [
        F.min(minhash_affine(F.col("_h"), i)).alias(f"mh{i}")
        for i in range(num_hashes)
    ]
    return tall.groupBy("doc_id").agg(*aggs)


def lsh_candidate_pairs(
    sigs: DataFrame,
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
) -> DataFrame:
    """Banded LSH: split the signature into ``bands`` rows-per-band chunks,
    hash each band, self-join on (band_idx, band_key). Returns distinct
    candidate (doc_a < doc_b) pairs. The join key includes the band hash →
    co-located shuffle join, quadratic only within identical-band groups."""
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands
    band_structs = []
    for b in range(bands):
        cols = [F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)]
        key = h60(F.concat_ws("_", *[c.cast("string") for c in cols]))
        band_structs.append(
            F.struct(F.lit(b).alias("band_idx"), key.alias("band_key"))
        )
    tall = sigs.select(
        "doc_id", F.explode(F.array(*band_structs)).alias("band")
    ).select("doc_id", "band.band_idx", "band.band_key")
    a = tall.alias("a")
    b = tall.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


def jaccard_pairs(sh: DataFrame, pairs: DataFrame | None = None) -> DataFrame:
    """Exact shingle-set Jaccard per pair: (doc_a, doc_b, jaccard).

    With ``pairs`` given (LSH candidates) the shingle join is semi-joined
    down to candidates first — the 100 TB path. Without, it's the exact
    all-pairs form (shuffle keyed by shingle; hot shingles are the skew
    risk, which LSH avoids)."""
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    if pairs is not None:
        # candidates-first: expand each candidate pair to doc_a's shingles,
        # then equi-join on (doc_b, shingle). Work is O(candidates ×
        # shingles-per-doc) — never touches the quadratic shingle join.
        sh_a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
        sh_b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
        inter = (
            pairs.join(sh_a, "doc_a")
            .join(sh_b, ["doc_b", "shingle"])
            .groupBy("doc_a", "doc_b")
            .agg(F.count("*").alias("inter"))
        )
    else:
        a = sh.alias("sa")
        b = sh.alias("sb")
        inter = (
            a.join(b, "shingle")
            .filter(F.col("sa.doc_id") < F.col("sb.doc_id"))
            .select(
                F.col("sa.doc_id").alias("doc_a"),
                F.col("sb.doc_id").alias("doc_b"),
            )
            .groupBy("doc_a", "doc_b")
            .agg(F.count("*").alias("inter"))
        )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .withColumnRenamed("sz", "sz_a")
        .join(
            sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed(
                "sz", "sz_b"
            ),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("inter")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
            ).alias("jaccard"),
        )
    )


def minhash_near_dups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
    shingle_n: int = DEFAULT_SHINGLE,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: shingle → sign → band-join →
    exact-Jaccard verify ≥ threshold. Returns (doc_a, doc_b, jaccard)."""
    from pyspark import StorageLevel

    # the shingle table feeds signatures, sizes and the intersection join —
    # persist it once instead of re-tokenizing the corpus three times
    # (disk-backed; LRU-evicted when the pipeline's actions finish)
    sh = shingles(df, text_col, id_col, shingle_n).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    sigs = minhash_signatures(sh, num_hashes)
    cand = lsh_candidate_pairs(sigs, num_hashes, bands)
    return jaccard_pairs(sh, cand).filter(F.col("jaccard") >= threshold)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------
def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 64,
) -> DataFrame:
    """(doc_id, simhash): 64-bit sign-aggregated fingerprint. Per doc-term:
    tf-weighted ±1 vote per bit of h60(term); bit set where the vote sum is
    positive. One groupBy(doc) aggregation with ``bits`` agg expressions —
    stays entirely in codegen (the tall form would 64× the shuffle).

    h60 only yields 60 bits, so bits 60..63 come from a second seeded h60
    ('sh') — all 64 bits vary, keeping the 4 pigeonhole prefix regions of
    ``simhash_near_dups`` balanced (16 effective bits each)."""
    toks = df.select(
        F.col(id_col).alias("doc_id"), F.explode(tokenize_expr(text_col)).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    h = h60(F.col("term"))
    h2 = h60(F.col("term"), seed="sh")

    def _bit(i: int):
        return (
            F.shiftright(h, i).bitwiseAND(F.lit(1))
            if i < 60
            else F.shiftright(h2, i - 60).bitwiseAND(F.lit(1))
        )

    votes = [
        F.sum(
            F.when(_bit(i) == 1, F.col("tf")).otherwise(-F.col("tf"))
        ).alias(f"v{i}")
        for i in range(bits)
    ]
    per_doc = tf.groupBy("doc_id").agg(*votes)
    sig = None
    for i in range(bits):
        # bit 63 is the sign bit of int64: its two's-complement weight is
        # -2^63 (a plain 1<<63 literal would overflow signed long)
        weight = (1 << i) if i < 63 else -(1 << 63)
        term = F.when(F.col(f"v{i}") > 0, F.lit(weight).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        sig = term if sig is None else sig + term
    return per_doc.select("doc_id", sig.alias("simhash"))


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_dups(
    sigs: DataFrame, max_hamming: int = 3, prefix_bits: int = 16
) -> DataFrame:
    """Near-dup pairs by simhash Hamming distance ≤ max_hamming.

    Candidate generation joins on 4 rotated ``prefix_bits`` prefixes
    (pigeonhole: ≤3 differing bits must leave at least one of 4 disjoint
    16-bit regions untouched) so the self-join is bucket-keyed, then the
    exact Hamming check filters. At 100 TB each bucket is tiny."""
    assert prefix_bits * 4 == 64, "4 disjoint regions must cover 64 bits"
    regions = [
        F.struct(
            F.lit(r).alias("region"),
            F.shiftright(F.col("simhash"), r * prefix_bits)
            .bitwiseAND(F.lit((1 << prefix_bits) - 1))
            .alias("rkey"),
        )
        for r in range(4)
    ]
    tall = sigs.select(
        "doc_id", "simhash", F.explode(F.array(*regions)).alias("reg")
    ).select("doc_id", "simhash", "reg.region", "reg.rkey")
    a, b = tall.alias("a"), tall.alias("b")
    return (
        a.join(
            b,
            (F.col("a.region") == F.col("b.region"))
            & (F.col("a.rkey") == F.col("b.rkey"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            hamming64(F.col("a.simhash"), F.col("b.simhash")).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# embedding cosine near-dups
# ---------------------------------------------------------------------------
def embedding_near_dups(
    emb: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All-pairs cosine ≥ threshold over an embedding column. Exact form
    (cross join) — correct at verification scale; the 100 TB path buckets
    by LSH sign first (similarity.lsh_bucket) and joins within buckets."""
    from .similarity import cosine_expr

    a = emb.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va")
    ).alias("a")
    b = emb.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb")
    ).alias("b")
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            cosine_expr(F.col("va"), F.col("vb")).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def connected_components(
    pairs: DataFrame,
    id_a: str = "doc_a",
    id_b: str = "doc_b",
    max_iterations: int = 50,
) -> DataFrame:
    """(doc_id, component) for every node in the near-dup pair graph;
    component = smallest doc_id reachable. Dedup keeps one representative
    per component (doc_id == component).

    Min-label propagation with pointer jumping: each round (a) every node
    takes the min of its own and its neighbors' labels (node-keyed join +
    groupBy-min — shuffles keyed by node id, no driver-side graph), then
    (b) jumps its label to its label's label (`l(u) ← l(l(u))`), which
    halves chain depth so convergence is O(log n) rounds rather than
    O(diameter). A label is always the id of a node reachable from u, so
    the converged fixpoint — where both endpoints of every edge agree — is
    exactly the component minimum. Each round checks a deterministic
    fingerprint; a non-decreasing label sum makes the check sound."""
    from pyspark import StorageLevel

    sym = (
        pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
        .unionAll(pairs.select(F.col(id_b).alias("u"), F.col(id_a).alias("v")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    labels = (
        sym.select(F.col("u").alias("n"))
        .distinct()
        .withColumn("l", F.col("n"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    prev = None
    try:
        for _ in range(max_iterations):
            # (a) neighbor min: l(u) ← min(l(u), min_{v∈N(u)} l(v))
            nbr = sym.join(
                labels.withColumnRenamed("n", "v"), "v"
            ).select(F.col("u").alias("n"), "l")
            stepped = (
                labels.unionAll(nbr).groupBy("n").agg(F.min("l").alias("l"))
            )
            # (b) pointer jump: l(u) ← l(l(u))
            jump = labels.select(
                F.col("n").alias("l"), F.col("l").alias("l2")
            )
            nxt = (
                stepped.join(jump, "l", "left")
                .select("n", F.coalesce("l2", F.col("l")).alias("l"))
                .persist(StorageLevel.MEMORY_AND_DISK)
            )
            row = nxt.agg(
                F.count(F.lit(1)).alias("c"), F.sum("l").alias("s")
            ).collect()[0]
            fp = (int(row["c"]), int(row["s"] or 0))
            labels.unpersist()
            labels = nxt
            if fp == prev:
                break
            prev = fp
        else:
            raise RuntimeError(
                f"connected_components did not converge in "
                f"{max_iterations} rounds"
            )
        # localCheckpoint truncates the iteration lineage so every
        # intermediate cache (labels, sym) can be released here instead of
        # leaking MEMORY_AND_DISK storage into the caller's session
        out = labels.select(
            F.col("n").alias("doc_id"), F.col("l").alias("component")
        ).localCheckpoint(eager=True)
    finally:
        labels.unpersist()
        sym.unpersist()
    return out


def embedding_near_dups_lsh(
    emb: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 8,
    max_hamming: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Bucketed near-dup pairs — the 100 TB path: each vector gets an
    ``n_planes``-bit random-hyperplane sign bucket; candidate pairs come
    from an equi-join on 4 rotated 2-bit bucket regions (pigeonhole:
    bucket-hamming ≤ 3 guarantees a shared region), then the exact cosine
    + bucket-hamming filters verify. The shuffle is keyed by (region,
    rkey) — never an all-pairs cross join. Recall is the standard LSH
    trade-off: pairs whose buckets differ in > max_hamming planes are not
    candidates (P(miss) falls geometrically with cosine)."""
    from .similarity import cosine_expr, hyperplanes, lsh_bucket

    assert n_planes % 4 == 0
    rb = n_planes // 4  # region width in bits
    if dim is None:
        # one peek action to learn the vector dimension — pass dim to skip
        row = emb.select(vec_col).first()
        if row is None:  # empty input → empty pair set
            return emb.sparkSession.range(0).select(
                F.col("id").alias("id_a"),
                F.col("id").alias("id_b"),
                F.lit(0.0).alias("cosine"),
            )
        dim = len(row[0])
    planes = hyperplanes(n_planes, dim)
    b = emb.select(
        F.col(id_col).alias("doc_id"),
        F.col(vec_col).alias("v"),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    regions = [
        F.struct(
            F.lit(r).alias("region"),
            F.shiftright(F.col("bucket"), r * rb)
            .bitwiseAND(F.lit((1 << rb) - 1))
            .alias("rkey"),
        )
        for r in range(4)
    ]
    tall = b.select(
        "doc_id", "v", "bucket", F.explode(F.array(*regions)).alias("reg")
    ).select("doc_id", "v", "bucket", "reg.region", "reg.rkey")
    a, c = tall.alias("a"), tall.alias("b")
    pairs = (
        a.join(
            c,
            (F.col("a.region") == F.col("b.region"))
            & (F.col("a.rkey") == F.col("b.rkey"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.bit_count(
                F.col("a.bucket").bitwiseXOR(F.col("b.bucket"))
            ).alias("hamming"),
            cosine_expr(F.col("a.v"), F.col("b.v")).alias("cosine"),
        )
        .distinct()
    )
    return pairs.filter(
        (F.col("hamming") <= max_hamming) & (F.col("cosine") >= threshold)
    ).select("id_a", "id_b", "cosine")

"""Completion suggester — the host's `completion` field + suggest API
(Lucene NRTSuggester / FST-based CompletionQuery semantics, re-expressed
for Spark + parquet).

Reference surface (public OpenSearch API): documents carry suggestion
inputs with optional weights; a suggest request sends a prefix and gets
back the top-`size` suggestions by weight, optionally skipping duplicate
surface forms, optionally fuzzy (FuzzyCompletionQuery: edits after a
protected prefix, AUTO fuzziness by prefix length, min_length gate).

Spark-first shape — the FST's two superpowers, re-created with parquet:

* **Ordered traversal** (any-depth prefix → matching entries): the
  entries table is written range-partitioned AND sorted by the analyzed
  key, so a prefix lookup is a pyarrow row-group range read
  ([prefix, prefix⁺)), never a scan.
* **Weighted best-path** (top-k without visiting all matches): Lucene
  walks max-weight FST arcs; we precompute, at build time, the top
  `prefix_top` suggestions for EVERY key prefix up to `prefix_depth`
  chars (one explode + one Window over the entries frame — bounded
  output ≤ prefix_top · |distinct prefixes|). Serving a short prefix —
  exactly the case where the match set is huge — is then a point read of
  ≤ prefix_top pre-ranked rows. Longer prefixes are selective by
  construction and use the range read.

Both build passes are single-shuffle DataFrame plans; serving never
starts a Spark job (the coordinator-cheap pattern, like
query/suggest.py).

Scoring/order: weight desc, surface asc, doc_id asc (deterministic
tiebreak). Fuzzy ranks exact-prefix matches first via the edit distance
as the primary sort key (dist asc, then weight desc) — Lucene boosts
exact completions above fuzzed ones the same way
(FuzzyCompletionQuery's maxEdits-based boost).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

import numpy as np

from ..tokenizer import tokenize_expr, tokenize_py

__all__ = ["CompletionIndexBuilder", "CompletionIndex", "Completion"]

# category-context key separator: sorts below every analyzed char
# ([0-9a-z ]), so each context owns one contiguous key range
_CTX_SEP = "\x01"


def _encode_keys(
    keys: list[str], width: int
) -> tuple[np.ndarray, np.ndarray]:
    """Candidate key prefixes as one padded int32 codepoint matrix
    (n × width, pad 0 — NUL never appears in analyzed keys) plus true
    lengths. One C-level join+frombuffer, no per-key numpy calls."""
    n = len(keys)
    lens = np.fromiter((len(k) for k in keys), np.int64, n)
    joined = "\0".join(k[:width].ljust(width, "\0") for k in keys)
    if n:
        joined += "\0"  # uniform stride: every key owns width+1 slots
        flat = np.frombuffer(
            joined.encode("utf-32-le"), dtype=np.uint32
        ).astype(np.int32)
        mat = flat.reshape(n, width + 1)[:, :width]
    else:
        mat = np.empty((0, width), dtype=np.int32)
    return mat, lens


def _prefix_edit_distances_enc(
    akey: str,
    mat: np.ndarray,
    lens: np.ndarray,
    edits: int,
    transpositions: bool,
) -> np.ndarray:
    """Banded Levenshtein/OSA prefix-distance DP, candidates as the
    vector axis: min over prefix cuts of dist(akey, key[:cut]) for EVERY
    candidate at once. Only the |i−j| ≤ edits band is computed (cells
    outside it exceed the budget), every update is a numpy op across all
    candidates, and values clip at edits+1 (int16) — the per-query hot
    loop of fuzzy completion, ~100× the per-candidate python DP even on
    full-corpus candidate sets. Returns edits+1 for over-budget rows."""
    la = len(akey)
    maxj = la + edits
    n = mat.shape[0]
    if n == 0:
        return np.empty(0, dtype=np.int64)
    a = np.frombuffer(akey.encode("utf-32-le"), dtype=np.uint32).astype(
        np.int32
    )
    big = np.int16(edits + 1)
    # D[:, i] = dist(akey[:i], cand[:j]) at the current j, clipped at big
    D = np.tile(
        np.minimum(np.arange(la + 1), int(big)).astype(np.int16), (n, 1)
    )
    best = np.full(n, big, dtype=np.int16)
    if la <= edits:
        best[:] = la  # the empty prefix (cut=0) is inside the window
    Dprev = None  # D at j-1, for the OSA transposition term
    one = np.int16(1)
    for j in range(1, maxj + 1):
        cj = mat[:, j - 1]
        newD = np.full_like(D, big)
        if j <= edits:
            newD[:, 0] = j
        lo = max(1, j - edits)
        hi = min(la, j + edits)
        for i in range(lo, hi + 1):
            sub = D[:, i - 1] + (cj != a[i - 1]).astype(np.int16)
            cell = np.minimum(sub, D[:, i] + one)
            cell = np.minimum(cell, newD[:, i - 1] + one)
            if transpositions and i >= 2 and j >= 2 and Dprev is not None:
                tr_ok = (cj == a[i - 2]) & (mat[:, j - 2] == a[i - 1])
                cell = np.where(
                    tr_ok, np.minimum(cell, Dprev[:, i - 2] + one), cell
                )
            # clip keeps values small; never changes the ≤edits verdict
            np.minimum(cell, big, out=newD[:, i])
        Dprev = D
        D = newD
        if j >= la - edits:
            valid = lens >= j  # cut=j only exists if the key is that long
            best = np.where(valid, np.minimum(best, D[:, la]), best)
    return best.astype(np.int64)


def _prefix_edit_distances(
    akey: str, keys: list[str], edits: int, transpositions: bool
) -> np.ndarray:
    mat, lens = _encode_keys(keys, len(akey) + edits)
    return _prefix_edit_distances_enc(akey, mat, lens, edits, transpositions)


@dataclass
class Completion:
    text: str       # the stored surface form
    weight: float
    doc_id: int
    distance: int = 0  # fuzzy edit distance (0 on the exact path)


def _analyze(s: str) -> str:
    """Query/entry analysis: the engine's analyzer chain, token stream
    joined on single spaces (the completion field's analyzed form)."""
    return " ".join(tokenize_py(s))


def _next_key(prefix: str) -> str:
    return prefix[:-1] + chr(ord(prefix[-1]) + 1)


class CompletionIndexBuilder:
    """Builds the on-disk completion index:

    out_dir/entries/   (key, surface, weight, doc_id) sorted by key
    out_dir/tops/      (prefix, surface, weight, doc_id, rk) sorted by
                       prefix — top `prefix_top` per prefix of length
                       1..prefix_depth
    out_dir/meta.json
    """

    def __init__(
        self,
        spark: SparkSession,
        out_dir: str,
        prefix_depth: int = 3,
        prefix_top: int = 50,
        n_files: int = 8,
    ):
        self.spark = spark
        self.out_dir = out_dir
        self.prefix_depth = int(prefix_depth)
        self.prefix_top = int(prefix_top)
        self.n_files = int(n_files)

    def build(
        self,
        df: DataFrame,
        input_col: str,
        weight_col: str | None = None,
        id_col: str = "doc_id",
        context_col: str | None = None,
    ) -> dict:
        """context_col (host category contexts, ContextSuggestField):
        a string or array<string> column of category values; each value
        becomes its own contiguous slice of the key space (the key is
        written as ``ctx + '\\x01' + analyzed_key`` — exactly Lucene's
        context-prepended FST key), so a context-filtered suggest stays
        ONE range/point read. A context-built index REQUIRES contexts
        at query time and vice versa (host 'Missing mandatory contexts'
        parity). '\\x01' sorts below every analyzed char and cannot
        appear in a context value (validated)."""
        w = (
            F.col(weight_col).cast("double")
            if weight_col
            else F.lit(1.0)
        )
        base = df
        akey = F.concat_ws(" ", tokenize_expr(input_col))
        if context_col is not None:
            from pyspark.sql.types import ArrayType

            ctype = base.schema[context_col].dataType
            ctx = (
                # a doc's contexts are a SET (host semantics): dedupe so
                # duplicate categories can't mint duplicate entries.
                # Generator must head the select.
                F.explode(F.array_distinct(F.col(context_col)))
                if isinstance(ctype, ArrayType)
                else F.col(context_col)
            )
            base = base.select(
                ctx.alias("__ctx_raw"),
                akey.alias("__akey"),
                F.col(input_col).alias("surface"),
                w.alias("weight"),
                F.col(id_col).cast("long").alias("doc_id"),
            ).select(
                # separator validation rides the same pass (raise_error
                # folds into the projection — no extra validation job
                # over the input)
                F.when(
                    F.col("__ctx_raw").cast("string").contains(_CTX_SEP),
                    F.raise_error(
                        F.lit(
                            "context values must not contain the \\x01 "
                            "separator"
                        )
                    ),
                )
                .otherwise(F.col("__ctx_raw").cast("string"))
                .alias("__ctx"),
                "__akey", "surface", "weight", "doc_id",
            ).filter(
                F.col("__ctx").isNotNull() & (F.col("__ctx") != "")
            )
        else:
            base = base.select(
                F.lit(None).cast("string").alias("__ctx"),
                akey.alias("__akey"),
                F.col(input_col).alias("surface"),
                w.alias("weight"),
                F.col(id_col).cast("long").alias("doc_id"),
            )
        key = F.when(
            F.col("__ctx").isNotNull(),
            F.concat(F.col("__ctx"), F.lit(_CTX_SEP), F.col("__akey")),
        ).otherwise(F.col("__akey"))
        entries = (
            base.select(
                key.alias("key"),
                "__akey",
                "__ctx",
                "surface",
                "weight",
                "doc_id",
            )
            .filter(F.col("__akey") != "")
        )
        (
            entries.select("key", "surface", "weight", "doc_id")
            .repartitionByRange(self.n_files, "key")
            .sortWithinPartitions("key", "surface", "doc_id")
            .write.mode("overwrite")
            .parquet(os.path.join(self.out_dir, "entries"))
        )
        # weighted-best-path precompute: every ≤prefix_depth-char prefix
        # of every SUGGESTION key (the context, when present, is a fixed
        # prepended bucket — depth budgets the typed prefix, not the
        # context), top prefix_top entries per prefix. One explode + one
        # Window — the Window key IS the prefix, so skew is bounded by
        # prefix_top rows surviving per group after the rank filter.
        depth = self.prefix_depth
        sub = F.expr(
            f"transform(sequence(1, least(length(__akey), {depth})),"
            " i -> substring(__akey, 1, i))"
        )
        pref = entries.select(
            F.explode(sub).alias("__sub"),
            "__ctx", "surface", "weight", "doc_id",
        ).select(
            F.when(
                F.col("__ctx").isNotNull(),
                F.concat(F.col("__ctx"), F.lit(_CTX_SEP), F.col("__sub")),
            )
            .otherwise(F.col("__sub"))
            .alias("prefix"),
            "surface", "weight", "doc_id",
        )
        rk = F.row_number().over(
            Window.partitionBy("prefix").orderBy(
                F.col("weight").desc(),
                F.col("surface").asc(),
                F.col("doc_id").asc(),
            )
        )
        tops = pref.withColumn("rk", rk).filter(
            F.col("rk") <= self.prefix_top
        )
        (
            tops.repartitionByRange(self.n_files, "prefix")
            .sortWithinPartitions("prefix", "rk")
            .write.mode("overwrite")
            .parquet(os.path.join(self.out_dir, "tops"))
        )
        n = entries.count()
        meta = {
            "n_entries": int(n),
            "prefix_depth": depth,
            "prefix_top": self.prefix_top,
            "contexts": context_col is not None,
        }
        with open(os.path.join(self.out_dir, "meta.json"), "w") as fh:
            json.dump(meta, fh)
        return meta


class CompletionIndex:
    """Read handle. Serving is pyarrow range/point reads only — no Spark
    job per suggest call."""

    # pre-encoded fuzzy candidate width: covers analyzed prefixes up to
    # 62 chars (+2 edits); longer prefixes fall back to a direct encode
    _ENC_WIDTH = 64
    # seeds cached per handle — the resident-terms-index analog (Lucene
    # keeps the whole suggest FST in memory; we keep the hot protected-
    # prefix buckets), bounded so memory stays O(cached buckets)
    _SEED_CACHE_MAX = 16

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        with open(os.path.join(path, "meta.json")) as fh:
            self.meta = json.load(fh)
        self._entries_ds = None
        self._tops_ds = None
        from collections import OrderedDict

        self._seed_cache: OrderedDict = OrderedDict()

    # -- low-level reads ------------------------------------------------
    def _ds(self, which: str):
        import pyarrow.dataset as ds

        attr = f"_{which}_ds"
        if getattr(self, attr) is None:
            setattr(
                self, attr,
                ds.dataset(
                    os.path.join(self.path, which), format="parquet"
                ),
            )
        return getattr(self, attr)

    def _read_tops(self, prefix: str):
        import pyarrow.dataset as ds

        tbl = self._ds("tops").to_table(
            columns=["surface", "weight", "doc_id", "rk"],
            filter=ds.field("prefix") == prefix,
        )
        rows = sorted(
            zip(
                tbl["rk"].to_pylist(), tbl["surface"].to_pylist(),
                tbl["weight"].to_pylist(), tbl["doc_id"].to_pylist(),
            )
        )
        return [(s, w, d) for _, s, w, d in rows]

    def _read_range(self, prefix: str):
        import pyarrow.dataset as ds

        flt = (ds.field("key") >= prefix) & (
            ds.field("key") < _next_key(prefix)
        )
        tbl = self._ds("entries").to_table(
            columns=["key", "surface", "weight", "doc_id"], filter=flt
        )
        return list(
            zip(
                tbl["key"].to_pylist(), tbl["surface"].to_pylist(),
                tbl["weight"].to_pylist(), tbl["doc_id"].to_pylist(),
            )
        )

    # -- public API ------------------------------------------------------
    def complete(
        self,
        prefix: str,
        size: int = 5,
        skip_duplicates: bool = False,
        fuzzy: dict | None = None,
        contexts: list[str] | None = None,
    ) -> list[Completion]:
        """Top-`size` completions for `prefix`.

        fuzzy options (FuzzyCompletionQuery parity): fuzziness 0|1|2|
        'AUTO' (AUTO = 0 below 3 analyzed chars, 1 below 6, else 2),
        prefix_length (protected exact chars, default 1 — the pruned
        candidate read; 0 would scan every entry and is refused unless
        allow_unpruned=True), min_length (prefixes shorter than this
        match exactly, default 3), transpositions (OSA vs plain
        Levenshtein, default True).

        contexts (host category contexts): the category values to
        search under, each ONE contiguous key-range/point read; results
        merge across the requested contexts (a doc matching several
        appears once). A context-built index requires them ('Missing
        mandatory contexts' parity) and a context-free one refuses
        them."""
        akey = _analyze(prefix)
        if not akey:
            return []
        has_ctx = bool(self.meta.get("contexts"))
        if has_ctx and not contexts:
            raise ValueError(
                "this completion index was built with contexts — pass "
                "contexts=[...] (the host's 'Missing mandatory contexts')"
            )
        if not has_ctx and contexts:
            raise ValueError(
                "contexts passed but the index was built without a "
                "context_col"
            )
        buckets = (
            [f"{c}{_CTX_SEP}" for c in dict.fromkeys(contexts)]
            if has_ctx
            else [""]
        )
        out: list[Completion] = []
        for b in buckets:
            out.extend(self._complete_one(b, akey, fuzzy))
        if len(buckets) > 1:
            seen_pair: set[tuple] = set()
            uniq = []
            for c in out:
                kk = (c.text, c.doc_id)
                if kk in seen_pair:
                    continue
                seen_pair.add(kk)
                uniq.append(c)
            if fuzzy is None:
                uniq.sort(key=lambda c: (-c.weight, c.text, c.doc_id))
            else:
                uniq.sort(
                    key=lambda c: (c.distance, -c.weight, c.text, c.doc_id)
                )
            out = uniq
        if skip_duplicates:
            seen: set[str] = set()
            dedup = []
            for c in out:
                if c.text in seen:
                    continue
                seen.add(c.text)
                dedup.append(c)
            out = dedup
        return out[:size]

    def _complete_one(
        self, bucket: str, akey: str, fuzzy: dict | None
    ) -> list[Completion]:
        """One context bucket (or '' for a context-free index): the
        original exact tops/range/fuzzy paths with the bucket prepended
        to every key the reads touch."""
        if fuzzy is None:
            if len(akey) <= self.meta["prefix_depth"]:
                rows = self._read_tops(bucket + akey)
                return [Completion(s, w, d) for s, w, d in rows]
            got = self._read_range(bucket + akey)
            got.sort(key=lambda r: (-r[2], r[1], r[3]))
            return [Completion(s, w, d) for _, s, w, d in got]
        return self._fuzzy(akey, fuzzy, bucket=bucket)

    def _fuzzy(
        self, akey: str, fuzzy: dict, bucket: str = ""
    ) -> list[Completion]:
        fz = fuzzy.get("fuzziness", "AUTO")
        if fz == "AUTO":
            edits = 0 if len(akey) < 3 else (1 if len(akey) < 6 else 2)
        else:
            edits = min(int(fz), 2)
        if len(akey) < int(fuzzy.get("min_length", 3)):
            edits = 0
        pl = int(fuzzy.get("prefix_length", 1))
        if pl <= 0 and not fuzzy.get("allow_unpruned", False):
            raise ValueError(
                "fuzzy completion with prefix_length=0 reads every entry; "
                "pass allow_unpruned=True to override (sandbox scale only)"
            )
        if edits == 0:
            got = self._read_range(bucket + akey)
            got.sort(key=lambda r: (-r[2], r[1], r[3]))
            return [Completion(s, w, d) for _, s, w, d in got]
        # candidates: everything sharing the protected prefix — a range
        # read bounded by the pl-char bucket (document: pl>=2 recommended
        # at large entry counts; the guard above refuses pl=0), cached
        # pre-encoded per seed (the Lucene resident-FST analog, bounded).
        # Under a context the seed carries the context bucket and the
        # fixed-length bucket prefix is stripped before the DP encode.
        seed = bucket + akey[: min(pl, len(akey))]
        maxj = len(akey) + edits
        surfaces, weights, doc_ids, keys, mat, lens = self._candidates(
            seed, strip=len(bucket)
        )
        if not surfaces:
            return []
        if maxj > mat.shape[1]:
            mat, lens = _encode_keys(keys, maxj)
        # prefix edit distance for EVERY candidate in one vectorized DP
        dists = _prefix_edit_distances_enc(
            akey, mat, lens, edits, bool(fuzzy.get("transpositions", True))
        )
        sel = np.flatnonzero(dists <= edits)
        scored = [
            (int(dists[i]), -weights[i], surfaces[i], doc_ids[i], weights[i])
            for i in sel
        ]
        scored.sort()
        return [
            Completion(s, w, d, distance=b)
            for b, _, s, d, w in scored
        ]

    def _candidates(self, seed: str, strip: int = 0):
        """(surfaces, weights, doc_ids, keys, mat, lens) for a protected
        prefix, LRU-cached with the key matrix pre-encoded at _ENC_WIDTH.
        ``strip`` removes a fixed-length context bucket from every key
        before encoding (the DP compares suggestion keys, not composite
        ones); it is derivable from the seed, so the seed stays the
        cache key."""
        hit = self._seed_cache.get(seed)
        if hit is not None:
            self._seed_cache.move_to_end(seed)
            return hit
        if seed:
            rows = self._read_range(seed)
        else:
            # pl=0 (guard overridden): the full-entry walk
            tbl = self._ds("entries").to_table(
                columns=["key", "surface", "weight", "doc_id"]
            )
            rows = list(
                zip(
                    tbl["key"].to_pylist(), tbl["surface"].to_pylist(),
                    tbl["weight"].to_pylist(), tbl["doc_id"].to_pylist(),
                )
            )
        keys = [r[0][strip:] if strip else r[0] for r in rows]
        mat, lens = _encode_keys(keys, self._ENC_WIDTH)
        item = (
            [r[1] for r in rows],
            [r[2] for r in rows],
            [r[3] for r in rows],
            keys,
            mat,
            lens,
        )
        self._seed_cache[seed] = item
        if len(self._seed_cache) > self._SEED_CACHE_MAX:
            self._seed_cache.popitem(last=False)
        return item

"""Ingest-side processors (reference processor/* family), Spark-first.

The reference's ingest processors call a remote ML model
(ml/MLCommonsClientAccessor.java:64-137). This container has no model, so
the engine ships DETERMINISTIC STUB MODELS built on the cross-engine h60
hash: embeddings and token weights are reproducible in Spark, numpy and
ANSI SQL, which lets the driver's DuckDB oracle verify the whole ingest
pipeline value-for-value. A real deployment swaps `embed_expr` /
`sparse_encode` for a pandas-UDF model call with the same column contract.

Operators (reference file:line):
* text_embedding       — TextEmbeddingProcessor.java:63-154
* sparse_encoding      — SparseEncodingProcessor.java:77-95 (+ prune)
* text_image_embedding — TextImageEmbeddingProcessor.java:42-162
* semantic field       — semantic/SemanticFieldProcessor.java:63-270
                         (chunk → dedup (model,chunk) → embed → subfields)
* skip_existing        — optimization/InferenceFilter.java: re-embed only
                         rows whose text changed vs the existing snapshot
                         (left-anti join on (id, text-hash)) — this is the
                         incremental-ingest path at 100 TB
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .chunking import chunk_udf
from .extras.hashing import H60_MAX, h60
from .tokenizer import tokenize_expr

EMBED_DIM = 8


# ---------------------------------------------------------------------------
# stub models (deterministic, cross-engine)
# ---------------------------------------------------------------------------
def embed_expr(col: Column | str, dim: int = EMBED_DIM) -> Column:
    """Stub dense 'model': component j = 2*u_j - 1 where
    u_j = h60(fingerprint(text) + '#' + j)/2^60 and the fingerprint is the
    md5 of the normalized token stream. Pure Catalyst; identical in SQL."""
    fp = F.md5(F.array_join(tokenize_expr(col), " ").cast("binary"))
    comps = [
        (h60(fp, seed=j) / F.lit(H60_MAX) * 2.0 - 1.0).cast("float")
        for j in range(dim)
    ]
    return F.array(*comps)


def embed_sql(expr: str, dim: int = EMBED_DIM) -> str:
    from .extras.hashing import h60_sql
    from .tokenizer import tokenize_sql

    fp = f"md5(array_to_string({tokenize_sql(expr)}, ' '))"
    comps = ", ".join(
        f"(({h60_sql(fp, j)} / {H60_MAX!r}) * 2.0 - 1.0)::REAL" for j in range(dim)
    )
    return f"[{comps}]"


def sparse_encode(df: DataFrame, text_col: str = "text", id_cols=("doc_id",)) -> DataFrame:
    """Stub sparse 'model' in tall form: (ids..., token, weight) with
    weight = tf * (1 + h60(token)/2^60) — positive, reproducible in SQL.
    Collapse to MapType with ``to_feature_map`` when the map form is needed."""
    tf = (
        df.select(*id_cols, F.explode(tokenize_expr(text_col)).alias("token"))
        .groupBy(*id_cols, "token")
        .agg(F.count("*").alias("tf"))
    )
    w = F.col("tf") * (1.0 + h60("token") / F.lit(H60_MAX))
    return tf.select(*id_cols, "token", w.cast("float").alias("weight"))


def to_feature_map(tall: DataFrame, id_cols=("doc_id",)) -> DataFrame:
    return tall.groupBy(*id_cols).agg(
        F.map_from_entries(
            F.collect_list(F.struct("token", "weight"))
        ).alias("features")
    )


# ---------------------------------------------------------------------------
# pipeline processors
# ---------------------------------------------------------------------------
def text_embedding(
    df: DataFrame, text_col: str = "text", out_col: str = "embedding", dim: int = EMBED_DIM
) -> DataFrame:
    """doc → doc + dense vector (reference TextEmbeddingProcessor)."""
    return df.withColumn(out_col, embed_expr(text_col, dim))


def text_image_embedding(
    df: DataFrame,
    text_col: str = "text",
    image_col: str = "image",
    out_col: str = "embedding",
    dim: int = EMBED_DIM,
) -> DataFrame:
    """One embedding from {inputText, inputImage}: the stub hashes the
    concatenated modalities (image treated as opaque bytes → hex)."""
    joined = F.concat_ws(
        "",
        F.coalesce(F.col(text_col), F.lit("")),
        F.coalesce(F.hex(F.col(image_col)), F.lit("")),
    )
    comps = [
        (h60(F.md5(joined.cast("binary")), seed=j) / F.lit(H60_MAX) * 2.0 - 1.0).cast(
            "float"
        )
        for j in range(dim)
    ]
    return df.withColumn(out_col, F.array(*comps))


def semantic_field(
    df: DataFrame,
    text_col: str = "text",
    id_cols=("doc_id",),
    chunk_algorithm: str = "fixed_char_length",
    dim: int = EMBED_DIM,
    **chunk_params,
) -> DataFrame:
    """Semantic-field system pipeline: chunk → dedup identical chunks before
    'inference' (reference dedups (model, chunk) pairs,
    SemanticFieldProcessor.java:260-268) → embed → chunk rows
    (ids..., chunk_idx, chunk, chunk_embedding)."""
    chunks = df.select(
        *id_cols,
        F.posexplode(chunk_udf(chunk_algorithm, **chunk_params)(F.col(text_col))).alias(
            "chunk_idx", "chunk"
        ),
    )
    uniq = chunks.select("chunk").distinct().withColumn(
        "chunk_embedding", embed_expr("chunk", dim)
    )
    # broadcast when the distinct-chunk side is small; at 100 TB this is a
    # shuffle join on the chunk hash — either way, inference ran once per
    # distinct chunk, not once per occurrence
    return chunks.join(uniq, "chunk").select(
        *id_cols, "chunk_idx", "chunk", "chunk_embedding"
    )


def skip_existing_filter(
    incoming: DataFrame,
    existing: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame]:
    """Incremental ingest: split incoming rows into (needs_inference,
    reusable). A row is reusable when the existing snapshot has the same id
    AND the same normalized text fingerprint (the reference compares stored
    source text, TextEmbeddingInferenceFilter). Left-anti join = the rows to
    re-embed; inner join = rows whose stored vectors can be copied."""
    fp = F.md5(F.array_join(tokenize_expr(text_col), " ").cast("binary"))
    inc = incoming.withColumn("_fp", fp)
    ex = existing.select(
        F.col(id_col).alias("_ex_id"),
        F.md5(F.array_join(tokenize_expr(text_col), " ").cast("binary")).alias("_ex_fp"),
    )
    cond = (F.col(id_col) == F.col("_ex_id")) & (F.col("_fp") == F.col("_ex_fp"))
    needs = inc.join(ex, cond, "left_anti").drop("_fp")
    reuse = inc.join(ex, cond, "left_semi").drop("_fp")
    return needs, reuse

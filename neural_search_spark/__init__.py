"""neural_search_spark — a from-scratch PySpark-native full-text retrieval engine.

Re-expresses the query/data-processing capabilities of the OpenSearch
neural-search plugin (reference: junqiu-lei/neural-search, studied read-only)
as idiomatic Spark: a distributed inverted-index build with delta+varint
posting blocks and per-block max-score metadata, a BM25 (k1=1.2, b=0.75)
block-max top-k query engine, and the hybrid-search surface (normalization,
combination, sparse scoring, pruning, chunking, rerank, collapse) built on
DataFrame / Window / vectorized pandas-UDF primitives.

Nothing here is a port: the reference is a JVM search plugin orchestrating
Lucene; this engine builds the lexical substrate itself, Spark-first.
"""

__version__ = "0.1.0"

BM25_K1 = 1.2
BM25_B = 0.75
BLOCK_SIZE = 4096  # posting-block width, mirrors Lucene's 4096-doc bulk-score
# windows (reference: query/HybridBulkScorer.java:23-26, SHIFT=12).

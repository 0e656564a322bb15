"""_update_by_query — query-scoped document updates with incremental
reindex.

Reference host surface (public OpenSearch API: `_update_by_query`,
`org.opensearch.index.reindex.UpdateByQueryAction`): run a query, apply a
script to every matched document's ``_source``, and reindex the changed
documents — internally a versioned delete-plus-add per doc; unmatched
documents are untouched.

Spark-first shape, and the documented divergence: the host's per-doc
painless script becomes a dict of **Spark SQL expressions** applied as
vectorized Catalyst columns (``{"text": "upper(text)"}``) — the same
express-the-transform-declaratively trade every processor in this engine
makes; a per-row scripting VM would be the slow path at any scale.

The index maintenance is Lucene's update-as-delete-plus-add in merge
form, costed by the UPDATE SIZE, never the corpus:

* a fresh segment index is built over the matched rows ONLY (same
  layout params as the main index; positions sidecar too when the main
  has one);
* one ``merge_indexes`` pass combines main + segment while expunging the
  main's stale copies via SOURCE-SCOPED deletes (``deletes_sources``),
  so the same doc ids keep their new postings from the segment;
* the merged index is query-identical to a from-scratch build over the
  updated corpus (asserted in tests/test_update_by_query.py) — stats
  (n_docs/avgdl/df/cf) are re-derived exactly, not approximated.

Caveat shared with the expunge path: a matched doc whose OLD copy had
zero tokens leaves no posting to correct n_docs by (merge.py contract).
"""

from __future__ import annotations

import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["apply_update", "update_and_reindex"]


def apply_update(
    corpus: DataFrame,
    matched_ids: DataFrame,
    set_exprs: dict[str, str],
    id_col: str = "doc_id",
) -> DataFrame:
    """The corpus after the update: matched rows get each ``set_exprs``
    column replaced by its SQL expression (evaluated over the old row —
    all expressions see pre-update values, like a painless script reading
    ctx._source before assignment); unmatched rows pass through. New
    column names are added (NULL on unmatched rows), matching the host's
    ability to add fields. One left join + Catalyst projections."""
    flag = matched_ids.select(F.col(id_col)).distinct().withColumn(
        "__upd", F.lit(True)
    )
    out = corpus.join(flag, id_col, "left")
    upd = F.coalesce(F.col("__upd"), F.lit(False))
    # evaluate every expression against the PRE-update row in one select
    # (sequential withColumn would let later exprs see earlier updates)
    cols = []
    for c in corpus.columns:
        if c in set_exprs:
            cols.append(
                F.when(upd, F.expr(set_exprs[c]))
                .otherwise(F.col(c))
                .alias(c)
            )
        else:
            cols.append(F.col(c))
    for c, expr in set_exprs.items():
        if c not in corpus.columns:
            cols.append(
                F.when(upd, F.expr(expr)).otherwise(F.lit(None)).alias(c)
            )
    return out.select(*cols)


def update_and_reindex(
    spark: SparkSession,
    index,
    updated_corpus: DataFrame,
    matched_ids: DataFrame,
    out_dir: str,
    id_col: str = "doc_id",
    target_postings_per_task: int = 500_000,
) -> dict:
    """Incremental reindex after ``apply_update``: segment build over the
    matched rows + one source-scoped merge (see module docstring).
    ``index`` is the main BM25Index handle; returns merge_indexes' info
    dict with the segment build folded in. The matched rows must carry
    the builder's identity columns (conv_id, turn_idx) and text."""
    from ..query.bm25 import BM25Index  # noqa: F401 (doc reference)
    from .build import IndexBuilder
    from .merge import _read_layout, merge_indexes
    from .positions import build_positions, has_positions

    lay = _read_layout(spark, index.path)
    seg_dir = out_dir.rstrip("/") + ".seg"
    rows = updated_corpus.join(
        matched_ids.select(id_col).distinct(), id_col, "left_semi"
    )
    IndexBuilder(
        spark,
        seg_dir,
        n_shards=int(lay["n_shards"]),
        block_size=int(lay["block_size"]),
        k1=float(lay["k1"]),
        b=float(lay["b"]),
    ).build(rows)
    dels = matched_ids.select(F.col(id_col).cast("long").alias("doc_id"))
    # fold the handle's query-time tombstones into the scoped expunge:
    # without this, an update after delete_by_query would RESURRECT the
    # tombstoned docs (tombstones live on the handle, not in the files,
    # so a plain merge would carry their postings into the new index)
    if getattr(index, "deletes", None) is not None and len(index.deletes):
        tomb = spark.createDataFrame(
            [(int(x),) for x in index.deletes], schema="doc_id long"
        )
        dels = dels.unionByName(tomb).distinct()
    try:
        if has_positions(index.path):
            build_positions(spark, seg_dir, rows)
        info = merge_indexes(
            spark,
            [index.path, seg_dir],
            out_dir,
            target_postings_per_task=target_postings_per_task,
            deletes=dels,
            deletes_sources=[index.path],
        )
    finally:
        shutil.rmtree(seg_dir, ignore_errors=True)
    return info

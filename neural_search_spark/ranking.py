"""Rank-window helper for post-limit top-k results.

Every query path ends with ``orderBy(...).limit(k)`` (a
TakeOrderedAndProject — per-partition heap + driver merge, no full sort)
followed by a 1..k ``row_number`` — the reference's TopDocs rank field.
The window's input is ≤ k rows BY CONSTRUCTION, so moving it to one
partition is intended; but an empty partition spec makes WindowExec log
"No Partition Defined ... serious performance degradation" on every
query, burying real regressions in bench-log greps.

``topk_rank_window`` uses a constant-zero, NON-FOLDABLE partition key:
all rows share partition 0 (identical semantics/ranks), WindowExec sees a
non-empty spec and stays quiet. A plain ``lit(0)`` would not work —
Catalyst folds foldable partition keys away and the warning returns.
"""

from __future__ import annotations

from pyspark.sql import Column, Window, WindowSpec
from pyspark.sql import functions as F


def _const_zero() -> Column:
    # rand() is flagged non-deterministic, so the optimizer must keep it;
    # ×0 pins every row to partition key 0
    return (F.rand(42) * 0).cast("int")


def topk_rank_window(
    *order: Column, partition_cols: list[str] | None = None
) -> WindowSpec:
    """Window for ranking an already-k-bounded result set. With
    ``partition_cols`` (e.g. a batch's query_id) the rank restarts per
    group and the real keys distribute the window normally."""
    if partition_cols:
        return Window.partitionBy(*partition_cols).orderBy(*order)
    return Window.partitionBy(_const_zero()).orderBy(*order)

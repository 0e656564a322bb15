"""Scroll — deep result iteration (the host's scroll / point-in-time +
`search_after` idiom) as a driver-held cursor over keyset pagination.

The host deprecated stateful server-side scroll contexts in favor of
PIT + ``search_after``; that newer idiom is exactly the shape that
scales on Spark, so it is the one implemented: every page is a fresh
declarative plan ``filter(sort_tuple > last_tuple) → orderBy → limit``
— the keyset predicate pushes to the scan (Catalyst/parquet min-max
pruning), NO executor-side pagination state exists, and a cursor can
resume from just its last sort tuple (serializable, like a PIT +
search_after pair). Skipping to page 1 000 000 never materializes the
pages before it anywhere but the scan filter.

Two orderings:

* **field sort** — any (column, asc|desc) list over the corpus, the
  `sort_topk` collector paged;
* **score sort** — a query spec's FULL scored frame (every match, the
  ``track_total_hits: true`` collector) paged by (score desc, doc_id
  asc). The scored frame is deterministic float32, so the keyset is
  stable across pages.

Point-in-time semantics: a cursor captures its source DataFrame once —
over parquet the file listing is fixed at plan time, over Iceberg the
caller pins ``snapshot_id`` through ``sources.load_table`` — so every
page reads the same corpus version, which is the PIT contract.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from .neural import sort_topk

__all__ = ["ScrollCursor"]


class ScrollCursor:
    """Keyset-pagination cursor: ``next_page()`` → pandas frame of up
    to ``page_size`` rows (empty at exhaustion), ``pages()`` → iterator.
    ``checkpoint()`` / ``resume_token`` expose the last sort tuple so a
    new cursor (even in a new session) can continue exactly where this
    one stopped."""

    def __init__(
        self,
        df: DataFrame,
        sort_cols: list[tuple[str, str]],
        page_size: int = 100,
        tiebreak: str = "doc_id",
        search_after: list | None = None,
    ):
        if page_size <= 0:
            raise ValueError("page_size must be positive")
        for c, d in sort_cols:
            if d not in ("asc", "desc"):
                raise ValueError(f"sort direction must be asc|desc, got {d!r}")
        self.df = df
        self.sort_cols = list(sort_cols)
        self.page_size = int(page_size)
        self.tiebreak = tiebreak
        self._after = list(search_after) if search_after else None
        self._done = False
        self._keys = [c for c, _ in self.sort_cols] + [tiebreak]

    @property
    def resume_token(self) -> list | None:
        """Last emitted sort tuple (None before the first page) — the
        serializable scroll id."""
        return None if self._after is None else list(self._after)

    def next_page(self) -> pd.DataFrame:
        if self._done:
            return pd.DataFrame(columns=[c for c in self.df.columns] + ["rank"])
        page = sort_topk(
            self.df,
            self.sort_cols,
            k=self.page_size,
            search_after=self._after,
            tiebreak=self.tiebreak,
        ).toPandas()
        if len(page) < self.page_size:
            self._done = True
        if len(page):
            last = page.iloc[-1]
            self._after = [last[c] for c in self._keys]
        return page

    def pages(self) -> Iterator[pd.DataFrame]:
        while True:
            page = self.next_page()
            if not len(page):
                return
            yield page

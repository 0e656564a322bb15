"""Bounded FIFO eviction for the driver-side decoded-postings caches.

Entries are tid → tuple-of-numpy-arrays (or None for absent terms). Bounds
are BOTH entry count and total bytes — a zipfian stream of near-threshold
hot terms would otherwise grow a count-only cache to multi-GB on the
driver. FIFO ≈ LRU at these sizes; callers evict AFTER their scoring loop
so in-use entries can't be dropped mid-query.
"""

from __future__ import annotations

DEFAULT_MAX_TERMS = 512
DEFAULT_MAX_BYTES = 256 * 1024 * 1024


def entry_nbytes(value) -> int:
    if not value:
        return 0
    return sum(a.nbytes for a in value)


def evict_fifo(cache: dict, max_terms: int, max_bytes: int) -> None:
    total = sum(entry_nbytes(v) for v in cache.values())
    while cache and (len(cache) > max_terms or total > max_bytes):
        total -= entry_nbytes(cache.pop(next(iter(cache))))

"""Deterministic synthetic transcripts table + reference query set.

Shape per BASELINE.json input_hint:
    (conv_id string, turn_idx int32, role string, text string,
     tool string, ts timestamp)

Generated with numpy (seed=42), zipf-ish turn counts and vocabulary with
deliberate hot terms (>30% of turns) so salted skew splitting is exercised,
per FIXTURES.md §1. All generation is driver-side numpy writing parquet once;
the engine only ever reads the parquet (no RDD-side randomness).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

HOT_TERMS = ["the", "tool", "call", "model"]  # appear in >30% of turns
COMMON_VOCAB_SIZE = 5000
RARE_VOCAB_SIZE = 20000

_EPOCH = np.datetime64("2025-01-01T00:00:00")


def _vocab() -> tuple[np.ndarray, np.ndarray]:
    common = np.array([f"w{i:04d}" for i in range(COMMON_VOCAB_SIZE)])
    rare = np.array([f"rare{i:05d}" for i in range(RARE_VOCAB_SIZE)])
    return common, rare


def generate_transcripts(n_convs: int, seed: int = 42) -> pd.DataFrame:
    """Return a pandas DataFrame of synthetic multi-turn transcripts."""
    rng = np.random.default_rng(seed)
    common, rare = _vocab()

    # zipf-ish turn counts in [1, 64]
    n_turns = np.minimum(rng.zipf(1.4, size=n_convs), 64).astype(np.int32)
    total = int(n_turns.sum())

    conv_ids = np.repeat(
        np.array([f"conv{i:08d}" for i in range(n_convs)]), n_turns
    )
    turn_idx = np.concatenate([np.arange(n, dtype=np.int32) for n in n_turns])

    roles = np.array(["user", "assistant", "tool"])[turn_idx % 3]
    tools = rng.choice(np.array(["search", "code", "none"]), size=total)

    # per-turn token counts 5..200, zipf-weighted common vocab — fully
    # vectorized: one flat draw, then per-row joins (C-speed str.join).
    tok_counts = rng.integers(5, 201, size=total)
    ranks = np.arange(1, COMMON_VOCAB_SIZE + 1)
    zipf_w = 1.0 / ranks**1.1
    zipf_w /= zipf_w.sum()
    flat = rng.choice(common, size=int(tok_counts.sum()), p=zipf_w)
    offsets = np.concatenate([[0], np.cumsum(tok_counts)])
    texts = np.empty(total, dtype=object)
    rare_mask = rng.random(total) < 0.3
    rare_pick = rng.choice(rare, size=total)
    hot_mask = rng.random((total, len(HOT_TERMS))) < 0.35  # hot terms >30%
    for i in range(total):
        toks = flat[offsets[i] : offsets[i + 1]].tolist()
        if rare_mask[i]:
            toks.append(rare_pick[i])
        for j, h in enumerate(HOT_TERMS):
            if hot_mask[i, j]:
                toks.append(h)
        texts[i] = " ".join(toks)

    # timestamps: monotone per conversation, +1..300 s per turn
    deltas = rng.integers(1, 301, size=total).astype("timedelta64[s]")
    conv_start = rng.integers(0, 86400 * 365, size=n_convs).astype(
        "timedelta64[s]"
    )
    starts = np.repeat(conv_start, n_turns)
    # segmented cumsum: global cumsum minus the running total at each
    # conversation's first turn
    d = deltas.astype(np.int64)
    g = np.cumsum(d)
    seg_starts = np.cumsum(n_turns) - n_turns
    base = np.repeat(g[seg_starts] - d[seg_starts], n_turns)
    cum = (g - base).astype("timedelta64[s]")
    ts = _EPOCH + starts + cum

    return pd.DataFrame(
        {
            "conv_id": conv_ids,
            "turn_idx": turn_idx,
            "role": roles,
            "text": texts,
            "tool": tools,
            "ts": ts.astype("datetime64[us]"),
        }
    )


def generate_queries(n_queries: int = 40, seed: int = 43) -> pd.DataFrame:
    """Reference query set per FIXTURES.md §2: common / rare / hot / absent /
    tie-inducing term mixes, k=10."""
    rng = np.random.default_rng(seed)
    common, rare = _vocab()
    ranks = np.arange(1, COMMON_VOCAB_SIZE + 1)
    zipf_w = 1.0 / ranks**1.1
    zipf_w /= zipf_w.sum()
    rows = []
    for q in range(n_queries):
        kind = q % 5
        if kind == 0:  # single common term
            text = str(rng.choice(common[:50]))
        elif kind == 1:  # single rare term
            text = str(rng.choice(rare[:2000]))
        elif kind == 2:  # multi-term with one hot term
            toks = list(rng.choice(common, size=3, p=zipf_w)) + [
                HOT_TERMS[q % len(HOT_TERMS)]
            ]
            text = " ".join(toks)
        elif kind == 3:  # absent from corpus
            text = f"zzabsent{q:04d}"
        else:  # plain multi-term
            text = " ".join(rng.choice(common, size=4, p=zipf_w))
        rows.append({"query_id": f"q{q:04d}", "query_text": text, "k": 10})
    return pd.DataFrame(rows)


def write_transcripts_parquet(
    path: str, n_convs: int, seed: int = 42, n_files: int = 1
) -> str:
    """Write the synthetic corpus. n_files > 1 writes a DIRECTORY of part
    files (split on conversation boundaries) so Spark parallelizes the scan
    like any properly-partitioned table — a single pandas parquet file would
    serialize stage 1 of the index build onto one task."""
    pdf = generate_transcripts(n_convs, seed)
    if n_files <= 1:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        pdf.to_parquet(path, index=False)
        return path
    os.makedirs(path, exist_ok=True)
    convs = pdf["conv_id"].to_numpy()
    # conversation-aligned splits (stable turn ordering preserved per file)
    codes = pd.factorize(convs)[0] % n_files
    for i in range(n_files):
        pdf[codes == i].to_parquet(
            os.path.join(path, f"part-{i:05d}.parquet"), index=False
        )
    return path

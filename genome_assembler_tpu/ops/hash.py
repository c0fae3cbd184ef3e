"""Mixing hash for bucket routing (SURVEY.md §7 hard parts: all-to-all skew).

Hash-prefix bucketing is uniform only if the hash mixes well; raw k-mer bits
are highly structured (GC skew, repeats). We use an xxhash-style avalanche
over the xor-combined key words for *routing only* — the raw key remains the
sort/identity key, so bucketing never affects correctness, only balance.
Works identically in NumPy and JAX (pure uint32 arithmetic).
"""

from __future__ import annotations

import numpy as np

# uint32 scalars: plain Python ints > 2**31 would be weak-typed to int32 by
# JAX and overflow.
_P1 = np.uint32(0x9E3779B1)
_P2 = np.uint32(0x85EBCA77)
_P3 = np.uint32(0xC2B2AE3D)
_P4 = np.uint32(0x27D4EB2F)


def mix_words(words):
    """[..., W] uint32 key words -> [...] uint32 well-mixed hash.

    Accepts NumPy or JAX arrays (uint32 wrap-around arithmetic in both).
    """
    w = words.shape[-1]
    h = words[..., 0] * _P1
    for i in range(1, w):
        h = (h ^ (words[..., i] * _P2)) * _P3
    h = h ^ (h >> 15)
    h = h * _P4
    h = h ^ (h >> 13)
    h = h * _P2
    h = h ^ (h >> 16)
    return h


def mix32(x):
    """Single-word mix for u32 values (minimizer hashes) — the w=1 case
    of mix_words, so the two routing hashes can never diverge."""
    return mix_words(x[..., None])

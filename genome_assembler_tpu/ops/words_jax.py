"""Multi-word k-mer key manipulation in JAX (device-side graph building).

Operations on the big-endian uint32 word representation (utils.dna layout)
needed to derive the De Bruijn graph from the counted k-mer table without
ever spelling strings on device (SURVEY.md §7 M3/M4):

  * revcomp_words     — reverse complement entirely in bit arithmetic;
  * prefix/suffix     — the (k-1)-mer node keys of an edge k-mer;
  * searchsorted_words — lexicographic binary search (multiword keys), the
    sort-merge primitive connecting edges to nodes.

All static-shape, fori_loop/elementwise only — no data-dependent control
flow (XLA-friendly per SURVEY.md design rules).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_U2 = np.uint32(2)
_U30 = np.uint32(30)
_MASK_AA = np.uint32(0xAAAAAAAA)  # odd 2-bit lanes
_MASK_55 = np.uint32(0x55555555)
_MASK_CC = np.uint32(0xCCCCCCCC)  # odd 4-bit lanes
_MASK_33 = np.uint32(0x33333333)
_MASK_F0 = np.uint32(0xF0F0F0F0)
_MASK_0F = np.uint32(0x0F0F0F0F)
_MASK_FF00 = np.uint32(0xFF00FF00)
_MASK_00FF = np.uint32(0x00FF00FF)


def _reverse_bases_word(x: jax.Array) -> jax.Array:
    """Reverse the 16 2-bit groups within each uint32 lane."""
    x = ((x & _MASK_33) << np.uint32(2)) | ((x & _MASK_CC) >> np.uint32(2))
    x = ((x & _MASK_0F) << np.uint32(4)) | ((x & _MASK_F0) >> np.uint32(4))
    x = ((x & _MASK_00FF) << np.uint32(8)) | ((x & _MASK_FF00) >> np.uint32(8))
    x = (x << np.uint32(16)) | (x >> np.uint32(16))
    return x


def shift_right_words(words: jax.Array, bits: int) -> jax.Array:
    """Logical right shift of the [..., W] big-endian multiword by ``bits``."""
    w = words.shape[-1]
    word_shift, bit_shift = divmod(bits, 32)
    cols = [jnp.zeros_like(words[..., 0])] * word_shift + [
        words[..., i] for i in range(w - word_shift)
    ]
    if bit_shift:
        bs = np.uint32(bit_shift)
        ibs = np.uint32(32 - bit_shift)
        out = [cols[0] >> bs]
        out.extend(
            (cols[i] >> bs) | (cols[i - 1] << ibs) for i in range(1, w)
        )
        cols = out
    return jnp.stack(cols, axis=-1)


def shift_left_words(words: jax.Array, bits: int) -> jax.Array:
    """Logical left shift of the [..., W] big-endian multiword by ``bits``."""
    w = words.shape[-1]
    word_shift, bit_shift = divmod(bits, 32)
    cols = [words[..., i] for i in range(word_shift, w)] + [
        jnp.zeros_like(words[..., 0])
    ] * word_shift
    if bit_shift:
        bs = np.uint32(bit_shift)
        ibs = np.uint32(32 - bit_shift)
        out = [
            (cols[i] << bs) | (cols[i + 1] >> ibs) for i in range(w - 1)
        ]
        out.append(cols[-1] << bs)
        cols = out
    return jnp.stack(cols, axis=-1)


@functools.partial(jax.jit, static_argnames=("k",))
def revcomp_words(words: jax.Array, k: int) -> jax.Array:
    """Reverse complement of [..., W] packed k-mers, same layout.

    complement == bitwise NOT on 2-bit codes (A=0<->3=T, C=1<->2=G); reverse
    == reverse word order + reverse 2-bit groups per word + realign from the
    top of the W*32-bit register down to the 2k-bit key.
    """
    w = words.shape[-1]
    comp = ~words  # complement every base (junk in the spare high bits)
    rev = jnp.stack(
        [_reverse_bases_word(comp[..., w - 1 - i]) for i in range(w)],
        axis=-1,
    )
    # The reversed key now occupies the TOP 2k bits; realign to the bottom.
    return shift_right_words(rev, 32 * w - 2 * k)


@functools.partial(jax.jit, static_argnames=("k",))
def prefix_node(words: jax.Array, k: int) -> jax.Array:
    """Edge k-mer -> its prefix (k-1)-mer node key (drop the last base)."""
    return shift_right_words(words, 2)


@functools.partial(jax.jit, static_argnames=("k",))
def suffix_node(words: jax.Array, k: int) -> jax.Array:
    """Edge k-mer -> its suffix (k-1)-mer node key (drop the first base)."""
    w = words.shape[-1]
    pos = 2 * (k - 1)  # bit position of the dropped (top) base
    widx = w - 1 - pos // 32
    mask = ~(np.uint32(3) << np.uint32(pos % 32))
    cols = [
        words[..., i] & mask if i == widx
        else (jnp.zeros_like(words[..., i]) if i < widx else words[..., i])
        for i in range(w)
    ]
    return jnp.stack(cols, axis=-1)


def _bisect(
    sorted_words: jax.Array,
    queries: jax.Array,
    lo: jax.Array,
    hi: jax.Array,
    steps: int,
    side: str,
) -> jax.Array:
    """Shared lexicographic bisection body over [lo, hi) per query lane.

    side='left': first index with key >= query (lower bound);
    side='right': first index with key > query (upper bound).
    Fixed ``steps`` gather rounds; converged lanes stop updating.
    """
    n, w = sorted_words.shape

    def go_right_of(a: jax.Array, b: jax.Array) -> jax.Array:
        less = jnp.zeros(a.shape[0], dtype=bool)
        undecided = jnp.ones(a.shape[0], dtype=bool)
        for i in range(w):
            less = less | (undecided & (a[:, i] < b[:, i]))
            undecided = undecided & (a[:, i] == b[:, i])
        return (less | undecided) if side == "right" else less

    def body(_, state):
        lo, hi = state
        open_ = lo < hi
        mid = (lo + hi) >> 1
        mid_keys = sorted_words[jnp.clip(mid, 0, n - 1)]
        go_right = go_right_of(mid_keys, queries) & open_
        lo = jnp.where(go_right, mid + 1, lo)
        hi = jnp.where(go_right | ~open_, hi, mid)
        return lo, hi

    lo, hi = jax.lax.fori_loop(0, steps, body, (lo, hi))
    return lo


@functools.partial(jax.jit, static_argnames=("side",))
def searchsorted_words(
    sorted_words: jax.Array, queries: jax.Array, side: str = "left"
) -> jax.Array:
    """Lexicographic binary search: [N, W] sorted keys, [M, W] queries.

    Full-range bisection, log2(N) gather rounds, no data-dependent shapes.
    """
    n, _ = sorted_words.shape
    m = queries.shape[0]
    steps = max(1, int(np.ceil(np.log2(max(n, 2)))) + 1)
    return _bisect(
        sorted_words,
        queries,
        jnp.zeros(m, dtype=jnp.int32),
        jnp.full(m, n, dtype=jnp.int32),
        steps,
        side,
    )

"""Minimizer super-k-mers: compress the k-mer stream for routing.

The distributed counter's only cross-chip traffic is the all-to-all that
reshards every k-mer to its hash owner — W uint32 words per window. But
consecutive windows overlap in k-1 bases, and every k-mer containing a
given *minimizer* (the smallest canonical m-mer inside the window, by
hash) shares that minimizer with its neighbors for ~(k-m+2)/2 consecutive
windows. Routing by minimizer therefore lets one record carry a whole run
of windows as a 2-bit-packed substring: ~(run + k - 1)/4 bytes instead of
run * 4W bytes (~3-6x less wire for k=31, m=15 — the KMC2/Gerbil
super-k-mer idea, PAPERS.md, restructured as fixed-shape elementwise JAX).

Correctness: a k-mer's minimizer is a strand-symmetric function of the
k-mer alone (canonical m-mer, leftmost-position tie-break), so every
occurrence of a canonical k-mer routes to the same owner — owner-local
counts stay global, exactly as in the per-window scheme.

All stages are static-shape and scatter-free:
  * canonical m-mer hashes by rolling shift (one u32; m <= 16);
  * per-window minimizer by tournament min over the k-m+1 positions;
  * run breaks by neighbor compare + a RUN_CAP split (caps the record);
  * substring words built elementwise for every position, then the
    break positions are compacted by the routing sort (pure gather);
  * owners re-extract windows from substring words by static shifts.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..utils.dna import key_words
from .hash import mix32
from .kmer_jax import SENTINEL, lex_min
from .words_jax import revcomp_words, shift_right_words

# windows per super-k-mer record (split point for longer runs); 17 keeps
# the substring span (RUN_CAP + k - 1) within 4 words for k <= 47
RUN_CAP = 17


def span_words(k: int) -> int:
    """uint32 words per packed substring (RUN_CAP + k - 1 bases)."""
    return (2 * (RUN_CAP + k - 1) + 31) // 32


def mean_run(k: int, m: int) -> float:
    """Expected windows per super-k-mer for random sequence, ~(k-m+2)/2,
    capped by RUN_CAP and discounted for variance (capacity sizing)."""
    return max(1.0, min((k - m + 2) / 2, RUN_CAP) * 0.7)


def _canonical_mmer_hash(reads: jax.Array, m: int) -> jax.Array:
    """[B, L] codes -> [B, L-m+1] mixed hash of each canonical m-mer."""
    if not 1 <= m <= 16:
        raise ValueError(f"minimizer length must be in [1, 16], got {m}")
    b, length = reads.shape
    mc = length - m + 1
    fwd = jnp.zeros((b, mc), dtype=jnp.uint32)
    rc = jnp.zeros((b, mc), dtype=jnp.uint32)
    for j in range(m):
        base = jax.lax.dynamic_slice_in_dim(reads, j, mc, axis=1)
        base = base.astype(jnp.uint32) & jnp.uint32(3)
        fwd = (fwd << jnp.uint32(2)) | base
        rc = (rc >> jnp.uint32(2)) | (
            (jnp.uint32(3) - base) << jnp.uint32(2 * (m - 1))
        )
    return mix32(jnp.minimum(fwd, rc))


@functools.partial(jax.jit, static_argnames=("k", "m"))
def window_minimizers(
    reads: jax.Array, k: int, m: int
) -> tuple[jax.Array, jax.Array]:
    """Per k-window minimizer over [B, L] codes.

    Returns (hmin [B, WC] u32 — the minimizer's hash, the routing key;
    mpos [B, WC] i32 — its absolute position, leftmost on ties, the run
    identity). WC = L - k + 1.
    """
    if m > k:
        raise ValueError(f"minimizer length m={m} must be <= k={k}")
    b, length = reads.shape
    wc = length - k + 1
    hm = _canonical_mmer_hash(reads, m)  # [B, L-m+1]
    npos = k - m + 1  # m-mer positions per window
    hmin = jax.lax.dynamic_slice_in_dim(hm, 0, wc, axis=1)
    rel = jnp.zeros((b, wc), jnp.int32)
    for j in range(1, npos):
        h = jax.lax.dynamic_slice_in_dim(hm, j, wc, axis=1)
        # strict < keeps the earlier (leftmost) position on hash ties
        take = h < hmin
        hmin = jnp.where(take, h, hmin)
        rel = jnp.where(take, j, rel)
    mpos = rel + jax.lax.broadcasted_iota(jnp.int32, (b, wc), 1)
    return hmin, mpos


@functools.partial(jax.jit, static_argnames=("k",))
def superkmer_records(
    reads: jax.Array,
    k: int,
    hmin: jax.Array,
    mpos: jax.Array,
    window_valid: jax.Array,
):
    """Cut reads into super-k-mer records at minimizer/RUN_CAP boundaries.

    Returns, per window position (only ``is_start`` lanes are real
    records; the routing sort compacts them):
      is_start [B, WC] bool, run [B, WC] i32 (windows in the record),
      sub [B, WC, SW] u32 (big-endian 2-bit packed substring of
      run + k - 1 bases starting at this window), owner_key [B, WC] u32.
    """
    b, length = reads.shape
    wc = length - k + 1
    sw = span_words(k)
    widx = jnp.broadcast_to(
        jax.lax.broadcasted_iota(jnp.int32, (b, wc), 1), (b, wc)
    )

    prev_pos = jnp.concatenate(
        [jnp.full((b, 1), -1, jnp.int32), mpos[:, :-1]], axis=1
    )
    prev_valid = jnp.concatenate(
        [jnp.zeros((b, 1), bool), window_valid[:, :-1]], axis=1
    )
    brk = window_valid & ((mpos != prev_pos) | ~prev_valid)
    brk = brk.at[:, 0].set(window_valid[:, 0])
    # split long runs: a break every RUN_CAP windows past the last real
    # break (positions stay deterministic; runs never exceed RUN_CAP)
    last_brk = jax.lax.cummax(jnp.where(brk, widx, -1), axis=1)
    pos_in_run = widx - last_brk
    brk = brk | (window_valid & (pos_in_run % RUN_CAP == 0) & (pos_in_run > 0))

    # run length per start: next break (or first invalid window) after me
    stop = brk | ~window_valid
    nxt = jnp.concatenate(
        [
            jnp.where(stop, widx, wc)[:, 1:],
            jnp.full((b, 1), wc, jnp.int32),
        ],
        axis=1,
    )
    next_stop = jnp.flip(
        jax.lax.cummin(jnp.flip(nxt, axis=1), axis=1), axis=1
    )
    run = jnp.where(brk, jnp.minimum(next_stop - widx, RUN_CAP), 0)

    # substring words for every position: span = RUN_CAP + k - 1 bases
    # packed big-endian into sw words, first base topmost (positions past
    # the read end pad with zeros; re-extraction masks by run)
    span = RUN_CAP + k - 1
    padded = jnp.pad(reads, ((0, 0), (0, span)))
    words = [jnp.zeros((b, wc), jnp.uint32) for _ in range(sw)]
    total_bits = 32 * sw
    for j in range(span):
        src = jax.lax.dynamic_slice_in_dim(padded, j, wc, axis=1)
        src = src.astype(jnp.uint32) & jnp.uint32(3)
        bitpos = total_bits - 2 * (j + 1)  # top-aligned
        wi = sw - 1 - bitpos // 32
        words[wi] = words[wi] | (src << jnp.uint32(bitpos % 32))
    sub = jnp.stack(words, axis=-1)
    return brk, run, sub, hmin


@functools.partial(jax.jit, static_argnames=("k",))
def extract_from_records(
    sub: jax.Array, run: jax.Array, k: int
) -> tuple[jax.Array, jax.Array]:
    """Owner side: [N, SW] substrings + [N] run -> canonical keys.

    Returns ([N * RUN_CAP, W] canonical keys with sentinel on lanes past
    each record's run, [N * RUN_CAP] valid).
    """
    n, sw = sub.shape
    w = key_words(k)
    total_bits = 32 * sw
    keys = []
    for j in range(RUN_CAP):
        # window j = bases j .. j+k-1 = bits [2j, 2j+2k) from the top
        shift = total_bits - 2 * (j + k)
        fwd_full = shift_right_words(sub, shift)  # low 2k bits = window
        fwd = fwd_full[..., sw - w :]
        # clear bits above 2k in the top kept word
        top_bits = 2 * k - 32 * (w - 1)
        mask = (
            jnp.uint32(0xFFFFFFFF)
            if top_bits >= 32
            else jnp.uint32((1 << top_bits) - 1)
        )
        fwd = jnp.concatenate(
            [(fwd[..., :1] & mask), fwd[..., 1:]], axis=-1
        )
        rc = revcomp_words(fwd, k)
        canon = jnp.stack(
            lex_min(
                [fwd[..., i] for i in range(w)],
                [rc[..., i] for i in range(w)],
            ),
            axis=-1,
        )
        keys.append(canon)
    keys = jnp.stack(keys, axis=1)  # [N, RUN_CAP, W]
    lane = jnp.arange(RUN_CAP, dtype=jnp.int32)
    valid = lane[None, :] < run[:, None]
    keys = jnp.where(valid[..., None], keys, SENTINEL)
    return keys.reshape(n * RUN_CAP, w), valid.reshape(n * RUN_CAP)

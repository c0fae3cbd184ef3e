"""Pallas TPU kernel: k-mer extraction + canonicalization (SURVEY.md §7 M2).

The roofline-metered inner loop [BASELINE.json north_star]: read tiles are
DMA'd HBM->VMEM once, each tile's k window positions are processed by an
unrolled multi-word rolling shift entirely in VMEM registers (VPU
elementwise ops only — no matmuls, no gathers), and the canonical
(min(fwd, revcomp)) key planes stream back to HBM. Per window the kernel
moves ~L/WC bytes in + 4W bytes out — the minimal traffic for this stage.

Layout: keys are emitted as W separate [B, WC] uint32 planes (word-major),
avoiding a [.., W]-minor dimension that would defeat the (8,128) lane
tiling; the wrapper stacks planes into the [N, W] contract shared with
ops.kmer_jax / ops.kmer_ref (bit-identical outputs, tested).

Padding rows (read index >= n_valid) emit the all-ones sentinel, which
sorts to the end of the count pipeline (ops.count_jax).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import numpy as np

from ..utils.dna import key_words

_SENT = np.uint32(0xFFFFFFFF)


def _kernel(
    n_valid_ref, reads_ref, *rest, k: int, w: int, tb: int, has_bad: bool
):
    if has_bad:
        bad_ref, *out_refs = rest
    else:
        out_refs = rest
    wc = reads_ref.shape[1] - k + 1
    zeros = jnp.zeros((tb, wc), dtype=jnp.uint32)
    fwd = [zeros] * w
    rc = [zeros] * w
    badwin = jnp.zeros((tb, wc), dtype=jnp.bool_)
    pos = 2 * (k - 1)
    rc_widx = w - 1 - pos // 32
    rc_shift = jnp.uint32(pos % 32)
    for j in range(k):
        base = reads_ref[:, j : j + wc].astype(jnp.uint32)
        # raw (unpacked) codes can carry INVALID_CODE=4 for N bases:
        # mask the window and clamp the code, matching
        # ops.kmer_jax.extract_kmers bit for bit
        badwin = badwin | (base > 3)
        base = base & jnp.uint32(3)
        if has_bad:
            # ambiguous-base plane: windows touching one emit the sentinel
            badwin = badwin | (bad_ref[:, j : j + wc] != 0)
        # fwd <- (fwd << 2) | base
        nfwd = [
            (fwd[i] << jnp.uint32(2)) | (fwd[i + 1] >> jnp.uint32(30))
            for i in range(w - 1)
        ]
        nfwd.append((fwd[-1] << jnp.uint32(2)) | base)
        fwd = nfwd
        # rc <- (rc >> 2) | (3 - base) << 2(k-1)
        nrc = [rc[0] >> jnp.uint32(2)]
        nrc.extend(
            (rc[i] >> jnp.uint32(2)) | (rc[i - 1] << jnp.uint32(30))
            for i in range(1, w)
        )
        nrc[rc_widx] = nrc[rc_widx] | ((jnp.uint32(3) - base) << rc_shift)
        rc = nrc
    # canonical = lexicographic min(fwd, rc)
    fwd_less = jnp.zeros((tb, wc), dtype=jnp.bool_)
    undecided = jnp.ones((tb, wc), dtype=jnp.bool_)
    for i in range(w):
        fwd_less = fwd_less | (undecided & (fwd[i] < rc[i]))
        undecided = undecided & (fwd[i] == rc[i])
    pick_fwd = fwd_less | undecided
    # sentinel on padding rows
    tile = pl.program_id(0)
    row = jax.lax.broadcasted_iota(jnp.int32, (tb, wc), 0) + tile * tb
    invalid = (row >= n_valid_ref[0]) | badwin
    for i in range(w):
        canon = jnp.where(pick_fwd, fwd[i], rc[i])
        out_refs[i][:, :] = jnp.where(invalid, _SENT, canon)


@functools.partial(
    jax.jit, static_argnames=("k", "tile_rows", "interpret")
)
def extract_canonical_planes_pallas(
    reads: jax.Array,
    k: int,
    n_valid: jax.Array | None = None,
    tile_rows: int = 256,
    interpret: bool | None = None,
    bad: jax.Array | None = None,
) -> tuple[jax.Array, ...]:
    """[B, L] uint8 reads -> W planes of [B, L-k+1] uint32 canonical keys.

    B must be a multiple of tile_rows (wrappers pad; padding rows emit the
    sentinel via n_valid). bad [B, L] uint8/bool flags ambiguous bases
    (N handling): every window touching one emits the sentinel, matching
    ops.kmer_jax.extract_kmers. interpret=None auto-selects the Pallas
    interpreter off-TPU (CPU tests/debug) and the compiled kernel on TPU.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, length = reads.shape
    if b % tile_rows:
        raise ValueError(f"batch {b} not a multiple of tile_rows {tile_rows}")
    wc = length - k + 1
    w = key_words(k)
    if n_valid is None:
        n_valid = jnp.asarray(b, dtype=jnp.int32)
    n_valid = jnp.asarray(n_valid, dtype=jnp.int32).reshape(1)

    has_bad = bad is not None
    read_spec = pl.BlockSpec(
        (tile_rows, length), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b // tile_rows,),
        in_specs=[read_spec, read_spec] if has_bad else [read_spec],
        out_specs=tuple(
            pl.BlockSpec(
                (tile_rows, wc),
                lambda i, *_: (i, 0),
                memory_space=pltpu.VMEM,
            )
            for _ in range(w)
        ),
    )
    kernel = functools.partial(
        _kernel, k=k, w=w, tb=tile_rows, has_bad=has_bad
    )
    args = (n_valid, reads)
    if has_bad:
        args = args + (bad.astype(jnp.uint8),)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=tuple(
            jax.ShapeDtypeStruct((b, wc), jnp.uint32) for _ in range(w)
        ),
        interpret=interpret,
    )(*args)
    return out


@functools.partial(jax.jit, static_argnames=("k", "tile_rows"))
def extract_canonical_flat_pallas(
    reads: jax.Array,
    k: int,
    n_valid: jax.Array | None = None,
    tile_rows: int = 256,
    bad: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Drop-in for ops.kmer_jax.extract_canonical_flat (Pallas-backed).

    Returns ([B*(L-k+1), W] keys, [B*(L-k+1)] valid mask).
    """
    b, length = reads.shape
    wc = length - k + 1
    planes = extract_canonical_planes_pallas(
        reads, k, n_valid, tile_rows, bad=bad
    )
    keys = jnp.stack([p.reshape(b * wc) for p in planes], axis=-1)
    if n_valid is None:
        valid = jnp.ones((b * wc,), dtype=bool)
    else:
        row_ok = jnp.arange(b, dtype=jnp.int32) < jnp.asarray(
            n_valid, jnp.int32
        )
        valid = jnp.broadcast_to(row_ok[:, None], (b, wc)).reshape(b * wc)
    # valid matches the key mask exactly (ambiguous/N windows emit the
    # sentinel in-kernel; see extract_canonical_flat)
    return keys, valid & ~jnp.all(keys == _SENT, axis=-1)

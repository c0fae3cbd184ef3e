"""Pallas extraction kernel vs the NumPy reference (interpret mode on CPU)."""

import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from genome_assembler_tpu.ops import kmer_ref
from genome_assembler_tpu.ops.kmer_pallas import extract_canonical_flat_pallas


def _reads(seed, b, length):
    return np.random.default_rng(seed).integers(
        0, 4, size=(b, length), dtype=np.uint8
    )


@pytest.mark.parametrize("k", [21, 31, 41])
def test_pallas_extract_matches_ref(k):
    reads = _reads(1, 256, 100)
    with pltpu.force_tpu_interpret_mode():
        keys, valid = extract_canonical_flat_pallas(reads, k)
    want = kmer_ref.extract_canonical_np(reads, k)
    np.testing.assert_array_equal(np.asarray(keys), want)
    assert np.asarray(valid).all()


def test_pallas_extract_masks_invalid_rows():
    reads = _reads(2, 512, 60)
    k = 25
    n_valid = np.int32(300)
    with pltpu.force_tpu_interpret_mode():
        keys, valid = extract_canonical_flat_pallas(reads, k, n_valid)
    keys, valid = np.asarray(keys), np.asarray(valid)
    wc = 60 - k + 1
    want = kmer_ref.extract_canonical_np(reads[:300], k)
    np.testing.assert_array_equal(keys[: 300 * wc], want)
    assert (keys[300 * wc :] == 0xFFFFFFFF).all()
    assert valid[: 300 * wc].all() and not valid[300 * wc :].any()


def test_pallas_multi_tile_grid():
    reads = _reads(3, 1024, 50)
    k = 21
    with pltpu.force_tpu_interpret_mode():
        keys, _ = extract_canonical_flat_pallas(reads, k)
    want = kmer_ref.extract_canonical_np(reads, k)
    np.testing.assert_array_equal(np.asarray(keys), want)


def test_pallas_rejects_unaligned_batch():
    reads = _reads(4, 100, 50)
    with pytest.raises(ValueError, match="tile_rows"):
        with pltpu.force_tpu_interpret_mode():
            extract_canonical_flat_pallas(reads, 21)


def test_pallas_raw_invalid_codes_match_xla():
    """Raw (unpacked) codes carrying INVALID_CODE=4 without a separate bad
    plane: both kernels must mask the touched windows to the sentinel and
    report them invalid (regression: the pallas kernel OR'd the stray bit
    into neighboring bases instead)."""
    import jax.numpy as jnp

    from genome_assembler_tpu.ops.kmer_jax import (
        SENTINEL,
        extract_canonical_flat,
    )
    from genome_assembler_tpu.ops.kmer_pallas import (
        extract_canonical_flat_pallas,
    )

    rng = np.random.default_rng(17)
    reads = rng.integers(0, 4, size=(256, 40), dtype=np.uint8)
    reads[rng.random(reads.shape) < 0.05] = 4  # Ns as raw codes
    k = 21
    kx, vx = extract_canonical_flat(jnp.asarray(reads), k, np.int32(200))
    kp, vp = extract_canonical_flat_pallas(
        jnp.asarray(reads), k, np.int32(200)
    )
    assert np.array_equal(np.asarray(kx), np.asarray(kp))
    assert np.array_equal(np.asarray(vx), np.asarray(vp))
    # valid matches the key mask exactly: sentinel lanes are invalid
    sent = np.all(np.asarray(kx) == np.uint32(SENTINEL), axis=-1)
    assert np.array_equal(np.asarray(vx), ~sent)
    assert sent.any() and (~sent).any()

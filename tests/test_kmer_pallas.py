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

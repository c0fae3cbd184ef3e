"""ops.kmer_ref (NumPy rolling-pack) vs the straight-line string oracle."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from genome_assembler_tpu.models.oracle import (
    count_canonical_dict,
    count_canonical_fast,
)
from genome_assembler_tpu.ops import kmer_ref
from genome_assembler_tpu.utils import dna


def _random_reads(rng, b, length):
    return rng.integers(0, 4, size=(b, length)).astype(np.uint8)


def test_extract_matches_string_windows():
    rng = np.random.default_rng(0)
    k = 31
    reads = _random_reads(rng, 4, 64)
    fwd, rc = kmer_ref.extract_kmer_words_np(reads, k)
    for r in range(reads.shape[0]):
        s = dna.decode_seq(reads[r])
        for p in range(64 - k + 1):
            window = s[p : p + k]
            assert dna.words_to_kmer(tuple(fwd[r, p]), k) == window
            assert dna.words_to_kmer(tuple(rc[r, p]), k) == dna.revcomp_str(
                window
            )


@settings(deadline=None, max_examples=25)
@given(
    st.integers(0, 2**32 - 1),
    st.sampled_from([5, 15, 16, 21, 25, 31, 33, 41]),
)
def test_canonical_extraction_matches_oracle(seed, k):
    rng = np.random.default_rng(seed)
    reads = _random_reads(rng, 3, k + 17)
    canon = kmer_ref.extract_canonical_np(reads, k)
    flat = [
        dna.canonical_str(dna.decode_seq(reads[r])[p : p + k])
        for r in range(reads.shape[0])
        for p in range(reads.shape[1] - k + 1)
    ]
    got = [dna.words_to_kmer(tuple(row), k) for row in canon]
    assert got == flat


@settings(deadline=None, max_examples=20)
@given(st.integers(0, 2**32 - 1), st.sampled_from([15, 21, 31, 41]))
def test_count_fast_matches_dict(seed, k):
    rng = np.random.default_rng(seed)
    reads = _random_reads(rng, 8, k + 29)
    assert count_canonical_fast(reads, k) == count_canonical_dict(reads, k)


def test_count_unique_with_mask():
    keys = np.array(
        [[0, 1], [0, 1], [0, 2], [9, 9], [0, 2]], dtype=np.uint32
    )
    valid = np.array([True, True, True, False, True])
    uniq, counts = kmer_ref.count_unique_np(keys, valid)
    np.testing.assert_array_equal(
        uniq, np.array([[0, 1], [0, 2]], dtype=np.uint32)
    )
    np.testing.assert_array_equal(counts, [2, 2])

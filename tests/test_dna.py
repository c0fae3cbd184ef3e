"""Unit tests for the 2-bit data model (utils.dna)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from genome_assembler_tpu.utils import dna

dna_seq = st.text(alphabet="ACGT", min_size=1, max_size=200)


def test_encode_decode_roundtrip():
    s = "ACGTTGCA"
    assert dna.decode_seq(dna.encode_seq(s)) == s


def test_encode_rejects_non_acgt():
    with pytest.raises(ValueError):
        dna.encode_seq("ACGN")


def test_complement_is_3_minus_code():
    assert dna.revcomp_str("A") == "T"
    assert dna.revcomp_str("ACGT") == "ACGT"  # palindrome
    assert dna.revcomp_str("AAACCC") == "GGGTTT"


@given(dna_seq)
def test_revcomp_involution(s):
    assert dna.revcomp_str(dna.revcomp_str(s)) == s


@given(dna_seq)
def test_canonical_idempotent_and_symmetric(s):
    c = dna.canonical_str(s)
    assert dna.canonical_str(c) == c
    assert dna.canonical_str(dna.revcomp_str(s)) == c


@pytest.mark.parametrize("k,expected_w", [(15, 1), (16, 2), (21, 2), (25, 2), (31, 2), (32, 3), (41, 3), (47, 3), (48, 4), (63, 4)])
def test_key_words(k, expected_w):
    assert dna.key_words(k) == expected_w
    # >= 1 spare bit: the sentinel (all ones) is never a valid key
    assert 2 * k < 32 * expected_w


@given(dna_seq.filter(lambda s: len(s) <= 63))
def test_kmer_words_roundtrip(s):
    k = len(s)
    words = dna.kmer_to_words(dna.encode_seq(s))
    assert len(words) == dna.key_words(k)
    assert dna.words_to_kmer(words, k) == s


@given(st.tuples(dna_seq, dna_seq).filter(lambda t: len(t[0]) == len(t[1]) and len(t[0]) <= 63))
def test_word_order_matches_lexicographic(pair):
    a, b = pair
    wa = dna.kmer_to_words(dna.encode_seq(a))
    wb = dna.kmer_to_words(dna.encode_seq(b))
    assert (wa < wb) == (a < b)
    assert (wa == wb) == (a == b)


def test_revcomp_codes():
    codes = dna.encode_seq("AACG")
    np.testing.assert_array_equal(
        dna.revcomp_codes(codes), dna.encode_seq("CGTT")
    )


def test_has_ambiguous():
    from genome_assembler_tpu.utils.dna import has_ambiguous

    clean = np.zeros((4, 10), dtype=np.uint8)
    assert not has_ambiguous(clean)
    dirty = clean.copy()
    dirty[3, 9] = 4
    assert has_ambiguous(dirty)
    # non-contiguous views still scan correctly (ravel copies)
    assert has_ambiguous(dirty[:, ::3])  # keeps column 9
    assert not has_ambiguous(dirty[:, ::2])  # drops column 9
    assert not has_ambiguous(np.zeros(0, dtype=np.uint8))


@given(st.integers(0, 200), st.integers(0, 3))
def test_unpack_codes_np_roundtrip(n, tail):
    # flat 2-bit packing used for the device->host spell transfer
    rng = np.random.default_rng(n * 4 + tail)
    codes = rng.integers(0, 4, size=n, dtype=np.uint8)
    pad = (-n) % 4
    quads = np.concatenate([codes, np.zeros(pad, np.uint8)]).reshape(-1, 4)
    packed = (
        quads[:, 0] | (quads[:, 1] << 2) | (quads[:, 2] << 4)
        | (quads[:, 3] << 6)
    ).astype(np.uint8)
    out = dna.unpack_codes_np(packed, n)
    assert out.shape == (n,)
    assert np.array_equal(out, codes)


# ---- least rotation: vectorized tournament vs Booth (r5) ----


def test_least_rotation_matches_booth_random():
    from genome_assembler_tpu.utils.dna import (
        _least_rotation_booth,
        _least_rotation_np,
    )

    rng = np.random.default_rng(5)
    for n in (2, 3, 17, 100, 4097, 9000, 50001):
        s = "".join("ACGT"[i] for i in rng.integers(0, 4, n))
        got = _least_rotation_np(s)
        assert got is not None
        assert got == _least_rotation_booth(s)


def test_least_rotation_periodic_and_adversarial():
    from genome_assembler_tpu.utils.dna import (
        _least_rotation_booth,
        _least_rotation_np,
    )

    cases = [
        "A" * 10000,                      # period 1
        "AC" * 6000,                      # period 2
        "ACGT" * 3000,                    # period 4
        ("ACG" * 4000) + "A",             # near-periodic, aperiodic total
        "C" + "A" * 9999,                 # single min at the end region
        ("A" * 4999 + "C") * 2,           # long shared prefixes, period n/2
        "AT" * 2500 + "AA" + "AT" * 2500, # periodic with one defect
    ]
    for s in cases:
        got = _least_rotation_np(s)
        want = _least_rotation_booth(s)
        # the tournament may decline (budget) but must never be wrong
        assert got is None or got == want, s[:20]


@settings(deadline=None, max_examples=150)
@given(st.text(alphabet="ACGT", min_size=1, max_size=200))
def test_least_rotation_hypothesis(s):
    from genome_assembler_tpu.utils.dna import (
        _least_rotation_booth,
        _least_rotation_np,
        least_rotation,
    )

    want = _least_rotation_booth(s)
    assert least_rotation(s) == want
    got = _least_rotation_np(s)
    assert got is None or got == want
    # the result is a rotation of s and minimal among all rotations
    assert sorted(want) == sorted(s)
    assert all(want <= s[i:] + s[:i] for i in range(len(s)))


def test_least_rotation_large_dna_fast():
    import time

    from genome_assembler_tpu.utils.dna import least_rotation
    from genome_assembler_tpu.utils.simulate import simulate_genome
    from genome_assembler_tpu.utils.dna import decode_seq

    s = decode_seq(simulate_genome(2_000_000, seed=77))
    t0 = time.perf_counter()
    out = least_rotation(s)
    dt = time.perf_counter() - t0
    assert len(out) == len(s)
    # vectorized path: ~tens of ms; the Python Booth loop needs seconds
    assert dt < 2.0, dt

"""Simulator invariants (utils.simulate): coverage, errors, determinism."""

import numpy as np
import pytest

from genome_assembler_tpu.utils.simulate import (
    GENOME_PRESETS,
    ReadSet,
    pad_to_batch,
    preset_genome,
    simulate_genome,
    simulate_reads,
)


def test_genome_deterministic_and_bounded():
    a = simulate_genome(5000, seed=1)
    b = simulate_genome(5000, seed=1)
    np.testing.assert_array_equal(a, b)
    assert a.dtype == np.uint8 and a.min() >= 0 and a.max() <= 3


def test_gc_content_respected():
    g = simulate_genome(200_000, seed=2, gc=0.7)
    gc = np.isin(g, [1, 2]).mean()
    assert 0.68 < gc < 0.72


def test_reads_deterministic():
    g = simulate_genome(2000, seed=3)
    r1 = simulate_reads(g, coverage=10, read_len=80, seed=4)
    r2 = simulate_reads(g, coverage=10, read_len=80, seed=4)
    np.testing.assert_array_equal(r1.codes, r2.codes)


def test_coverage_approximate():
    g = simulate_genome(10_000, seed=5)
    rs = simulate_reads(g, coverage=30, read_len=100, seed=6)
    total = rs.num_reads * rs.read_len
    assert total >= 30 * 10_000  # tiling adds a little extra


def test_every_kmer_covered_error_free():
    """tile_exactly guarantees no genome k-mer is missed (CFG 0 bar)."""
    from genome_assembler_tpu.models.oracle import count_canonical_dict
    from genome_assembler_tpu.utils.dna import canonical_str, decode_seq

    g = simulate_genome(1500, seed=7)
    rs = simulate_reads(g, coverage=2, read_len=100, seed=8)
    counts = count_canonical_dict(rs.codes, 31)
    gs = decode_seq(g)
    for i in range(0, len(gs) - 31 + 1, 97):
        assert canonical_str(gs[i : i + 31]) in counts


def test_error_rate_applied():
    """Mismatch vs the true genome window matches the error rate."""
    g = simulate_genome(5000, seed=9)
    rs = simulate_reads(g, coverage=5, read_len=100, seed=10,
                        error_rate=0.05, both_strands=False)
    idx = rs.starts[:, None] + np.arange(rs.read_len)[None, :]
    truth = g[idx]
    frac = (rs.codes != truth).mean()
    assert 0.045 < frac < 0.055


def test_provenance_reconstructs_clean_reads():
    g = simulate_genome(3000, seed=15)
    rs = simulate_reads(g, coverage=5, read_len=80, seed=16)
    idx = rs.starts[:, None] + np.arange(rs.read_len)[None, :]
    truth = g[idx]
    truth[rs.flipped] = (3 - truth[rs.flipped])[:, ::-1]
    np.testing.assert_array_equal(rs.codes, truth)


def test_read_len_longer_than_genome_raises():
    g = simulate_genome(50, seed=11)
    with pytest.raises(ValueError, match="genome length"):
        simulate_reads(g, coverage=5, read_len=100, seed=12)


def test_pad_to_batch():
    codes = np.zeros((10, 5), dtype=np.uint8)
    padded, n = pad_to_batch(codes, 8)
    assert padded.shape == (16, 5) and n == 10
    same, n2 = pad_to_batch(padded, 8)
    assert same.shape == (16, 5) and n2 == 16


def test_presets_sized():
    for name, (length, _) in GENOME_PRESETS.items():
        if length <= 100_000:
            assert len(preset_genome(name)) == length


def test_readset_strings():
    g = simulate_genome(300, seed=13)
    rs = simulate_reads(g, coverage=2, read_len=50, seed=14)
    assert isinstance(rs, ReadSet)
    strs = rs.strings()
    assert len(strs) == rs.num_reads and len(strs[0]) == 50

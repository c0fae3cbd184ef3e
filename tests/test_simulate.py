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


# ---- multi-chromosome + circular (VERDICT r4 item 5) ----


def test_genome_multi_deterministic_lengths():
    from genome_assembler_tpu.utils.simulate import simulate_genome_multi

    a = simulate_genome_multi([500, 900, 1200], seed=11)
    b = simulate_genome_multi([500, 900, 1200], seed=11)
    assert [len(g) for g in a] == [500, 900, 1200]
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
    # chromosomes are independent draws, not prefixes of one stream
    assert not np.array_equal(a[0], a[1][:500])


def test_circular_reads_cover_wrap_kmers():
    """Origin-spanning k-mers appear in circular read sets (CFG-5 bar)."""
    from genome_assembler_tpu.models.oracle import count_canonical_dict
    from genome_assembler_tpu.utils.dna import canonical_str, decode_seq

    g = simulate_genome(600, seed=21)
    rs = simulate_reads(
        g, coverage=3, read_len=80, seed=22, tile_k=25, circular=True
    )
    counts = count_canonical_dict(rs.codes, 25)
    gs = decode_seq(g)
    wrapped = gs + gs[:24]  # all 600 circular k-mer start positions
    for i in range(len(gs) - 24, len(gs)):  # the origin-spanning ones
        assert canonical_str(wrapped[i : i + 25]) in counts
    # and no foreign k-mers beyond the circular genome's set
    want = {
        canonical_str(wrapped[i : i + 25]) for i in range(len(gs))
    }
    assert set(counts) == want


def test_circular_reads_stay_in_genome():
    g = simulate_genome(500, seed=23)
    rs = simulate_reads(
        g, coverage=5, read_len=60, seed=24, circular=True
    )
    assert rs.codes.shape[1] == 60
    assert rs.starts.max() < 500  # starts wrap, never beyond g


def test_reads_multi_pools_all_chromosomes():
    from genome_assembler_tpu.models.oracle import count_canonical_dict
    from genome_assembler_tpu.utils.dna import canonical_str, decode_seq
    from genome_assembler_tpu.utils.simulate import (
        simulate_genome_multi,
        simulate_reads_multi,
    )

    gs = simulate_genome_multi([400, 700], seed=31)
    rs = simulate_reads_multi(
        gs, coverage=3, read_len=80, seed=32, tile_k=25
    )
    counts = count_canonical_dict(rs.codes, 25)
    for g in gs:
        s = decode_seq(g)
        for i in range(0, len(s) - 25 + 1, 53):
            assert canonical_str(s[i : i + 25]) in counts
    assert rs.num_reads >= (400 + 700) * 3 // 80


def test_reads_multi_circular_flag_validation():
    from genome_assembler_tpu.utils.simulate import (
        simulate_genome_multi,
        simulate_reads_multi,
    )

    gs = simulate_genome_multi([300, 300], seed=41)
    with pytest.raises(ValueError):
        simulate_reads_multi(
            gs, coverage=2, read_len=60, seed=42, circular=[True]
        )

"""Handcrafted tip and bubble cases for host simplification (C6/C7)."""

import numpy as np

from genome_assembler_tpu.host.dbg import both_strand_edges, compress_unitigs
from genome_assembler_tpu.host.simplify import merge_chains, simplify_counts
from genome_assembler_tpu.host.traverse import contigs_equal, emit_contigs
from genome_assembler_tpu.models.oracle import count_canonical_dict
from genome_assembler_tpu.utils.dna import decode_seq, revcomp_str
from genome_assembler_tpu.utils.simulate import simulate_genome


def _windows(seq: str, read_len: int, stride: int = 1) -> list[str]:
    return [
        seq[i : i + read_len]
        for i in range(0, len(seq) - read_len + 1, stride)
    ]


def test_tip_removed_low_coverage_branch():
    """Genome + a short dead-end error branch at 1/10 the coverage."""
    k = 15
    genome = decode_seq(simulate_genome(400, seed=91))
    # error branch: diverge at position 200 for 10 bases then dead-end
    branch = genome[180:200] + "".join(
        "ACGT"[(ord(c) % 4 + 1) % 4] for c in genome[200:210]
    )
    reads = _windows(genome, 60) * 10 + _windows(branch, 25)
    counts = count_canonical_dict(reads, k)
    g = simplify_counts(counts, k, tip_len=2 * k, bubble_len=2 * k)
    contigs = emit_contigs(g)
    assert contigs_equal(contigs, [genome])


def test_bubble_collapsed_to_major_allele():
    """A SNP in 30% of reads creates a bubble; keep the major arm."""
    k = 15
    genome = decode_seq(simulate_genome(300, seed=92))
    pos = 150
    alt_base = "ACGT"[("ACGT".index(genome[pos]) + 1) % 4]
    variant = genome[:pos] + alt_base + genome[pos + 1 :]
    reads = _windows(genome, 60) * 7 + _windows(variant, 60) * 3
    counts = count_canonical_dict(reads, k)
    g = simplify_counts(counts, k, tip_len=2 * k, bubble_len=2 * k)
    contigs = emit_contigs(g)
    assert contigs_equal(contigs, [genome])


def test_bubble_tie_breaks_canonically():
    """Equal-coverage bubble arms resolve deterministically."""
    k = 15
    genome = decode_seq(simulate_genome(300, seed=93))
    pos = 150
    alt_base = "ACGT"[("ACGT".index(genome[pos]) + 1) % 4]
    variant = genome[:pos] + alt_base + genome[pos + 1 :]
    reads = _windows(genome, 60) * 5 + _windows(variant, 60) * 5
    counts = count_canonical_dict(reads, k)
    g1 = simplify_counts(dict(counts), k, 2 * k, 2 * k)
    g2 = simplify_counts(dict(counts), k, 2 * k, 2 * k)
    c1, c2 = emit_contigs(g1), emit_contigs(g2)
    assert c1 == c2
    assert len(c1) == 1  # one arm was dropped, graph re-merged
    # the survivor is one of the two haplotypes
    assert contigs_equal(c1, [genome]) or contigs_equal(c1, [variant])


def test_isolated_short_contig_not_treated_as_tip():
    """A disconnected short sequence is a contig, not a tip."""
    k = 15
    genome = decode_seq(simulate_genome(200, seed=94))
    other = decode_seq(simulate_genome(40, seed=95))
    reads = _windows(genome, 60) * 3 + _windows(other, 30) * 3
    counts = count_canonical_dict(reads, k)
    g = simplify_counts(counts, k, 2 * k, 2 * k)
    contigs = emit_contigs(g)
    assert contigs_equal(contigs, [genome, other])


def test_merge_chains_weighted_coverage():
    from genome_assembler_tpu.host.dbg import Unitig

    k = 5
    # two abutting chains with different coverages merge; coverage is the
    # edge-weighted mean
    u1 = Unitig(seq="ACGTTGCA", cov_sum=40, edges=4, k=k)  # ends "TTGCA"[-4:]
    u2 = Unitig(seq=u1.seq[-(k - 1) :] + "AC", cov_sum=8, edges=2, k=k)
    assert u1.end == u2.start
    merged = merge_chains([u1, u2], k)
    assert len(merged) == 1
    u = merged[0]
    assert u.seq == u1.seq + "AC"
    assert u.edges == 6
    assert abs(u.cov - (10 * 4 + 4 * 2) / 6) < 1e-9


def test_strand_symmetry_of_simplification():
    """Simplifying the revcomp read set yields revcomp-equal contigs."""
    k = 15
    genome = decode_seq(simulate_genome(300, seed=96))
    pos = 150
    alt = "ACGT"[("ACGT".index(genome[pos]) + 1) % 4]
    variant = genome[:pos] + alt + genome[pos + 1 :]
    reads = _windows(genome, 60) * 6 + _windows(variant, 60) * 3
    rc_reads = [revcomp_str(r) for r in reads]
    g_fwd = simplify_counts(count_canonical_dict(reads, k), k, 2 * k, 2 * k)
    g_rc = simplify_counts(count_canonical_dict(rc_reads, k), k, 2 * k, 2 * k)
    assert emit_contigs(g_fwd) == emit_contigs(g_rc)


def test_low_cov_island_pruned():
    """An isolated, short unitig whose coverage hugs the filter cutoff
    (surviving error cluster) is pruned; genuine isolated contigs are
    kept (r2 fix for the CFG-1 full-scale artifact)."""
    import numpy as np

    from genome_assembler_tpu.host.dbg import Unitig
    from genome_assembler_tpu.host.simplify import simplify_unitigs
    from genome_assembler_tpu.utils.dna import decode_seq, revcomp_str

    def twins(seq, cov, k):
        edges = len(seq) - k + 1
        return [
            Unitig(seq=seq, cov_sum=int(cov * edges), edges=edges, k=k),
            Unitig(
                seq=revcomp_str(seq), cov_sum=int(cov * edges), edges=edges,
                k=k,
            ),
        ]

    k = 15  # long enough that random strings share no (k-1)-mers
    rng = np.random.default_rng(3)
    main = decode_seq(rng.integers(0, 4, 80).astype(np.uint8))
    island = decode_seq(rng.integers(0, 4, 25).astype(np.uint8))
    mc = 5  # run's coverage-filter threshold
    # island at cov 6 (hugging the min_count=5 cutoff): pruned
    g = simplify_unitigs(
        twins(main, 100.0, k) + twins(island, 6.0, k), k, 30, 30, mc
    )
    assert sorted(len(u.seq) for u in g.unitigs) == [len(main)] * 2
    # same island at healthy coverage: kept
    g2 = simplify_unitigs(
        twins(main, 100.0, k) + twins(island, 90.0, k), k, 30, 30, mc
    )
    assert len(g2.unitigs) == 4
    # low-coverage but LONG isolated contig: kept (edges > tip_len)
    g3 = simplify_unitigs(
        twins(main, 100.0, k) + twins(island, 6.0, k), k, 8, 8, mc
    )
    assert len(g3.unitigs) == 4
    # with min_count=1 a cov-6 island is NOT near the cutoff: kept
    g4 = simplify_unitigs(
        twins(main, 100.0, k) + twins(island, 6.0, k), k, 30, 30, 1
    )
    assert len(g4.unitigs) == 4

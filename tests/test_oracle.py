"""Oracle assembler end-to-end: the acceptance semantics on small configs."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from genome_assembler_tpu.host.traverse import canonicalize_contigs, contigs_equal
from genome_assembler_tpu.models.oracle import assemble_oracle
from genome_assembler_tpu.utils.config import AssemblyConfig
from genome_assembler_tpu.utils.dna import canonical_str, decode_seq, revcomp_str
from genome_assembler_tpu.utils.simulate import simulate_genome, simulate_reads


def _assemble(genome, k, *, coverage=20, read_len=None, seed=7, error_rate=0.0,
              min_count=1, both_strands=True):
    read_len = read_len or min(100, len(genome) - 1)
    rs = simulate_reads(
        genome,
        coverage=coverage,
        read_len=read_len,
        seed=seed,
        error_rate=error_rate,
        both_strands=both_strands,
    )
    cfg = AssemblyConfig(k=k, min_count=min_count, read_len=read_len)
    return assemble_oracle(rs.codes, cfg)


def test_error_free_small_genome_exact():
    """CFG 0 shape: error-free reads reassemble the genome exactly."""
    genome = simulate_genome(2000, seed=42)
    contigs = _assemble(genome, k=25)
    assert contigs_equal(contigs, [decode_seq(genome)])


def test_error_free_forward_only_reads():
    genome = simulate_genome(1500, seed=43)
    contigs = _assemble(genome, k=25, both_strands=False)
    assert contigs_equal(contigs, [decode_seq(genome)])


def test_deterministic_across_runs():
    genome = simulate_genome(3000, seed=44)
    a = _assemble(genome, k=21)
    b = _assemble(genome, k=21)
    assert a == b


def test_errors_with_filter_and_tips():
    """CFG 1 shape: substitution errors + coverage filter + tip removal.

    The coverage filter trims the genome ends (reads cannot overhang, so end
    k-mers fall below min_count); the body must assemble into one exact
    contig.
    """
    genome = simulate_genome(5000, seed=45)
    k = 25
    contigs = _assemble(
        genome, k=k, coverage=60, error_rate=0.01, min_count=5
    )
    assert len(contigs) == 1
    contig = contigs[0]
    gs = decode_seq(genome)
    assert contig in gs or revcomp_str(contig) in gs
    assert len(contig) >= len(gs) - 4 * k


def test_contigs_are_canonical_sorted():
    genome = simulate_genome(2000, seed=46)
    contigs = _assemble(genome, k=25)
    assert contigs == canonicalize_contigs(contigs)


def test_contigs_equal_up_to_revcomp():
    assert contigs_equal(["ACGTA"], [revcomp_str("ACGTA")])
    assert not contigs_equal(["ACGTA"], ["ACGTC"])


@settings(deadline=None, max_examples=10)
@given(st.integers(0, 2**31 - 1))
def test_property_roundtrip_random_genomes(seed):
    """SURVEY.md §4: assemble(simulate(genome)) == genome (error-free)."""
    genome = simulate_genome(800, seed=seed)
    contigs = _assemble(genome, k=21, coverage=15, read_len=80, seed=seed + 1)
    assert contigs_equal(contigs, [decode_seq(genome)])


def test_min_count_filter_drops_singletons():
    genome = simulate_genome(1000, seed=47)
    # with min_count=2 and exactly one read layer, everything is dropped
    rs = simulate_reads(
        genome, coverage=0.0, read_len=100, seed=3, both_strands=False
    )
    cfg = AssemblyConfig(k=25, min_count=3, read_len=100)
    # tiled reads give most k-mers multiplicity 2 at stride 50; min_count=3
    # wipes the graph -> no contigs of length >= k survive... build expectation
    contigs = assemble_oracle(rs.codes, cfg)
    assert isinstance(contigs, list)


def test_repeat_genome_still_covers_all_kmers():
    """A genome with an exact repeat: contigs cover every genome k-mer."""
    core = simulate_genome(400, seed=48)
    rep = simulate_genome(120, seed=49)
    genome = np.concatenate([core, rep, simulate_genome(300, seed=50), rep])
    contigs = _assemble(genome, k=21, coverage=30, read_len=80)
    genome_str = decode_seq(genome)
    k = 21
    genome_kmers = {
        canonical_str(genome_str[i : i + k])
        for i in range(len(genome_str) - k + 1)
    }
    contig_kmers = set()
    for c in contigs:
        for i in range(len(c) - k + 1):
            contig_kmers.add(canonical_str(c[i : i + k]))
    assert genome_kmers == contig_kmers

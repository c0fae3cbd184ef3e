"""Reverse-complement twin suppression at repeat junctions.

At small k, genomes with repeated (k-1)-mers stitch differently on the
two strands, so canonical-sequence dedupe alone emits both strands'
walks; emit_contigs must drop walks whose k-mer content is already
covered (the rc twins).
"""

import numpy as np

from genome_assembler_tpu.host.traverse import (
    contigs_equal,
    kmer_content_equal,
)
from genome_assembler_tpu.models.oracle import assemble_oracle
from genome_assembler_tpu.models.pipeline import assemble_tpu
from genome_assembler_tpu.utils.config import AssemblyConfig
from genome_assembler_tpu.utils.dna import decode_seq
from genome_assembler_tpu.utils.simulate import simulate_genome, simulate_reads


def _repeat_genome(seed):
    """A genome with an exact internal repeat longer than k-1."""
    a = simulate_genome(1200, seed=seed)
    rep = simulate_genome(300, seed=seed + 1)
    b = simulate_genome(900, seed=seed + 2)
    return np.concatenate([a, rep, b, rep, simulate_genome(400, seed + 3)])


def test_no_rc_twin_duplication_with_repeats():
    genome = _repeat_genome(201)
    rs = simulate_reads(genome, coverage=25, read_len=100, seed=205)
    cfg = AssemblyConfig(k=21, read_len=100)
    contigs = assemble_tpu(rs.codes, cfg)
    gs = decode_seq(genome)
    # no double-emission: spelled windows bounded by genome windows
    total_windows = sum(len(c) - 20 for c in contigs)
    assert total_windows <= len(gs) - 20
    assert kmer_content_equal(contigs, gs, 21)


def test_oracle_and_tpu_agree_on_repeats():
    genome = _repeat_genome(211)
    rs = simulate_reads(genome, coverage=25, read_len=100, seed=215)
    cfg = AssemblyConfig(k=21, read_len=100)
    assert assemble_tpu(rs.codes, cfg) == assemble_oracle(rs.codes, cfg)


def test_kmer_content_equal_detects_missing_and_foreign():
    genome = decode_seq(simulate_genome(500, seed=221))
    assert kmer_content_equal([genome], genome, 21)
    assert not kmer_content_equal([genome[:300]], genome, 21)
    foreign = decode_seq(simulate_genome(100, seed=222))
    assert not kmer_content_equal([genome, foreign], genome, 21)
    # duplicated content fails the once-only bound
    assert not kmer_content_equal([genome, genome[:200]], genome, 21)


def test_clean_genome_still_single_contig():
    genome = simulate_genome(3000, seed=231)
    rs = simulate_reads(genome, coverage=30, read_len=100, seed=232)
    cfg = AssemblyConfig(k=25, read_len=100)
    contigs = assemble_tpu(rs.codes, cfg)
    assert contigs_equal(contigs, [decode_seq(genome)])

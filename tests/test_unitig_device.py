"""Device pointer-jumping unitig compression vs host compress_unitigs."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from genome_assembler_tpu.host.dbg import (
    both_strand_edges,
    compress_unitigs,
    spell_device_unitigs,
)
from genome_assembler_tpu.models.oracle import assemble_oracle, count_canonical_fast
from genome_assembler_tpu.models.pipeline import assemble_tpu, count_reads_device
from genome_assembler_tpu.ops.count_jax import filter_table
from genome_assembler_tpu.ops.unitig_jax import compress_unitigs_device
from genome_assembler_tpu.utils.config import AssemblyConfig
from genome_assembler_tpu.utils.simulate import simulate_genome, simulate_reads


def _unitig_set(unitigs):
    return {(u.seq, round(u.cov, 9), u.edges) for u in unitigs}


def _device_unitigs_for(reads, k, min_count=1):
    cfg = AssemblyConfig(k=k, read_len=reads.shape[1])
    table = filter_table(count_reads_device(reads, cfg), min_count)
    dev = compress_unitigs_device(table, k)
    return spell_device_unitigs(dev, k)


def _host_unitigs_for(reads, k, min_count=1):
    counts = {
        km: c
        for km, c in count_canonical_fast(reads, k).items()
        if c >= min_count
    }
    return compress_unitigs(both_strand_edges(counts), k)


@settings(deadline=None, max_examples=12)
@given(st.integers(0, 2**31 - 1), st.sampled_from([21, 25, 31, 41]))
def test_device_unitigs_match_host(seed, k):
    genome = simulate_genome(600, seed=seed)
    rs = simulate_reads(genome, coverage=8, read_len=k + 30, seed=seed + 1)
    got = _unitig_set(_device_unitigs_for(rs.codes, k))
    want = _unitig_set(_host_unitigs_for(rs.codes, k))
    assert got == want


def test_device_unitigs_with_errors_and_filter():
    genome = simulate_genome(2000, seed=5)
    rs = simulate_reads(
        genome, coverage=50, read_len=100, seed=6, error_rate=0.02
    )
    got = _unitig_set(_device_unitigs_for(rs.codes, 25, min_count=4))
    want = _unitig_set(_host_unitigs_for(rs.codes, 25, min_count=4))
    assert got == want


def test_device_unitigs_cycle_graph():
    """A circular genome: the both-strand graph is two pure cycles."""
    genome = simulate_genome(300, seed=7)
    circ = np.concatenate([genome, genome[:99]])  # wrap for circular reads
    rs = simulate_reads(circ, coverage=20, read_len=100, seed=8)
    got = _unitig_set(_device_unitigs_for(rs.codes, 21))
    want = _unitig_set(_host_unitigs_for(rs.codes, 21))
    assert got == want


def test_assemble_tpu_device_unitigs_equals_oracle():
    genome = simulate_genome(3000, seed=9)
    rs = simulate_reads(genome, coverage=40, read_len=100, seed=10)
    cfg = AssemblyConfig(k=25, read_len=100)
    via_device = assemble_tpu(rs.codes, cfg, device_unitigs=True)
    via_host = assemble_tpu(rs.codes, cfg, device_unitigs=False)
    oracle = assemble_oracle(rs.codes, cfg)
    assert via_device == via_host == oracle


def test_homopolymer_self_loop():
    """Poly-A genome: the k-mer AAAA..A is a self-loop edge."""
    reads = np.zeros((260, 40), dtype=np.uint8)  # all A
    got = _unitig_set(_device_unitigs_for(reads, 21))
    want = _unitig_set(_host_unitigs_for(reads, 21))
    assert got == want

"""Distributed counting on the 8-device CPU mesh (SURVEY.md §4 invariants)."""

import jax
import numpy as np
import pytest

from genome_assembler_tpu.host.traverse import contigs_equal
from genome_assembler_tpu.models.oracle import assemble_oracle, count_canonical_fast
from genome_assembler_tpu.parallel.mesh import build_mesh
from genome_assembler_tpu.parallel.pipeline import (
    assemble_distributed,
    distributed_count_to_host,
)
from genome_assembler_tpu.utils.config import AssemblyConfig
from genome_assembler_tpu.utils.dna import decode_seq
from genome_assembler_tpu.utils.simulate import simulate_genome, simulate_reads


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "conftest must force 8 CPU devices"
    return build_mesh(8)


def _readset(genome_len, *, seed, coverage=25, read_len=80, error_rate=0.0):
    genome = simulate_genome(genome_len, seed=seed)
    return (
        simulate_reads(
            genome,
            coverage=coverage,
            read_len=read_len,
            seed=seed + 1,
            error_rate=error_rate,
        ),
        genome,
    )


def test_distributed_counts_equal_host(mesh8):
    rs, _ = _readset(2000, seed=31)
    cfg = AssemblyConfig(k=25, read_len=rs.read_len)
    got = distributed_count_to_host(rs.codes, cfg, mesh8)
    assert got == count_canonical_fast(rs.codes, cfg.k)


def test_distributed_counts_uneven_reads(mesh8):
    """Read count not divisible by D: padding rows must not pollute counts."""
    rs, _ = _readset(1100, seed=32, coverage=13)
    assert rs.num_reads % 8 != 0
    cfg = AssemblyConfig(k=21, read_len=rs.read_len)
    got = distributed_count_to_host(rs.codes, cfg, mesh8)
    assert got == count_canonical_fast(rs.codes, cfg.k)


def test_distributed_assembly_equals_oracle(mesh8):
    """Sharded pipeline output == single-device output == genome."""
    rs, genome = _readset(3000, seed=33, coverage=30, read_len=100)
    cfg = AssemblyConfig(k=25, read_len=100)
    dist = assemble_distributed(rs.codes, cfg, mesh8)
    assert dist == assemble_oracle(rs.codes, cfg)
    assert contigs_equal(dist, [decode_seq(genome)])


def test_distributed_mesh_sizes(mesh8):
    """Same answer on 1-, 2-, 4- and 8-device meshes."""
    rs, _ = _readset(1000, seed=34, coverage=10)
    cfg = AssemblyConfig(k=21, read_len=rs.read_len)
    want = count_canonical_fast(rs.codes, cfg.k)
    for d in (1, 2, 4):
        mesh = build_mesh(d)
        assert distributed_count_to_host(rs.codes, cfg, mesh) == want


def test_bucket_overflow_raises(mesh8):
    rs, _ = _readset(1000, seed=35, coverage=10)
    cfg = AssemblyConfig(k=21, read_len=rs.read_len)
    with pytest.raises(RuntimeError, match="bucket overflow"):
        distributed_count_to_host(rs.codes, cfg, mesh8, bucket_cap=4)

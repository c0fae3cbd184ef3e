"""Property-based invariants for the sharded pipeline (SURVEY.md §4c).

Hypothesis drives random genomes/read sets/k through the 8-device CPU
mesh, asserting the core invariant: sharded output == single-device
output == oracle, for any input.
"""

import jax
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from genome_assembler_tpu.models.oracle import (
    assemble_oracle,
    count_canonical_fast,
)
from genome_assembler_tpu.parallel.mesh import build_mesh
from genome_assembler_tpu.parallel.pipeline import (
    assemble_distributed,
    distributed_count_to_host,
)
from genome_assembler_tpu.utils.config import AssemblyConfig
from genome_assembler_tpu.utils.simulate import simulate_genome, simulate_reads


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8
    return build_mesh(8)


@settings(deadline=None, max_examples=10)
@given(
    seed=st.integers(0, 2**31 - 1),
    k=st.sampled_from([15, 21, 25, 33]),
    genome_len=st.integers(300, 1500),
    coverage=st.integers(4, 20),
)
def test_sharded_counts_equal_host_any_input(
    mesh8, seed, k, genome_len, coverage
):
    genome = simulate_genome(genome_len, seed=seed)
    read_len = min(100, genome_len - 1)
    if read_len <= k:
        return
    rs = simulate_reads(
        genome, coverage=coverage, read_len=read_len, seed=seed + 1
    )
    cfg = AssemblyConfig(k=k, read_len=read_len)
    got = distributed_count_to_host(rs.codes, cfg, mesh8)
    assert got == count_canonical_fast(rs.codes, cfg.k)


@settings(deadline=None, max_examples=6)
@given(
    seed=st.integers(0, 2**31 - 1),
    error_rate=st.sampled_from([0.0, 0.01]),
)
def test_sharded_assembly_equals_oracle_any_input(mesh8, seed, error_rate):
    genome = simulate_genome(1200, seed=seed)
    rs = simulate_reads(
        genome,
        coverage=25,
        read_len=90,
        seed=seed + 1,
        error_rate=error_rate,
    )
    cfg = AssemblyConfig(
        k=25, read_len=90, min_count=3 if error_rate else 1
    )
    assert assemble_distributed(rs.codes, cfg, mesh8) == assemble_oracle(
        rs.codes, cfg
    )


@settings(deadline=None, max_examples=6)
@given(
    seed=st.integers(0, 2**31 - 1),
    error_rate=st.sampled_from([0.0, 0.01]),
)
def test_sharded_graph_assembly_equals_oracle_any_input(
    mesh8, seed, error_rate
):
    """The fully sharded-graph path (parallel.compress) holds the same
    invariant: output == oracle for arbitrary inputs."""
    from genome_assembler_tpu.parallel.pipeline import (
        assemble_distributed_sharded,
    )

    genome = simulate_genome(1000, seed=seed)
    rs = simulate_reads(
        genome,
        coverage=20,
        read_len=80,
        seed=seed + 1,
        error_rate=error_rate,
    )
    cfg = AssemblyConfig(
        k=21, read_len=80, min_count=3 if error_rate else 1
    )
    assert assemble_distributed_sharded(
        rs.codes, cfg, mesh8
    ) == assemble_oracle(rs.codes, cfg)

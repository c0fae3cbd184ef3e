"""Real-chip smoke tests (GA_TPU_TESTS=1; skipped on CPU-only runs).

Run: GA_TPU_TESTS=1 python -m pytest tests/test_tpu_smoke.py -v
Note the axon platform's first compile per process takes minutes.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.tpu


@pytest.fixture(scope="module")
def tpu():
    import jax

    if jax.default_backend() != "tpu":
        pytest.skip("no TPU backend")
    return jax


def test_count_on_chip_matches_reference(tpu):
    from genome_assembler_tpu.models.oracle import count_canonical_fast
    from genome_assembler_tpu.models.pipeline import (
        count_reads_device,
        table_to_host_counts,
    )
    from genome_assembler_tpu.utils.config import AssemblyConfig
    from genome_assembler_tpu.utils.simulate import simulate_genome, simulate_reads

    genome = simulate_genome(2000, seed=301)
    rs = simulate_reads(genome, coverage=15, read_len=100, seed=302)
    cfg = AssemblyConfig(k=31, read_len=100)
    got = table_to_host_counts(count_reads_device(rs.codes, cfg), cfg.k)
    assert got == count_canonical_fast(rs.codes, cfg.k)


def test_pallas_kernel_on_chip(tpu):
    from genome_assembler_tpu.ops import kmer_ref
    from genome_assembler_tpu.ops.kmer_pallas import extract_canonical_flat_pallas

    reads = np.random.default_rng(3).integers(
        0, 4, size=(256, 100), dtype=np.uint8
    )
    keys, _ = extract_canonical_flat_pallas(reads, 31)
    np.testing.assert_array_equal(
        np.asarray(keys), kmer_ref.extract_canonical_np(reads, 31)
    )


def test_assemble_on_chip(tpu):
    from genome_assembler_tpu.host.traverse import contigs_equal
    from genome_assembler_tpu.models.pipeline import assemble_tpu
    from genome_assembler_tpu.utils.config import AssemblyConfig
    from genome_assembler_tpu.utils.dna import decode_seq
    from genome_assembler_tpu.utils.simulate import simulate_genome, simulate_reads

    genome = simulate_genome(3000, seed=303)
    rs = simulate_reads(genome, coverage=25, read_len=100, seed=304)
    contigs = assemble_tpu(rs.codes, AssemblyConfig(k=25, read_len=100))
    assert contigs_equal(contigs, [decode_seq(genome)])

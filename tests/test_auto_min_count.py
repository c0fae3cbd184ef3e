"""Automatic coverage-filter threshold (min_count=0)."""

import numpy as np

from genome_assembler_tpu.host.traverse import contigs_equal
from genome_assembler_tpu.models.oracle import assemble_oracle
from genome_assembler_tpu.models.pipeline import assemble_tpu, auto_min_count
from genome_assembler_tpu.utils.config import AssemblyConfig
from genome_assembler_tpu.utils.dna import decode_seq
from genome_assembler_tpu.utils.simulate import simulate_genome, simulate_reads


def test_auto_threshold_separates_error_peak():
    # error spike at 1-2, coverage peak at ~30
    rng = np.random.default_rng(0)
    counts = np.concatenate([
        np.ones(5000, dtype=np.int64),
        np.full(1500, 2, dtype=np.int64),
        rng.poisson(30, 8000).astype(np.int64) + 1,
    ])
    t = auto_min_count(counts)
    assert 3 <= t <= 15


def test_auto_threshold_error_free_keeps_all():
    rng = np.random.default_rng(1)
    counts = rng.poisson(25, 5000).astype(np.int64) + 1
    assert auto_min_count(counts) <= 3  # no error spike: near-permissive


def test_auto_end_to_end_matches_oracle():
    genome = simulate_genome(4000, seed=55)
    rs = simulate_reads(
        genome, coverage=60, read_len=100, seed=56, error_rate=0.01
    )
    cfg = AssemblyConfig(k=25, min_count=0, read_len=100)
    tpu = assemble_tpu(rs.codes, cfg)
    oracle = assemble_oracle(rs.codes, cfg)
    assert tpu == oracle
    # and the auto filter actually cleaned the graph into one big contig
    assert len(tpu) == 1
    assert len(tpu[0]) >= 3800


def test_auto_on_empty():
    assert auto_min_count(np.array([], dtype=np.int64)) == 1


def test_device_histogram_matches_host_threshold():
    # device-side histogram path must pick the identical threshold the
    # host bincount path picks on the same multiplicities
    from genome_assembler_tpu.models.pipeline import count_reads_device

    genome = simulate_genome(6000, seed=77)
    rs = simulate_reads(
        genome, coverage=50, read_len=100, seed=78, error_rate=0.01
    )
    cfg = AssemblyConfig(k=21, read_len=100)
    table = count_reads_device(rs.codes, cfg)
    host_counts = np.asarray(table.counts)[: int(table.num_unique)]
    assert auto_min_count(table) == auto_min_count(host_counts)
    assert auto_min_count(table) >= 2  # errored data: filter engages

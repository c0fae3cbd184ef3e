"""Streamed distributed counting (parallel.pipeline streaming path).

Beyond DIST_STREAM_WINDOWS per-device windows, the distributed counter
streams read batches into carried per-shard tables instead of one fused
step over the whole read set. These tests force the streamed path on
small inputs (monkeypatched threshold, small batch_reads) and pin it to
the host oracle across mesh sizes, Ns, minimizer routing, uneven
shards, and both full-assembly paths.
"""

import numpy as np
import pytest

import genome_assembler_tpu.parallel.pipeline as pp
from genome_assembler_tpu.models.oracle import (
    assemble_oracle,
    count_canonical_fast,
)
from genome_assembler_tpu.parallel.mesh import build_mesh
from genome_assembler_tpu.utils.config import AssemblyConfig
from genome_assembler_tpu.utils.simulate import (
    simulate_genome,
    simulate_reads,
)


@pytest.fixture
def force_stream(monkeypatch):
    # every window count exceeds 0 -> always stream
    monkeypatch.setattr(pp, "DIST_STREAM_WINDOWS", 0)


def _reads(genome_len=900, coverage=12, seed=5, read_len=60, with_n=False):
    genome = simulate_genome(genome_len, seed=seed)
    rs = simulate_reads(
        genome, coverage=coverage, read_len=read_len, seed=seed + 1
    )
    codes = rs.codes
    if with_n:
        codes = codes.copy()
        rng = np.random.default_rng(seed + 2)
        rows = rng.integers(0, codes.shape[0], size=codes.shape[0] // 20)
        cols = rng.integers(0, codes.shape[1], size=rows.size)
        codes[rows, cols] = 4
    return codes


@pytest.mark.parametrize("d", [1, 2, 8])
def test_streamed_counts_match_host(force_stream, d):
    codes = _reads()
    cfg = AssemblyConfig(k=15, read_len=60, batch_reads=64)
    counts = pp.distributed_count_to_host(
        codes, cfg, build_mesh(d), table_capacity=4096
    )
    assert counts == count_canonical_fast(codes, cfg.k)


def test_streamed_counts_with_ns_and_uneven_shards(force_stream):
    codes = _reads(with_n=True)[:-3]  # not divisible by d or batch
    cfg = AssemblyConfig(k=15, read_len=60, batch_reads=56)
    counts = pp.distributed_count_to_host(
        codes, cfg, build_mesh(8), table_capacity=4096
    )
    assert counts == count_canonical_fast(codes, cfg.k)


def test_streamed_counts_minimizer_routing(force_stream):
    codes = _reads()
    cfg = AssemblyConfig(k=15, read_len=60, batch_reads=64)
    counts = pp.distributed_count_to_host(
        codes, cfg, build_mesh(4), table_capacity=4096, minimizer_len=7
    )
    assert counts == count_canonical_fast(codes, cfg.k)


def test_streamed_assembly_matches_oracle_both_paths(force_stream):
    codes = _reads(genome_len=1200, coverage=15)
    cfg = AssemblyConfig(k=15, read_len=60, batch_reads=128)
    oracle = assemble_oracle(codes, cfg)
    mesh = build_mesh(4)
    gathered = pp.assemble_distributed(
        codes, cfg, mesh, table_capacity=4096
    )
    sharded = pp.assemble_distributed_sharded(
        codes, cfg, mesh, table_capacity=4096
    )
    assert gathered == oracle
    assert sharded == oracle


def test_streamed_routing_overflow_raises(force_stream):
    # snug_capacity's floor (64k rows/shard) absorbs any test-scale table
    # overflow, so exercise the accumulated-overflow plumbing through the
    # routing-bucket capacity instead
    codes = _reads()
    cfg = AssemblyConfig(k=15, read_len=60, batch_reads=64)
    with pytest.raises(RuntimeError, match="overflow"):
        pp.distributed_count_to_host(
            codes, cfg, build_mesh(2), table_capacity=4096, bucket_cap=1
        )


def test_default_threshold_uses_one_shot_on_small_inputs():
    # without the monkeypatch, tiny inputs stay on the one-shot step;
    # results must be identical either way
    codes = _reads()
    cfg = AssemblyConfig(k=15, read_len=60)
    counts = pp.distributed_count_to_host(codes, cfg, build_mesh(2))
    assert counts == count_canonical_fast(codes, cfg.k)


@pytest.mark.parametrize(
    "d,stride,n_drop",
    [
        (1, 3, 0),     # single-owner routing skip + strided appends
        (4, 2, 3),     # uneven final batch + partial final stride
        (8, 3, 1),     # stride not dividing the batch count
    ],
)
def test_streamed_counts_strided(force_stream, d, stride, n_drop):
    """Deferred-merge distributed streaming (merge_stride > 1) is
    bit-identical to per-batch merging and the host oracle, across mesh
    sizes, tail batches, and partial final strides."""
    codes = _reads()
    if n_drop:
        codes = codes[:-n_drop]
    cfg = AssemblyConfig(k=15, read_len=60, batch_reads=64)
    mesh = build_mesh(d)
    base = pp.distributed_count_to_host(
        codes, cfg, mesh, table_capacity=4096
    )
    strided = pp.distributed_count_to_host(
        codes, cfg, mesh, table_capacity=4096, merge_stride=stride
    )
    assert strided == base == count_canonical_fast(codes, cfg.k)


def test_streamed_counts_strided_ns_and_minimizer(force_stream):
    """Strided appends compose with N-masked windows and with minimizer
    super-k-mer routing (records, not per-window keys, ride the
    pending buffer's all-to-all)."""
    codes = _reads(with_n=True)
    cfg = AssemblyConfig(k=15, read_len=60, batch_reads=64)
    want = count_canonical_fast(codes, cfg.k)
    got_n = pp.distributed_count_to_host(
        codes, cfg, build_mesh(4), table_capacity=4096, merge_stride=2
    )
    assert got_n == want
    got_m = pp.distributed_count_to_host(
        codes, cfg, build_mesh(4), table_capacity=4096, merge_stride=3,
        minimizer_len=7,
    )
    assert got_m == want


def test_streamed_assembly_strided_env(force_stream, monkeypatch):
    """GA_MERGE_STRIDE reaches the distributed streaming path and the
    full assembly still matches the oracle on both graph paths."""
    codes = _reads(genome_len=1200, coverage=15)
    cfg = AssemblyConfig(k=15, read_len=60, batch_reads=128)
    oracle = assemble_oracle(codes, cfg)
    monkeypatch.setenv("GA_MERGE_STRIDE", "2")
    mesh = build_mesh(4)
    assert pp.assemble_distributed(
        codes, cfg, mesh, table_capacity=4096
    ) == oracle
    assert pp.assemble_distributed_sharded(
        codes, cfg, mesh, table_capacity=4096
    ) == oracle

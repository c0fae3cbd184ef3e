"""Range-sort sharded spelling (parallel.compress.spell_sharded_arrays):
the host pulls E/4 bytes of packed bases + O(U) per-unitig rows instead of
O(E) per-edge quads. Must equal the gathered-quads spelling bit for bit on
every workload shape (branchy graphs, cycles, tiny u_block retries).
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from genome_assembler_tpu.host.traverse import contigs_equal
from genome_assembler_tpu.models.oracle import assemble_oracle
from genome_assembler_tpu.parallel.mesh import build_mesh
from genome_assembler_tpu.parallel.pipeline import (
    assemble_distributed_sharded,
)
from genome_assembler_tpu.utils.config import AssemblyConfig
from genome_assembler_tpu.utils.dna import decode_seq, encode_seq
from genome_assembler_tpu.utils.simulate import simulate_genome, simulate_reads


def _workload(genome_len=1500, coverage=14, seed=211, k=21, error_rate=0.0):
    genome = simulate_genome(genome_len, seed=seed)
    rs = simulate_reads(
        genome, coverage=coverage, read_len=80, seed=seed + 1,
        error_rate=error_rate,
    )
    return genome, rs.codes, AssemblyConfig(k=k, read_len=80)


def _compress_outputs(reads, cfg, mesh):
    """Run count+filter+compress, return spell inputs (mirrors the
    assemble_distributed_sharded stages up to the spell)."""
    import jax

    from genome_assembler_tpu.ops.count_jax import snug_capacity
    from genome_assembler_tpu.parallel.compress import make_sharded_compress
    from genome_assembler_tpu.parallel.pipeline import (
        _run_distributed_step,
        _shard_filter_compact,
    )
    from genome_assembler_tpu.parallel.mesh import axis_size, mesh_axes
    from genome_assembler_tpu.utils.dna import key_words
    from genome_assembler_tpu.utils.jaxenv import to_host

    axis = mesh_axes(mesh)
    d = axis_size(mesh, axis)
    words, counts, _ = _run_distributed_step(
        reads, cfg, mesh, None, axis, None
    )
    w = key_words(cfg.k)
    c_shard = words.shape[0] // d
    words, counts, kept = _shard_filter_compact(
        mesh, axis, max(cfg.min_count, 1)
    )(words, counts)
    new_c = min(c_shard, snug_capacity(int(to_host(kept).max())))
    if new_c < c_shard:
        words = words.reshape(d, c_shard, w)[:, :new_c].reshape(d * new_c, w)
        counts = counts.reshape(d, c_shard)[:, :new_c].reshape(-1)
        c_shard = new_c
    out = make_sharded_compress(mesh, cfg.k, c_shard, axis)(words, counts)
    return c_shard, axis, out


def _assert_ua_equal(a, b):
    np.testing.assert_array_equal(a.buf, b.buf)
    np.testing.assert_array_equal(a.off, b.off)
    np.testing.assert_array_equal(a.edges, b.edges)
    np.testing.assert_array_equal(a.cov_sum, b.cov_sum)
    assert a.k == b.k


@pytest.mark.parametrize("n_dev", [2, 4, 8])
def test_spell_paths_bit_identical(n_dev):
    from genome_assembler_tpu.parallel.compress import (
        spell_quads_arrays,
        spell_sharded_arrays,
    )
    from genome_assembler_tpu.utils.jaxenv import to_host

    _, reads, cfg = _workload(seed=300 + n_dev)
    mesh = build_mesh(n_dev)
    c_shard, axis, out = _compress_outputs(reads, cfg, mesh)
    (valid, uid, pos, cov, last_base, heads,
     edge_words, num_unitigs, _) = out
    u = int(to_host(num_unitigs)[0])
    ua_quads = spell_quads_arrays(
        valid, uid, pos, cov, last_base, heads, edge_words, u, cfg.k
    )
    ua_range = spell_sharded_arrays(
        mesh, cfg.k, c_shard, u,
        valid, uid, pos, cov, heads, edge_words, axis,
    )
    _assert_ua_equal(ua_range, ua_quads)


def test_spell_branchy_with_errors():
    """Errors + filtering leave a branchy multi-unitig graph; both spell
    paths and the end-to-end pipeline must agree."""
    from genome_assembler_tpu.parallel.compress import (
        spell_quads_arrays,
        spell_sharded_arrays,
    )
    from genome_assembler_tpu.utils.jaxenv import to_host

    _, reads, cfg = _workload(
        genome_len=2500, coverage=25, seed=321, error_rate=0.01
    )
    cfg = AssemblyConfig(k=cfg.k, read_len=80, min_count=3)
    mesh = build_mesh(4)
    c_shard, axis, out = _compress_outputs(reads, cfg, mesh)
    (valid, uid, pos, cov, last_base, heads,
     edge_words, num_unitigs, _) = out
    u = int(to_host(num_unitigs)[0])
    assert u > 1  # the point of this workload
    ua_quads = spell_quads_arrays(
        valid, uid, pos, cov, last_base, heads, edge_words, u, cfg.k
    )
    ua_range = spell_sharded_arrays(
        mesh, cfg.k, c_shard, u,
        valid, uid, pos, cov, heads, edge_words, axis,
    )
    _assert_ua_equal(ua_range, ua_quads)


def test_spell_tiny_u_block_retries():
    """A deliberately too-small u_block must flag overflow and retry to
    the same answer, never silently truncate."""
    from genome_assembler_tpu.parallel.compress import (
        spell_quads_arrays,
        spell_sharded_arrays,
    )
    from genome_assembler_tpu.utils.jaxenv import to_host

    _, reads, cfg = _workload(
        genome_len=2000, coverage=25, seed=333, error_rate=0.01
    )
    cfg = AssemblyConfig(k=cfg.k, read_len=80, min_count=3)
    mesh = build_mesh(2)
    c_shard, axis, out = _compress_outputs(reads, cfg, mesh)
    (valid, uid, pos, cov, last_base, heads,
     edge_words, num_unitigs, _) = out
    u = int(to_host(num_unitigs)[0])
    assert u > 2
    ua_small = spell_sharded_arrays(
        mesh, cfg.k, c_shard, u,
        valid, uid, pos, cov, heads, edge_words, axis,
        u_block=4,  # snug grid would pick far more; forces the retry path
    )
    ua_quads = spell_quads_arrays(
        valid, uid, pos, cov, last_base, heads, edge_words, u, cfg.k
    )
    _assert_ua_equal(ua_small, ua_quads)


def test_sharded_pipeline_uses_range_spell_and_matches_oracle():
    genome, reads, cfg = _workload(seed=350)
    mesh = build_mesh(4)
    assert os.environ.get("GA_SPELL_QUADS") != "1"
    contigs = assemble_distributed_sharded(reads, cfg, mesh)
    assert contigs == assemble_oracle(reads, cfg)
    assert contigs_equal(contigs, [decode_seq(genome)])


def test_spell_circular_genome():
    """Cycle-broken chains spell identically through both paths."""
    rng = np.random.default_rng(17)
    core = decode_seq(rng.integers(0, 4, 300).astype(np.uint8))
    k = 21
    circ = core + core[: k + 39]
    reads = np.stack(
        [encode_seq(circ[i : i + 60]) for i in range(len(circ) - 60 + 1)]
    )
    cfg = AssemblyConfig(k=k, read_len=60)
    mesh = build_mesh(4)
    contigs = assemble_distributed_sharded(reads, cfg, mesh)
    assert contigs == assemble_oracle(reads, cfg)
    assert len(contigs) == 1

"""Fully sharded compression (VERDICT r1 item 6): the graph stays sharded
through edge build, linking, doubling, and numbering; per-device buffers
scale ~1/D; results match the oracle and the gathered path bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pytest

from genome_assembler_tpu.host.traverse import contigs_equal
from genome_assembler_tpu.models.oracle import assemble_oracle
from genome_assembler_tpu.parallel.compress import peak_rows_per_device
from genome_assembler_tpu.parallel.mesh import build_mesh
from genome_assembler_tpu.parallel.pipeline import (
    assemble_distributed,
    assemble_distributed_sharded,
)
from genome_assembler_tpu.utils.config import AssemblyConfig
from genome_assembler_tpu.utils.dna import decode_seq, encode_seq
from genome_assembler_tpu.utils.simulate import simulate_genome, simulate_reads


def _workload(genome_len=1200, coverage=12, seed=51, k=21, error_rate=0.0):
    genome = simulate_genome(genome_len, seed=seed)
    rs = simulate_reads(
        genome, coverage=coverage, read_len=80, seed=seed + 1,
        error_rate=error_rate,
    )
    return genome, rs.codes, AssemblyConfig(k=k, read_len=80)


@pytest.mark.parametrize("n_dev", [2, 4, 8])
def test_sharded_matches_oracle_and_genome(n_dev):
    genome, reads, cfg = _workload(seed=60 + n_dev)
    mesh = build_mesh(n_dev)
    contigs = assemble_distributed_sharded(reads, cfg, mesh)
    assert contigs == assemble_oracle(reads, cfg)
    assert contigs_equal(contigs, [decode_seq(genome)])


def test_sharded_matches_gathered_path():
    genome, reads, cfg = _workload(genome_len=2500, coverage=15, seed=71)
    mesh = build_mesh(8)
    assert assemble_distributed_sharded(reads, cfg, mesh) == (
        assemble_distributed(reads, cfg, mesh)
    )


def test_sharded_two_level_mesh():
    genome, reads, cfg = _workload(seed=81)
    contigs = assemble_distributed_sharded(reads, cfg, build_mesh(8, hosts=2))
    assert contigs == assemble_oracle(reads, cfg)


def test_sharded_with_errors_and_filter():
    genome, reads, cfg = _workload(
        genome_len=2000, coverage=25, seed=91, error_rate=0.01
    )
    cfg = AssemblyConfig(k=cfg.k, read_len=80, min_count=3)
    contigs = assemble_distributed_sharded(reads, cfg, build_mesh(4))
    assert contigs == assemble_oracle(reads, cfg)


def test_sharded_circular_genome():
    """Pure cycle: break point differs per sharding, but contigs
    canonicalize identically (Booth rotation in emission)."""
    rng = np.random.default_rng(7)
    core = decode_seq(rng.integers(0, 4, 260).astype(np.uint8))
    k = 21
    circ = core + core[: k + 39]
    reads = np.stack([
        encode_seq(circ[i : i + 60])
        for i in range(len(circ) - 60 + 1)
    ])
    cfg = AssemblyConfig(k=k, read_len=60)
    contigs = assemble_distributed_sharded(reads, cfg, build_mesh(4))
    assert contigs == assemble_oracle(reads, cfg)
    assert len(contigs) == 1


def test_peak_memory_scales_inverse_with_devices():
    """The 1/D claim, pinned: per-device buffer rows at fixed global table
    size shrink proportionally as D grows (static shapes == memory)."""
    c_global = 1 << 20
    rows = {d: peak_rows_per_device(d, c_global // d) for d in (1, 2, 4, 8)}
    assert rows[2] <= rows[1] * 0.75
    assert rows[4] <= rows[2] * 0.75
    assert rows[8] <= rows[4] * 0.75
    assert rows[8] <= rows[1] * 0.35


def test_repeat_genome_sharded():
    """Branchy graph (interior repeat) compresses identically sharded."""
    rng = np.random.default_rng(15)
    piece = lambda n: decode_seq(rng.integers(0, 4, n).astype(np.uint8))  # noqa: E731
    rep = piece(30)
    genome = piece(220) + rep + piece(200) + rep + piece(180)
    reads = np.stack([
        encode_seq(genome[i : i + 61])
        for i in range(len(genome) - 61 + 1)
    ])
    cfg = AssemblyConfig(k=21, read_len=61)
    contigs = assemble_distributed_sharded(reads, cfg, build_mesh(8))
    assert contigs == assemble_oracle(reads, cfg)


def test_sharded_checkpoint_resume(tmp_path):
    genome, reads, cfg = _workload(genome_len=1800, coverage=15, seed=101)
    mesh = build_mesh(8)
    ckpt = str(tmp_path / "sh.npz")
    contigs = assemble_distributed_sharded(reads, cfg, mesh, checkpoint=ckpt)
    resumed = assemble_distributed_sharded(
        np.zeros_like(reads), cfg, mesh, resume_from=ckpt
    )
    assert resumed == contigs
    # mismatched mesh size is a clear error, not silent corruption
    with pytest.raises(ValueError):
        assemble_distributed_sharded(
            reads, cfg, build_mesh(4), resume_from=ckpt
        )


def test_node_owner_hash_uncorrelated_with_home_shard():
    """Regression (r4): suf(K) differs from K only in w0's top bits, and
    the unsalted mix_words left P(owner(suf(K)) == home(K)) at ~0.51
    instead of 1/d — a 2x diagonal join-bucket load that overflowed
    cap_join at CFG-4 3 Mb scale. The salted node hash must keep every
    node-record type's home-collision probability at ~1/d."""
    import jax.numpy as jnp
    import numpy as np

    from genome_assembler_tpu.ops.hash import mix_words
    from genome_assembler_tpu.ops.kmer_ref import extract_canonical_np
    from genome_assembler_tpu.ops.words_jax import (
        prefix_node,
        revcomp_words,
        suffix_node,
    )
    from genome_assembler_tpu.utils.simulate import simulate_genome

    k, d = 31, 8
    genome = simulate_genome(100_000, seed=1050)
    keys = extract_canonical_np(genome[None, :], k)
    u64 = keys.astype(np.uint64)
    packed = (u64[:, 0] << np.uint64(32)) | u64[:, 1]
    uniq = np.unique(packed)
    words = jnp.asarray(
        np.stack(
            [(uniq >> np.uint64(32)).astype(np.uint32),
             uniq.astype(np.uint32)],
            axis=1,
        )
    )
    home = np.asarray(mix_words(words) % jnp.uint32(d))
    rc = revcomp_words(words, k)
    salt = jnp.uint32(0x5BD1E995)  # must match parallel/compress.link
    for nk in (
        prefix_node(words, k), suffix_node(words, k),
        prefix_node(rc, k), suffix_node(rc, k),
    ):
        owner = np.asarray(mix_words(nk ^ salt) % jnp.uint32(d))
        frac = float((owner == home).mean())
        # binomial(100k-ish, 1/8): anything past 0.15 is structural
        assert frac < 0.15, f"node-owner correlated with home: {frac}"

"""Minimizer super-k-mer primitives (ops/superkmer.py).

Core invariant: cutting reads into super-k-mer records and re-extracting
windows from the packed substrings reproduces exactly the per-window
canonical key multiset — for any input, any k/m, with Ns masked.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from genome_assembler_tpu.ops.kmer_jax import SENTINEL, extract_canonical_flat
from genome_assembler_tpu.ops.superkmer import (
    RUN_CAP,
    extract_from_records,
    superkmer_records,
    window_minimizers,
)
from genome_assembler_tpu.utils.dna import INVALID_CODE
from genome_assembler_tpu.utils.simulate import simulate_genome, simulate_reads


def _key_multiset(keys, valid):
    keys = np.asarray(keys)[np.asarray(valid)]
    return sorted(map(tuple, keys.tolist()))


def _roundtrip(codes, k, m):
    import jax.numpy as jnp

    reads = jnp.asarray(codes & np.uint8(3))
    bad_windows = None
    # window validity: same rule as the pipeline (any N in window -> mask)
    from genome_assembler_tpu.ops.kmer_ref import window_valid_np

    wv = window_valid_np(codes, k).reshape(codes.shape[0], -1)
    hmin, mpos = window_minimizers(reads, k, m)
    brk, run, sub, owner_key = superkmer_records(
        reads, k, hmin, mpos, jnp.asarray(wv)
    )
    brk = np.asarray(brk)
    run = np.asarray(run)
    sub = np.asarray(sub)
    # records = start lanes only
    rec_sub = sub[brk]
    rec_run = run[brk]
    assert (rec_run >= 1).all() and (rec_run <= RUN_CAP).all()
    # every valid window is covered exactly once
    assert rec_run.sum() == wv.sum()
    keys, valid = extract_from_records(
        jnp.asarray(rec_sub), jnp.asarray(rec_run), k
    )
    got = _key_multiset(keys, valid)

    want_keys, _ = extract_canonical_flat(jnp.asarray(codes), k)
    wk = np.asarray(want_keys)
    sent = (wk == np.uint32(0xFFFFFFFF)).all(axis=1)
    want = _key_multiset(wk, wv.reshape(-1) & ~sent)
    assert got == want
    return rec_sub, rec_run, np.asarray(owner_key)[brk]


@pytest.mark.parametrize("k,m", [(21, 11), (31, 15), (41, 15), (25, 16)])
def test_records_reproduce_window_multiset(k, m):
    genome = simulate_genome(900, seed=5)
    rs = simulate_reads(genome, coverage=6, read_len=80, seed=6)
    _roundtrip(rs.codes, k, m)


def test_records_with_ns():
    genome = simulate_genome(900, seed=15)
    rs = simulate_reads(genome, coverage=6, read_len=80, seed=16)
    codes = rs.codes.copy()
    rng = np.random.default_rng(17)
    codes[rng.random(codes.shape) < 0.02] = INVALID_CODE
    _roundtrip(codes, 21, 11)


def test_same_kmer_same_owner():
    """Every occurrence of a canonical k-mer routes to one owner."""
    import jax.numpy as jnp

    genome = simulate_genome(600, seed=25)
    # both-strand reads: each k-mer occurs forward and reverse-complement
    rs = simulate_reads(genome, coverage=10, read_len=70, seed=26)
    k, m = 21, 11
    reads = jnp.asarray(rs.codes)
    hmin, mpos = window_minimizers(reads, k, m)
    keys, _ = extract_canonical_flat(reads, k)
    keys = np.asarray(keys)
    owners = {}
    hm = np.asarray(hmin).reshape(-1)
    for i, key in enumerate(map(tuple, keys.tolist())):
        if key in owners:
            assert owners[key] == hm[i], "k-mer routed to two owners"
        else:
            owners[key] = hm[i]


def test_wire_volume_reduction():
    """The point of the exercise: fewer bytes on the wire per window."""
    genome = simulate_genome(2000, seed=35)
    rs = simulate_reads(genome, coverage=10, read_len=100, seed=36)
    k, m = 31, 15
    rec_sub, rec_run, _ = _roundtrip(rs.codes, k, m)
    from genome_assembler_tpu.ops.superkmer import span_words
    from genome_assembler_tpu.utils.dna import key_words

    n_windows = rs.codes.shape[0] * (100 - k + 1)
    direct_bytes = n_windows * key_words(k) * 4
    record_bytes = rec_sub.shape[0] * (span_words(k) + 1) * 4
    assert record_bytes < direct_bytes / 2.5, (
        record_bytes,
        direct_bytes,
        rec_sub.shape[0],
    )


@settings(deadline=None, max_examples=8)
@given(
    seed=st.integers(0, 2**31 - 1),
    k=st.sampled_from([21, 31, 33]),
    m=st.sampled_from([9, 13, 15]),
)
def test_roundtrip_any_input(seed, k, m):
    genome = simulate_genome(500, seed=seed)
    rs = simulate_reads(genome, coverage=4, read_len=64, seed=seed + 1)
    _roundtrip(rs.codes, k, m)


def test_distributed_counting_with_minimizers():
    """Sharded counting via super-k-mer routing == host counts."""
    from genome_assembler_tpu.models.oracle import count_canonical_fast
    from genome_assembler_tpu.parallel.mesh import build_mesh
    from genome_assembler_tpu.parallel.pipeline import (
        distributed_count_to_host,
    )
    from genome_assembler_tpu.utils.config import AssemblyConfig

    genome = simulate_genome(1500, seed=45)
    rs = simulate_reads(genome, coverage=10, read_len=100, seed=46)
    cfg = AssemblyConfig(k=31, read_len=100)
    want = count_canonical_fast(rs.codes, cfg.k)
    for d in (2, 8):
        got = distributed_count_to_host(
            rs.codes, cfg, build_mesh(d), minimizer_len=15
        )
        assert got == want


def test_distributed_minimizers_with_ns():
    from genome_assembler_tpu.models.oracle import count_canonical_dict
    from genome_assembler_tpu.parallel.mesh import build_mesh
    from genome_assembler_tpu.parallel.pipeline import (
        distributed_count_to_host,
    )
    from genome_assembler_tpu.utils.config import AssemblyConfig

    genome = simulate_genome(1200, seed=47)
    rs = simulate_reads(genome, coverage=12, read_len=100, seed=48)
    codes = rs.codes.copy()
    rng = np.random.default_rng(49)
    codes[rng.random(codes.shape) < 0.01] = INVALID_CODE
    cfg = AssemblyConfig(k=21, read_len=100)
    got = distributed_count_to_host(
        codes, cfg, build_mesh(4), minimizer_len=11
    )
    assert got == count_canonical_dict(codes, cfg.k)


def test_sharded_assembly_with_minimizers():
    from genome_assembler_tpu.models.oracle import assemble_oracle
    from genome_assembler_tpu.parallel.mesh import build_mesh
    from genome_assembler_tpu.parallel.pipeline import (
        assemble_distributed,
        assemble_distributed_sharded,
    )
    from genome_assembler_tpu.utils.config import AssemblyConfig

    genome = simulate_genome(2000, seed=51)
    rs = simulate_reads(genome, coverage=15, read_len=100, seed=52)
    cfg = AssemblyConfig(k=31, read_len=100)
    mesh = build_mesh(8)
    oracle = assemble_oracle(rs.codes, cfg)
    assert assemble_distributed(
        rs.codes, cfg, mesh, minimizer_len=15
    ) == oracle
    assert assemble_distributed_sharded(
        rs.codes, cfg, mesh, minimizer_len=15
    ) == oracle

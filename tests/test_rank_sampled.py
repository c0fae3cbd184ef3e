"""Sampled two-level ranking (ops.unitig_jax._rank_sampled) vs the plain
doubling pass: bit-identical on acyclic graphs, exact fallback on cycles.

The fast path only engages above SAMPLED_MIN_ROWS in production; these
tests monkeypatch the threshold to 0 so tiny CPU graphs exercise it.
"""

import jax.numpy as jnp
import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from genome_assembler_tpu.host.dbg import (
    both_strand_edges,
    compress_unitigs,
    spell_device_unitigs,
)
from genome_assembler_tpu.models.oracle import count_canonical_fast
from genome_assembler_tpu.models.pipeline import count_reads_device
from genome_assembler_tpu.ops import unitig_jax
from genome_assembler_tpu.ops.count_jax import filter_table
from genome_assembler_tpu.utils.config import AssemblyConfig
from genome_assembler_tpu.utils.simulate import simulate_genome, simulate_reads


@pytest.fixture()
def force_sampled(monkeypatch):
    monkeypatch.setattr(unitig_jax, "SAMPLED_MIN_ROWS", 0)


def _plain(prev, valid):
    anc, dist, has_cycle = unitig_jax._rank_pass(prev)
    if bool(has_cycle):
        prev = unitig_jax._break_cycles(prev, valid)
        anc, dist, _ = unitig_jax._rank_pass(prev)
    return unitig_jax._finalize_chains(prev, anc, dist, valid)


def _chain_prev(order):
    """prev[] for one chain whose edge ids appear in `order`."""
    n = len(order)
    prev = np.full(n, -1, np.int32)
    for i in range(1, n):
        prev[order[i]] = order[i - 1]
    return prev


def test_single_chain_in_id_order(force_sampled):
    n = 300
    prev = jnp.asarray(_chain_prev(list(range(n))))
    head, rank, ok = unitig_jax._rank_sampled(prev)
    assert bool(ok)
    np.testing.assert_array_equal(np.asarray(head), np.zeros(n, np.int32))
    np.testing.assert_array_equal(
        np.asarray(rank), np.arange(n, dtype=np.int32)
    )


def test_shuffled_chains_match_plain(force_sampled):
    rng = np.random.default_rng(42)
    n = 500
    order = rng.permutation(n)
    # split into 3 chains
    prev = np.full(n, -1, np.int32)
    for part in np.array_split(order, 3):
        prev[part[1:]] = part[:-1]
    prev = jnp.asarray(prev)
    valid = jnp.ones(n, bool)
    head, rank, ok = unitig_jax._rank_sampled(prev)
    assert bool(ok)
    uid_f, pos_f, num_f = unitig_jax._finalize_chains(prev, head, rank, valid)
    uid_p, pos_p, num_p = _plain(prev, valid)
    np.testing.assert_array_equal(np.asarray(uid_f), np.asarray(uid_p))
    np.testing.assert_array_equal(np.asarray(pos_f), np.asarray(pos_p))
    assert int(num_f) == int(num_p)


def test_cycle_with_ruler_falls_back(force_sampled):
    # one pure cycle covering all ids: contains ruler 0, so phase A
    # converges but the contracted list cycles -> ok False
    n = 200
    prev = jnp.asarray(np.roll(np.arange(n, dtype=np.int32), 1))
    _, _, ok = unitig_jax._rank_sampled(prev)
    assert not bool(ok)


def test_rulerless_cycle_falls_back(force_sampled):
    # cycle among ids 5..12 (no multiple of 32), rest one chain
    n = 40
    prev = np.full(n, -1, np.int32)
    cyc = list(range(5, 13))
    for i, e in enumerate(cyc):
        prev[e] = cyc[i - 1]
    prev = jnp.asarray(prev)
    _, _, ok = unitig_jax._rank_sampled(prev)
    assert not bool(ok)


def test_self_loop_falls_back(force_sampled):
    prev = np.full(64, -1, np.int32)
    prev[33] = 33
    _, _, ok = unitig_jax._rank_sampled(jnp.asarray(prev))
    assert not bool(ok)


def _unitig_set(unitigs):
    return {(u.seq, round(u.cov, 9), u.edges) for u in unitigs}


@settings(deadline=None, max_examples=8)
@given(st.integers(0, 2**31 - 1), st.sampled_from([21, 31]))
def test_compress_device_sampled_matches_host(seed, k):
    # cannot use the fixture inside @given: patch module state directly
    old = unitig_jax.SAMPLED_MIN_ROWS
    unitig_jax.SAMPLED_MIN_ROWS = 0
    try:
        genome = simulate_genome(700, seed=seed)
        rs = simulate_reads(genome, coverage=8, read_len=k + 30, seed=seed + 1)
        cfg = AssemblyConfig(k=k, read_len=rs.codes.shape[1])
        table = filter_table(count_reads_device(rs.codes, cfg), 1)
        dev = unitig_jax.compress_unitigs_device(table, k)
        got = _unitig_set(spell_device_unitigs(dev, k))
        counts = count_canonical_fast(rs.codes, k)
        want = _unitig_set(compress_unitigs(both_strand_edges(counts), k))
        assert got == want
    finally:
        unitig_jax.SAMPLED_MIN_ROWS = old


# ---- contraction tail (_rank_sampled_contract, GA_RANK_CONTRACT) ----
# r0=1 forces the A2-A4 contraction legs to engage on tiny graphs
# (with the default r0=6 every chain under 64 edges resolves in phase
# A and the tail is a no-op).


def test_contract_single_chain_id_order(force_sampled):
    # div=1: the compacted buffer holds every lane, so the contraction
    # legs engage without tripping the e/4 overflow guard on a graph
    # where r0=1 leaves ~75% of lanes unresolved
    n = 300
    prev = jnp.asarray(_chain_prev(list(range(n))))
    head, rank, ok = unitig_jax._rank_sampled_contract(prev, r0=1, div=1)
    assert bool(ok)
    np.testing.assert_array_equal(np.asarray(head), np.zeros(n, np.int32))
    np.testing.assert_array_equal(
        np.asarray(rank), np.arange(n, dtype=np.int32)
    )


@settings(deadline=None, max_examples=20)
@given(st.integers(0, 2**32 - 1), st.integers(1, 5), st.integers(1, 4))
def test_contract_matches_plain_hypothesis(seed, nchains, r0):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(40, 600))
    order = rng.permutation(n)
    prev = np.full(n, -1, np.int32)
    for part in np.array_split(order, nchains):
        if len(part) > 1:
            prev[part[1:]] = part[:-1]
    prev = jnp.asarray(prev)
    valid = jnp.ones(n, bool)
    head, rank, ok = unitig_jax._rank_sampled_contract(prev, r0=r0, div=1)
    assert bool(ok)
    uid_c, pos_c, num_c = unitig_jax._finalize_chains(prev, head, rank, valid)
    uid_p, pos_p, num_p = _plain(prev, valid)
    np.testing.assert_array_equal(np.asarray(uid_c), np.asarray(uid_p))
    np.testing.assert_array_equal(np.asarray(pos_c), np.asarray(pos_p))
    assert int(num_c) == int(num_p)


def test_contract_equals_sampled_converged_case(force_sampled):
    # chains shorter than 2^r0: phase A converges, contraction no-op
    rng = np.random.default_rng(9)
    n = 400
    order = rng.permutation(n)
    prev = np.full(n, -1, np.int32)
    for part in np.array_split(order, 20):
        if len(part) > 1:
            prev[part[1:]] = part[:-1]
    prev = jnp.asarray(prev)
    hs, rs_, oks = unitig_jax._rank_sampled(prev)
    hc, rc, okc = unitig_jax._rank_sampled_contract(prev)
    assert bool(oks) and bool(okc)
    np.testing.assert_array_equal(np.asarray(hs), np.asarray(hc))
    np.testing.assert_array_equal(np.asarray(rs_), np.asarray(rc))


def test_contract_overflow_flags_not_wrong(force_sampled):
    # r0=1 on one long shuffled chain: far more than e4=128 lanes stay
    # unresolved -> over trips, ok False, caller falls back (exact path)
    rng = np.random.default_rng(3)
    n = 4000
    prev = jnp.asarray(_chain_prev(list(rng.permutation(n))))
    _, _, ok = unitig_jax._rank_sampled_contract(prev, r0=1, div=31)
    assert not bool(ok)


def test_contract_rulerless_cycle_falls_back(force_sampled):
    n = 40
    prev = np.full(n, -1, np.int32)
    cyc = list(range(5, 13))
    for i, e in enumerate(cyc):
        prev[e] = cyc[i - 1]
    _, _, ok = unitig_jax._rank_sampled_contract(
        jnp.asarray(prev), r0=1, div=1
    )
    assert not bool(ok)


def test_contract_self_loop_falls_back(force_sampled):
    prev = np.full(64, -1, np.int32)
    prev[33] = 33
    _, _, ok = unitig_jax._rank_sampled_contract(
        jnp.asarray(prev), r0=1, div=1
    )
    assert not bool(ok)


def test_contract_cycle_with_ruler_falls_back(force_sampled):
    n = 200
    prev = jnp.asarray(np.roll(np.arange(n, dtype=np.int32), 1))
    _, _, ok = unitig_jax._rank_sampled_contract(prev, r0=1, div=1)
    assert not bool(ok)


def test_compress_device_contract_matches_host(monkeypatch):
    monkeypatch.setattr(unitig_jax, "SAMPLED_MIN_ROWS", 0)
    monkeypatch.setattr(unitig_jax, "CONTRACT_R0", 2)
    monkeypatch.setattr(unitig_jax, "CONTRACT_DIV", 1)
    monkeypatch.setenv("GA_RANK_CONTRACT", "1")
    genome = simulate_genome(900, seed=17)
    rs = simulate_reads(genome, coverage=8, read_len=61, seed=18)
    cfg = AssemblyConfig(k=31, read_len=61)
    table = filter_table(count_reads_device(rs.codes, cfg), 1)
    dev = unitig_jax.compress_unitigs_device(table, 31)
    got = _unitig_set(spell_device_unitigs(dev, 31))
    counts = count_canonical_fast(rs.codes, 31)
    want = _unitig_set(compress_unitigs(both_strand_edges(counts), 31))
    assert got == want


def test_compress_device_sampled_circular_genome():
    old = unitig_jax.SAMPLED_MIN_ROWS
    unitig_jax.SAMPLED_MIN_ROWS = 0
    try:
        genome = simulate_genome(300, seed=7)
        circ = np.concatenate([genome, genome[:99]])
        rs = simulate_reads(circ, coverage=20, read_len=100, seed=8)
        cfg = AssemblyConfig(k=21, read_len=100)
        table = filter_table(count_reads_device(rs.codes, cfg), 1)
        dev = unitig_jax.compress_unitigs_device(table, 21)
        got = _unitig_set(spell_device_unitigs(dev, 21))
        counts = count_canonical_fast(rs.codes, 21)
        want = _unitig_set(compress_unitigs(both_strand_edges(counts), 21))
        assert got == want
    finally:
        unitig_jax.SAMPLED_MIN_ROWS = old



# ---- cycle-aware sampled ranking (_rank_sampled_cyclic, r5) ----


def _mixed_prev(seed, n, nchains, ncycles):
    """Random graph of chains + pure cycles over a shuffled id space."""
    rng = np.random.default_rng(seed)
    order = rng.permutation(n)
    prev = np.full(n, -1, np.int32)
    parts = np.array_split(order, nchains + ncycles)
    for i, part in enumerate(parts):
        if len(part) > 1:
            prev[part[1:]] = part[:-1]
            if i >= nchains:  # close into a cycle
                prev[part[0]] = part[-1]
    return jnp.asarray(prev)


@settings(deadline=None, max_examples=25)
@given(
    st.integers(0, 2**32 - 1),
    st.integers(0, 3),
    st.integers(1, 4),
)
def test_cyclic_sampled_matches_exact_hypothesis(seed, nchains, ncycles):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(200, 900))
    prev = _mixed_prev(seed, n, nchains, ncycles)
    valid = jnp.ones(n, bool)
    head, rank, ok, prev3 = unitig_jax._rank_sampled_cyclic(prev)
    uid_e, pos_e, num_e = _plain(prev, valid)
    if not bool(ok):
        return  # rulerless cycle: fallback territory, nothing to compare
    uid_c, pos_c, num_c = unitig_jax._finalize_chains(
        prev3, head, rank, valid
    )
    np.testing.assert_array_equal(np.asarray(uid_c), np.asarray(uid_e))
    np.testing.assert_array_equal(np.asarray(pos_c), np.asarray(pos_e))
    assert int(num_c) == int(num_e)


def test_cyclic_sampled_single_big_cycle():
    # one 600-lane cycle in id order: rulers every 32 lanes, must break
    # at lane 0 (the global min) exactly like _break_cycles
    n = 600
    prev = jnp.asarray(np.roll(np.arange(n, dtype=np.int32), 1))
    valid = jnp.ones(n, bool)
    head, rank, ok, prev3 = unitig_jax._rank_sampled_cyclic(prev)
    assert bool(ok)
    assert int(prev3[0]) == -1  # broken at the min edge id
    uid_c, pos_c, num_c = unitig_jax._finalize_chains(prev3, head, rank, valid)
    uid_e, pos_e, num_e = _plain(prev, valid)
    np.testing.assert_array_equal(np.asarray(uid_c), np.asarray(uid_e))
    np.testing.assert_array_equal(np.asarray(pos_c), np.asarray(pos_e))
    assert int(num_c) == int(num_e) == 1


def test_cyclic_sampled_rulerless_cycle_falls_back():
    # an 8-lane cycle avoiding every multiple of 32: no ruler on it
    n = 200
    prev = np.full(n, -1, np.int32)
    cyc = [33, 37, 41, 45, 49, 53, 57, 61]
    for i, e in enumerate(cyc):
        prev[e] = cyc[i - 1]
    _, _, ok, _ = unitig_jax._rank_sampled_cyclic(jnp.asarray(prev))
    assert not bool(ok)


def test_compress_device_circular_uses_cyclic_sampled(monkeypatch):
    """A circular genome through compress_unitigs_device with the
    sampled threshold forced: the cyclic pass must produce the exact
    path's unitig set (and the pipeline the genome, up to rotation)."""
    monkeypatch.setattr(unitig_jax, "SAMPLED_MIN_ROWS", 0)
    genome = simulate_genome(1200, seed=23)
    rs = simulate_reads(
        genome, coverage=8, read_len=61, seed=24, tile_k=31, circular=True
    )
    cfg = AssemblyConfig(k=31, read_len=61)
    table = filter_table(count_reads_device(rs.codes, cfg), 1)
    dev = unitig_jax.compress_unitigs_device(table, 31)
    got = _unitig_set(spell_device_unitigs(dev, 31))
    counts = count_canonical_fast(rs.codes, 31)
    want = _unitig_set(compress_unitigs(both_strand_edges(counts), 31))
    assert got == want

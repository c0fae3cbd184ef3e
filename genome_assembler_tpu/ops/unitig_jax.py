"""On-device unitig compression by pointer jumping (SURVEY.md §7 M4).

The reference walks non-branching chains one edge at a time on the host
(SURVEY.md §3.4); here the non-branching 95% of the graph is compressed in
O(log E) doubling sweeps of fixed-shape gathers — the TPU-native
restructuring mandated by the north star ("Eulerian path traversal
restructured as iterative parallel unitig compression (pointer-jumping /
list-ranking on non-branching chains)", BASELINE.json).

Pipeline (all static shapes, capacity = 2C directed edges):
  1. both-strand edge table: canonical k-mers + their reverse complements,
     lexicographically sorted — edge id == sorted position;
  2. successor linking: edge e chains into the unique edge whose prefix
     node equals suffix(e) iff that node has outdeg == indeg == 1, found by
     lexicographic binary search (prefix order == key order);
  3. chain heads via pointer doubling on the predecessor pointers, with
     min-id tracking to break pure cycles deterministically at their
     lexicographically smallest edge (matching host compress_unitigs);
  4. outputs (edge -> unitig id, position, coverage) are spelled into
     strings on the host by vectorized NumPy (host/dbg.spell_unitigs).

Semantics are bit-identical to host compress_unitigs on the same counts
(tested); only the mechanics are parallel.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .count_jax import CountTable, sort_by_words
from .kmer_jax import SENTINEL
from .words_jax import (
    build_search_lut,
    prefix_node,
    revcomp_words,
    searchsorted_words_bucketed,
    suffix_node,
)


class DeviceUnitigs(NamedTuple):
    """Edge-level unitig assignment, capacity 2C (invalid lanes masked).

    edge_words: [E, W] sorted directed edge k-mers (both strands).
    cov:        [E] int32 multiplicity per edge.
    uid:        [E] int32 unitig id (dense, 0..num_unitigs-1) or -1 invalid.
    pos:        [E] int32 position of the edge within its unitig chain.
    valid:      [E] bool.
    num_unitigs: scalar int32.
    """

    edge_words: jax.Array
    cov: jax.Array
    uid: jax.Array
    pos: jax.Array
    valid: jax.Array
    num_unitigs: jax.Array


def _doubling(prev: jax.Array, steps: int, track: str = "dist"):
    """Pointer doubling over predecessor pointers.

    prev[e] = predecessor edge id or -1. Heads (prev == -1) self-loop, so
    the ancestor converges to the chain head. track selects the second
    quantity carried along (each costs one extra gather per round):
      "dist" -> distance from the head (chain offset);
      "min"  -> minimum edge id on the ancestor path (cycle break point —
                for pure cycles the ancestor keeps rotating and the min
                covers the whole cycle).
    Returns (ancestor, tracked).
    """
    n = prev.shape[0]
    ids = jnp.arange(n, dtype=jnp.int32)
    anc = jnp.where(prev >= 0, prev, ids)
    if track == "dist":
        aux = (prev >= 0).astype(jnp.int32)

        def body(_, state):
            anc, aux = state
            return anc[anc], aux + aux[anc]

    else:
        aux = jnp.minimum(ids, anc)

        def body(_, state):
            anc, aux = state
            return anc[anc], jnp.minimum(aux, aux[anc])

    return jax.lax.fori_loop(0, steps, body, (anc, aux))


def _eq_rows(a: jax.Array, b: jax.Array) -> jax.Array:
    eq = a[:, 0] == b[:, 0]
    for i in range(1, a.shape[1]):
        eq &= a[:, i] == b[:, i]
    return eq


@functools.partial(jax.jit, static_argnames=("k",))
def _build_edges(table: CountTable, k: int):
    """Both-strand sorted edge table: (edge_words [2C, W], covs, valid)."""
    c, w = table.words.shape
    lane = jnp.arange(c, dtype=jnp.int32)
    is_real = lane < table.num_unique
    rc = revcomp_words(table.words, k)
    rc = jnp.where(is_real[:, None], rc, SENTINEL)
    edge_words = jnp.concatenate([table.words, rc], axis=0)
    covs = jnp.concatenate([table.counts, table.counts], axis=0)
    covs = jnp.where(jnp.concatenate([is_real, is_real]), covs, 0)
    edge_words, covs = sort_by_words(edge_words, covs)
    valid = ~_eq_rows(edge_words, jnp.broadcast_to(
        jnp.full((1, w), SENTINEL, jnp.uint32), edge_words.shape
    ))
    return edge_words, covs, valid


@functools.partial(jax.jit, static_argnames=("k",))
def _prep_link(edge_words: jax.Array, valid: jax.Array, k: int):
    """Node keys + the successor-join search LUT."""
    pre = prefix_node(edge_words, k)  # sorted: prefix of the sort key
    suf = suffix_node(edge_words, k)
    # suffix_node(sentinel) would alias the all-T node key and corrupt
    # degree counts; pin invalid lanes to the sentinel (> any valid node).
    suf = jnp.where(valid[:, None], suf, SENTINEL)
    pre_lut, pre_max = build_search_lut(pre)
    return pre, suf, pre_lut, pre_max


def _run_lengths_per_lane(keys: jax.Array) -> jax.Array:
    """For each lane of [E, W] keys: the size of its equal-value group.

    Sort once carrying the lane id, measure runs with scans in the sorted
    domain, and sort back by lane id — two fast sorts instead of a
    binary-search join.
    """
    e, w = keys.shape
    ids = jnp.arange(e, dtype=jnp.int32)
    ops = jax.lax.sort(
        tuple(keys[:, i] for i in range(w)) + (ids,), num_keys=w
    )
    sorted_keys = jnp.stack(ops[:w], axis=1)
    ids_s = ops[w]
    idx = jnp.arange(e, dtype=jnp.int32)
    prev = jnp.concatenate(
        [jnp.full((1, w), SENTINEL, jnp.uint32), sorted_keys[:-1]], axis=0
    )
    is_start = jnp.any(sorted_keys != prev, axis=1).at[0].set(True)
    start_or_inf = jnp.where(is_start, idx, e)
    next_start = jnp.concatenate(
        [jnp.flip(jax.lax.cummin(jnp.flip(start_or_inf)))[1:],
         jnp.full((1,), e, jnp.int32)]
    )
    my_start = jax.lax.cummax(jnp.where(is_start, idx, -1))
    runlen_sorted = next_start - my_start
    # restore lane order: single-int-key sort, run length as payload
    _, runlen = jax.lax.sort((ids_s, runlen_sorted), num_keys=1)
    return runlen


@functools.partial(jax.jit, static_argnames=("steps_pre",))
def _link_main(valid, pre, suf, pre_lut, steps_pre):
    e = pre.shape[0]
    ids = jnp.arange(e, dtype=jnp.int32)

    def run_is_one(sorted_keys, lo, q):
        """length of the equal run of q starting at lo is exactly 1."""
        first = sorted_keys[jnp.clip(lo, 0, e - 1)]
        second = sorted_keys[jnp.clip(lo + 1, 0, e - 1)]
        hit = (lo < e) & _eq_rows(first, q)
        more = (lo + 1 < e) & _eq_rows(second, q)
        return hit & ~more

    lo = searchsorted_words_bucketed(pre, suf, pre_lut, steps_pre)
    out_one = run_is_one(pre, lo, suf)
    in_one = _run_lengths_per_lane(suf) == 1

    chain = valid & out_one & in_one
    succ = jnp.where(chain, lo, e)  # e == out-of-bounds, dropped below
    return jnp.full(e, -1, dtype=jnp.int32).at[succ].set(ids, mode="drop")


def _quantized_steps(max_bucket: int) -> int:
    """Bisection rounds for a bucket of this size, rounded up to x4 to
    bound the jit-cache variants."""
    need = int(np.ceil(np.log2(max(max_bucket, 2)))) + 1
    return min(32, -(-need // 4) * 4)


def _link_successors(edge_words: jax.Array, valid: jax.Array, k: int):
    """prev[e] = unique chain predecessor edge id, or -1 (see module doc).

    The successor lookup is a lower-bound search (outdeg(n)==1 iff the run
    at lower_bound(n) has length 1) seeded from a 16-bit-prefix LUT — one
    scalar pull picks the static round count. The indegree test needs only
    per-lane run lengths of the suffix keys, which two fast sorts + scans
    compute without any searching.
    """
    pre, suf, pre_lut, pre_max = _prep_link(edge_words, valid, k)
    steps_pre = _quantized_steps(int(pre_max))
    return _link_main(valid, pre, suf, pre_lut, steps_pre)


def _steps_for(e: int) -> int:
    return max(1, int(np.ceil(np.log2(max(e, 2)))) + 1)


@jax.jit
def _rank_pass(prev: jax.Array):
    """One doubling pass: (ancestor, distance, any_cycle).

    In a pure cycle every lane has a predecessor forever, so its distance
    doubles every round and hits exactly 2^steps; chain distances are
    bounded by the chain length < 2^steps. One scalar flag therefore
    detects whether the (rare, circular-genome) cycle-breaking pass is
    needed at all.
    """
    steps = _steps_for(prev.shape[0])
    anc, dist = _doubling(prev, steps, track="dist")
    return anc, dist, jnp.any(dist >= (1 << steps))


@jax.jit
def _break_cycles(prev: jax.Array, valid: jax.Array):
    """Min-id doubling pass; returns prev with each cycle's minimum edge
    turned into a head."""
    e = prev.shape[0]
    ids = jnp.arange(e, dtype=jnp.int32)
    steps = _steps_for(e)
    anc, mn = _doubling(prev, steps, track="min")
    in_cycle = valid & (prev[anc] >= 0)
    return jnp.where(in_cycle & (ids == mn), -1, prev)


@jax.jit
def _finalize_chains(prev: jax.Array, anc: jax.Array, dist: jax.Array, valid: jax.Array):
    heads = valid & (prev == -1)
    head_rank = jnp.cumsum(heads.astype(jnp.int32)) - 1
    uid = jnp.where(valid, head_rank[anc], -1)
    return uid, dist, jnp.sum(heads.astype(jnp.int32))


def _resolve_chains(prev: jax.Array, valid: jax.Array):
    """Chain heads/offsets by pointer doubling; the cycle-breaking pass
    (circular components only) runs adaptively."""
    anc, dist, has_cycle = _rank_pass(prev)
    if bool(has_cycle):
        prev = _break_cycles(prev, valid)
        anc, dist, _ = _rank_pass(prev)
    return _finalize_chains(prev, anc, dist, valid)


class SpellArrays(NamedTuple):
    """Compact spelling transfer set (device -> host link is ~40 MB/s here,
    so the full edge table must not cross it).

    bases:     [E] uint8 — last base of every edge, sorted by (uid, pos):
               the concatenation of all unitig bodies in unitig order.
    head_words:[U_cap, W] uint32 — the head edge k-mer of each unitig
               (its prefix spells the unitig's first k-1 bases).
    lengths:   [U_cap] int32 edge counts per unitig (0 = padding).
    cov_sum:   [U_cap] int32 summed edge multiplicities per unitig.
    num_unitigs: scalar int32.
    overflow:  scalar bool — num_unitigs exceeded U_cap; caller must retry
               with a larger cap (checked, never silent).
    """

    bases: jax.Array
    head_words: jax.Array
    lengths: jax.Array
    cov_sum: jax.Array
    num_unitigs: jax.Array
    overflow: jax.Array


@functools.partial(jax.jit, static_argnames=("u_cap",))
def spell_arrays(dev: DeviceUnitigs, u_cap: int) -> SpellArrays:
    """Reduce DeviceUnitigs to the compact transfer set (see SpellArrays).

    One sort puts every edge in (uid, pos) order — pos packs its 2-bit last
    base so a single uint32 operand carries both — with the edge words and
    coverage as payload; segment scans then produce per-unitig lengths and
    coverage sums, and a second (tiny-key) sort compacts the per-unitig
    rows to the front for a static [u_cap] slice.
    """
    e, w = dev.edge_words.shape
    big = jnp.int32(2**30)
    uid_adj = jnp.where(dev.valid, dev.uid, big).astype(jnp.uint32)
    packed = (
        (dev.pos.astype(jnp.uint32) << jnp.uint32(2))
        | (dev.edge_words[:, -1] & jnp.uint32(3))
    )
    operands = (uid_adj, packed, dev.cov) + tuple(
        dev.edge_words[:, i] for i in range(w)
    )
    out = jax.lax.sort(operands, num_keys=2)
    uid_s, packed_s, cov_s = out[0], out[1], out[2]
    words_s = jnp.stack(out[3 : 3 + w], axis=1)
    bases = (packed_s & jnp.uint32(3)).astype(jnp.uint8)

    idx = jnp.arange(e, dtype=jnp.int32)
    prev_uid = jnp.concatenate([jnp.full((1,), 0xFFFFFFFF, jnp.uint32), uid_s[:-1]])
    is_start = (uid_s != prev_uid).at[0].set(True) & (uid_s != jnp.uint32(2**30))
    start_or_inf = jnp.where(is_start | (uid_s == jnp.uint32(2**30)), idx, e)
    next_start = jnp.concatenate(
        [jnp.flip(jax.lax.cummin(jnp.flip(start_or_inf)))[1:],
         jnp.full((1,), e, jnp.int32)]
    )
    lengths = jnp.where(is_start, next_start - idx, 0)
    cs = jnp.cumsum(cov_s)
    cov_sum = jnp.where(
        is_start,
        cs[jnp.clip(next_start - 1, 0, e - 1)] - cs[idx] + cov_s,
        0,
    )
    num = jnp.sum(is_start.astype(jnp.int32))

    # compact per-unitig rows (at start lanes, already in uid order) to the
    # front: sort by the tiny is_start key, stable in uid order
    sort2 = jax.lax.sort(
        ((~is_start).astype(jnp.uint32), uid_s, lengths, cov_sum)
        + tuple(words_s[:, i] for i in range(w)),
        num_keys=2,
    )
    lengths_c = sort2[2][:u_cap]
    cov_sum_c = sort2[3][:u_cap]
    head_words = jnp.stack([sort2[4 + i][:u_cap] for i in range(w)], axis=1)
    return SpellArrays(
        bases=bases,
        head_words=head_words,
        lengths=lengths_c,
        cov_sum=cov_sum_c,
        num_unitigs=num,
        overflow=num > u_cap,
    )


def compress_unitigs_device(table: CountTable, k: int) -> DeviceUnitigs:
    """Filtered canonical CountTable -> unitig chain assignment (see module).

    Requires odd k (no palindromic k-mers, so the both-strand edge set has
    exactly two distinct directed edges per canonical k-mer). Stages run as
    separate dispatches: each sub-program compiles in bounded time on the
    axon backend and faults isolate per stage.
    """
    if k % 2 == 0:
        raise ValueError("device unitig compression requires odd k")
    if 2 * table.words.shape[0] >= (1 << 29):
        # _rank_pass carries chain distances in int32; beyond 2^29 edges the
        # doubled distance / cycle threshold would overflow (ADVICE.md r1).
        # 2^29 edge rows is ~4 GiB of key words alone, past single-chip HBM
        # budget for this pipeline — shard the table instead.
        raise ValueError(
            "edge table too large for device compression "
            f"({2 * table.words.shape[0]} rows >= 2^29); "
            "reduce table capacity or use the distributed path"
        )
    edge_words, covs, valid = _build_edges(table, k)
    prev = _link_successors(edge_words, valid, k)
    uid, pos, num = _resolve_chains(prev, valid)
    return DeviceUnitigs(
        edge_words=edge_words,
        cov=covs,
        uid=uid,
        pos=pos,
        valid=valid,
        num_unitigs=num,
    )

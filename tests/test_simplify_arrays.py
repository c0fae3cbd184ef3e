"""Array-native simplification == normative Python simplification.

host.simplify_arrays is the production path (no Python loops, no string
materialization until the end); host.simplify defines the rules. These
tests pin that, given the same unitig list, both produce the same final
graph — on handcrafted tip/bubble/island/cycle scenarios and on random
branchy inputs (Hypothesis).
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from genome_assembler_tpu.host.dbg import (
    both_strand_edges,
    compress_unitigs,
)
from genome_assembler_tpu.host.simplify import simplify_unitigs
from genome_assembler_tpu.host.simplify_arrays import (
    from_unitigs,
    simplify_arrays_to_graph,
    to_unitig_graph,
)
from genome_assembler_tpu.host.traverse import emit_contigs
from genome_assembler_tpu.models.oracle import count_canonical_dict
from genome_assembler_tpu.utils.dna import decode_seq, revcomp_str
from genome_assembler_tpu.utils.simulate import simulate_genome


def _windows(seq, read_len, stride=1):
    return [
        seq[i : i + read_len]
        for i in range(0, len(seq) - read_len + 1, stride)
    ]


def _unitig_key_set(g):
    return sorted((u.seq, u.cov_sum, u.edges) for u in g.unitigs)


def _assert_parity(unitigs, k, tip_len, bubble_len, min_count=1):
    g_py = simplify_unitigs(list(unitigs), k, tip_len, bubble_len, min_count)
    g_ar = simplify_arrays_to_graph(
        from_unitigs(list(unitigs), k), tip_len, bubble_len, min_count
    )
    assert _unitig_key_set(g_py) == _unitig_key_set(g_ar)
    assert emit_contigs(g_py) == emit_contigs(g_ar)


def _unitigs_from_reads(reads, k):
    counts = count_canonical_dict(reads, k)
    return compress_unitigs(both_strand_edges(counts), k)


def test_roundtrip_pack_unpack():
    k = 15
    genome = decode_seq(simulate_genome(300, seed=21))
    unitigs = _unitigs_from_reads(_windows(genome, 60), k)
    g = to_unitig_graph(from_unitigs(unitigs, k))
    assert _unitig_key_set(g) == sorted(
        (u.seq, u.cov_sum, u.edges) for u in unitigs
    )


def test_parity_tip_scenario():
    k = 15
    genome = decode_seq(simulate_genome(400, seed=91))
    branch = genome[180:200] + "".join(
        "ACGT"[(ord(c) % 4 + 1) % 4] for c in genome[200:210]
    )
    reads = _windows(genome, 60) * 10 + _windows(branch, 25)
    _assert_parity(_unitigs_from_reads(reads, k), k, 2 * k, 2 * k)


def test_parity_bubble_scenario():
    k = 15
    genome = decode_seq(simulate_genome(300, seed=92))
    pos = 150
    alt = "ACGT"[("ACGT".index(genome[pos]) + 1) % 4]
    variant = genome[:pos] + alt + genome[pos + 1 :]
    for fwd, var in [(7, 3), (5, 5), (3, 7)]:
        reads = _windows(genome, 60) * fwd + _windows(variant, 60) * var
        _assert_parity(_unitigs_from_reads(reads, k), k, 2 * k, 2 * k)


def test_parity_island_scenario():
    from genome_assembler_tpu.host.dbg import Unitig

    def twins(seq, cov, k):
        edges = len(seq) - k + 1
        return [
            Unitig(seq=seq, cov_sum=int(cov * edges), edges=edges, k=k),
            Unitig(
                seq=revcomp_str(seq), cov_sum=int(cov * edges), edges=edges,
                k=k,
            ),
        ]

    k = 15
    rng = np.random.default_rng(3)
    main = decode_seq(rng.integers(0, 4, 80).astype(np.uint8))
    island = decode_seq(rng.integers(0, 4, 25).astype(np.uint8))
    for island_cov in (6.0, 60.0):
        unitigs = twins(main, 100.0, k) + twins(island, island_cov, k)
        _assert_parity(unitigs, k, 30, 30, min_count=5)


def test_parity_circular_genome():
    k = 15
    genome = decode_seq(simulate_genome(200, seed=77))
    circ = genome + genome[: k + 20]  # wrap-around reads close the cycle
    reads = _windows(circ, 60) * 4
    _assert_parity(_unitigs_from_reads(reads, k), k, 2 * k, 2 * k)


def test_parity_repeat_branching():
    """A long repeat creates real junctions that survive simplification."""
    k = 15
    a = decode_seq(simulate_genome(120, seed=41))
    rep = decode_seq(simulate_genome(60, seed=42))
    b = decode_seq(simulate_genome(120, seed=43))
    c = decode_seq(simulate_genome(120, seed=44))
    genome = a + rep + b + rep + c
    reads = _windows(genome, 50) * 5
    _assert_parity(_unitigs_from_reads(reads, k), k, 2 * k, 2 * k)


@settings(max_examples=25, deadline=None)
@given(st.data())
def test_parity_random_branchy(data):
    """Random genomes + error reads: array path == Python path."""
    k = 11
    rng_seed = data.draw(st.integers(0, 2**31 - 1))
    glen = data.draw(st.integers(60, 400))
    depth = data.draw(st.integers(2, 6))
    n_errors = data.draw(st.integers(0, 8))
    rng = np.random.default_rng(rng_seed)
    genome = decode_seq(rng.integers(0, 4, glen).astype(np.uint8))
    reads = _windows(genome, min(40, glen)) * depth
    # inject substitution errors to create tips/bubbles
    reads = list(reads)
    for _ in range(n_errors):
        i = int(rng.integers(0, len(reads)))
        r = list(reads[i])
        p = int(rng.integers(0, len(r)))
        r[p] = "ACGT"[int(rng.integers(0, 4))]
        reads[i] = "".join(r)
    unitigs = _unitigs_from_reads(reads, k)
    _assert_parity(unitigs, k, 2 * k, 2 * k, min_count=1)


def test_parity_empty_input():
    _assert_parity([], 15, 30, 30)


def test_parity_all_unitigs_doomed():
    """Four equal-coverage tips through one junction: every unitig dies in
    one round. The array path must return an empty graph (it used to
    crash in the final materialization), matching the normative path."""
    from genome_assembler_tpu.host.dbg import Unitig

    k = 5

    def u(seq, cov=2):
        edges = len(seq) - k + 1
        return Unitig(seq=seq, cov_sum=cov * edges, edges=edges, k=k)

    unitigs = [
        u("AAAAACGT"),  # ends at node ACGT (start dead)
        u("CCCCACGT"),  # ends at node ACGT (start dead)
        u("ACGTGGGG"),  # starts at node ACGT (end dead)
        u("ACGTTCTC"),  # starts at node ACGT (end dead)
    ]
    _assert_parity(unitigs, k, 2 * k, 2 * k)


def test_parity_bubble_revcomp_twin_tie_after_merge():
    """Bubble arms that are revcomp twins tie on coverage AND canonical
    sequence; the final raw-sequence tie-break must pick the same arm on
    both paths even after earlier rounds reorder the array path's unitigs
    (a tip removal + chain merge precedes the bubble round here)."""
    from genome_assembler_tpu.host.dbg import Unitig

    k = 5

    def u(seq, cov):
        edges = len(seq) - k + 1
        return Unitig(seq=seq, cov_sum=cov * edges, edges=edges, k=k)

    unitigs = [
        u("ACGTTACGT", 2),  # arm B: ACGT -> ACGT, canonical == arm A's
        u("ACGTAACGT", 2),  # arm A: revcomp of B through palindromic node
        u("GGGGCCCC", 5),  # C: ends at CCCC; tip T's higher-cov sibling
        u("TTTTCCCC", 1),  # T: tip, removed round 1
        u("CCCCAAAA", 5),  # C2: merges with C after T dies
    ]
    _assert_parity(unitigs, k, 2 * k, 2 * k)


def test_doubling_guard_rejects_oversized_tables():
    import pytest

    from genome_assembler_tpu.ops.unitig_jax import _steps_for

    assert _steps_for(1 << 29) == 30
    with pytest.raises(ValueError, match="sharded"):
        _steps_for((1 << 29) + 1)


def test_assemble_zero_survivors_yields_no_contigs():
    """A min_count above every multiplicity must yield zero contigs, not
    a crash, on the device pipeline (empty spell + empty simplify)."""
    from genome_assembler_tpu.models.pipeline import assemble_tpu
    from genome_assembler_tpu.utils.config import AssemblyConfig
    from genome_assembler_tpu.utils.dna import encode_seq

    k = 15
    genome = decode_seq(simulate_genome(200, seed=5))
    reads = np.stack([encode_seq(r) for r in _windows(genome, 60)])
    cfg = AssemblyConfig(k=k, read_len=60, min_count=1000)
    assert assemble_tpu(reads, cfg) == []

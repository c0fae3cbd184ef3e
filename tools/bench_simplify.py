"""Micro-benchmark: array-native vs Python simplification at scale.

Builds a large branchy unitig set (many error tips + bubbles hanging off
a long backbone — the shape a low-quality read set produces after
compression) and times host.simplify.simplify_unitigs (normative Python)
against host.simplify_arrays (production vectorized path) on identical
inputs, asserting identical outputs.

Run: python tools/bench_simplify.py [n_decorations]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from genome_assembler_tpu.host.dbg import Unitig, both_strand_edges, compress_unitigs  # noqa: E402
from genome_assembler_tpu.host.simplify import simplify_unitigs  # noqa: E402
from genome_assembler_tpu.host.simplify_arrays import (  # noqa: E402
    from_unitigs,
    simplify_arrays_to_graph,
)
from genome_assembler_tpu.host.traverse import emit_contigs  # noqa: E402
from genome_assembler_tpu.models.oracle import count_canonical_dict  # noqa: E402
from genome_assembler_tpu.utils.dna import decode_seq  # noqa: E402
from genome_assembler_tpu.utils.simulate import simulate_genome  # noqa: E402


def build_branchy_unitigs(n_decorations: int, k: int = 21):
    """A long backbone with n error tips + n bubbles attached."""
    rng = np.random.default_rng(7)
    glen = max(2000, n_decorations * 60)
    genome = decode_seq(simulate_genome(glen, seed=7))
    reads: list[str] = []
    L = 80
    for i in range(0, glen - L + 1, L // 4):
        reads.extend([genome[i : i + L]] * 8)
    # decorations: short divergent branches (tips) and SNP bubbles
    for j in range(n_decorations):
        p = int(rng.integers(k + 5, glen - L - 5))
        window = genome[p : p + L]
        mid = L // 2
        alt = "ACGT"[("ACGT".index(window[mid]) + 1 + (j % 3)) % 4]
        if j % 2 == 0:  # tip: error near the end of a read
            reads.append(window[: mid + 1 - (j % 5)] + alt)
        else:  # bubble: error mid-read, covered by 3 copies
            reads.extend([window[:mid] + alt + window[mid + 1 :]] * 3)
    counts = count_canonical_dict(reads, k)
    return compress_unitigs(both_strand_edges(counts), k), k


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    unitigs, k = build_branchy_unitigs(n)
    print(f"unitigs: {len(unitigs)}  (decorations requested: {n})")

    t0 = time.perf_counter()
    ua = from_unitigs(unitigs, k)
    pack_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    g_arr = simplify_arrays_to_graph(ua, 2 * k, 2 * k, 1)
    arr_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    g_py = simplify_unitigs(list(unitigs), k, 2 * k, 2 * k, 1)
    py_s = time.perf_counter() - t0

    same = sorted((u.seq, u.cov_sum, u.edges) for u in g_py.unitigs) == sorted(
        (u.seq, u.cov_sum, u.edges) for u in g_arr.unitigs
    )
    same &= emit_contigs(g_py) == emit_contigs(g_arr)
    print(
        f"python: {py_s:.3f}s   arrays: {arr_s:.3f}s (+{pack_s:.3f}s pack)   "
        f"speedup: {py_s / arr_s:.1f}x   outputs equal: {same}"
    )
    print(f"surviving unitigs: {len(g_arr.unitigs)}")
    return 0 if same else 1


if __name__ == "__main__":
    sys.exit(main())

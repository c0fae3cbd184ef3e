"""Eulerian traversal + contig emission (reference C8/C9).

Hierholzer's algorithm over the *unitig* graph (each unitig is one edge),
per SURVEY.md §3.4: the non-branching 95% was already compressed, so this
walks thousands of edges, not millions. Deterministic by construction:
  * start nodes: maximize available (out - in) imbalance, tie-break on the
    lexicographically smallest node label;
  * edge choice: lexicographically smallest unitig sequence (then id).
Repeats until every unitig edge is consumed; each walk spells one contig.

Contigs are reported canonically (min of sequence and its reverse
complement), deduplicated — the strand-symmetric graph yields every walk
twice, once per strand — and sorted by (length desc, sequence asc), matching
the acceptance bar "equality up to reverse-complement and contig ordering"
(BASELINE.md).
"""

from __future__ import annotations

from ..utils.dna import canonical_str
from .dbg import UnitigGraph


def euler_walks(g: UnitigGraph) -> list[list[int]]:
    """Decompose the unitig graph into deterministic edge-covering walks."""
    unused: dict[str, list[int]] = {
        node: sorted(ids, key=lambda i: (g.unitigs[i].seq, i), reverse=True)
        for node, ids in g.out_adj.items()
    }
    out_avail = {node: len(ids) for node, ids in unused.items()}
    in_avail: dict[str, int] = {}
    for node, ids in g.in_adj.items():
        in_avail[node] = len(ids)

    remaining = sum(out_avail.values())
    walks: list[list[int]] = []
    while remaining:
        # Start preference: most positive (out - in) imbalance, then smallest
        # node label — an Eulerian path start when one exists.
        start = min(
            (n for n, c in out_avail.items() if c > 0),
            key=lambda n: (-(out_avail[n] - in_avail.get(n, 0)), n),
        )
        stack: list[tuple[str, int]] = [(start, -1)]
        circuit: list[int] = []
        while stack:
            node, _ = stack[-1]
            ids = unused.get(node)
            if ids:
                eid = ids.pop()
                out_avail[node] -= 1
                u = g.unitigs[eid]
                in_avail[u.end] = in_avail.get(u.end) - 1
                stack.append((u.end, eid))
                remaining -= 1
            else:
                _, eid = stack.pop()
                if eid >= 0:
                    circuit.append(eid)
        circuit.reverse()
        walks.append(circuit)
    return walks


def spell_walk(g: UnitigGraph, walk: list[int]) -> str:
    parts = [g.unitigs[walk[0]].seq]
    overlap = g.k - 1
    parts.extend(g.unitigs[eid].seq[overlap:] for eid in walk[1:])
    return "".join(parts)


def emit_contigs(g: UnitigGraph, min_len: int | None = None) -> list[str]:
    """Walks -> canonical, deduplicated, deterministically ordered contigs."""
    min_len = g.k if min_len is None else min_len
    seen: set[str] = set()
    contigs: list[str] = []
    for walk in euler_walks(g):
        seq = canonical_str(spell_walk(g, walk))
        if len(seq) >= min_len and seq not in seen:
            seen.add(seq)
            contigs.append(seq)
    contigs.sort(key=lambda s: (-len(s), s))
    return contigs


def canonicalize_contigs(contigs: list[str]) -> list[str]:
    """Normalize any contig list for comparison (canonical, dedup, sorted)."""
    out = sorted({canonical_str(c) for c in contigs}, key=lambda s: (-len(s), s))
    return out


def contigs_equal(a: list[str], b: list[str]) -> bool:
    """Equality up to reverse complement and contig ordering (BASELINE.md)."""
    return canonicalize_contigs(a) == canonicalize_contigs(b)

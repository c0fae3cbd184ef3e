"""Tip and bubble removal on the unitig graph (reference C6/C7).

Runs on the host over the compressed unitig graph — after compression the
branchy residue is thousands of unitigs, not millions of k-mers
(SURVEY.md §7 M4), so plain Python is fine here.

Rules (normative, strand-symmetric, deterministic — SURVEY.md §7 hard parts):

Tip: a unitig with exactly one dead end (no unitig feeds its start, or none
leaves its end), at most ``tip_len`` k-mer edges long, attached at its live
end to a junction that has an alternative branch in the same direction with
coverage >= the tip's. All qualifying tips are removed simultaneously per
round, which preserves strand symmetry (a tip's reverse-complement twin
always qualifies in the same round).

Bubble: >= 2 unitig arms sharing both endpoints (start node s, end node t),
each at most ``bubble_len`` edges. Keep the arm with the highest coverage,
tie-broken by smallest *canonical* sequence (canonical, not raw, so the
choice agrees between a bubble and its reverse-complement twin bubble);
delete the rest.

Both passes iterate (removal can expose new tips / merge through bubbles)
until a fixpoint, with recompression between rounds.
"""

from __future__ import annotations

from ..utils.dna import canonical_str
from .dbg import (
    UnitigGraph,
    both_strand_edges,
    build_unitig_graph,
    compress_unitigs,
    unitig_kmers,
)

_MAX_ROUNDS = 64


def _find_tips(g: UnitigGraph, tip_len: int) -> list[int]:
    tips: list[int] = []
    for i, u in enumerate(g.unitigs):
        if u.edges > tip_len:
            continue
        start_dead = len(g.in_ids(u.start)) == 0
        end_dead = len(g.out_ids(u.end)) == 0
        if start_dead == end_dead:
            # both dead: isolated contig, keep; neither dead: internal chain.
            continue
        if start_dead:
            # Tip flows into junction t == u.end; alternatives are other
            # unitigs that also flow into t.
            siblings = [j for j in g.in_ids(u.end) if j != i]
        else:
            siblings = [j for j in g.out_ids(u.start) if j != i]
        if any(g.unitigs[j].cov >= u.cov for j in siblings):
            tips.append(i)
    return tips


def _find_bubble_losers(g: UnitigGraph, bubble_len: int) -> list[int]:
    groups: dict[tuple[str, str], list[int]] = {}
    for i, u in enumerate(g.unitigs):
        if u.edges <= bubble_len:
            groups.setdefault((u.start, u.end), []).append(i)
    losers: list[int] = []
    for arms in groups.values():
        if len(arms) < 2:
            continue
        # Keep max coverage, tie-break smallest canonical sequence.
        keep = max(
            arms,
            key=lambda i: (g.unitigs[i].cov, _neg_canon(g.unitigs[i].seq)),
        )
        losers.extend(i for i in arms if i != keep)
    return losers


class _neg_canon:
    """Order-reversing wrapper so max() prefers the *smallest* canonical seq."""

    __slots__ = ("s",)

    def __init__(self, seq: str) -> None:
        self.s = canonical_str(seq)

    def __lt__(self, other: "_neg_canon") -> bool:
        return self.s > other.s

    def __eq__(self, other: object) -> bool:
        return isinstance(other, _neg_canon) and self.s == other.s


def simplify_edges(
    edges: dict[str, int], k: int, tip_len: int, bubble_len: int
) -> dict[str, int]:
    """Iterate tip + bubble removal to fixpoint on the directed edge dict."""
    for _ in range(_MAX_ROUNDS):
        g = build_unitig_graph(compress_unitigs(edges, k), k)
        doomed = _find_tips(g, tip_len)
        if not doomed:
            doomed = _find_bubble_losers(g, bubble_len)
        if not doomed:
            return edges
        for i in doomed:
            for kmer in unitig_kmers(g.unitigs[i]):
                edges.pop(kmer, None)
    return edges


def simplify_counts(
    canonical_counts: dict[str, int],
    k: int,
    tip_len: int,
    bubble_len: int,
) -> UnitigGraph:
    """Canonical counts -> simplified strand-symmetric unitig graph."""
    edges = both_strand_edges(canonical_counts)
    edges = simplify_edges(edges, k, tip_len, bubble_len)
    return build_unitig_graph(compress_unitigs(edges, k), k)

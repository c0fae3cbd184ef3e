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


def _canonical_kmer_keys(seq: str, k: int) -> "np.ndarray":
    """Packed canonical k-mer keys of a sequence as a u64-column array."""
    from ..ops.kmer_ref import _to_u64_cols, extract_canonical_np
    from ..utils.dna import encode_seq

    codes = encode_seq(seq)[None, :]
    return _to_u64_cols(extract_canonical_np(codes, k))


def emit_contigs(g: UnitigGraph, min_len: int | None = None) -> list[str]:
    """Simplified unitigs -> canonical, deduplicated, ordered contigs."""
    return [seq for seq, _ in emit_contigs_with_cov(g, min_len)]


def emit_contigs_with_cov(
    g: UnitigGraph, min_len: int | None = None
) -> list[tuple[str, float]]:
    """Contigs with their mean k-mer coverage (for FASTA headers/reports).

    Contigs are the maximal unambiguous sequences: the simplified unitigs.
    Stitching through a branching junction would pick an arbitrary pairing
    of in/out edges (repeats longer than k-1 make the continuation
    genuinely ambiguous — and the choice differs between a walk and its
    reverse-complement mirror), so, as in production assemblers, contigs
    stop at junctions; non-branching runs were already merged by unitig
    compression, which is exactly the Eulerian path on every clean
    component (SURVEY.md §3.4 restructuring).

    Strand handling: the unitig set is perfectly strand-symmetric, so
    canonical-sequence dedupe collapses each reverse-complement twin pair.
    Circular unitigs (start node == end node) linearize at an arbitrary
    strand-dependent break; they are re-linearized at the lexicographically
    least rotation over both strands (Booth) before dedupe.
    """
    from ..utils.dna import canonical_cycle

    min_len = g.k if min_len is None else min_len
    overlap = g.k - 1
    seen: set[str] = set()
    contigs: list[tuple[str, float]] = []
    for u in g.unitigs:
        if u.start == u.end and u.edges > 1:
            # circular: drop the duplicated (k-1)-overlap, canonicalize the
            # rotation, and re-wrap for a linear representation
            core = canonical_cycle(u.seq[: len(u.seq) - overlap])
            seq = core + core[:overlap]
        else:
            seq = canonical_str(u.seq)
        if len(seq) >= min_len and seq not in seen:
            seen.add(seq)
            contigs.append((seq, u.cov))
    contigs.sort(key=lambda sc: (-len(sc[0]), sc[0]))
    return contigs


def canonicalize_contigs(contigs: list[str]) -> list[str]:
    """Normalize any contig list for comparison (canonical, dedup, sorted)."""
    out = sorted({canonical_str(c) for c in contigs}, key=lambda s: (-len(s), s))
    return out


def contigs_equal(a: list[str], b: list[str]) -> bool:
    """Equality up to reverse complement and contig ordering (BASELINE.md)."""
    return canonicalize_contigs(a) == canonicalize_contigs(b)


def kmer_content_equal(contigs: list[str], genome: str, k: int) -> bool:
    """Contigs spell exactly the genome's canonical k-mer set, once.

    The honest bar when repeats shorter than the genome but longer than
    k-1 make single-contig reconstruction ambiguous (BASELINE.md CFG 3
    "repeat-induced branching"): every genome k-mer present, no foreign
    k-mers, and no k-mer spelled by two contigs (i.e. total length is the
    genome's plus the k-1 overlap loss per extra contig, up to the repeat
    multiplicity ambiguity).
    """
    import numpy as np

    want = np.unique(_canonical_kmer_keys(genome, k), axis=0)
    got_parts = [_canonical_kmer_keys(c, k) for c in contigs if len(c) >= k]
    if not got_parts:
        return len(want) == 0
    got_all = np.concatenate(got_parts)
    got = np.unique(got_all, axis=0)
    if got.shape != want.shape or not (got == want).all():
        return False
    # each k-mer spelled at most ~once beyond repeat multiplicity: total
    # spelled k-mer instances should not exceed the genome's window count
    total_windows = sum(len(c) - k + 1 for c in contigs if len(c) >= k)
    return total_windows <= (len(genome) - k + 1)

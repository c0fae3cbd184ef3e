"""Eulerian traversal API (reference C8): euler_walks + spell_walk.

Contig emission stops at ambiguous junctions (unitigs), but the Eulerian
machinery remains a first-class capability: deterministic edge-covering
walks over the unitig graph, usable for scaffolding/inspection.
"""

from genome_assembler_tpu.host.dbg import (
    both_strand_edges,
    build_unitig_graph,
    compress_unitigs,
)
from genome_assembler_tpu.host.traverse import euler_walks, spell_walk
from genome_assembler_tpu.models.oracle import count_canonical_dict
from genome_assembler_tpu.utils.dna import canonical_str, revcomp_str
from genome_assembler_tpu.utils.simulate import simulate_genome, simulate_reads
from genome_assembler_tpu.utils.dna import decode_seq


def _graph_for(genome, k, coverage=20, read_len=80, seed=9):
    rs = simulate_reads(
        genome, coverage=coverage, read_len=read_len, seed=seed
    )
    counts = count_canonical_dict(rs.codes, k)
    edges = both_strand_edges(counts)
    return build_unitig_graph(compress_unitigs(edges, k), k)


def test_clean_genome_single_walk_per_strand():
    genome = simulate_genome(1500, seed=241)
    g = _graph_for(genome, 25)
    walks = euler_walks(g)
    spelled = {canonical_str(spell_walk(g, w)) for w in walks}
    assert spelled == {canonical_str(decode_seq(genome))}


def test_walks_cover_every_unitig_exactly_once():
    # a repeat-bearing genome: multiple walks, each edge consumed once
    import numpy as np

    rep = simulate_genome(120, seed=251)
    genome = np.concatenate(
        [simulate_genome(500, 252), rep, simulate_genome(400, 253), rep,
         simulate_genome(300, 254)]
    )
    g = _graph_for(genome, 21)
    walks = euler_walks(g)
    used = [eid for w in walks for eid in w]
    assert sorted(used) == list(range(len(g.unitigs)))


def test_walks_deterministic():
    genome = simulate_genome(900, seed=261)
    g1 = _graph_for(genome, 21)
    g2 = _graph_for(genome, 21)
    w1 = [spell_walk(g1, w) for w in euler_walks(g1)]
    w2 = [spell_walk(g2, w) for w in euler_walks(g2)]
    assert w1 == w2


def test_walk_spelling_overlap():
    genome = simulate_genome(600, seed=271)
    g = _graph_for(genome, 21)
    for walk in euler_walks(g):
        seq = spell_walk(g, walk)
        # walk spelling = sum of unitig bodies + one (k-1) head
        expect = sum(g.unitigs[e].edges for e in walk) + 20
        assert len(seq) == expect
        # consecutive unitigs overlap by k-1
        for a, b in zip(walk, walk[1:]):
            assert g.unitigs[a].end == g.unitigs[b].start

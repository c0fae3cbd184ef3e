"""Contig stats (N50) + GFA export."""

import io

from genome_assembler_tpu.host.dbg import both_strand_edges, compress_unitigs, build_unitig_graph
from genome_assembler_tpu.host.stats import contig_stats, write_gfa
from genome_assembler_tpu.models.oracle import count_canonical_dict
from genome_assembler_tpu.utils.simulate import simulate_genome, simulate_reads


def test_contig_stats_basic():
    s = contig_stats(["A" * 100, "C" * 50, "G" * 50])
    assert s["contigs"] == 3
    assert s["total_bp"] == 200
    assert s["n50"] == 100 and s["l50"] == 1
    assert s["max_len"] == 100 and s["min_len"] == 50


def test_contig_stats_empty():
    assert contig_stats([])["n50"] == 0


def test_n50_even_split():
    s = contig_stats(["A" * 60, "C" * 40, "G" * 40, "T" * 20])
    # total 160, half 80: 60+40 >= 80 -> n50 = 40, l50 = 2
    assert s["n50"] == 40 and s["l50"] == 2


def test_gfa_output():
    genome = simulate_genome(500, seed=81)
    rs = simulate_reads(genome, coverage=10, read_len=80, seed=82)
    counts = count_canonical_dict(rs.codes, 21)
    g = build_unitig_graph(
        compress_unitigs(both_strand_edges(counts), 21), 21
    )
    buf = io.StringIO()
    write_gfa(g, buf)
    lines = buf.getvalue().splitlines()
    assert lines[0] == "H\tVN:Z:1.0"
    s_lines = [l for l in lines if l.startswith("S\t")]
    l_lines = [l for l in lines if l.startswith("L\t")]
    assert len(s_lines) == len(g.unitigs)
    # every link references existing segments and k-1 overlap
    names = {l.split("\t")[1] for l in s_lines}
    for link in l_lines:
        parts = link.split("\t")
        assert parts[1] in names and parts[3] in names
        assert parts[5] == "20M"

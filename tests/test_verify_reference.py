"""verify-reference harness (SURVEY.md §0 / VERDICT r1 item 5).

/root/reference is still empty, so the harness is exercised against a fake
mini-reference: a tiny standalone Python assembler written to the same
normative semantics. When the real mount populates, the identical plumbing
runs against it with zero code changes.
"""

from __future__ import annotations

import os
import textwrap

from genome_assembler_tpu.verify_reference import (
    find_entry,
    find_read_sets,
    parse_contig_output,
    verify,
)

# A miniature "reference assembler": error-free path only — dict counting,
# both-strand graph, unitig emission — matching the oracle's semantics so
# parity holds on clean reads.
FAKE_REFERENCE = '''
import sys

def revcomp(s):
    return s[::-1].translate(str.maketrans("ACGT", "TGCA"))

def main():
    k = 25
    reads = [ln.strip() for ln in open(sys.argv[1]) if ln.strip()]
    counts = {}
    for r in reads:
        for i in range(len(r) - k + 1):
            km = r[i:i + k]
            km = min(km, revcomp(km))
            counts[km] = counts.get(km, 0) + 1
    edges = {}
    for km, c in counts.items():
        edges[km] = c
        edges[revcomp(km)] = c
    out = {}
    indeg = {}
    for e in edges:
        out.setdefault(e[:-1], []).append(e)
        indeg[e[1:]] = indeg.get(e[1:], 0) + 1
    for v in out.values():
        v.sort()
    def junction(n):
        return indeg.get(n, 0) != 1 or len(out.get(n, ())) != 1
    done = set()
    contigs = []
    for e in sorted(edges):
        if e in done or not junction(e[:-1]):
            continue
        chain = [e]
        done.add(e)
        node = e[1:]
        while not junction(node):
            nxt = out[node][0]
            if nxt in done:
                break
            chain.append(nxt)
            done.add(nxt)
            node = nxt[1:]
        seq = chain[0] + "".join(c[-1] for c in chain[1:])
        contigs.append(min(seq, revcomp(seq)))
    contigs = sorted(set(contigs), key=lambda s: (-len(s), s))
    for i, c in enumerate(contigs):
        print(f">contig_{i}")
        print(c)

if __name__ == "__main__":
    main()
'''


def _make_fake_reference(tmp_path):
    ref = tmp_path / "reference"
    ref.mkdir()
    (ref / "assembler.py").write_text(textwrap.dedent(FAKE_REFERENCE))
    (ref / "README.md").write_text("fake reference\n")
    return str(ref)


def test_empty_mount_reports_empty(tmp_path):
    empty = tmp_path / "empty"
    empty.mkdir()
    report = verify(str(empty))
    assert report["status"] == "empty"


def test_real_mount_is_checked_every_session():
    """The standing SURVEY.md §0 check: if /root/reference ever populates,
    this test fails loudly so the session runs the real parity harness."""
    ref = "/root/reference"
    if os.path.isdir(ref) and any(os.scandir(ref)):
        raise AssertionError(
            "/root/reference is POPULATED — run "
            "`ga-tpu verify-reference /root/reference` and validate "
            "SURVEY.md against the real files before anything else"
        )


def test_find_entry_prefers_assembler_py(tmp_path):
    ref = _make_fake_reference(tmp_path)
    assert find_entry(ref).endswith("assembler.py")


def test_find_read_sets(tmp_path):
    ref = _make_fake_reference(tmp_path)
    os.makedirs(os.path.join(ref, "tests", "data"))
    with open(os.path.join(ref, "tests", "data", "toy.txt"), "w") as fh:
        fh.write("ACGT\n")
    assert find_read_sets(ref) == [
        os.path.join(ref, "tests", "data", "toy.txt")
    ]


def test_parse_contig_output_fasta_and_lines():
    assert parse_contig_output(">a\nACGT\nTTTT\n>b\nGGGG\n") == [
        "ACGTTTTT",
        "GGGG",
    ]
    assert parse_contig_output("loading...\nACGT\nGGGG\n") == ["ACGT", "GGGG"]


def test_verify_parity_against_fake_reference(tmp_path):
    ref = _make_fake_reference(tmp_path)
    report = verify(ref, k=25)
    assert report["status"] == "pass", report
    run = report["runs"][0]
    assert run["equal"]["oracle"] is True
    assert run["equal"]["tpu"] is True
    assert run["reference_contigs"] >= 1


def test_verify_detects_mismatch(tmp_path):
    """A reference that prints a wrong contig must yield MISMATCH."""
    ref = tmp_path / "badref"
    ref.mkdir()
    (ref / "assembler.py").write_text(
        "print('>c0')\nprint('ACGT' * 30)\n"
    )
    report = verify(str(ref), k=25)
    assert report["status"] == "MISMATCH"


def test_find_entry_deep_sibling_dirs(tmp_path):
    """Many sibling dirs before the entry: depth, not walk order, bounds
    the search (r2 review fix)."""
    ref = tmp_path / "ref"
    for name in ("a1", "a2", "a3", "a4"):
        (ref / name).mkdir(parents=True)
        (ref / name / "data.txt").write_text("x")
    (ref / "zz").mkdir()
    (ref / "zz" / "assembler.py").write_text("def main():\n    pass\n")
    assert find_entry(str(ref)).endswith("assembler.py")


def _write_replay_reference(tmp_path, contigs, name="reference"):
    """A fake reference that prints a fixed contig set (FASTA).

    Replay style: the contig semantics under test (euler vs unitig
    emission) are pinned elsewhere (test_euler_emission.py); here the
    harness's job is to DISCOVER which (k, emit) combination reproduces
    an arbitrary reference's output without operator flags (VERDICT r2
    item 4).
    """
    ref = tmp_path / name
    ref.mkdir()
    body = ["import sys", "sys.argv  # reads path ignored: replay output"]
    for i, c in enumerate(contigs):
        body.append(f"print('>contig_{i}')")
        body.append(f"print({c!r})")
    (ref / "assembler.py").write_text("\n".join(body) + "\n")
    return str(ref)


def _branchy_reads(tmp_path):
    """Error-free reads from a genome with a 60 bp exact repeat: at k=25
    the repeat is longer than k, so the graph branches and euler emission
    differs from unitig emission."""
    import numpy as np

    from genome_assembler_tpu.utils.dna import decode_seq

    rng = np.random.default_rng(7)

    def seg(n):
        return decode_seq(rng.integers(0, 4, n).astype(np.uint8))

    rep = seg(60)
    genome = seg(300) + rep + seg(300) + rep + seg(300)
    reads = [genome[i:i + 100] for i in range(0, len(genome) - 99, 4)]
    path = tmp_path / "branchy_reads.txt"
    path.write_text("\n".join(reads) + "\n")
    return str(path), reads


def test_sweep_matches_euler_emitting_reference(tmp_path):
    """A branchy, euler-emitting reference is matched unattended: the
    harness sweeps emission modes and reports euler as the match."""
    from genome_assembler_tpu.host.traverse import canonicalize_contigs
    from genome_assembler_tpu.models.oracle import assemble_oracle
    from genome_assembler_tpu.utils.config import AssemblyConfig

    reads_path, reads = _branchy_reads(tmp_path)
    cfg = AssemblyConfig(k=25, min_count=1, read_len=100)
    euler = assemble_oracle(reads, cfg, fast_count=False, emit="euler")
    unitigs = assemble_oracle(reads, cfg, fast_count=False, emit="unitigs")
    # the read set must actually discriminate the two modes
    assert canonicalize_contigs(euler) != canonicalize_contigs(unitigs)

    ref = _write_replay_reference(tmp_path, euler)
    report = verify(ref, reads_path=reads_path)
    assert report["status"] == "pass", report
    run = report["runs"][0]
    assert run["matched"]["oracle"] == {"k": 25, "emit": "euler"}
    assert run["matched"]["tpu"] == {"k": 25, "emit": "euler"}


def test_sweep_matches_nondefault_k_reference(tmp_path):
    """A reference running k=31 is matched by the k sweep even though the
    harness's first-tried k stays at the default 25."""
    from genome_assembler_tpu.models.oracle import assemble_oracle
    from genome_assembler_tpu.utils.config import AssemblyConfig

    reads_path, reads = _branchy_reads(tmp_path)
    cfg = AssemblyConfig(k=31, min_count=1, read_len=100)
    unitigs = assemble_oracle(reads, cfg, fast_count=False, emit="unitigs")
    ref = _write_replay_reference(tmp_path, unitigs)
    report = verify(ref, reads_path=reads_path, backends=("oracle",))
    assert report["status"] == "pass", report
    matched = report["runs"][0]["matched"]["oracle"]
    assert matched["k"] == 31


def test_cmd_without_detectable_entry(tmp_path):
    """--cmd drives a non-Python reference even when no entry is found."""
    ref = tmp_path / "shref"
    ref.mkdir()
    (ref / "run.sh").write_text(f"#!/bin/sh\ncat {ref}/genome.txt\n")
    (ref / "genome.txt").write_text("ACGTACGTACGTACGTACGTACGTACGT\n")
    report = verify(
        str(ref), cmd=f"sh {ref}/run.sh {{reads}}", k=25,
        backends=("oracle",),
    )
    # it ran and compared (mismatch expected: the fake prints a fixed seq)
    assert report["status"] in ("pass", "MISMATCH")
    assert report["runs"][0]["reference_contigs"] == 1

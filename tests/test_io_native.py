"""Native C++ read loader vs the Python parser."""

import numpy as np
import pytest

from genome_assembler_tpu.cli import read_sequences
from genome_assembler_tpu.utils import io_native
from genome_assembler_tpu.utils.dna import decode_seq, encode_seq
from genome_assembler_tpu.utils.simulate import simulate_genome, simulate_reads

pytestmark = pytest.mark.skipif(
    not io_native.available(), reason="native toolchain unavailable"
)


def _write_reads(path, rows, fasta=False, wrap=None):
    with open(path, "w") as fh:
        for i, row in enumerate(rows):
            s = decode_seq(row)
            if fasta:
                fh.write(f">read_{i} comment text\n")
                if wrap:
                    for j in range(0, len(s), wrap):
                        fh.write(s[j : j + wrap] + "\n")
                    continue
            fh.write(s + "\n")


@pytest.fixture
def readset():
    genome = simulate_genome(1000, seed=71)
    return simulate_reads(genome, coverage=5, read_len=80, seed=72)


def test_plain_lines(tmp_path, readset):
    path = str(tmp_path / "reads.txt")
    _write_reads(path, readset.codes)
    got = io_native.load_reads(path)
    np.testing.assert_array_equal(got, readset.codes)


def test_fasta_multiline(tmp_path, readset):
    path = str(tmp_path / "reads.fa")
    _write_reads(path, readset.codes, fasta=True, wrap=37)
    got = io_native.load_reads(path)
    np.testing.assert_array_equal(got, readset.codes)
    # agrees with the Python parser
    want = [decode_seq(r) for r in readset.codes]
    assert read_sequences(path) == want


def test_ragged_returns_none(tmp_path):
    path = str(tmp_path / "ragged.txt")
    with open(path, "w") as fh:
        fh.write("ACGT\nACGTACGT\n")
    assert io_native.load_reads(path) is None


def test_invalid_base_encodes_to_invalid_code(tmp_path):
    # r1 bailed to the Python parser on Ns; r2 masks them (VERDICT item 7)
    from genome_assembler_tpu.utils.dna import INVALID_CODE

    path = str(tmp_path / "bad.txt")
    with open(path, "w") as fh:
        fh.write("ACGTN\nACGTA\n")
    out = io_native.load_reads(path)
    assert out is not None
    assert list(out[0]) == [0, 1, 2, 3, INVALID_CODE]
    assert list(out[1]) == [0, 1, 2, 3, 0]


def test_missing_file_returns_none(tmp_path):
    assert io_native.load_reads(str(tmp_path / "nope.txt")) is None


def test_decode_native_matches():
    codes = encode_seq("ACGTTGCAAC")
    assert io_native.decode_seq_native(codes) == "ACGTTGCAAC"


def test_lowercase_fasta(tmp_path):
    path = str(tmp_path / "lc.fa")
    with open(path, "w") as fh:
        fh.write(">r0\nacgtacgt\n>r1\nTTGGCCAA\n")
    got = io_native.load_reads(path)
    want = np.stack([encode_seq("ACGTACGT"), encode_seq("TTGGCCAA")])
    np.testing.assert_array_equal(got, want)

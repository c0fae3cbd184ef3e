"""CLI surface tests (in-process main(), no subprocess for speed)."""

import json

import numpy as np
import pytest

from genome_assembler_tpu.cli import main, read_sequences
from genome_assembler_tpu.host.traverse import contigs_equal


@pytest.fixture
def sim_files(tmp_path):
    reads = str(tmp_path / "reads.txt")
    genome = str(tmp_path / "genome.fa")
    rc = main([
        "simulate", "--genome-len", "3000", "--coverage", "30",
        "--read-len", "100", "--out", reads, "--genome-out", genome,
    ])
    assert rc == 0
    return reads, genome


def test_simulate_assemble_roundtrip(sim_files, tmp_path):
    reads, genome = sim_files
    out = str(tmp_path / "contigs.fa")
    rc = main(["assemble", "--reads", reads, "-k", "25", "--out", out])
    assert rc == 0
    assert contigs_equal(read_sequences(out), read_sequences(genome))


def test_tpu_backend_with_metrics_and_checkpoint(sim_files, tmp_path):
    reads, genome = sim_files
    out = str(tmp_path / "contigs.fa")
    ckpt = str(tmp_path / "table.npz")
    mjson = str(tmp_path / "metrics.json")
    rc = main([
        "assemble", "--reads", reads, "-k", "25", "--backend", "tpu",
        "--out", out, "--checkpoint", ckpt, "--metrics-out", mjson,
    ])
    assert rc == 0
    assert contigs_equal(read_sequences(out), read_sequences(genome))
    metrics = json.load(open(mjson))
    assert metrics["stages_s"]["count"] > 0
    # resume path
    out2 = str(tmp_path / "contigs2.fa")
    rc = main([
        "assemble", "--reads", reads, "-k", "25", "--backend", "tpu",
        "--out", out2, "--resume-from", ckpt,
    ])
    assert rc == 0
    assert read_sequences(out2) == read_sequences(out)


def test_dist_backend(sim_files, tmp_path):
    reads, genome = sim_files
    out = str(tmp_path / "contigs.fa")
    rc = main([
        "assemble", "--reads", reads, "-k", "25", "--backend", "dist",
        "--devices", "4", "--out", out,
    ])
    assert rc == 0
    assert contigs_equal(read_sequences(out), read_sequences(genome))


def test_assemble_inline_simulation(tmp_path):
    out = str(tmp_path / "c.fa")
    rc = main([
        "assemble", "--genome-len", "2000", "--coverage", "25",
        "-k", "21", "--backend", "tpu", "--out", out,
    ])
    assert rc == 0
    assert len(read_sequences(out)) >= 1


def test_accept_cli(monkeypatch, capsys):
    monkeypatch.setenv("GA_ACCEPT_SCALE", "0.01")
    rc = main(["accept", "0"])
    out = capsys.readouterr().out.strip().splitlines()
    payload = json.loads(out[-1])
    assert payload["config"] == 0 and payload["passed"]
    assert rc == 0


def test_missing_input_errors():
    with pytest.raises(SystemExit):
        main(["assemble", "-k", "25"])


def test_ragged_reads_tpu_backend(tmp_path):
    """Ragged reads pad with masked windows -> tpu backend == oracle."""
    from genome_assembler_tpu.cli import main, read_sequences
    from genome_assembler_tpu.utils.dna import decode_seq
    from genome_assembler_tpu.utils.simulate import (
        simulate_genome,
        simulate_reads,
    )

    genome = simulate_genome(1200, seed=201)
    rs = simulate_reads(genome, coverage=15, read_len=90, seed=202)
    reads_path = tmp_path / "ragged.txt"
    with open(reads_path, "w") as fh:
        for i, row in enumerate(rs.codes):
            # vary lengths 60..90
            fh.write(decode_seq(row)[: 60 + (i % 4) * 10] + "\n")
    out_o = tmp_path / "o.fa"
    out_t = tmp_path / "t.fa"
    base = ["assemble", "--reads", str(reads_path), "-k", "25"]
    assert main(base + ["--out", str(out_o)]) == 0
    assert main(base + ["--backend", "tpu", "--out", str(out_t)]) == 0
    assert read_sequences(str(out_t)) == read_sequences(str(out_o))


def test_merge_stride_flag(sim_files, tmp_path, monkeypatch):
    """--merge-stride N (deferred-merge streaming) is bit-identical to the
    default per-batch merge, driven through the real CLI path."""
    monkeypatch.delenv("GA_MERGE_STRIDE", raising=False)
    reads, genome = sim_files
    base = ["assemble", "--reads", reads, "-k", "25", "--backend", "tpu",
            "--batch-reads", "256", "--table-capacity", "8192"]
    out1 = str(tmp_path / "c1.fa")
    out2 = str(tmp_path / "c2.fa")
    assert main(base + ["--out", out1]) == 0
    assert main(base + ["--out", out2, "--merge-stride", "2"]) == 0
    monkeypatch.delenv("GA_MERGE_STRIDE", raising=False)
    assert read_sequences(out1) == read_sequences(out2)
    assert contigs_equal(read_sequences(out1), read_sequences(genome))


def test_stats_subcommand(sim_files, capsys):
    _, genome = sim_files
    rc = main(["stats", genome])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["contigs"] == 1
    assert out["total_bp"] == out["n50"] == out["max_len"] == 3000

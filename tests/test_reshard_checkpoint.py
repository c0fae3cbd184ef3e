"""Elastic recovery: reshard a mid-stream sharded checkpoint to a new
mesh size (SURVEY.md §5 failure/elastic row, beyond same-shape restart).

A preempted pod count must be resumable on however many devices remain:
reshard_sharded_stream_checkpoint repartitions the already-counted
(key, count) rows host-side (owner = mix_words(key) % new_d), rewrites
the snapshot in the layout/geometry the new-mesh resume will expect,
and the resumed counts must equal the uninterrupted run's bit for bit.
"""

import numpy as np
import pytest

import genome_assembler_tpu.parallel.pipeline as pp
from genome_assembler_tpu.models.oracle import count_canonical_fast
from genome_assembler_tpu.parallel.mesh import build_mesh
from genome_assembler_tpu.utils.config import AssemblyConfig
from genome_assembler_tpu.utils.simulate import simulate_genome, simulate_reads


@pytest.fixture
def force_stream(monkeypatch):
    monkeypatch.setattr(pp, "DIST_STREAM_WINDOWS", 0)
    monkeypatch.setenv("GA_BUCKETS", "8")


def _reads(genome_len=2000, coverage=12, read_len=60, seed=77):
    genome = simulate_genome(genome_len, seed=seed)
    return simulate_reads(
        genome, coverage=coverage, read_len=read_len, seed=seed + 1
    ).codes


def _snapshot(reads, cfg, d, ck, monkeypatch, abort_after="3", every=2):
    monkeypatch.setenv("GA_STREAM_ABORT_AFTER_BATCH", abort_after)
    with pytest.raises(RuntimeError, match="fault injection"):
        pp.distributed_count_table(
            reads, cfg, build_mesh(d), table_capacity=8192,
            stream_checkpoint=ck, stream_checkpoint_every=every,
        )
    monkeypatch.delenv("GA_STREAM_ABORT_AFTER_BATCH")
    assert pp.is_sharded_stream_checkpoint(ck)


@pytest.mark.parametrize("old_d,new_d", [(8, 4), (2, 8)])
def test_reshard_shrink_and_grow(force_stream, tmp_path, monkeypatch,
                                 old_d, new_d):
    reads = _reads()
    cfg = AssemblyConfig(k=15, read_len=60, batch_reads=64)
    want = count_canonical_fast(reads, cfg.k)

    ck = str(tmp_path / "mid.npz")
    _snapshot(reads, cfg, old_d, ck, monkeypatch)

    ck2 = str(tmp_path / "resharded.npz")
    pp.reshard_sharded_stream_checkpoint(
        ck, ck2, reads.shape, cfg, new_d, table_capacity=8192
    )
    from genome_assembler_tpu.models.pipeline import table_to_host_counts

    table = pp.distributed_count_table(
        reads, cfg, build_mesh(new_d), table_capacity=8192,
        resume_stream_from=ck2,
    )
    assert table_to_host_counts(table, cfg.k) == want


def test_reshard_into_bucketed_layout(force_stream, tmp_path, monkeypatch):
    """Snapshot written by a flat run, resharded for a resume whose env
    selects the bucketed per-shard layout: the resharder emits the
    bucketed geometry and the resumed run accepts + matches."""
    reads = _reads()
    cfg = AssemblyConfig(k=15, read_len=60, batch_reads=64)
    want = count_canonical_fast(reads, cfg.k)

    ck = str(tmp_path / "mid_flat.npz")
    monkeypatch.setenv("GA_BUCKETED", "0")
    _snapshot(reads, cfg, 8, ck, monkeypatch)

    monkeypatch.setenv("GA_BUCKETED", "1")
    ck2 = str(tmp_path / "resharded_bkt.npz")
    pp.reshard_sharded_stream_checkpoint(
        ck, ck2, reads.shape, cfg, 4, table_capacity=8192
    )
    _, _, params = pp.load_sharded_stream_checkpoint(ck2)
    assert params["bucketed"] == 1 and params["d"] == 4
    from genome_assembler_tpu.models.pipeline import table_to_host_counts

    table = pp.distributed_count_table(
        reads, cfg, build_mesh(4), table_capacity=8192,
        resume_stream_from=ck2,
    )
    assert table_to_host_counts(table, cfg.k) == want


def test_reshard_from_bucketed_layout(force_stream, tmp_path, monkeypatch):
    reads = _reads()
    cfg = AssemblyConfig(k=15, read_len=60, batch_reads=64)
    want = count_canonical_fast(reads, cfg.k)

    ck = str(tmp_path / "mid_bkt.npz")
    monkeypatch.setenv("GA_BUCKETED", "1")
    # accum=2: keep batch 2 a merge boundary for the every=2 snapshot
    monkeypatch.setenv("GA_BUCKET_ACCUM", "2")
    _snapshot(reads, cfg, 8, ck, monkeypatch)
    monkeypatch.delenv("GA_BUCKET_ACCUM")

    monkeypatch.setenv("GA_BUCKETED", "0")
    ck2 = str(tmp_path / "resharded_flat.npz")
    pp.reshard_sharded_stream_checkpoint(
        ck, ck2, reads.shape, cfg, 2, table_capacity=8192
    )
    from genome_assembler_tpu.models.pipeline import table_to_host_counts

    table = pp.distributed_count_table(
        reads, cfg, build_mesh(2), table_capacity=8192,
        resume_stream_from=ck2,
    )
    assert table_to_host_counts(table, cfg.k) == want


def test_reshard_rejects_misaligned_cursor(force_stream, tmp_path,
                                           monkeypatch):
    reads = _reads()
    cfg = AssemblyConfig(k=15, read_len=60, batch_reads=64)
    ck = str(tmp_path / "mid.npz")
    _snapshot(reads, cfg, 8, ck, monkeypatch)
    with pytest.raises(ValueError, match="align"):
        pp.reshard_sharded_stream_checkpoint(
            ck, str(tmp_path / "out.npz"), reads.shape, cfg, 3,
            table_capacity=8192,
        )


def test_reshard_rejects_minimizer_stream(force_stream, tmp_path,
                                          monkeypatch):
    reads = _reads()
    cfg = AssemblyConfig(k=15, read_len=60, batch_reads=64)
    ck = str(tmp_path / "mid_min.npz")
    monkeypatch.setenv("GA_STREAM_ABORT_AFTER_BATCH", "3")
    with pytest.raises(RuntimeError, match="fault injection"):
        pp.distributed_count_table(
            reads, cfg, build_mesh(4), table_capacity=8192,
            minimizer_len=7, stream_checkpoint=ck,
            stream_checkpoint_every=2,
        )
    monkeypatch.delenv("GA_STREAM_ABORT_AFTER_BATCH")
    with pytest.raises(ValueError, match="minimizer"):
        pp.reshard_sharded_stream_checkpoint(
            ck, str(tmp_path / "out.npz"), reads.shape, cfg, 2,
            table_capacity=8192,
        )


def test_reshard_rejects_wrong_read_set(force_stream, tmp_path,
                                        monkeypatch):
    reads = _reads()
    cfg = AssemblyConfig(k=15, read_len=60, batch_reads=64)
    ck = str(tmp_path / "mid.npz")
    _snapshot(reads, cfg, 4, ck, monkeypatch)
    with pytest.raises(ValueError, match="total_reads"):
        pp.reshard_sharded_stream_checkpoint(
            ck, str(tmp_path / "out.npz"), (reads.shape[0] - 1, 60), cfg,
            2, table_capacity=8192,
        )


def test_reshard_cli_roundtrip(force_stream, tmp_path, monkeypatch):
    """CLI surface: dist assemble writes a mid-stream snapshot under
    fault injection; reshard-checkpoint rewrites it for a smaller mesh;
    the resumed dist assemble reproduces the uninterrupted contigs."""
    from genome_assembler_tpu.cli import main, read_sequences

    reads_f = str(tmp_path / "reads.txt")
    genome_f = str(tmp_path / "genome.fa")
    assert main([
        "simulate", "--genome-len", "2000", "--coverage", "12",
        "--read-len", "60", "--out", reads_f, "--genome-out", genome_f,
    ]) == 0
    out1 = str(tmp_path / "c_full.fa")
    base_args = [
        "assemble", "--reads", reads_f, "-k", "15", "--backend", "dist",
        "--batch-reads", "64", "--table-capacity", "8192",
    ]
    assert main(base_args + ["--devices", "8", "--out", out1]) == 0

    ck = str(tmp_path / "mid.npz")
    monkeypatch.setenv("GA_STREAM_ABORT_AFTER_BATCH", "3")
    # main() maps user-facing RuntimeErrors (incl. the injected fault)
    # to a clean nonzero exit
    assert main(base_args + [
        "--devices", "8", "--checkpoint", ck,
        "--stream-checkpoint-every", "2",
    ]) == 2
    monkeypatch.delenv("GA_STREAM_ABORT_AFTER_BATCH")
    assert pp.is_sharded_stream_checkpoint(ck)

    ck2 = str(tmp_path / "mid4.npz")
    assert main([
        "reshard-checkpoint", ck, "--out", ck2, "--devices", "4",
        "--reads", reads_f, "-k", "15", "--batch-reads", "64",
        "--table-capacity", "8192",
    ]) == 0
    out2 = str(tmp_path / "c_resumed.fa")
    assert main(base_args + [
        "--devices", "4", "--resume-from", ck2, "--out", out2,
    ]) == 0
    assert read_sequences(out2) == read_sequences(out1)

"""Mid-stream checkpointing + resume (SURVEY.md §5 failure/elastic and
checkpoint rows; VERDICT r2 item 7).

A preempted streaming COUNT run — the multi-minute stage at pod scale —
must restart from the last merge boundary, not from zero. The fault is
injected with GA_STREAM_ABORT_AFTER_BATCH (the pipeline raises after N
batches, exactly like a preemption between dispatches); resume must
reproduce the uninterrupted run byte-identically.
"""

import numpy as np
import pytest

import genome_assembler_tpu.parallel.pipeline as pp
from genome_assembler_tpu.models.pipeline import (
    assemble_tpu,
    count_reads_device,
    is_stream_checkpoint,
)
from genome_assembler_tpu.parallel.mesh import build_mesh
from genome_assembler_tpu.utils.config import AssemblyConfig
from genome_assembler_tpu.utils.simulate import simulate_genome, simulate_reads


def _reads(genome_len=2000, coverage=12, read_len=60, seed=77):
    genome = simulate_genome(genome_len, seed=seed)
    return simulate_reads(
        genome, coverage=coverage, read_len=read_len, seed=seed + 1
    ).codes


def _tables_equal(a, b):
    assert int(a.num_unique) == int(b.num_unique)
    assert np.array_equal(np.asarray(a.words), np.asarray(b.words))
    assert np.array_equal(np.asarray(a.counts), np.asarray(b.counts))
    assert bool(a.overflow) == bool(b.overflow)


@pytest.mark.parametrize("stride", [1, 2])
def test_kill_and_resume_single_device(tmp_path, monkeypatch, stride):
    reads = _reads()
    cfg = AssemblyConfig(k=15, read_len=60, batch_reads=64)
    cap = 8192
    full = count_reads_device(
        reads, cfg, table_capacity=cap, merge_stride=stride
    )

    ck = str(tmp_path / "mid.npz")
    monkeypatch.setenv("GA_STREAM_ABORT_AFTER_BATCH", "3")
    with pytest.raises(RuntimeError, match="fault injection"):
        count_reads_device(
            reads, cfg, table_capacity=cap, merge_stride=stride,
            stream_checkpoint=ck, stream_checkpoint_every=2,
        )
    monkeypatch.delenv("GA_STREAM_ABORT_AFTER_BATCH")
    assert is_stream_checkpoint(ck)

    resumed = count_reads_device(
        reads, cfg, table_capacity=cap, merge_stride=stride,
        resume_stream_from=ck,
    )
    _tables_equal(full, resumed)


def test_resume_rejects_mismatched_params(tmp_path, monkeypatch):
    reads = _reads()
    cfg = AssemblyConfig(k=15, read_len=60, batch_reads=64)
    ck = str(tmp_path / "mid.npz")
    monkeypatch.setenv("GA_STREAM_ABORT_AFTER_BATCH", "2")
    with pytest.raises(RuntimeError, match="fault injection"):
        count_reads_device(
            reads, cfg, table_capacity=8192,
            stream_checkpoint=ck, stream_checkpoint_every=1,
        )
    monkeypatch.delenv("GA_STREAM_ABORT_AFTER_BATCH")
    with pytest.raises(ValueError, match="mismatch"):
        count_reads_device(
            reads, cfg, table_capacity=16384, resume_stream_from=ck
        )


def test_kill_and_resume_through_assemble_tpu(tmp_path, monkeypatch):
    """End to end: kill a checkpointed assembly mid-count, resume via the
    same --resume-from flag, byte-identical contigs."""
    reads = _reads(genome_len=3000, coverage=15)
    cfg = AssemblyConfig(k=15, read_len=60, batch_reads=128)
    cap = 16384
    baseline = assemble_tpu(reads, cfg, table_capacity=cap)

    ck = str(tmp_path / "mid.npz")
    monkeypatch.setenv("GA_STREAM_ABORT_AFTER_BATCH", "2")
    with pytest.raises(RuntimeError, match="fault injection"):
        assemble_tpu(
            reads, cfg, table_capacity=cap, checkpoint=ck,
            stream_checkpoint_every=1,
        )
    monkeypatch.delenv("GA_STREAM_ABORT_AFTER_BATCH")
    assert is_stream_checkpoint(ck)
    resumed = assemble_tpu(
        reads, cfg, table_capacity=cap, resume_from=ck
    )
    assert resumed == baseline


@pytest.mark.parametrize("d", [2, 8])
def test_kill_and_resume_sharded(tmp_path, monkeypatch, d):
    """Distributed streaming path: kill at batch 3, resume from the shard
    checkpoint, identical global table."""
    monkeypatch.setattr(pp, "DIST_STREAM_WINDOWS", 0)
    reads = _reads()
    cfg = AssemblyConfig(k=15, read_len=60, batch_reads=64)
    mesh = build_mesh(d)
    full = pp.distributed_count_to_host(
        reads, cfg, mesh, table_capacity=8192
    )

    ck = str(tmp_path / "mid_shard.npz")
    monkeypatch.setenv("GA_STREAM_ABORT_AFTER_BATCH", "3")
    with pytest.raises(RuntimeError, match="fault injection"):
        pp.distributed_count_table(
            reads, cfg, mesh, table_capacity=8192,
            stream_checkpoint=ck, stream_checkpoint_every=2,
        )
    monkeypatch.delenv("GA_STREAM_ABORT_AFTER_BATCH")
    assert pp.is_sharded_stream_checkpoint(ck)

    table = pp.distributed_count_table(
        reads, cfg, mesh, table_capacity=8192, resume_stream_from=ck
    )
    from genome_assembler_tpu.models.pipeline import table_to_host_counts

    assert table_to_host_counts(table, cfg.k) == full


def test_sharded_resume_rejects_other_mesh(tmp_path, monkeypatch):
    monkeypatch.setattr(pp, "DIST_STREAM_WINDOWS", 0)
    reads = _reads()
    cfg = AssemblyConfig(k=15, read_len=60, batch_reads=64)
    ck = str(tmp_path / "mid_shard.npz")
    monkeypatch.setenv("GA_STREAM_ABORT_AFTER_BATCH", "2")
    with pytest.raises(RuntimeError, match="fault injection"):
        pp.distributed_count_table(
            reads, cfg, build_mesh(4), table_capacity=8192,
            stream_checkpoint=ck, stream_checkpoint_every=1,
        )
    monkeypatch.delenv("GA_STREAM_ABORT_AFTER_BATCH")
    with pytest.raises(ValueError, match="mismatch"):
        pp.distributed_count_table(
            reads, cfg, build_mesh(8), table_capacity=8192,
            resume_stream_from=ck,
        )


def test_stream_checkpoint_not_written_when_run_completes(tmp_path):
    """No abort, stream_checkpoint_every set: the run completes and the
    stage-boundary checkpoint (assemble path) overwrites the mid-stream
    snapshot with a cursor-free table, so resume_from skips counting."""
    reads = _reads()
    cfg = AssemblyConfig(k=15, read_len=60, batch_reads=64)
    ck = str(tmp_path / "done.npz")
    contigs = assemble_tpu(
        reads, cfg, table_capacity=8192, checkpoint=ck,
        stream_checkpoint_every=1,
    )
    assert not is_stream_checkpoint(ck)
    resumed = assemble_tpu(reads, cfg, table_capacity=8192, resume_from=ck)
    assert resumed == contigs

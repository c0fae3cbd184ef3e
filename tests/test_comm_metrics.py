"""Communication-volume observability (SURVEY.md §5 metrics row: "all-to-
all volume"; VERDICT r2 item 6): distributed runs record their wire and
link volume in Metrics, so the minimizer routing's wire saving is visible
in run metrics — not only pinned by tests.
"""

import numpy as np
import pytest

import genome_assembler_tpu.parallel.pipeline as pp
from genome_assembler_tpu.parallel.mesh import build_mesh
from genome_assembler_tpu.utils.config import AssemblyConfig
from genome_assembler_tpu.utils.metrics import Metrics
from genome_assembler_tpu.utils.simulate import simulate_genome, simulate_reads


def _reads(genome_len=900, coverage=12, read_len=60, seed=5):
    genome = simulate_genome(genome_len, seed=seed)
    return simulate_reads(
        genome, coverage=coverage, read_len=read_len, seed=seed + 1
    ).codes


def test_count_records_a2a_and_link_bytes():
    reads = _reads()
    cfg = AssemblyConfig(k=15, read_len=60)
    m = Metrics()
    pp.distributed_count_to_host(reads, cfg, build_mesh(4), metrics=m)
    assert m.counters["a2a_bytes_count"] > 0
    assert m.counters["h2d_bytes_reads"] > 0
    assert m.counters["d2h_bytes_table"] > 0


def test_minimizer_routing_cuts_recorded_wire_volume():
    """The >2.5x super-k-mer wire saving must be OBSERVABLE in a run's
    metrics (it was previously only test-pinned on buffer shapes). The
    saving exists at multi-word keys (k=31/m=15, the documented regime);
    at k=15 the 1-word key makes records no cheaper than keys."""
    reads = _reads(genome_len=4000, coverage=15, read_len=100)
    cfg = AssemblyConfig(k=31, read_len=100)
    mesh = build_mesh(4)
    plain, mini = Metrics(), Metrics()
    pp.distributed_count_to_host(reads, cfg, mesh, metrics=plain)
    pp.distributed_count_to_host(
        reads, cfg, mesh, metrics=mini, minimizer_len=15
    )
    assert (
        mini.counters["a2a_bytes_count"]
        < plain.counters["a2a_bytes_count"] / 2
    )


def test_streamed_count_accumulates_per_batch(monkeypatch):
    monkeypatch.setattr(pp, "DIST_STREAM_WINDOWS", 0)
    reads = _reads()
    cfg = AssemblyConfig(k=15, read_len=60, batch_reads=64)
    m = Metrics()
    pp.distributed_count_to_host(
        reads, cfg, build_mesh(4), table_capacity=4096, metrics=m
    )
    n_batches = -(-reads.shape[0] // 64)
    per_step = m.counters["a2a_bytes_count"] / n_batches
    assert per_step > 0 and per_step == int(per_step)


def test_sharded_assembly_reports_compress_volume():
    reads = _reads(genome_len=1200, coverage=15)
    cfg = AssemblyConfig(k=15, read_len=60)
    m = Metrics()
    pp.assemble_distributed_sharded(reads, cfg, build_mesh(4), metrics=m)
    for key in (
        "a2a_bytes_count",
        "a2a_bytes_compress_link",
        "a2a_bytes_compress_query_round",
        "a2a_compress_query_rounds_max",
        "a2a_bytes_spell",
    ):
        assert m.counters[key] > 0, key
    # counters flow into the JSON report consumed by --metrics-out / CFG-4
    assert "a2a_bytes_count" in m.report()["counters"]


def test_single_owner_mesh_reports_zero_wire():
    reads = _reads()
    cfg = AssemblyConfig(k=15, read_len=60)
    m = Metrics()
    pp.distributed_count_to_host(reads, cfg, build_mesh(1), metrics=m)
    assert m.counters["a2a_bytes_count"] == 0

"""2-level ('host','chip') mesh + distributed checkpoint/resume
(SURVEY.md §5 distributed backend, §7 M5; VERDICT r1 items 4 and 9).

Runs on the forced 8-device CPU platform: a faked pod of 2 hosts x 4 chips
(or 4 x 2). The collectives flatten over both axes, so real pod runs only
change the mesh construction (build_mesh(hosts=jax.process_count())).
"""

from __future__ import annotations

import numpy as np
import pytest

from genome_assembler_tpu.models.oracle import (
    assemble_oracle,
    count_canonical_fast,
)
from genome_assembler_tpu.parallel.mesh import (
    build_mesh,
    mesh_axes,
    num_hosts,
)
from genome_assembler_tpu.parallel.pipeline import (
    assemble_distributed,
    distributed_count_to_host,
)
from genome_assembler_tpu.utils.config import AssemblyConfig
from genome_assembler_tpu.utils.metrics import Metrics
from genome_assembler_tpu.utils.simulate import simulate_genome, simulate_reads


@pytest.fixture(scope="module")
def workload():
    genome = simulate_genome(1500, seed=41)
    rs = simulate_reads(genome, coverage=12, read_len=80, seed=42)
    cfg = AssemblyConfig(k=21, read_len=80)
    return rs.codes, cfg


@pytest.mark.parametrize("hosts,chips", [(2, 4), (4, 2), (2, 2)])
def test_two_level_mesh_counts_match_host(workload, hosts, chips):
    reads, cfg = workload
    mesh = build_mesh(hosts * chips, hosts=hosts)
    assert mesh_axes(mesh) == ("host", "chip")
    assert num_hosts(mesh) == hosts
    got = distributed_count_to_host(reads, cfg, mesh)
    assert got == count_canonical_fast(reads, cfg.k)


def test_two_level_mesh_assembly_matches_oracle_and_flat_mesh(workload):
    reads, cfg = workload
    m = Metrics()
    contigs2 = assemble_distributed(
        reads, cfg, build_mesh(8, hosts=2), metrics=m
    )
    contigs1 = assemble_distributed(reads, cfg, build_mesh(8))
    assert contigs2 == contigs1 == assemble_oracle(reads, cfg)
    assert m.counters["hosts"] == 2
    assert "reads_per_s_per_host" in m.derive()


def test_uneven_host_split_rejected():
    with pytest.raises(ValueError):
        build_mesh(7, hosts=2)


def test_distributed_checkpoint_resume(tmp_path, workload):
    """Kill-and-resume on the sharded path: byte-identical contigs
    (VERDICT r1 item 9 done-bar)."""
    reads, cfg = workload
    mesh = build_mesh(8, hosts=2)
    ckpt = str(tmp_path / "dist_table.npz")
    contigs = assemble_distributed(reads, cfg, mesh, checkpoint=ckpt)
    # "preemption": fresh call, garbage reads — must resume from the table
    resumed = assemble_distributed(
        np.zeros_like(reads), cfg, mesh, resume_from=ckpt
    )
    assert resumed == contigs

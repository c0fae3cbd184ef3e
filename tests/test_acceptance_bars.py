"""The acceptance runners' pass bars must be enforced, not vacuous.

VERDICT r1 item 3: each bar demonstrably fails when violated. These tests
mutate inputs/results and assert the bar catches the corruption.
"""

from __future__ import annotations

import numpy as np
import pytest

from genome_assembler_tpu.models.acceptance import (
    errored_run_ok,
    weak_scaling_efficiency,
)
from genome_assembler_tpu.utils.dna import decode_seq, revcomp_str
from genome_assembler_tpu.utils.simulate import simulate_genome


def test_weak_scaling_efficiency_linear():
    # perfectly linear scaling -> efficiency 1.0 everywhere
    rates = {1: 100.0, 2: 200.0, 8: 800.0}
    eff = weak_scaling_efficiency(rates)
    assert eff == {1: 1.0, 2: 1.0, 8: 1.0}


def test_weak_scaling_efficiency_sublinear():
    rates = {1: 100.0, 4: 200.0}
    eff = weak_scaling_efficiency(rates)
    assert eff[1] == 1.0
    assert eff[4] == pytest.approx(0.5)


def test_weak_scaling_efficiency_base_not_one_device():
    # smallest measured count is 2, not 1 — base must be keyed by device
    # count, not dict order
    rates = {4: 150.0, 2: 100.0}
    eff = weak_scaling_efficiency(rates)
    assert eff[2] == 1.0
    assert eff[4] == pytest.approx(150.0 / 200.0)
    assert weak_scaling_efficiency({}) == {}


GENOME = decode_seq(simulate_genome(3000, seed=7))
K = 31


def test_errored_bar_accepts_trimmed_genome():
    # single contig with modest end-trimming: legitimate
    assert errored_run_ok([GENOME[25 : len(GENOME) - 25]], GENOME, K)


def test_errored_bar_accepts_revcomp():
    assert errored_run_ok([revcomp_str(GENOME)], GENOME, K)


def test_errored_bar_rejects_error_bases():
    # one substitution in the middle -> not a genome substring -> fail
    middle = len(GENOME) // 2
    base = GENOME[middle]
    sub = {"A": "C", "C": "A", "G": "T", "T": "G"}[base]
    corrupt = GENOME[:middle] + sub + GENOME[middle + 1 :]
    assert not errored_run_ok([corrupt], GENOME, K)


def test_errored_bar_rejects_chimera():
    # two distant genome pieces joined out of order -> fail
    chimera = GENOME[2000:] + GENOME[:1000]
    assert not errored_run_ok([chimera], GENOME, K)


def test_errored_bar_rejects_incomplete_assembly():
    # half the genome missing -> fail
    assert not errored_run_ok([GENOME[: len(GENOME) // 2]], GENOME, K)


def test_errored_bar_rejects_fragmentation():
    # genome shattered into 10 pieces -> fail even though content is exact
    n = 10
    step = len(GENOME) // n
    pieces = [GENOME[i * step : (i + 1) * step + K] for i in range(n)]
    assert not errored_run_ok(pieces, GENOME, K)


def test_errored_bar_rejects_empty():
    assert not errored_run_ok([], GENOME, K)


def test_errored_bar_low_coverage_tolerates_breaks_not_corruption():
    # low effective coverage: a few breaks are fine...
    step = len(GENOME) // 3
    pieces = [GENOME[i * step : (i + 1) * step + K] for i in range(3)]
    assert errored_run_ok(pieces, GENOME, K, coverage=20)
    # ...but non-genomic bases still fail
    corrupt = [pieces[0][:-1] + ("A" if pieces[0][-1] != "A" else "C")]
    assert not errored_run_ok(corrupt + pieces[1:], GENOME, K, coverage=20)


def test_cfg4_counts_bar_catches_wrong_counts(monkeypatch):
    """accept_cfg4 must FAIL if the sharded counts diverge from the host."""
    import genome_assembler_tpu.models.acceptance as acc
    import genome_assembler_tpu.parallel.pipeline as pp

    real = pp.distributed_count_to_host

    def corrupted(reads, cfg, mesh, **kw):
        counts = real(reads, cfg, mesh, **kw)
        key = next(iter(counts))
        counts[key] += 1  # one wrong multiplicity
        return counts

    monkeypatch.setenv("GA_ACCEPT_SCALE", "0.001")
    monkeypatch.setattr(pp, "distributed_count_to_host", corrupted)
    monkeypatch.setattr(acc, "weak_scaling_efficiency", lambda r: {d: 1.0 for d in r})
    res = acc.accept_cfg4()
    assert not res.passed
    assert res.detail["counts_match_host"] is False


def test_cfg4_passes_at_small_scale(monkeypatch):
    monkeypatch.setenv("GA_ACCEPT_SCALE", "0.001")
    res = __import__(
        "genome_assembler_tpu.models.acceptance", fromlist=["accept_cfg4"]
    ).accept_cfg4()
    assert res.passed, res.detail
    assert res.detail["counts_match_host"] is True
    assert res.detail["assembly_genome_exact_and_paths_agree"] is True
    # at CI scale the dict-oracle cross-check is cheap and must run
    assert res.detail["oracle_cross_checked"] is True

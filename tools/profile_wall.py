"""Fine-grained wall-clock attribution for the CFG2-scale single-device run.

The acceptance runner reported wall_s well above the per-stage sum
(11.85s vs 5.73s on 2026-08-17); this tool replays the same workload with
perf_counter timers spliced between every statement of assemble_tpu's
body so the untimed glue is attributable. Run on the real chip:

    python tools/profile_wall.py [--scale 1.0]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, default=1.0)
    args = ap.parse_args()

    from genome_assembler_tpu.models.pipeline import (
        SINGLE_SHOT_WINDOWS,
        assemble_tpu,
        count_reads_device,
    )
    from genome_assembler_tpu.ops import count_jax
    from genome_assembler_tpu.ops.count_jax import snug_capacity
    from genome_assembler_tpu.utils.config import AssemblyConfig
    from genome_assembler_tpu.utils.jaxenv import setup, sync
    from genome_assembler_tpu.utils.simulate import (
        simulate_genome,
        simulate_reads,
    )

    setup()
    k = 31
    genome_len = max(int(4_641_652 * args.scale), 50 * k)
    coverage = max(50 * max(args.scale, 0.2), 8)
    genome = simulate_genome(genome_len, seed=1030)
    rs = simulate_reads(
        genome, coverage=coverage, read_len=100, seed=1031, tile_k=k
    )
    cfg = AssemblyConfig(k=k, min_count=1, read_len=100)
    total_windows = rs.num_reads * (100 - k + 1)
    capacity = None
    if total_windows > SINGLE_SHOT_WINDOWS:
        capacity = snug_capacity(int(1.5 * genome_len) + 4096)
    print(
        f"reads={rs.num_reads} windows={total_windows} capacity={capacity}",
        flush=True,
    )

    print("warm pass (untimed compiles)...", flush=True)
    t0 = time.perf_counter()
    assemble_tpu(rs.codes, cfg, table_capacity=capacity)
    print(f"warm pass: {time.perf_counter() - t0:.2f}s", flush=True)

    # -- instrumented replay of assemble_tpu's body --------------------
    marks: list[tuple[str, float]] = []

    def mark(name: str) -> None:
        marks.append((name, time.perf_counter()))

    reads = rs.codes
    mark("start")
    _scan = bool((reads > 3).any())
    mark("invalid_scan")
    table = count_reads_device(reads, cfg, table_capacity=capacity)
    mark("count_dispatch")
    sync(table.num_unique)
    mark("count_sync")
    min_count = 1
    if not bool(table.overflow):
        table = count_jax.compact_table(table)
    mark("compact1")
    table = count_jax.filter_table(table, min_count)
    mark("filter_dispatch")
    table = count_jax.compact_table(table)
    mark("compact2")

    from genome_assembler_tpu.host.dbg import spell_device_arrays
    from genome_assembler_tpu.host.simplify_arrays import (
        simplify_arrays_to_graph,
    )
    from genome_assembler_tpu.ops.unitig_jax import compress_unitigs_device

    dev = compress_unitigs_device(table, cfg.k)
    mark("compress_dispatch")
    sync(dev.num_unitigs)
    mark("compress_sync")
    ua = spell_device_arrays(dev, cfg.k)
    mark("spell")
    graph = simplify_arrays_to_graph(
        ua, cfg.resolved_tip_len, cfg.resolved_bubble_len, min_count
    )
    mark("simplify")
    from genome_assembler_tpu.host.traverse import emit_contigs

    contigs = emit_contigs(graph)
    mark("traverse")

    t_prev = marks[0][1]
    total = marks[-1][1] - t_prev
    print(f"\ninstrumented wall: {total:.3f}s")
    for name, t in marks[1:]:
        print(f"  {name:20s} {t - t_prev:8.3f}s")
        t_prev = t
    print(f"contigs={len(contigs)} bases={sum(len(c) for c in contigs)}")


if __name__ == "__main__":
    main()

"""On-chip measurement: the streamed COUNT stage alone, at scale.

The bucketed-vs-flat merge decision (GA_BUCKETED / models.pipeline.
BUCKETED_MIN_MERGE_ROWS) is about the counting stage's per-batch merge
sorts only — the full run_large pipeline pays compress/spell compiles
and walls that just add noise and chip-time to a crossover bisection.
This tool simulates a genome-size-parameterized read set, runs
count_reads_device once cold and N times warm, and prints one JSON line
with the geometry (capacity, merge rows, bucketed on/off) and walls —
one data point for the VERDICT r3 item-1 crossover sweep.

Usage: python tools/measure_count_stage.py [genome_Mb] [coverage] [k] [reps]
Env:   GA_BUCKETED=0/1/auto (the knob under test), GA_BUCKETS,
       GA_MERGE_STRIDE, GA_BUCKET*_SLACK as in models.pipeline.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from genome_assembler_tpu.utils import jaxenv

jaxenv.setup()


def main() -> int:
    genome_mb = float(sys.argv[1]) if len(sys.argv) > 1 else 40.0
    coverage = float(sys.argv[2]) if len(sys.argv) > 2 else 25.0
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 31
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 2

    import numpy as np

    from genome_assembler_tpu.models.pipeline import (
        BUCKETED_MIN_MERGE_ROWS,
        count_reads_device,
    )
    from genome_assembler_tpu.ops.count_jax import snug_capacity
    from genome_assembler_tpu.utils.config import AssemblyConfig
    from genome_assembler_tpu.utils.jaxenv import sync
    from genome_assembler_tpu.utils.simulate import (
        simulate_genome,
        simulate_reads,
    )

    glen = int(genome_mb * 1e6)
    t0 = time.time()
    genome = simulate_genome(glen, seed=7001)
    rs = simulate_reads(genome, coverage=coverage, read_len=100, seed=7002,
                        tile_k=k)
    sim_s = time.time() - t0
    cfg = AssemblyConfig(k=k, read_len=100)
    cap = snug_capacity(int(1.2 * glen) + 4096)
    merge_windows = cfg.batch_reads * (100 - k + 1)
    env_bucketed = os.environ.get("GA_BUCKETED", "auto")
    use_bucketed = (
        cap + merge_windows >= BUCKETED_MIN_MERGE_ROWS
        if env_bucketed == "auto"
        else env_bucketed == "1"
    )
    print(
        f"# {genome_mb} Mb, {rs.num_reads} reads, cap {cap/1e6:.1f}M, "
        f"merge rows {(cap + merge_windows)/1e6:.1f}M, "
        f"bucketed={use_bucketed}, sim {sim_s:.0f}s",
        file=sys.stderr, flush=True,
    )

    t0 = time.time()
    table = count_reads_device(rs.codes, cfg, table_capacity=cap)
    sync(table.num_unique)
    cold_s = time.time() - t0
    warms = []
    for _ in range(reps):
        t0 = time.time()
        table = count_reads_device(rs.codes, cfg, table_capacity=cap)
        sync(table.num_unique)
        warms.append(time.time() - t0)
    windows = rs.num_reads * (100 - k + 1)
    best = min(warms)
    result = {
        "genome_mb": genome_mb,
        "coverage": coverage,
        "k": k,
        "reads": rs.num_reads,
        "windows": windows,
        "capacity": cap,
        "merge_rows": cap + merge_windows,
        "bucketed": bool(use_bucketed),
        "ga_bucketed_env": env_bucketed,
        # effective bucket count: env override, else the shipped auto
        # rule (ops.bucketed.auto_buckets) on this run's geometry
        "buckets": (
            int(os.environ["GA_BUCKETS"])
            if os.environ.get("GA_BUCKETS")
            else __import__(
                "genome_assembler_tpu.ops.bucketed", fromlist=["auto_buckets"]
            ).auto_buckets(
                cap, merge_windows,
                max(1, int(os.environ.get("GA_BUCKET_ACCUM", "4"))),
            )
        )
        if use_bucketed else None,
        "accum": int(os.environ.get("GA_BUCKET_ACCUM", "4"))
        if use_bucketed else None,
        "cold_s": round(cold_s, 1),
        "warm_s": [round(x, 2) for x in warms],
        "best_s": round(best, 2),
        "kmers_per_s": round(windows / best, 0),
        "num_unique": int(table.num_unique),
        "overflow": bool(table.overflow),
    }
    print(json.dumps(result), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

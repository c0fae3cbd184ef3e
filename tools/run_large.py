"""Beyond-baseline scale run: assemble a large simulated genome on one chip.

The acceptance configs top out at E. coli scale (4.64 Mb) single-chip;
this tool pushes the same pipeline to tens-of-Mb genomes (C. elegans
chromosome scale) to demonstrate capacity headroom: streamed counting in
bounded HBM, genome-sized table compaction, pointer-jumping compression,
and the packed device->host spell pull all scale by construction.

Usage: python tools/run_large.py [genome_Mb] [coverage] [k] [stride]
Defaults: 40 Mb, 25x, k=31, merge stride from GA_MERGE_STRIDE.

Prints one JSON line with stage walls and verification results (exact
canonical k-mer content vs the genome; single-contig equality when the
genome is repeat-free at k).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from genome_assembler_tpu.utils import jaxenv

jaxenv.setup()


def main() -> int:
    genome_mb = float(sys.argv[1]) if len(sys.argv) > 1 else 40.0
    coverage = float(sys.argv[2]) if len(sys.argv) > 2 else 25.0
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 31
    stride = int(sys.argv[4]) if len(sys.argv) > 4 else None

    from genome_assembler_tpu.host.stats import contig_stats
    from genome_assembler_tpu.host.traverse import (
        contigs_equal,
        kmer_content_equal,
    )
    from genome_assembler_tpu.models.pipeline import assemble_tpu
    from genome_assembler_tpu.ops.count_jax import snug_capacity
    from genome_assembler_tpu.utils.config import AssemblyConfig
    from genome_assembler_tpu.utils.dna import decode_seq
    from genome_assembler_tpu.utils.metrics import Metrics
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
    print(
        f"# genome {genome_mb} Mb, {rs.num_reads} reads, cap {cap/1e6:.0f}M,"
        f" sim {sim_s:.0f}s",
        file=sys.stderr, flush=True,
    )

    # cold (compile) pass, then GA_RL_REPS warm timed passes. Repeating
    # warm passes in ONE process separates per-process costs (first-touch
    # page faults on the host-side spell/simplify buffers, allocator
    # growth) from steady-state stage walls — the r4 p1-vs-p2 spell and
    # simplify variance investigation (VERDICT r5 item 8).
    reps = max(1, int(os.environ.get("GA_RL_REPS", "1")))
    t0 = time.time()
    assemble_tpu(rs.codes, cfg, table_capacity=cap, merge_stride=stride)
    cold_s = time.time() - t0
    warm_runs = []
    for _ in range(reps):
        m = Metrics()
        t0 = time.time()
        contigs = assemble_tpu(
            rs.codes, cfg, metrics=m, table_capacity=cap,
            merge_stride=stride,
        )
        warm_runs.append((time.time() - t0, m))
    warm_s, m = min(warm_runs, key=lambda wm: wm[0])

    gstr = decode_seq(genome)
    stats = contig_stats(contigs)
    result = {
        "genome_mb": genome_mb,
        "coverage": coverage,
        "k": k,
        "reads": rs.num_reads,
        "windows": rs.num_reads * (100 - k + 1),
        "cold_s": round(cold_s, 1),
        "warm_s": round(warm_s, 2),
        "reads_per_s": round(rs.num_reads / warm_s, 1),
        "stages_s": {n: round(v, 2) for n, v in m.stages.items()},
        "warm_runs": [
            {
                "warm_s": round(w, 2),
                "stages_s": {
                    n: round(v, 2) for n, v in mm.stages.items()
                },
            }
            for w, mm in warm_runs
        ],
        "contigs": stats["contigs"],
        "n50": stats["n50"],
        "exact_single_contig": contigs_equal(contigs, [gstr]),
        "exact_kmer_content": kmer_content_equal(contigs, gstr, k),
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())

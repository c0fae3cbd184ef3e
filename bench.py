"""Benchmark harness: canonical k-mer counting throughput (SURVEY.md §6).

Prints ONE JSON line:
  {"metric": "kmer_count_throughput", "value": <kmers/s>, "unit": "kmers/s",
   "vs_baseline": <speedup vs the reference-style Python dict counter>, ...}

The primary metric is the north-star inner loop (BASELINE.json: "k-mers
counted/s/chip"): extraction + canonicalization + sort/segment-reduce
counting of a CFG-2-shaped simulated read set on one chip. ``vs_baseline``
is the measured speedup over the reference assembler's counting hot loop
(a straight Python dict-upsert per window, SURVEY.md §3.3) on the same
machine — the reference publishes no numbers of its own (BASELINE.md), so
its own implementation is the baseline to beat.

Env knobs: GA_BENCH_GENOME (bases), GA_BENCH_COVERAGE, GA_BENCH_K,
GA_BENCH_REPS, GA_BENCH_BASELINE_WINDOWS.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> int:
    import jax

    from genome_assembler_tpu.utils.jaxenv import setup

    setup()

    import numpy as np

    from genome_assembler_tpu.models.oracle import count_canonical_dict
    from genome_assembler_tpu.models.pipeline import count_reads_device
    from genome_assembler_tpu.utils.config import AssemblyConfig
    from genome_assembler_tpu.utils.dna import key_words
    from genome_assembler_tpu.utils.simulate import simulate_genome, simulate_reads

    # ~17.5M windows: large enough for steady-state throughput, small
    # enough that the axon backend's size-scaled compile stays bounded.
    genome_len = int(os.environ.get("GA_BENCH_GENOME", 1_000_000))
    coverage = float(os.environ.get("GA_BENCH_COVERAGE", 25))
    k = int(os.environ.get("GA_BENCH_K", 31))
    reps = int(os.environ.get("GA_BENCH_REPS", 3))
    read_len = 100

    genome = simulate_genome(genome_len, seed=11)
    rs = simulate_reads(
        genome, coverage=coverage, read_len=read_len, seed=12
    )
    reads = rs.codes
    n_windows = reads.shape[0] * (read_len - k + 1)
    cfg = AssemblyConfig(k=k, read_len=read_len)

    # Warmup: compile + first run. Timed regions end with a scalar fetch:
    # on the axon platform block_until_ready returns before remote
    # execution completes, so only a host fetch measures real completion
    # (ADVICE.md r1; the fetch itself is one ~32 ms roundtrip).
    from genome_assembler_tpu.utils.jaxenv import sync

    t0 = time.perf_counter()
    table = count_reads_device(reads, cfg)
    sync(table.num_unique)
    warmup_s = time.perf_counter() - t0

    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        table = count_reads_device(reads, cfg)
        sync(table.num_unique)
        times.append(time.perf_counter() - t0)
    best = min(times)
    kmers_per_s = n_windows / best

    # Reference-style Python dict counting rate on a subsample.
    base_windows = int(os.environ.get("GA_BENCH_BASELINE_WINDOWS", 200_000))
    wpr = read_len - k + 1
    n_base_reads = max(1, base_windows // wpr)
    t0 = time.perf_counter()
    count_canonical_dict(reads[:n_base_reads], k)
    base_s = time.perf_counter() - t0
    base_rate = (n_base_reads * wpr) / base_s

    # End-to-end assembly on the same workload (count + filter + device
    # unitig compression + host residue) — the full-pipeline rate.
    from genome_assembler_tpu.models.pipeline import assemble_tpu
    from genome_assembler_tpu.host.stats import contig_stats
    from genome_assembler_tpu.host.traverse import contigs_equal
    from genome_assembler_tpu.utils.dna import decode_seq

    t0 = time.perf_counter()
    contigs = assemble_tpu(reads, cfg)
    asm_s = time.perf_counter() - t0
    stats = contig_stats(contigs)
    exact = contigs_equal(contigs, [decode_seq(genome)])

    # Minimal-traffic HBM model for the roofline fraction: read bytes in +
    # one key-stream write + one sorted read-back (speed-of-light counting).
    w = key_words(k)
    min_bytes = reads.size + 2 * n_windows * w * 4
    hbm_peak = float(os.environ.get("GA_BENCH_HBM_PEAK", 819e9))  # v5e B/s

    result = {
        "metric": "kmer_count_throughput",
        "value": round(kmers_per_s, 1),
        "unit": "kmers/s",
        "vs_baseline": round(kmers_per_s / base_rate, 2),
        "detail": {
            "backend": jax.default_backend(),
            "device": str(jax.devices()[0]),
            "k": k,
            "reads": int(reads.shape[0]),
            "windows": int(n_windows),
            "best_s": round(best, 4),
            "warmup_s": round(warmup_s, 1),
            "reference_python_kmers_per_s": round(base_rate, 1),
            "min_traffic_roofline_frac": round(
                (min_bytes / best) / hbm_peak, 4
            ),
            "assemble_s": round(asm_s, 2),
            "assemble_reads_per_s": round(reads.shape[0] / asm_s, 1),
            "contigs": stats["contigs"],
            "n50": stats["n50"],
            "exact_match": exact,
        },
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    try:
        sys.exit(main())
    except Exception as e:  # always emit one parseable line for the driver
        print(
            json.dumps(
                {
                    "metric": "kmer_count_throughput",
                    "value": 0,
                    "unit": "kmers/s",
                    "vs_baseline": 0,
                    "error": f"{type(e).__name__}: {e}",
                }
            )
        )
        sys.exit(1)

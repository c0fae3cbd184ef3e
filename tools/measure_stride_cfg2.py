"""One-process chip measurement: deferred-merge stride on CFG-2 counting.

Runs in a single process to pay the axon one-time init once:
  1. merge_raw_keys cadence probe at CFG-2 shapes (P in {1, 2, 3}) —
     the merge-only cost model for GA_MERGE_STRIDE.
  2. Streamed CFG-2 counting (count_reads_device, transfers included,
     double-buffered uploads) at stride 1 vs the best probe stride —
     the end-to-end number that decides the default.

Usage: python tools/measure_stride_cfg2.py [strides...]   (default 1 2 3)
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

from genome_assembler_tpu.utils import jaxenv

jaxenv.setup()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from genome_assembler_tpu.ops import count_jax  # noqa: E402
from genome_assembler_tpu.models.pipeline import (  # noqa: E402
    count_reads_device,
)
from genome_assembler_tpu.utils.config import AssemblyConfig  # noqa: E402
from genome_assembler_tpu.utils.simulate import (  # noqa: E402
    simulate_genome,
    simulate_reads,
)

STRIDES = [int(a) for a in sys.argv[1:]] or [1, 2, 3]
GENOME = 4_641_652  # CFG-2 E. coli scale
COVERAGE = 50
K = 31
REPS = 2


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    results = {"probe": {}, "stream": {}, "config": {
        "genome": GENOME, "coverage": COVERAGE, "k": K, "reps": REPS,
    }}
    t_start = time.time()
    genome = simulate_genome(GENOME, seed=1030)
    rs = simulate_reads(genome, coverage=COVERAGE, read_len=100,
                        seed=1031, tile_k=K)
    reads = rs.codes
    cfg = AssemblyConfig(k=K, read_len=100)
    cap = count_jax.snug_capacity(int(1.5 * GENOME) + 4096)
    bw = cfg.batch_reads * (100 - K + 1)
    log(f"reads={reads.shape} cap={cap/1e6:.1f}M batch_windows={bw/1e6:.2f}M")

    # --- part 1: merge-only cadence probe (synthetic table + keys) ---
    rng = np.random.default_rng(0)
    nuniq = cap // 2
    w = 2
    tw = np.full((cap, w), 0xFFFFFFFF, dtype=np.uint32)
    uniq = rng.integers(0, 1 << 31, size=(nuniq, w), dtype=np.uint32)
    order = np.lexsort(tuple(uniq[:, i] for i in range(w - 1, -1, -1)))
    tw[:nuniq] = uniq[order]
    tc = np.zeros(cap, np.int32)
    tc[:nuniq] = rng.integers(1, 50, nuniq)
    table = count_jax.CountTable(
        words=jnp.asarray(tw), counts=jnp.asarray(tc),
        num_unique=jnp.asarray(nuniq, jnp.int32),
        overflow=jnp.asarray(False),
    )
    merge = jax.jit(count_jax.merge_raw_keys)
    for p in STRIDES:
        keys = jnp.asarray(
            rng.integers(0, 1 << 31, size=(p * bw, w), dtype=np.uint32)
        )
        t0 = time.time()
        out = merge(table, keys)
        jaxenv.sync(out.counts)
        compile_s = time.time() - t0
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            out = merge(table, keys)
            jaxenv.sync(out.counts)
            best = min(best, time.perf_counter() - t0)
        rows = cap + p * bw
        log(
            f"probe P={p}: {rows/1e6:6.1f}M rows  {best*1e3:7.1f} ms  "
            f"{best/rows*1e9:5.2f} ns/row  amortized/batch "
            f"{best/p*1e3:7.1f} ms  (compile {compile_s:.0f}s)"
        )
        results["probe"][str(p)] = {
            "rows": rows, "best_s": round(best, 4),
            "ns_per_row": round(best / rows * 1e9, 3),
            "amortized_per_batch_s": round(best / p, 4),
            "compile_s": round(compile_s, 1),
        }
        del keys, out

    # --- part 2: streamed CFG-2 counting end-to-end per stride ---
    for stride in STRIDES:
        os.environ["GA_MERGE_STRIDE"] = str(stride)
        t0 = time.time()
        t = count_reads_device(reads, cfg, table_capacity=cap)
        jaxenv.sync(t.num_unique)
        cold = time.time() - t0
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            t = count_reads_device(reads, cfg, table_capacity=cap)
            jaxenv.sync(t.num_unique)
            best = min(best, time.perf_counter() - t0)
        log(
            f"count stride={stride}: warm {best:6.2f} s "
            f"({reads.shape[0]*70/best/1e6:.1f}M windows/s, transfers "
            f"included)  cold {cold:.0f}s  unique={int(t.num_unique)/1e6:.2f}M"
        )
        results["stream"][str(stride)] = {
            "warm_s": round(best, 3),
            "windows_per_s": round(reads.shape[0] * 70 / best, 1),
            "cold_s": round(cold, 1),
            "unique": int(t.num_unique),
        }
        del t
    log(f"total {time.time()-t_start:.0f}s")
    path = os.path.join(
        os.path.dirname(__file__), "measure_stride_cfg2_results.json"
    )
    with open(path, "w") as fh:
        import json

        json.dump(results, fh, indent=2)
    log(f"results -> {path}")


if __name__ == "__main__":
    main()

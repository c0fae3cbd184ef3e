"""On-chip measurements for two candidate optimizations.

1. Streaming count batch size: the per-batch merge re-sorts the running
   table (capacity rows) alongside the batch windows, so fewer/larger
   batches sort fewer total rows — IF the bigger fused program's
   axon compile stays bounded and the worker survives it. Measures cold
   compile + warm full-CFG2 count for several batch_reads values.

2. Pointer-doubling state layout: the doubling loop is a row gather of
   the packed (ancestor, aux) [N, 2] int32 state per round. An int64
   lane packing the same 8 bytes may gather faster/slower depending on
   how axon lowers 64-bit lanes; measured head-to-head here.

Run: python tools/measure_stream_batch.py [--skip-batch] [--skip-pack]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def bench_stream_batches(reps: int = 2) -> None:
    import jax

    from genome_assembler_tpu.models.pipeline import count_reads_device
    from genome_assembler_tpu.ops.count_jax import snug_capacity
    from genome_assembler_tpu.utils.config import AssemblyConfig
    from genome_assembler_tpu.utils.jaxenv import sync
    from genome_assembler_tpu.utils.simulate import (
        simulate_genome,
        simulate_reads,
    )

    k = 31
    genome = simulate_genome(4_641_652, seed=1030)
    rs = simulate_reads(genome, coverage=50, read_len=100, seed=1031,
                        tile_k=k)
    capacity = snug_capacity(int(1.5 * 4_641_652) + 4096)
    total_windows = rs.num_reads * (100 - k + 1)
    print(json.dumps({"workload": "cfg2", "reads": rs.num_reads,
                      "windows": total_windows, "capacity": capacity}),
          flush=True)

    for batch_reads in (262_144, 393_216, 524_288, 655_360):
        cfg = AssemblyConfig(k=k, read_len=100, batch_reads=batch_reads)
        nb = -(-rs.num_reads // batch_reads)
        t0 = time.perf_counter()
        table = count_reads_device(rs.codes, cfg, table_capacity=capacity)
        sync(table.num_unique)
        cold_s = time.perf_counter() - t0
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            table = count_reads_device(
                rs.codes, cfg, table_capacity=capacity
            )
            sync(table.num_unique)
            times.append(time.perf_counter() - t0)
        print(json.dumps({
            "batch_reads": batch_reads,
            "batches": nb,
            "cold_s": round(cold_s, 2),
            "warm_best_s": round(min(times), 3),
            "num_unique": int(table.num_unique),
        }), flush=True)


def bench_doubling_pack(n: int = 16_777_216, rounds: int = 10,
                        reps: int = 3) -> None:
    import jax
    import jax.numpy as jnp

    from genome_assembler_tpu.utils.jaxenv import sync

    jax.config.update("jax_enable_x64", True)
    rng = np.random.default_rng(7)
    succ = rng.integers(0, n, size=n, dtype=np.int32)
    aux = np.ones(n, dtype=np.int32)

    @jax.jit
    def rows32(state):
        def body(i, s):
            g = s[s[:, 0]]
            return jnp.stack([g[:, 0], s[:, 1] + g[:, 1]], axis=1)

        return jax.lax.fori_loop(0, rounds, body, state)

    @jax.jit
    def packed64(state):
        def body(i, s):
            g = s[(s >> jnp.uint64(32)).astype(jnp.int32)]
            anc = g & jnp.uint64(0xFFFFFFFF00000000)
            # aux columns add in the low 32 bits (no carries: test data
            # keeps sums far below 2^31)
            low = (s + g) & jnp.uint64(0xFFFFFFFF)
            return anc | low

        return jax.lax.fori_loop(0, rounds, body, state)

    s32 = jnp.stack([jnp.asarray(succ), jnp.asarray(aux)], axis=1)
    s64 = (jnp.asarray(succ, jnp.uint64) << jnp.uint64(32)) | jnp.asarray(
        aux, jnp.uint64
    )

    for name, fn, arg in (("rows_int32x2", rows32, s32),
                          ("packed_int64", packed64, s64)):
        t0 = time.perf_counter()
        out = fn(arg)
        sync(out.reshape(-1)[:1])
        cold_s = time.perf_counter() - t0
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(arg)
            sync(out.reshape(-1)[:1])
            times.append(time.perf_counter() - t0)
        print(json.dumps({
            "layout": name, "n": n, "rounds": rounds,
            "cold_s": round(cold_s, 2),
            "warm_best_s": round(min(times), 3),
            "per_round_ms": round(1000 * min(times) / rounds, 1),
        }), flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-batch", action="store_true")
    ap.add_argument("--skip-pack", action="store_true")
    args = ap.parse_args()

    from genome_assembler_tpu.utils.jaxenv import setup

    setup()
    if not args.skip_pack:
        bench_doubling_pack()
    if not args.skip_batch:
        bench_stream_batches()


if __name__ == "__main__":
    main()

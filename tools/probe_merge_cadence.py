"""Probe: would merging raw keys every P batches beat merging every batch?

The streamed counter's per-batch cost is two sorts over (cap + batch)
rows (merge_raw_keys: weighted count sort + compaction sort). Batching P
extraction outputs into a pending buffer before merging pays the cap-row
tax 1/P as often:

    rows(P) = 2 * (windows + (nb/P) * cap)

but the merge program grows to cap + P*batch rows — and fused programs
on this backend degrade at 34-48M-row shapes (RESULTS.md sizing rules),
so the win must be measured, not assumed. This probe times
merge_raw_keys alone at CFG-2-like shapes for P in {1, 2, 3}.

Usage: python tools/probe_merge_cadence.py [cap_M] [batch_M]
"""

from __future__ import annotations

import sys
import time

import numpy as np

from genome_assembler_tpu.utils import jaxenv

jaxenv.setup()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from genome_assembler_tpu.ops import count_jax  # noqa: E402

CAP_M = float(sys.argv[1]) if len(sys.argv) > 1 else 11.6
BATCH_M = float(sys.argv[2]) if len(sys.argv) > 2 else 18.35
W = 2
REPS = 3


def timed(fn, *args):
    out = fn(*args)
    jaxenv.sync(out.counts)
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = fn(*args)
        jaxenv.sync(out.counts)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    cap = int(CAP_M * 1e6)
    batch = int(BATCH_M * 1e6)
    rng = np.random.default_rng(0)

    # half-full table of sorted unique keys (realistic mid-stream state)
    nuniq = cap // 2
    tw = np.full((cap, W), 0xFFFFFFFF, dtype=np.uint32)
    uniq = rng.integers(0, 1 << 31, size=(nuniq, W), dtype=np.uint32)
    order = np.lexsort(tuple(uniq[:, i] for i in range(W - 1, -1, -1)))
    tw[:nuniq] = uniq[order]
    tc = np.zeros(cap, np.int32)
    tc[:nuniq] = rng.integers(1, 50, nuniq)
    table = count_jax.CountTable(
        words=jnp.asarray(tw),
        counts=jnp.asarray(tc),
        num_unique=jnp.asarray(nuniq, jnp.int32),
        overflow=jnp.asarray(False),
    )

    for p in (1, 2, 3):
        keys = jnp.asarray(
            rng.integers(0, 1 << 31, size=(p * batch, W), dtype=np.uint32)
        )
        fn = jax.jit(count_jax.merge_raw_keys)
        t = timed(fn, table, keys)
        rows = cap + p * batch
        print(
            f"P={p}: merge {rows/1e6:6.1f}M rows  {t*1e3:7.1f} ms  "
            f"{t/rows*1e9:5.2f} ns/row  amortized/batch "
            f"{t/p*1e3:7.1f} ms",
            flush=True,
        )


if __name__ == "__main__":
    main()

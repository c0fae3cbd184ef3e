"""Map the lax.sort and row-gather size response on this device.

Measured verdict (2026-08-17): `lax.sort` (2-key 3-operand, the counting
merge shape) is LINEAR at ~4.3-5.4 ns/row from 20M to 44M rows — no size
cliff. The stream-batch sweep's several-fold slowdown at larger batches
(tools/measure_stream_batch.py) is therefore the fused extract+merge
PROGRAM degrading, i.e. the axon giant-fused-program pathology, not the
sort primitive. Packed-row gathers step ~45% worse between 13M and 16M
rows (9.7 -> 14.7 ns/row) and stay flat after — the doubling loop's edge
tables sit below that boundary at CFG-2/3 scale.

Run: python tools/probe_sort_cliff.py
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from genome_assembler_tpu.utils.jaxenv import setup, sync

    setup()
    rng = np.random.default_rng(3)

    def timed(fn, *args, reps=3):
        out = fn(*args)
        sync(out.reshape(-1)[:1])
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(*args)
            sync(out.reshape(-1)[:1])
            ts.append(time.perf_counter() - t0)
        return min(ts)

    sort3 = jax.jit(
        lambda a, b, c: jax.lax.sort((a, b, c), num_keys=2)[0]
    )
    for n in (20, 24, 28, 32, 33, 34, 36, 40, 44):
        rows = n << 20
        a = jnp.asarray(rng.integers(0, 1 << 31, rows, dtype=np.int32))
        b = jnp.asarray(rng.integers(0, 1 << 31, rows, dtype=np.int32))
        c = jnp.asarray(rng.integers(0, 1 << 31, rows, dtype=np.int32))
        best = timed(sort3, a, b, c)
        print(json.dumps({
            "op": "sort_2key_3operand", "rows_m": n,
            "best_s": round(best, 3),
            "ns_per_row": round(1e9 * best / rows, 2),
        }), flush=True)
        del a, b, c

    gather = jax.jit(lambda s: s[s[:, 0]])
    for n in (8, 11, 13, 16, 17, 21):
        rows = n << 20
        idx = rng.integers(0, rows, rows, dtype=np.int32)
        s = jnp.stack(
            [jnp.asarray(idx), jnp.ones(rows, jnp.int32)], axis=1
        )
        best = timed(gather, s)
        print(json.dumps({
            "op": "packed_row_gather", "rows_m": n,
            "best_s": round(best, 3),
            "ns_per_row": round(1e9 * best / rows, 2),
        }), flush=True)
        del s


if __name__ == "__main__":
    main()

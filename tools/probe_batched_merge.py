"""Probe: can range-bucketed BATCHED sorts beat the monolithic merge sort?

The streaming counter's per-batch merge (count_jax.merge_raw_keys) is two
~cap+batch-row 3-operand sorts; monolithic lax.sort measures 3.96 ns/row
at 17M rows and degrades super-linearly past ~26M (13.6 ns/row at 81M —
tools/measure_stride_cfg2_results.json), which is why the 40 Mb run's
count stage pays ~0.9 s/batch. Batched sorts over VMEM-sized chunks
measured 1.73 ns/row (tools/probe_sort_alternatives.py).

A sorted running table range-partitions into B contiguous buckets for
FREE (static slices of a sorted array), and a sorted batch splits into
the same ranges with one searchsorted — so a bucketed merge needs no
scatter: sort the batch once, then one batched [B, cap_b] sort merges
every bucket. This probe measures the batched sort at the exact merge
shapes (3 operands, 2 keys) to size that win before building it.

Run: python tools/probe_batched_merge.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    from genome_assembler_tpu.utils.jaxenv import setup, sync

    setup()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    reps = int(os.environ.get("GA_MB_REPS", 3))
    rng = np.random.default_rng(0)
    results = {}
    mix = jnp.uint32(2654435761)

    def slope(name, body, init, i1, i2, rows):
        t = []
        for iters in (i1, i2):
            f = jax.jit(lambda c, n=iters: lax.fori_loop(0, n, body, c))
            out = f(init)
            sync(jax.tree.leaves(out)[0])
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                out = f(init)
                sync(jax.tree.leaves(out)[0])
                ts.append(time.perf_counter() - t0)
            t.append(min(ts))
        per_iter = (t[1] - t[0]) / (i2 - i1)
        rec = {
            "case": name,
            "rows": rows,
            "per_iter_s": round(per_iter, 5),
            "ns_per_row": round(per_iter / rows * 1e9, 3),
        }
        results[name] = rec
        print(json.dumps(rec), flush=True)

    def cols(n):
        return tuple(
            jnp.asarray(
                rng.integers(0, 2**32, n, dtype=np.uint64).astype(np.uint32)
            )
            for _ in range(3)
        )

    def mono_body(i, cs):
        x, y, z = cs
        x = x ^ (i.astype(jnp.uint32) * mix)
        return lax.sort((x, y, z), num_keys=2)

    def batched_body(i, cs):
        x, y, z = cs
        x = x ^ (i.astype(jnp.uint32) * mix)
        return lax.sort((x, y, z), num_keys=2, dimension=-1)

    # CFG-2 merge shape (~26M rows) and 40 Mb merge shape (~68M rows),
    # monolithic vs range-bucketed batched at a few bucket counts.
    for total_log, label in ((24, "17M"), (25, "34M"), (26, "67M")):
        n = 1 << total_log
        slope(f"mono_{label}", mono_body, cols(n), 2, 6, n)
        for blog in (4, 6, 8):
            b = 1 << blog
            m = n >> blog
            kb = tuple(c.reshape(b, m) for c in cols(n))
            slope(
                f"batched_{label}_{b}x{m >> 10}K",
                batched_body,
                kb,
                2,
                6,
                n,
            )

    path = os.path.join(
        os.path.dirname(__file__), "probe_batched_merge_results.json"
    )
    with open(path, "w") as fh:
        json.dump(results, fh, indent=2)
    print(json.dumps({"summary": path}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Probe: REAL bucketed merge (ops.bucketed) vs flat merge_raw_keys.

probe_batched_merge.py measured the raw batched-sort primitive at merge
shapes (2.4-2.6x over monolithic); this probe times the full implemented
merge step — route sort + pack + batched merge sort + batched reduce —
against count_jax.merge_raw_keys at the exact streaming shapes of CFG-2
(cap 7.34M + 18.35M-window batches) and the 40 Mb run (cap 50.3M), both
amortized over carry-dependent iterations inside one jit.

Run on-chip: python tools/probe_bucketed_pipeline.py
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

    from genome_assembler_tpu.ops import bucketed, count_jax

    reps = int(os.environ.get("GA_MB_REPS", 3))
    rng = np.random.default_rng(0)
    results = {}
    mix = jnp.uint32(2654435761)

    def timed(name, fn, *args, rows=None):
        out = fn(*args)
        sync(jax.tree.leaves(out)[0])
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(*args)
            sync(jax.tree.leaves(out)[0])
            ts.append(time.perf_counter() - t0)
        rec = {"case": name, "s": round(min(ts), 4)}
        if rows:
            rec["ns_per_row"] = round(min(ts) / rows * 1e9, 3)
        results[name] = rec
        print(json.dumps(rec), flush=True)
        return out

    w = 2  # k=31 keys

    def rand_keys(n):
        return jnp.asarray(
            rng.integers(0, 2**32 - 1, size=(n, w), dtype=np.uint64).astype(
                np.uint32
            )
        )

    for label, cap, batch_n in (
        ("cfg2", 7_340_032, 18_350_080),
        ("40mb", 50_331_648, 17_825_792),
    ):
        # perturb keys per call so XLA cannot cache across timing reps;
        # a jitted xor keeps the batch on-device and data-dependent
        @jax.jit
        def perturb(keys, i):
            return keys ^ (i.astype(jnp.uint32) * mix)

        base = rand_keys(batch_n)

        # flat path: seed table with one batch, then time one merge
        flat = count_jax.empty_table(cap, w)
        flat = count_jax.merge_raw_keys(flat, base)

        def flat_merge(t, keys):
            return count_jax.merge_raw_keys(t, keys)

        k2 = perturb(base, jnp.int32(1))
        timed(
            f"{label}_flat_merge", jax.jit(flat_merge), flat, k2,
            rows=cap + batch_n,
        )

        nb = 256
        cb, m = bucketed.bucket_geometry(
            cap, batch_n, nb=nb, cb_slack=1.25, m_slack=1.5
        )
        bt = bucketed.empty_bucketed(nb, cb, w)
        bt = bucketed.merge_raw_keys_bucketed(bt, base, m=m)

        def bkt_merge(t, keys):
            return bucketed.merge_raw_keys_bucketed(t, keys, m=m)

        timed(
            f"{label}_bucketed_merge_nb{nb}", bkt_merge, bt, k2,
            rows=cap + batch_n,
        )
        rec = {
            "case": f"{label}_geometry",
            "nb": nb,
            "cb": cb,
            "m": m,
            "bucket_rows_total": nb * (cb + m),
        }
        results[rec["case"]] = rec
        print(json.dumps(rec), flush=True)

        # flatten cost (paid once per stream)
        timed(
            f"{label}_flatten",
            lambda t: bucketed.flatten_bucketed(t, capacity=cap),
            bt,
            rows=nb * cb,
        )

    path = os.path.join(
        os.path.dirname(__file__), "probe_bucketed_pipeline_results.json"
    )
    with open(path, "w") as fh:
        json.dump(results, fh, indent=2)
    print(json.dumps({"summary": path}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

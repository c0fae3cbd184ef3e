"""On-chip primitive microbenchmarks driving the r2 perf redesign.

Measures the building blocks the counting + compression pipelines choose
between (VERDICT r1 items 1-2): lax.sort cost vs operand/key count, random
vs sorted-index gathers (the pointer-doubling inner loop), row-stacked
gathers, and unique-index scatter. Every timed region ends with a scalar
fetch (utils.jaxenv.sync) — block_until_ready lies on this platform.

Run: python tools/microbench.py [N_log2]   (defaults 1<<24 rows)
Writes one JSON line per case to stdout and a summary to
tools/microbench_results.json.
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
    if os.environ.get("GA_MB_X64") == "1":
        import jax as _jax

        _jax.config.update("jax_enable_x64", True)
    import jax
    import jax.numpy as jnp
    import numpy as np

    n = 1 << int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 24
    rng = np.random.default_rng(0)
    results = {}

    def bench(name, fn, *args, reps=3):
        fn_j = jax.jit(fn)
        out = fn_j(*args)  # compile + warm
        sync(jax.tree.leaves(out)[0])
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn_j(*args)
            sync(jax.tree.leaves(out)[0])
            times.append(time.perf_counter() - t0)
        best = min(times)
        results[name] = best
        print(json.dumps({"case": name, "n": n, "best_s": round(best, 4)}))
        return best

    u32 = lambda: jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint64).astype(np.uint32))  # noqa: E731
    a = u32()
    b = u32()
    c = u32()
    d = u32()
    idx = jnp.asarray(rng.integers(0, n, n).astype(np.int32))
    idx_sorted = jnp.sort(idx)
    vals2 = jnp.stack([idx, idx], axis=1)  # [N,2] i32

    # --- sorts: operand count x num_keys
    bench("sort_1op", lambda x: jax.lax.sort((x,), num_keys=1)[0], a)
    bench("sort_2op_1key", lambda x, y: jax.lax.sort((x, y), num_keys=1)[0], a, b)
    bench("sort_2op_2key", lambda x, y: jax.lax.sort((x, y), num_keys=2)[0], a, b)
    bench("sort_3op_1key", lambda x, y, z: jax.lax.sort((x, y, z), num_keys=1)[0], a, b, c)
    bench("sort_3op_3key", lambda x, y, z: jax.lax.sort((x, y, z), num_keys=3)[0], a, b, c)
    bench("sort_4op_2key", lambda w, x, y, z: jax.lax.sort((w, x, y, z), num_keys=2)[0], a, b, c, d)

    # --- gathers (the pointer-doubling loop shape)
    bench("gather_rand_1col", lambda x, i: x[i], a, idx)
    bench("gather_rand_2col_rows", lambda v, i: v[i], vals2, idx)
    bench("gather_sorted_1col", lambda x, i: x[i], a, idx_sorted)
    bench("gather_two_1col", lambda x, y, i: (x[i], y[i]), a, b, idx)

    # --- doubling-round shapes: anc[anc] + aux[anc] vs packed rows
    anc = idx
    bench(
        "double_2gather",
        lambda an, ax: (an[an], ax + ax[an]),
        anc, jnp.ones(n, jnp.int32),
    )
    st = jnp.stack([anc, jnp.ones(n, jnp.int32)], axis=1)
    def packed_round(s):
        g = s[s[:, 0]]
        return jnp.stack([g[:, 0], s[:, 1] + g[:, 1]], axis=1)
    bench("double_packed_rows", packed_round, st)

    # --- int64-packed doubling round: (anc, aux) in one [N] int64 column
    # vs the [N,2] int32 row stack — same bytes gathered, different
    # layout. JAX 0.9 has no scoped x64 context, so these cases need the
    # global flag: rerun with GA_MB_X64=1 (set before jax import at the
    # top of main) to include them.
    if os.environ.get("GA_MB_X64") == "1":
        v64 = jnp.asarray(
            (idx.astype(np.int64) << np.int64(32)) | np.int64(1)
        )
        bench("gather_rand_1col_i64", lambda x, i: x[i], v64, idx)

        def packed64_round(s):
            lo = np.int64(0xFFFFFFFF)
            g = s[(s >> np.int64(32)).astype(jnp.int32)]
            return (g & ~lo) | ((s & lo) + (g & lo))

        bench("double_packed_i64", packed64_round, v64)

    # --- scatter with unique indices (permutation inversion)
    perm = jnp.asarray(rng.permutation(n).astype(np.int32))
    ids = jnp.arange(n, dtype=jnp.int32)
    bench(
        "scatter_unique_set",
        lambda p, i: jnp.zeros(n, jnp.int32).at[p].set(i, mode="drop"),
        perm, ids,
    )
    # sort-based inversion of the same permutation
    bench(
        "invert_via_sort",
        lambda p, i: jax.lax.sort((p, i), num_keys=1)[1],
        perm, ids,
    )

    # --- memcpy reference (streaming bandwidth)
    bench("copy_elementwise", lambda x: x + jnp.uint32(1), a)

    # --- sort cost vs row count (GA_MB_SIZES=16,24,33 in millions):
    # measured LINEAR (~5 ns/row for 2key+1payload up to 33M, r2) — no
    # size cliff; what scales badly in streaming merges is the weighted
    # segment reduce, not the sort (models/pipeline._stream_step).
    sizes = os.environ.get("GA_MB_SIZES")
    if sizes:
        for n_m in (int(s) for s in sizes.split(",")):
            m = n_m * 1_000_000
            cols = [
                jnp.asarray(
                    rng.integers(0, 2**32, m, dtype=np.uint64).astype(
                        np.uint32
                    )
                )
                for _ in range(3)
            ]
            f = jax.jit(
                lambda x, y, z: jax.lax.sort((x, y, z), num_keys=2)[0]
            )
            sync(f(*cols)[:1])
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                sync(f(*cols)[:1])
                ts.append(time.perf_counter() - t0)
            results[f"sort_2key1pay_{n_m}M"] = min(ts)
            print(
                json.dumps(
                    {
                        "case": f"sort_2key1pay_{n_m}M",
                        "n": m,
                        "best_s": round(min(ts), 4),
                        "ns_per_row": round(min(ts) / m * 1e9, 2),
                    }
                )
            )

    path = os.path.join(os.path.dirname(__file__), "microbench_results.json")
    with open(path, "w") as fh:
        json.dump({"n": n, "results": results}, fh, indent=2)
    print(json.dumps({"summary": path}))
    return 0


if __name__ == "__main__":
    sys.exit(main())

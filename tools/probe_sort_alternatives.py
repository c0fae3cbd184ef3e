"""Probe sort alternatives for the counting/merge pipeline (VERDICT r2 item 1).

The amortized microbench (tools/microbench_amortized.py) showed lax.sort at
2.2-4.7 ns/row vs a 0.024 ns/row bandwidth pass — ~100x off HBM-bound. TPU
has no efficient scatter (amortized random gather: 8.6 ns/row), so any exact
counter reduces to sort/merge networks; the question is whether an
XLA-expressible alternative beats the monolithic lax.sort where the pipeline
actually uses it:

  A. merge of two SORTED runs (the streaming-table merge: today a full
     re-sort of table+batch) via an explicit bitonic-merge network:
     log2(n) elementwise compare-exchange stages, each a reshape + where —
     O(log n) full-array passes vs the sort's O(log^2 n) network.
  B. batched small sorts ([B, m] along the last axis): if XLA keeps each
     row's sort VMEM-resident, per-row cost should collapse vs monolithic.

All timings are slope-amortized inside one jitted fori_loop (fixed dispatch
cancels). Run: python tools/probe_sort_alternatives.py [N_log2]
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

    lg = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    n = 1 << lg
    reps = int(os.environ.get("GA_MB_REPS", 3))
    rng = np.random.default_rng(0)
    results = {}

    def u32(m=n):
        return jnp.asarray(
            rng.integers(0, 2**32, m, dtype=np.uint64).astype(np.uint32)
        )

    def slope(name, body, init, i1, i2, rows=n):
        def run(c):
            return lax.fori_loop(0, i1, body, c)

        def run2(c):
            return lax.fori_loop(0, i2, body, c)

        t = []
        for f in (jax.jit(run), jax.jit(run2)):
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
            "iters": [i1, i2],
            "per_iter_s": round(per_iter, 6),
            "ns_per_row": round(per_iter / rows * 1e9, 3),
        }
        results[name] = rec
        print(json.dumps(rec))

    mix = jnp.uint32(2654435761)

    # --- A. bitonic merge of two sorted runs, 2-word keys + 1 payload.
    # Lexicographic compare-exchange on (hi, lo), payload rides along.
    def cmp_le(h0, l0, h1, l1):
        return (h0 < h1) | ((h0 == h1) & (l0 <= l1))

    def bitonic_merge(h, l, p):
        """h/l/p: [n] columns forming a bitonic sequence; full merge."""
        m = h.shape[0]
        stages = int(np.log2(m))
        for st in range(stages):
            s = m >> (st + 1)  # stride
            hs = h.reshape(-1, 2, s)
            ls = l.reshape(-1, 2, s)
            ps = p.reshape(-1, 2, s)
            a_le = cmp_le(hs[:, 0], ls[:, 0], hs[:, 1], ls[:, 1])
            lo_h = jnp.where(a_le, hs[:, 0], hs[:, 1])
            hi_h = jnp.where(a_le, hs[:, 1], hs[:, 0])
            lo_l = jnp.where(a_le, ls[:, 0], ls[:, 1])
            hi_l = jnp.where(a_le, ls[:, 1], ls[:, 0])
            lo_p = jnp.where(a_le, ps[:, 0], ps[:, 1])
            hi_p = jnp.where(a_le, ps[:, 1], ps[:, 0])
            h = jnp.stack([lo_h, hi_h], axis=1).reshape(m)
            l = jnp.stack([lo_l, hi_l], axis=1).reshape(m)
            p = jnp.stack([lo_p, hi_p], axis=1).reshape(m)
        return h, l, p

    half = n // 2
    h0 = jnp.sort(u32(half))
    l0 = u32(half)
    h1 = jnp.sort(u32(half))
    l1 = u32(half)
    pay = u32(n)

    def merge_body(i, carry):
        h, l, p = carry
        # lo/hi halves of a sorted array are each sorted; flip the hi half
        # to form a bitonic sequence, then merge. Perturb the payload so
        # the carry is live (network timing is data-oblivious anyway).
        hh = jnp.concatenate([h[:half], h[half:][::-1]])
        ll = jnp.concatenate([l[:half], l[half:][::-1]])
        pp = jnp.concatenate([p[:half], p[half:][::-1]]) ^ (
            i.astype(jnp.uint32) * mix
        )
        return bitonic_merge(hh, ll, pp)

    init = (
        jnp.concatenate([h0, h1[::-1]]),
        jnp.concatenate([l0, l1[::-1]]),
        pay,
    )
    init = bitonic_merge(*init)  # start from a genuinely sorted carry
    slope("bitonic_merge_3col", merge_body, init, 2, 8)

    # reference: the same merge done as a full 3-operand lax.sort
    def sort_body(i, carry):
        h, l, p = carry
        p = p ^ (i.astype(jnp.uint32) * mix)
        return lax.sort((h, l, p), num_keys=2)

    slope("resort_3op_2key", sort_body, init, 2, 8)

    # --- B. batched small sorts along the last axis
    for blog in (6, 8):
        b = 1 << blog
        m = n >> blog
        kb = u32().reshape(b, m)
        lb = u32().reshape(b, m)

        def batched_body(i, carry, _b=b, _m=m):
            x, y = carry
            x = x ^ (i.astype(jnp.uint32) * mix)
            return lax.sort((x, y), num_keys=2, dimension=-1)

        slope(f"batched_sort_{b}x{m}", batched_body, (kb, lb), 2, 8)

    path = os.path.join(
        os.path.dirname(__file__), "probe_sort_alternatives_results.json"
    )
    with open(path, "w") as fh:
        json.dump({"n": n, "results": results}, fh, indent=2)
    print(json.dumps({"summary": path}))
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Isolate which sub-op of the bucketed merge the axon backend rejects.

merge_raw_keys_bucketed failed with INVALID_ARGUMENT on the chip while
its CPU semantics are fully tested; this runs each building block
standalone at CFG-2 shapes and reports pass/fail per block.

Run: python tools/probe_bucketed_isolate.py
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

    from genome_assembler_tpu.ops import bucketed
    from genome_assembler_tpu.ops.kmer_jax import SENTINEL

    rng = np.random.default_rng(0)
    w = 2
    n = 18_350_080
    nb = 256
    cb, m = 35_840, 107_520

    def case(name, fn):
        try:
            t0 = time.perf_counter()
            out = fn()
            sync(jax.tree.leaves(out)[0])
            print(json.dumps({"case": name, "ok": True,
                              "s": round(time.perf_counter() - t0, 2)}),
                  flush=True)
            return out
        except Exception as exc:
            print(json.dumps({"case": name, "ok": False,
                              "err": repr(exc)[:160]}), flush=True)
            return None

    vals = rng.integers(0, 4_650_000, size=n, dtype=np.uint64)
    keys = jnp.asarray(
        np.stack([(vals >> np.uint64(32)).astype(np.uint32),
                  vals.astype(np.uint32)], axis=1)
    )
    case("device_put", lambda: keys)

    bkt = case("bucket_of", lambda: jax.jit(
        lambda k: bucketed._bucket_of(k, nb))(keys))

    srt = case("route_sort", lambda: jax.jit(
        lambda b, k: lax.sort((b, k[:, 0], k[:, 1]), num_keys=3)
    )(bkt, keys))

    def starts_fn(bks):
        targets = jnp.arange(nb + 1, dtype=jnp.uint32)
        return jnp.searchsorted(bks, targets, side="left").astype(jnp.int32)

    starts = case("searchsorted", lambda: jax.jit(starts_fn)(srt[0]))

    def pack_fn(b0, b1, st):
        ks = jnp.stack([b0, b1], axis=1)
        ks_pad = jnp.concatenate(
            [ks, jnp.full((m, w), SENTINEL, jnp.uint32)], axis=0
        )
        lens = st[1:] - st[:-1]
        j = jnp.arange(m, dtype=jnp.int32)

        def pack_one(b):
            s = st[b]
            seg = lax.dynamic_slice(ks_pad, (s, jnp.int32(0)), (m, w))
            return jnp.where((j < lens[b])[:, None], seg, SENTINEL)

        return lax.map(pack_one, jnp.arange(nb, dtype=jnp.int32))

    packed = case("lax_map_pack", lambda: jax.jit(pack_fn)(
        srt[1], srt[2], starts))

    def bsort_fn(pw):
        tbl_w = jnp.full((nb, cb, w), SENTINEL, jnp.uint32)
        merged = jnp.concatenate([tbl_w, pw], axis=1)
        wts = jnp.concatenate(
            [jnp.zeros((nb, cb), jnp.int32), jnp.ones((nb, m), jnp.int32)],
            axis=1,
        )
        return lax.sort(
            (merged[:, :, 0], merged[:, :, 1], wts), num_keys=w
        )

    bs = case("batched_sort_3op", lambda: jax.jit(bsort_fn)(packed))

    def reduce_fn(a, b, wt):
        words = jnp.stack([a, b], axis=2)
        return bucketed._batched_weighted_reduce(words, wt)

    case("batched_reduce", lambda: jax.jit(reduce_fn)(*bs))

    bt = bucketed.empty_bucketed(nb, cb, w)
    case("full_merge", lambda: bucketed.merge_raw_keys_bucketed(
        bt, keys, m=m))
    return 0


if __name__ == "__main__":
    sys.exit(main())

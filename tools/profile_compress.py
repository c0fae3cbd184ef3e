"""On-chip sub-stage profile of unitig compression + spelling at CFG-2 scale.

Builds an E.-coli-scale canonical k-mer table cheaply (the genome as one
long read: ~4.64M windows, single-shot count) so the compress/spell
stages see exactly their CFG-2 shapes, then times every sub-dispatch
with hard scalar syncs (block_until_ready lies on this platform).

Run: python tools/profile_compress.py [genome_mb [k]]
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
    import numpy as np

    from genome_assembler_tpu.models.pipeline import count_reads_device
    from genome_assembler_tpu.ops import count_jax
    from genome_assembler_tpu.ops.unitig_jax import (
        DeviceUnitigs,
        _build_edges,
        _finalize_chains,
        _link_sortjoin,
        _rank_pass,
        _rank_sampled,
        spell_arrays,
    )
    from genome_assembler_tpu.utils.config import AssemblyConfig
    from genome_assembler_tpu.utils.simulate import simulate_genome

    mb = float(sys.argv[1]) if len(sys.argv) > 1 else 4.64
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 31
    n = int(mb * 1_000_000)
    genome = simulate_genome(n, seed=7)
    cfg = AssemblyConfig(k=k)

    def timed(name, fn, *args, reps=2, **kw):
        out = fn(*args, **kw)  # compile + warm
        sync(jax.tree.leaves(out)[0])
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(*args, **kw)
            sync(jax.tree.leaves(out)[0])
            ts.append(time.perf_counter() - t0)
        print(json.dumps({"stage": name, "best_s": round(min(ts), 4)}))
        return out

    # Build the CFG-2-scale table HOST-side (NumPy oracle extraction +
    # one device_put): avoids paying fresh axon compiles for the count
    # path, which this profile does not measure. Capacity is snug —
    # exactly what the real pipeline's compact_table produces.
    t0 = time.perf_counter()
    import jax.numpy as jnp

    from genome_assembler_tpu.ops.kmer_ref import extract_canonical_np
    from genome_assembler_tpu.ops.count_jax import snug_capacity

    keys = extract_canonical_np(genome[None, :], k)
    if keys.shape[1] != 2:
        raise SystemExit("profile supports W==2 keys (17 <= k <= 31)")
    u64 = keys.astype(np.uint64)
    packed = (u64[:, 0] << np.uint64(32)) | u64[:, 1]
    uniq, cnt = np.unique(packed, return_counts=True)
    words_np = np.stack(
        [(uniq >> np.uint64(32)).astype(np.uint32), uniq.astype(np.uint32)],
        axis=1,
    )
    num = words_np.shape[0]
    cap = snug_capacity(num, fine=True)
    from genome_assembler_tpu.ops.kmer_jax import SENTINEL

    words_full = np.full((cap, keys.shape[1]), SENTINEL, np.uint32)
    words_full[:num] = words_np
    counts_full = np.zeros(cap, np.int32)
    counts_full[:num] = cnt.astype(np.int32)
    table = count_jax.CountTable(
        words=jnp.asarray(words_full),
        counts=jnp.asarray(counts_full),
        num_unique=jnp.asarray(num, jnp.int32),
        overflow=jnp.asarray(False),
    )
    sync(table.num_unique)
    print(
        json.dumps(
            {
                "stage": "build_table(host,untimed)",
                "s": round(time.perf_counter() - t0, 2),
                "num_unique": num,
                "cap": cap,
            }
        )
    )

    ew, covs, valid = timed("build_edges", _build_edges, table, k)
    e = ew.shape[0]
    print(json.dumps({"stage": "edge_rows", "e": e}))
    prev = timed("link_sortjoin", _link_sortjoin, ew, valid, k)
    anc, dist, has_cycle = timed("rank_pass(doubling)", _rank_pass, prev)
    anc_s, dist_s, ok_s = timed("rank_sampled(fast path)", _rank_sampled, prev)
    print(json.dumps({"stage": "sampled_ok", "ok": bool(ok_s),
                      "matches_plain": bool(
                          (np.asarray(anc_s) == np.asarray(anc)).all()
                          and (np.asarray(dist_s) == np.asarray(dist)).all()
                      )}))
    uid, pos, num = timed(
        "finalize_chains", _finalize_chains, prev, anc, dist, valid
    )
    dev = DeviceUnitigs(
        edge_words=ew, cov=covs, uid=uid, pos=pos, valid=valid,
        num_unitigs=num,
    )
    from genome_assembler_tpu.ops.count_jax import snug_capacity

    u_cap = min(e, snug_capacity(int(num), floor=1 << 12))
    print(json.dumps({"stage": "num_unitigs", "num": int(num), "u_cap": u_cap}))
    arrs = timed("spell_arrays", spell_arrays, dev, u_cap)

    u = int(arrs.num_unitigs)
    lengths = np.asarray(arrs.lengths)[:u].astype(np.int64)
    total_body = int(lengths.sum())
    for _ in range(2):
        t0 = time.perf_counter()
        bases = np.asarray(arrs.bases)
        tb = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "stage": "bases_transfer",
                "best_s": round(tb, 4),
                "bytes": int(bases.nbytes),
                "total_body": total_body,
            }
        )
    )
    t0 = time.perf_counter()
    from genome_assembler_tpu.host.dbg import spell_device_arrays

    ua = spell_device_arrays(dev, k)
    print(
        json.dumps(
            {
                "stage": "spell_device_arrays(full,warm)",
                "s": round(time.perf_counter() - t0, 4),
                "buf_bytes": int(ua.buf.nbytes),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())

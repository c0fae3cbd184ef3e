"""Sub-step profile of the spell stage at CFG-2 scale (see profile_compress).

Replicates host.dbg.spell_device_arrays step by step with hard timings:
device reduction, each device->host pull (fresh arrays per rep — JAX
caches the host copy after the first np.asarray), and the host NumPy
assembly. Also measures a raw device->host transfer to pin today's link
bandwidth.

Run: python tools/profile_spell.py [genome_mb [k]]
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

    from genome_assembler_tpu.ops import count_jax
    from genome_assembler_tpu.ops.count_jax import snug_capacity
    from genome_assembler_tpu.ops.kmer_jax import SENTINEL
    from genome_assembler_tpu.ops.kmer_ref import extract_canonical_np
    from genome_assembler_tpu.ops.unitig_jax import (
        compress_unitigs_device,
        spell_arrays,
    )
    from genome_assembler_tpu.utils.simulate import simulate_genome

    mb = float(sys.argv[1]) if len(sys.argv) > 1 else 4.64
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 31
    genome = simulate_genome(int(mb * 1_000_000), seed=7)

    t0 = time.perf_counter()
    keys = extract_canonical_np(genome[None, :], k)
    u64 = keys.astype(np.uint64)
    packed = (u64[:, 0] << np.uint64(32)) | u64[:, 1]
    uniq, cnt = np.unique(packed, return_counts=True)
    words_np = np.stack(
        [(uniq >> np.uint64(32)).astype(np.uint32), uniq.astype(np.uint32)],
        axis=1,
    )
    num = words_np.shape[0]
    cap = snug_capacity(num, fine=True)
    words_full = np.full((cap, 2), SENTINEL, np.uint32)
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
    print(json.dumps({"step": "host_build", "s": round(time.perf_counter() - t0, 2), "num": num}))

    t0 = time.perf_counter()
    dev = compress_unitigs_device(table, k)
    sync(dev.num_unitigs)
    print(json.dumps({"step": "compress(untimed)", "s": round(time.perf_counter() - t0, 2)}))

    e = dev.edge_words.shape[0]
    u_cap = min(e, snug_capacity(int(dev.num_unitigs), floor=1 << 12))

    # device reduction, warm
    arrs = spell_arrays(dev, u_cap)
    sync(arrs.num_unitigs)
    ts = []
    for _ in range(2):
        t0 = time.perf_counter()
        arrs = spell_arrays(dev, u_cap)
        sync(arrs.num_unitigs)
        ts.append(time.perf_counter() - t0)
    print(json.dumps({"step": "spell_arrays(device)", "best_s": round(min(ts), 4)}))

    # each pull, fresh arrays per rep (avoid the cached host copy)
    for name in ("num_unitigs", "lengths", "cov_sum", "head_words", "bases"):
        ts = []
        for _ in range(2):
            a2 = spell_arrays(dev, u_cap)
            sync(a2.num_unitigs)
            t0 = time.perf_counter()
            val = np.asarray(getattr(a2, name))
            ts.append(time.perf_counter() - t0)
        print(
            json.dumps(
                {
                    "step": f"pull_{name}",
                    "best_s": round(min(ts), 4),
                    "bytes": int(val.nbytes),
                }
            )
        )

    # raw link bandwidth today: fresh 16 MB device array -> host
    raw = jnp.arange(4 * 1024 * 1024, dtype=jnp.int32) + table.num_unique
    sync(raw)
    t0 = time.perf_counter()
    np.asarray(raw)
    dt = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "step": "raw_d2h_16MB",
                "s": round(dt, 4),
                "mb_per_s": round(16 / dt, 1),
            }
        )
    )

    # host assembly portion (arrays already on host)
    u = int(arrs.num_unitigs)
    lengths = np.asarray(arrs.lengths)[:u].astype(np.int64)
    head_words = np.asarray(arrs.head_words)[:u]
    total_body = int(lengths.sum())
    from genome_assembler_tpu.utils.dna import unpack_codes_np
    bases = unpack_codes_np(np.asarray(arrs.bases), total_body)
    w = head_words.shape[1]
    t0 = time.perf_counter()
    str_len = (k - 1) + lengths
    offsets = np.zeros(u + 1, dtype=np.int64)
    np.cumsum(str_len, out=offsets[1:])
    buf = np.empty(int(offsets[-1]), dtype=np.uint8)
    body_excl = np.concatenate([[0], np.cumsum(lengths)[:-1]])
    dest = (
        np.repeat(offsets[:-1] + (k - 1), lengths)
        + np.arange(total_body, dtype=np.int64)
        - np.repeat(body_excl, lengths)
    )
    buf[dest] = bases
    for j in range(k - 1):
        bitpos = 2 * (k - 1 - j)
        widx = w - 1 - bitpos // 32
        base = (head_words[:, widx] >> np.uint32(bitpos % 32)) & np.uint32(3)
        buf[offsets[:-1] + j] = base.astype(np.uint8)
    print(json.dumps({"step": "host_assembly", "s": round(time.perf_counter() - t0, 4)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())

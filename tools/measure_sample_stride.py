"""On-chip measurement: SAMPLE_STRIDE for the sampled two-level ranking.

Phase A of ops.unitig_jax._rank_sampled pays ceil(log2(max inter-ruler
gap)) FULL-SIZE packed-row gather rounds — the dominant compress cost at
CFG-2 scale — while phase B doubles over only E/stride contracted rows.
Smaller strides cut phase-A rounds and grow phase B; this tool times the
real _rank_sampled on a CFG-2-shaped predecessor array per stride so the
default is a measurement, not a guess.

Run: python tools/measure_sample_stride.py [strides...]   (default 8 16 32 64)
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

    from genome_assembler_tpu.ops import count_jax, unitig_jax
    from genome_assembler_tpu.ops.kmer_jax import SENTINEL
    from genome_assembler_tpu.ops.kmer_ref import extract_canonical_np
    from genome_assembler_tpu.utils.simulate import simulate_genome

    strides = [int(a) for a in sys.argv[1:]] or [8, 16, 32, 64]
    k = 31
    n = int(os.environ.get("GA_MSS_GENOME", 4_641_652))  # CFG-2 scale
    genome = simulate_genome(n, seed=7)

    # Build the post-filter table host-side (cheap, untimed) exactly like
    # tools/profile_compress.py, then run the real edge build + linker
    # once to obtain the production-shaped prev array.
    import jax.numpy as jnp

    keys = extract_canonical_np(genome[None, :], k)
    u64 = keys.astype(np.uint64)
    packed = (u64[:, 0] << np.uint64(32)) | u64[:, 1]
    uniq, cnt = np.unique(packed, return_counts=True)
    words_np = np.stack(
        [(uniq >> np.uint64(32)).astype(np.uint32), uniq.astype(np.uint32)],
        axis=1,
    )
    num = words_np.shape[0]
    cap = count_jax.snug_capacity(num, fine=True)
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
    ew, covs, valid = unitig_jax._build_edges(table, k)
    prev = unitig_jax._link_sortjoin(ew, valid, k)
    sync(prev[:1])
    print(json.dumps({"stage": "setup", "edge_rows": int(prev.shape[0])}))

    # GA_MSS_SKIP_PLAIN=1 skips the plain-doubling reference (minutes per
    # pass at 40 Mb / ~84M-row scale); the first stride's result then
    # serves as the cross-stride equality reference instead.
    anc_ref = dist_ref = None
    if os.environ.get("GA_MSS_SKIP_PLAIN") != "1":
        plain_fn = unitig_jax._rank_pass
        anc_ref, dist_ref, _ = plain_fn(prev)
        sync(anc_ref[:1])
        t_plain = []
        for _ in range(2):
            t0 = time.perf_counter()
            a, d, c = plain_fn(prev)
            sync(a[:1])
            t_plain.append(time.perf_counter() - t0)
        print(
            json.dumps({"stage": "rank_plain",
                        "best_s": round(min(t_plain), 4)})
        )
        anc_ref = np.asarray(anc_ref)
        dist_ref = np.asarray(dist_ref)

    raw = unitig_jax._rank_sampled.__wrapped__
    for s in strides:
        unitig_jax.SAMPLE_STRIDE = s
        fn = jax.jit(raw)
        head, rank, ok = fn(prev)  # compile + warm
        sync(head[:1])
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            head, rank, ok = fn(prev)
            sync(head[:1])
            ts.append(time.perf_counter() - t0)
        if anc_ref is None:
            anc_ref = np.asarray(head)
            dist_ref = np.asarray(rank)
        match = bool(
            (np.asarray(head) == anc_ref).all()
            and (np.asarray(rank) == dist_ref).all()
        )
        print(
            json.dumps(
                {
                    "stage": "rank_sampled",
                    "stride": s,
                    "best_s": round(min(ts), 4),
                    "ok": bool(ok),
                    "matches_plain": match,
                }
            ),
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())

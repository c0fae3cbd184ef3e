"""On-chip probe: contraction-tail list ranking vs plain sampled ranking
(VERDICT r4 item 3 / r5 next-round item 3).

Phase A of ops.unitig_jax._rank_sampled runs ~log2(max ruler gap)
full-size gather rounds at the 40 Mb edge-table shape (~84M rows), but
after r rounds only ~exp(-2^r/stride) of lanes remain unresolved — the
late rounds re-gather an almost-fully-resolved array. The contraction
variant (_rank_sampled_contract) stops at r0 full-size rounds,
sort-compacts the unresolved tail into an E/div buffer, finishes there,
and recombines with one unique-index scatter. This tool times both on
the production-shaped prev array and sweeps r0, checking bit-equality —
the adopt/revert decision is this measurement, per repo custom
(stride/straggler precedent).

Run: python tools/measure_rank_contract.py [r0s...]   (default 5 6 7)
Env: GA_MSS_GENOME genome bases (default 40e6 -> ~84M edge rows).
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

    from genome_assembler_tpu.ops import count_jax, unitig_jax
    from genome_assembler_tpu.ops.kmer_jax import SENTINEL
    from genome_assembler_tpu.ops.kmer_ref import extract_canonical_np
    from genome_assembler_tpu.utils.simulate import simulate_genome

    r0s = [int(a) for a in sys.argv[1:]] or [5, 6, 7]
    k = 31
    n = int(float(os.environ.get("GA_MSS_GENOME", 40e6)))
    genome = simulate_genome(n, seed=7)

    # production-shaped prev: host-side unique table -> edge build + linker
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
    print(json.dumps({"stage": "setup", "edge_rows": int(prev.shape[0])}),
          flush=True)

    def time_fn(fn, *args):
        head, rank, ok = fn(prev, *args)
        sync(head[:1])  # compile + warm
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            head, rank, ok = fn(prev, *args)
            sync(head[:1])
            ts.append(time.perf_counter() - t0)
        return np.asarray(head), np.asarray(rank), bool(ok), min(ts)

    h_ref, r_ref, ok_ref, t_plain = time_fn(unitig_jax._rank_sampled)
    print(json.dumps({"stage": "rank_sampled_plain", "ok": ok_ref,
                      "best_s": round(t_plain, 4)}), flush=True)

    for r0 in r0s:
        h, r, ok, t = time_fn(
            unitig_jax._rank_sampled_contract, r0, unitig_jax.CONTRACT_DIV
        )
        match = bool((h == h_ref).all() and (r == r_ref).all())
        print(json.dumps({
            "stage": "rank_sampled_contract",
            "r0": r0,
            "div": unitig_jax.CONTRACT_DIV,
            "ok": ok,
            "matches_plain": match,
            "best_s": round(t, 4),
            "speedup_vs_plain": round(t_plain / t, 3),
        }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

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
        try:
            t0 = time.perf_counter()
            out = fn(*args)
            sync(jax.tree.leaves(out)[0])
            compile_s = time.perf_counter() - t0
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                out = fn(*args)
                sync(jax.tree.leaves(out)[0])
                ts.append(time.perf_counter() - t0)
        except Exception as exc:  # axon tunnel flakes: record, continue
            rec = {"case": name, "error": repr(exc)[:200]}
            results[name] = rec
            print(json.dumps(rec), flush=True)
            return None
        rec = {
            "case": name,
            "s": round(min(ts), 4),
            "compile_s": round(compile_s, 1),
        }
        if rows:
            rec["ns_per_row"] = round(min(ts) / rows * 1e9, 3)
        results[name] = rec
        print(json.dumps(rec), flush=True)
        return out

    w = 2  # k=31 keys

    def rand_keys(n, distinct):
        # bounded key space: ~CFG-2-like aggregation (4-5M uniques out of
        # an 18M-window batch) instead of all-unique rows that saturate
        # the table; randomness rides the last word, realistic for sorts
        vals = rng.integers(0, distinct, size=n, dtype=np.uint64)
        return jnp.asarray(
            np.stack(
                [
                    (vals >> np.uint64(32)).astype(np.uint32),
                    vals.astype(np.uint32),
                ],
                axis=1,
            )
        )

    only = os.environ.get("GA_PROBE_CASES", "")
    for label, cap, batch_n, distinct in (
        ("cfg2", 7_340_032, 18_350_080, 4_650_000),
        ("40mb", 50_331_648, 17_825_792, 40_000_000),
    ):
        if only and label not in only.split(","):
            continue
        base = rand_keys(batch_n, distinct)

        def timed_chain(name, step, state, rows):
            """Chain `step(state, base)` like the real stream — the
            bucketed merge DONATES its table argument, so a rep must
            consume the previous rep's output, never reuse an input
            (donation is a no-op on CPU but real on TPU: reusing a
            donated table raises a backend error). Feeding the same
            batch each rep keeps the table at steady-state uniques,
            like a genome-bounded stream."""
            try:
                t0 = time.perf_counter()
                state = step(state, base)
                sync(jax.tree.leaves(state)[0])
                compile_s = time.perf_counter() - t0
                ts = []
                for _ in range(reps):
                    t0 = time.perf_counter()
                    state = step(state, base)
                    sync(jax.tree.leaves(state)[0])
                    ts.append(time.perf_counter() - t0)
            except Exception as exc:
                rec = {"case": name, "error": repr(exc)[:200]}
                results[name] = rec
                print(json.dumps(rec), flush=True)
                return None
            rec = {
                "case": name,
                "s": round(min(ts), 4),
                "compile_s": round(compile_s, 1),
                "ns_per_row": round(min(ts) / rows * 1e9, 3),
            }
            results[name] = rec
            print(json.dumps(rec), flush=True)
            return state

        flat = timed_chain(
            f"{label}_flat_merge",
            lambda t, k: count_jax.merge_raw_keys(t, k),
            count_jax.empty_table(cap, w),
            cap + batch_n,
        )
        del flat

        nb = 256
        cb, m = bucketed.bucket_geometry(
            cap, batch_n, nb=nb, cb_slack=1.25, m_slack=1.5
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
        bt = timed_chain(
            f"{label}_bucketed_merge_nb{nb}",
            lambda t, k: bucketed.merge_raw_keys_bucketed(t, k, m=m),
            bucketed.empty_bucketed(nb, cb, w),
            cap + batch_n,
        )
        if bt is not None:
            # flatten cost (paid once per stream); no donation
            timed(
                f"{label}_flatten",
                lambda t: bucketed.flatten_bucketed(t, capacity=cap),
                bt,
                rows=nb * cb,
            )

    path = os.path.join(
        os.path.dirname(__file__), "probe_bucketed_pipeline_results.json"
    )
    if os.path.exists(path):  # GA_PROBE_CASES reruns merge, not clobber
        with open(path) as fh:
            prior = json.load(fh)
        prior.update(results)
        results = prior
    with open(path, "w") as fh:
        json.dump(results, fh, indent=2)
    print(json.dumps({"summary": path}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

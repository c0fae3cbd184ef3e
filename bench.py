"""Benchmark harness: canonical k-mer counting throughput (SURVEY.md §6).

Prints ONE JSON line:
  {"metric": "kmer_count_throughput", "value": <kmers/s>, "unit": "kmers/s",
   "vs_baseline": <speedup vs the reference-style Python dict counter>, ...}

The primary metric is the north-star inner loop (BASELINE.json: "k-mers
counted/s/chip"): extraction + canonicalization + sort/segment-reduce
counting of a CFG-2-shaped simulated read set on one chip. ``vs_baseline``
is the measured speedup over the reference assembler's counting hot loop
(a straight Python dict-upsert per window, SURVEY.md §3.3) on the same
machine — the reference publishes no numbers of its own (BASELINE.md), so
its own implementation is the baseline to beat.

Env knobs: GA_BENCH_GENOME (bases), GA_BENCH_COVERAGE, GA_BENCH_K,
GA_BENCH_REPS, GA_BENCH_BASELINE_WINDOWS.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax.numpy as jnp
import numpy as np


def _axon_probe_ok(timeout_s: float) -> bool:
    """True if the tunneled axon backend initializes AND executes.

    Runs in a subprocess: in its outage mode the backend can hang the
    in-process init for ~20 minutes before raising UNAVAILABLE, which
    would eat the driver's bench timeout before the in-process CPU
    fallback could trigger. A subprocess can be killed on a deadline,
    and backend init is per-process, so the sequential re-init in the
    parent is cheap when the backend is healthy. The probe runs a jit +
    scalar fetch (not just devices()) because device listing can succeed
    while remote execution is down.
    """
    import subprocess

    code = (
        "import jax, numpy as np, jax.numpy as jnp\n"
        "x = jax.jit(lambda a: a + 1)(jnp.zeros(4, jnp.int32))\n"
        "assert int(np.asarray(x)[0]) == 1\n"
        "print('AXON_UP')\n"
    )
    try:
        out = subprocess.run(
            [sys.executable, "-c", code],
            timeout=timeout_s,
            capture_output=True,
            text=True,
        )
    except subprocess.TimeoutExpired:
        return False
    return out.returncode == 0 and "AXON_UP" in out.stdout


def main() -> int:
    import jax

    from genome_assembler_tpu.utils.jaxenv import setup

    setup()

    # If the tunneled axon backend is down (observed: UNAVAILABLE after a
    # hang of up to ~20 min), fall back to CPU so the driver still records
    # a real measurement — detail.backend reports what actually ran. The
    # probe must run before any module-level jnp constant (e.g.
    # kmer_jax.SENTINEL) triggers backend init inside the imports below,
    # and it runs in a deadline-killed subprocess so a hung init cannot
    # consume the whole bench timeout (GA_BENCH_INIT_TIMEOUT seconds).
    #
    # r5 (VERDICT r4 item 2): a single failed probe no longer dooms the
    # round to a CPU artifact — the relay died transiently in r4 and
    # returned minutes later. Retry inside a bounded window
    # (GA_BENCH_RETRY_DEADLINE s total, default 600): the cheap 2 s TCP
    # probe of the relay port gates each expensive subprocess probe, so
    # a dead relay costs one sleep per cycle, not a hung init. The loud
    # CPU fallback remains the terminal case, with the timed retry log
    # on stderr as the artifact's tail.
    fell_back = False
    if os.environ.get("GA_PLATFORM") != "cpu":
        from genome_assembler_tpu.utils.jaxenv import tunnel_alive

        probe_timeout = float(os.environ.get("GA_BENCH_INIT_TIMEOUT", 300))
        retry_deadline = float(
            os.environ.get("GA_BENCH_RETRY_DEADLINE", 600)
        )
        retry_interval = float(
            os.environ.get("GA_BENCH_RETRY_INTERVAL", 30)
        )
        t_probe0 = time.time()
        attempt = 0
        tpu_ok = False
        while True:
            attempt += 1
            elapsed = time.time() - t_probe0
            if tunnel_alive():
                if _axon_probe_ok(probe_timeout):
                    tpu_ok = True
                    break
                print(
                    f"# axon probe attempt {attempt} at t={elapsed:.0f}s: "
                    "relay TCP up but backend init/exec failed",
                    file=sys.stderr, flush=True,
                )
            else:
                print(
                    f"# axon probe attempt {attempt} at t={elapsed:.0f}s: "
                    "relay TCP down",
                    file=sys.stderr, flush=True,
                )
            if time.time() - t_probe0 + retry_interval > retry_deadline:
                break
            time.sleep(retry_interval)
        if not tpu_ok:
            print(
                f"# axon backend unavailable after {attempt} probe "
                f"attempt(s) over {time.time() - t_probe0:.0f}s; falling "
                "back to cpu", file=sys.stderr,
            )
            jax.config.update("jax_platforms", "cpu")
            fell_back = True
    try:
        jax.devices()
    except RuntimeError as e:
        print(f"# axon backend unavailable ({e}); falling back to cpu",
              file=sys.stderr)
        jax.config.update("jax_platforms", "cpu")
        jax.devices()
        fell_back = True

    import numpy as np

    from genome_assembler_tpu.models.oracle import count_canonical_dict
    from genome_assembler_tpu.models.pipeline import count_reads_device
    from genome_assembler_tpu.utils.config import AssemblyConfig
    from genome_assembler_tpu.utils.dna import key_words
    from genome_assembler_tpu.utils.simulate import simulate_genome, simulate_reads

    # ~17.5M windows: large enough for steady-state throughput, small
    # enough that the axon backend's size-scaled compile stays bounded.
    genome_len = int(os.environ.get("GA_BENCH_GENOME", 1_000_000))
    coverage = float(os.environ.get("GA_BENCH_COVERAGE", 25))
    k = int(os.environ.get("GA_BENCH_K", 31))
    reps = int(os.environ.get("GA_BENCH_REPS", 3))
    if fell_back and "GA_BENCH_GENOME" not in os.environ:
        # emergency CPU run: keep the full-pipeline passes within any
        # reasonable driver timeout (the CPU backend is ~2 orders slower)
        genome_len, coverage, reps = 200_000, 12.0, 1
    read_len = 100

    genome = simulate_genome(genome_len, seed=11)
    rs = simulate_reads(
        genome, coverage=coverage, read_len=read_len, seed=12
    )
    reads = rs.codes
    n_windows = reads.shape[0] * (read_len - k + 1)
    cfg = AssemblyConfig(k=k, read_len=read_len)

    # Warmup: compile + first run. Timed regions end with a scalar fetch:
    # on the axon platform block_until_ready returns before remote
    # execution completes, so only a host fetch measures real completion
    # (ADVICE.md r1; the fetch itself is one ~32 ms roundtrip).
    from genome_assembler_tpu.models.pipeline import _count_batch
    from genome_assembler_tpu.utils.dna import pack_codes
    from genome_assembler_tpu.utils.jaxenv import sync

    # The counting metric is k-mers counted/s/chip (BASELINE.md): reads
    # are staged on device before the timed region — the ~40 MB/s tunnel
    # transfer is reported separately, not folded into the kernel rate.
    packed = pack_codes(reads)
    # touch the device first: the first program on a fresh axon process
    # pays a ~10 min one-time init that must not masquerade as transfer
    sync(jax.jit(lambda x: x + 1)(jnp.zeros(8, jnp.int32)))
    t0 = time.perf_counter()
    reads_dev = jax.device_put(packed)
    sync(reads_dev[0, :1])
    transfer_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    table = _count_batch(reads_dev, k, np.int32(reads.shape[0]),
                         read_len=read_len)
    sync(table.num_unique)
    warmup_s = time.perf_counter() - t0

    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        table = _count_batch(reads_dev, k, np.int32(reads.shape[0]),
                             read_len=read_len)
        sync(table.num_unique)
        times.append(time.perf_counter() - t0)
    best = min(times)
    kmers_per_s = n_windows / best

    # Pallas vs XLA extraction, isolated (VERDICT r1 item 10): same staged
    # reads, same key contract; a cheap reduce forces full key production.
    extract_cmp = {}
    if jax.default_backend() != "cpu":
        from genome_assembler_tpu.ops.kmer_jax import extract_canonical_flat
        from genome_assembler_tpu.ops.kmer_pallas import (
            extract_canonical_flat_pallas,
        )

        pad_b = -(-reads.shape[0] // 256) * 256
        reads_pad = np.zeros((pad_b, read_len), np.uint8)
        reads_pad[: reads.shape[0]] = reads
        reads_pad_dev = jax.device_put(reads_pad)
        nv = np.int32(reads.shape[0])

        def timed(fn, *args):
            out = fn(*args)
            sync(out)
            times = []
            for _ in range(reps):
                t0 = time.perf_counter()
                out = fn(*args)
                sync(out)
                times.append(time.perf_counter() - t0)
            return min(times)

        xla_fn = jax.jit(
            lambda r: extract_canonical_flat(r, k, nv)[0].sum()
        )
        pls_fn = jax.jit(
            lambda r: extract_canonical_flat_pallas(r, k, nv)[0].sum()
        )
        try:
            xla_s = timed(xla_fn, reads_pad_dev)
            pls_s = timed(pls_fn, reads_pad_dev)
            extract_cmp = {
                "extract_xla_s": round(xla_s, 4),
                "extract_pallas_s": round(pls_s, 4),
                "extract_xla_kmers_per_s": round(n_windows / xla_s, 1),
                "extract_pallas_kmers_per_s": round(n_windows / pls_s, 1),
            }
        except Exception as e:  # pallas unavailable on this backend
            extract_cmp = {"extract_pallas_error": f"{type(e).__name__}: {e}"}

    # Measured achievable stream bandwidth, two ways (VERDICT r2 item 1):
    #  * single-dispatch (the r2 number): one elementwise pass, timed with
    #    one sync — CONFOUNDED by the ~32 ms dispatch roundtrip on this
    #    tunneled platform, kept for continuity;
    #  * amortized: N carry-dependent passes inside ONE jitted fori_loop,
    #    per-pass cost from the slope between two iteration counts, so the
    #    fixed dispatch cost cancels exactly. The body is a data-dependent
    #    xor-shift (an affine c+1 gets unrolled + algebraically collapsed
    #    by XLA and measures an impossible multi-TB/s). Measured r3:
    #    658 GB/s = 80% of nominal v5e HBM — the tunnel throttles dispatch
    #    and transfers, NOT on-chip HBM (tools/microbench_amortized.py).
    w = key_words(k)
    big = jnp.zeros((n_windows, w), jnp.uint32)
    copy = jax.jit(lambda x: x + jnp.uint32(1))
    sync(copy(big)[0, :1])
    t0 = time.perf_counter()
    sync(copy(big)[0, :1])
    stream_s = time.perf_counter() - t0
    measured_bw = 2 * n_windows * w * 4 / stream_s  # read + write

    from jax import lax

    def _mix_body(i, c):
        return c ^ ((c >> jnp.uint32(15)) + jnp.uint32(1))

    def _slope(body, init, i1, i2):
        """Per-iteration seconds from the slope between two loop lengths."""
        t = []
        for iters in (i1, i2):
            f = jax.jit(
                lambda c, n=iters: lax.fori_loop(0, n, body, c)
            )
            out = f(init)
            sync(jax.tree.leaves(out)[0])
            best = min(
                _timed_once(f, init) for _ in range(max(2, reps))
            )
            t.append(best)
        return (t[1] - t[0]) / (i2 - i1)

    def _timed_once(f, init):
        t0 = time.perf_counter()
        out = f(init)
        sync(jax.tree.leaves(out)[0])
        return time.perf_counter() - t0

    stream_amortized_s = _slope(_mix_body, big, 8, 64)
    measured_bw_amortized = 2 * n_windows * w * 4 / max(
        stream_amortized_s, 1e-9
    )

    # Measured sort floor: the counting dispatch IS two lax.sort calls on
    # this volume (count_jax.count_keys: a W-key sort of the key stream +
    # the masked-key compaction sort, W keys + 1 position payload) plus
    # elementwise scans that fuse into them. Timing those two sorts alone
    # on identical shapes gives the device's achievable bound for any
    # sort-based counter. The r2 claim that this floor ~= 2.5-3 stream
    # passes was a dispatch-latency artifact; the honest r3 statement
    # (ARCHITECTURE.md "Counting is sort-bound on TPU"): real HBM
    # bandwidth is ~658 GB/s, lax.sort is ~100 bandwidth passes, and no
    # XLA-expressible alternative beats it — bitonic merge networks
    # measure 5x worse, random gathers 2-4x worse per pass, and the
    # batched VMEM-resident sort that IS ~1.8x faster per row needs a
    # partition primitive TPU lacks (tools/probe_sort_alternatives.py).
    cols = [jnp.zeros(n_windows, jnp.uint32) for _ in range(w + 1)]
    sort1 = jax.jit(
        lambda *c: jax.lax.sort(c, num_keys=w)[0]
    )
    sort2 = jax.jit(
        lambda *c: jax.lax.sort(c, num_keys=w)[0]
    )
    sync(sort1(*cols[:w])[:1])
    sync(sort2(*cols)[:1])
    t0 = time.perf_counter()
    sync(sort1(*cols[:w])[:1])
    sort1_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    sync(sort2(*cols)[:1])
    sort2_s = time.perf_counter() - t0
    sort_floor_s = sort1_s + sort2_s

    # Amortized sort floor (same two dispatch shapes, slope-timed): the
    # counting kernel's achievable bound with the fixed dispatch cost
    # removed. frac_of_amortized_sort_floor is the honest utilization
    # number; the gap between the amortized and single-dispatch floors is
    # pure dispatch latency the tunnel adds.
    rng_np = np.random.default_rng(3)
    acols = [
        jnp.asarray(
            rng_np.integers(0, 2**32, n_windows, dtype=np.uint64).astype(
                np.uint32
            )
        )
        for _ in range(w + 1)
    ]
    mixc = jnp.uint32(2654435761)

    def _sort1_body(i, cs):
        xs = (cs[0] ^ (i.astype(jnp.uint32) * mixc),) + cs[1:]
        return jax.lax.sort(xs, num_keys=w)

    def _sort2_body(i, cs):
        xs = (cs[0] ^ (i.astype(jnp.uint32) * mixc),) + cs[1:]
        return jax.lax.sort(xs, num_keys=w)

    sort1_am = _slope(_sort1_body, tuple(acols[:w]), 2, 6)
    sort2_am = _slope(_sort2_body, tuple(acols), 2, 6)
    sort_floor_amortized_s = sort1_am + sort2_am

    # Streaming-mode counting on the same workload (VERDICT r1 item 8):
    # batches stream through merge_raw_keys with double-buffered uploads.
    # Timed host-to-contigs (pack + transfer included) for both modes —
    # streaming's overlap hides the transfer, single-shot pays it serially
    # — so the ratio reflects what a user actually experiences. Capacity
    # is genome-sized (snug), forcing the real streamed path; two batches
    # exercise the merge.
    from genome_assembler_tpu.ops.count_jax import snug_capacity

    # two batches with minimal padding, whatever the workload size
    stream_batch = max(256, -(-reads.shape[0] // 512) * 256)
    stream_cfg = AssemblyConfig(
        k=k, read_len=read_len, batch_reads=stream_batch
    )
    stream_cap = snug_capacity(int(table.num_unique))
    stream_cmp = {}

    def timed_count(fn):
        fn()  # warm (compile)
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            t = fn()
            sync(t.num_unique)
            times.append(time.perf_counter() - t0)
        return min(times)

    try:
        # distinct name from the stream-bandwidth pass's stream_s above
        stream_count_s = timed_count(
            lambda: count_reads_device(
                reads, stream_cfg, table_capacity=stream_cap
            )
        )
        single_s = timed_count(
            lambda: _count_batch(
                jax.device_put(pack_codes(reads)), k,
                np.int32(reads.shape[0]), read_len=read_len,
            )
        )
        stream_cmp = {
            "stream_count_s": round(stream_count_s, 4),
            "single_shot_with_transfer_s": round(single_s, 4),
            "stream_vs_single_shot": round(stream_count_s / single_s, 3),
        }
    except Exception as e:
        stream_cmp = {"stream_count_error": f"{type(e).__name__}: {e}"}

    # Reference-style Python dict counting rate on a subsample.
    base_windows = int(os.environ.get("GA_BENCH_BASELINE_WINDOWS", 200_000))
    wpr = read_len - k + 1
    n_base_reads = max(1, base_windows // wpr)
    t0 = time.perf_counter()
    count_canonical_dict(reads[:n_base_reads], k)
    base_s = time.perf_counter() - t0
    base_rate = (n_base_reads * wpr) / base_s

    # End-to-end assembly on the same workload (count + filter + device
    # unitig compression + host residue) — the full-pipeline rate.
    from genome_assembler_tpu.models.pipeline import assemble_tpu
    from genome_assembler_tpu.host.stats import contig_stats
    from genome_assembler_tpu.host.traverse import contigs_equal
    from genome_assembler_tpu.utils.dna import decode_seq
    from genome_assembler_tpu.utils.metrics import Metrics

    # Cold pass compiles every stage's fresh shapes (minutes on axon);
    # the warm passes are the steady-state rate production runs see. Best
    # of `reps` — a single warm pass right after the cold one has been
    # observed to absorb seconds of residual post-compile device work.
    mm_cold = Metrics()
    t0 = time.perf_counter()
    contigs = assemble_tpu(reads, cfg, metrics=mm_cold)
    asm_cold_s = time.perf_counter() - t0
    asm_s = None
    for _ in range(reps):
        mm_i = Metrics()
        t0 = time.perf_counter()
        contigs = assemble_tpu(reads, cfg, metrics=mm_i)
        dt = time.perf_counter() - t0
        if asm_s is None or dt < asm_s:
            asm_s, mm = dt, mm_i
    stats = contig_stats(contigs)
    exact = contigs_equal(contigs, [decode_seq(genome)])

    # Minimal-traffic HBM model for the roofline fraction: read bytes in +
    # one key-stream write + one sorted read-back (speed-of-light counting).
    min_bytes = packed.size + 2 * n_windows * w * 4
    hbm_peak = float(os.environ.get("GA_BENCH_HBM_PEAK", 819e9))  # v5e B/s
    achieved_bw = min_bytes / best

    result = {
        "metric": "kmer_count_throughput",
        "value": round(kmers_per_s, 1),
        "unit": "kmers/s",
        "vs_baseline": round(kmers_per_s / base_rate, 2),
        "detail": {
            "backend": jax.default_backend(),
            "device": str(jax.devices()[0]),
            "k": k,
            "reads": int(reads.shape[0]),
            "windows": int(n_windows),
            "best_s": round(best, 4),
            "warmup_s": round(warmup_s, 1),
            "host_to_device_s": round(transfer_s, 3),
            "reference_python_kmers_per_s": round(base_rate, 1),
            # roofline three ways: vs nominal v5e HBM; vs single-dispatch
            # stream bandwidth (r2's latency-confounded number, kept for
            # continuity); vs AMORTIZED stream bandwidth (slope-timed
            # inside one jit — the honest device bandwidth, ~80% of
            # nominal). The counting workload is sort-bound, not
            # bandwidth-bound (see the sort-floor comment), so
            # frac_of_amortized_sort_floor is the utilization bar.
            "min_traffic_roofline_frac": round(achieved_bw / hbm_peak, 4),
            "measured_stream_bw_gb_s": round(measured_bw / 1e9, 2),
            "frac_of_measured_bw": round(achieved_bw / measured_bw, 3),
            "measured_stream_bw_amortized_gb_s": round(
                measured_bw_amortized / 1e9, 2
            ),
            "frac_of_amortized_bw": round(
                achieved_bw / measured_bw_amortized, 4
            ),
            "sort_floor_s": round(sort_floor_s, 4),
            "frac_of_sort_floor": round(sort_floor_s / best, 3),
            "sort_floor_amortized_s": round(sort_floor_amortized_s, 4),
            "sort_ns_per_row_amortized": round(
                sort_floor_amortized_s / n_windows * 1e9, 3
            ),
            "frac_of_amortized_sort_floor": round(
                sort_floor_amortized_s / best, 3
            ),
            "assemble_s": round(asm_s, 2),
            "assemble_reads_per_s": round(reads.shape[0] / asm_s, 1),
            "assemble_stages_s": {
                name: round(v, 2) for name, v in mm.stages.items()
            },
            "assemble_cold_s": round(asm_cold_s, 2),
            "assemble_cold_stages_s": {
                name: round(v, 2) for name, v in mm_cold.stages.items()
            },
            "contigs": stats["contigs"],
            "n50": stats["n50"],
            "exact_match": exact,
            **extract_cmp,
            **stream_cmp,
        },
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    try:
        sys.exit(main())
    except Exception as e:  # always emit one parseable line for the driver
        print(
            json.dumps(
                {
                    "metric": "kmer_count_throughput",
                    "value": 0,
                    "unit": "kmers/s",
                    "vs_baseline": 0,
                    "error": f"{type(e).__name__}: {e}",
                }
            )
        )
        sys.exit(1)

"""JAX runtime environment setup (platform choice + compile cache).

Two quirks of this environment (SURVEY.md §7 [ENV]):
  * the experimental `axon` TPU platform is force-registered in jax.config
    at import time, overriding the JAX_PLATFORMS env var — so an explicit
    cpu request must be re-applied via jax.config;
  * first TPU compilation is extremely slow (minutes), so the persistent
    compilation cache is always enabled — repeat runs (tests, benches,
    driver checks) hit the cache.

Call ``setup()`` once before the first device use. GA_PLATFORM=cpu|tpu
overrides; default leaves the platform resolution alone (tpu when present).
"""

from __future__ import annotations

import os
import sys

_DONE = False


def tunnel_alive(timeout: float = 2.0) -> bool:
    """True if the local TPU tunnel relay is accepting connections.

    The `axon` plugin reaches its pool service through a loopback relay
    (PALLAS_AXON_POOL_IPS=127.0.0.1); when the relay process dies, the
    first backend touch (jax.devices / first dispatch) blocks FOREVER on
    a connect that nothing will answer. A 2 s TCP probe of the relay
    port distinguishes "tunnel down" from "first init is slow" so entry
    points can fail over to CPU loudly instead of hanging (observed
    live: the relay died mid-round and every chip job wedged)."""
    import socket

    try:
        with socket.create_connection(("127.0.0.1", 8082), timeout=timeout):
            return True
    except OSError:
        return False


def setup(platform: str | None = None) -> None:
    global _DONE
    import jax

    if not _DONE:
        cache = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/ga_jax_cache")
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        _DONE = True

    platform = platform or os.environ.get("GA_PLATFORM")
    if (
        platform is None
        and os.environ.get("PALLAS_AXON_POOL_IPS", "").startswith("127.")
        and os.environ.get("GA_TUNNEL_PROBE", "1") != "0"
        and not tunnel_alive()
    ):
        print(
            "WARNING: TPU tunnel relay is not accepting connections; "
            "falling back to CPU (set GA_TUNNEL_PROBE=0 to skip this "
            "probe, GA_PLATFORM=tpu to force the TPU attempt anyway)",
            file=sys.stderr,
            flush=True,
        )
        platform = "cpu"
    if platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    elif platform == "tpu":
        jax.config.update("jax_platforms", "axon,cpu")

    # Multi-process launches must initialize jax.distributed before ANY
    # backend touch (jax.devices/device_put), so the pod wiring lives at
    # the same chokepoint as the platform choice. Idempotent; no-op
    # unless GA_DIST=1.
    from ..parallel.mesh import init_distributed

    init_distributed()


def sync(x) -> None:
    """Force completion of the program that produced ``x``.

    On the tunneled `axon` platform, ``block_until_ready()`` returns before
    remote execution finishes (ARCHITECTURE.md "Platform notes"); only a
    host fetch truly waits. Fetching one scalar element is enough — XLA
    outputs materialize only when the whole program has executed — and
    costs one ~32 ms roundtrip instead of an array transfer.

    Multi-process (pod) arrays span non-addressable devices; fetching the
    first *addressable* shard is the local completion barrier there.
    """
    import numpy as np

    if not getattr(x, "is_fully_addressable", True):
        shard = x.addressable_shards[0].data
        np.asarray(
            shard.reshape(-1)[:1] if getattr(shard, "ndim", 0) else shard
        )
        return
    np.asarray(x.reshape(-1)[:1] if getattr(x, "ndim", 0) else x)


def to_host(x):
    """Fetch a jax array to host numpy, multi-process safe.

    Single-process (and the forced CPU test mesh): a plain np.asarray.
    Multi-process pods: arrays sharded across processes are not fully
    addressable, so np.asarray raises — process_allgather assembles the
    global value on every host instead.
    """
    import numpy as np

    if getattr(x, "is_fully_addressable", True):
        return np.asarray(x)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))

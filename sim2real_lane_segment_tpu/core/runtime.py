"""Process-level runtime setup: persistent compile cache, distributed init.

First XLA compilation over the tunneled TPU chip can take minutes; a
persistent compilation cache makes every CLI invocation after the first
fast.  Call ``setup_cache()`` early (the CLIs do).
"""
from __future__ import annotations

import os


def setup_cache(cache_dir: str | None = None) -> None:
    import jax

    cache_dir = cache_dir or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.expanduser("~/.cache/jax_s2r_tpu"))
    if jax.process_count() > 1:
        # per-rank cache under jax.distributed: a SHARED cache can serve
        # one rank a hit while its peer compiles the same program — a
        # minutes-long skew that trips the CPU collectives' (gloo) op
        # timeouts mid-run.  Symmetric misses keep ranks in lockstep.
        cache_dir = os.path.join(cache_dir, f"proc{jax.process_index()}")
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # cache is best-effort; never fail startup on it
        pass


def init_distributed() -> None:
    """Multi-host init (DCN): no-op on a single host.

    The reference had no working multi-device story (README.md:275-277);
    here multi-host runs go through ``jax.distributed.initialize`` driven by
    standard cluster env vars.
    """
    import jax

    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if addr:
        kwargs = {"coordinator_address": addr}
        if os.environ.get("JAX_NUM_PROCESSES"):
            kwargs["num_processes"] = int(os.environ["JAX_NUM_PROCESSES"])
            kwargs["process_id"] = int(os.environ["JAX_PROCESS_ID"])
        jax.distributed.initialize(**kwargs)

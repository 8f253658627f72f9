"""sgp_tpu — TPU-native framework for scalable spatiotemporal GNNs.

A from-scratch JAX/XLA/Pallas implementation of the SGP model family
(training-free echo-state + graph-shift-operator encoder, sampled MLP
decoder) with the capabilities of the Graph-Machine-Learning-Group/sgp
reference (AAAI 2023), re-designed TPU-first:

- all spatial propagation runs as MXU matmuls (dense path) or Pallas
  block-sparse SpMM kernels;
- the reservoir time-scan is a single `jax.lax.scan` jitted once;
- multi-chip scaling via `jax.sharding.Mesh` + shard_map (node-sharded
  propagation, data-parallel sampled decoder training).
"""

__version__ = "0.1.0"

epsilon = 1e-8

from sgp_tpu.utils.config import config  # noqa: E402,F401
from sgp_tpu.utils.logging import logger  # noqa: E402,F401


def _enable_compile_cache():
    """Point jax at the repo-local persistent compile cache unless the
    user configured one. The remote-TPU compile service's latency
    swings 17-1281 s per program (BENCH_NOTES.md); cache hits skip it.
    Env vars are read by jax at import time — and sitecustomize imports
    jax before any user code — so ``jax.config.update`` here is the
    only route that works in-process (measured)."""
    import os

    import jax
    try:
        if jax.config.jax_platforms == "cpu":
            # CPU AOT cache entries reload with machine-feature
            # mismatch warnings (SIGILL risk); tests set platforms=cpu
            # before importing sgp_tpu, real runs keep the TPU backend
            return
        if not (os.environ.get("JAX_COMPILATION_CACHE_DIR")
                or jax.config.jax_compilation_cache_dir):
            jax.config.update(
                "jax_compilation_cache_dir",
                os.path.join(os.path.dirname(os.path.dirname(
                    os.path.abspath(__file__))), ".jax_cache"))
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 0.2)
            jax.config.update(
                "jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:  # never let cache config break an import
        pass


_enable_compile_cache()

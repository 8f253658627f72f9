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

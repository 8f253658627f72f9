from sgp_tpu.parallel.mesh import make_mesh, local_mesh
from sgp_tpu.parallel.sharding import (shard_batch, shard_operator,
                                       shard_params_tp, sharded_ridge,
                                       sharded_spmm)

__all__ = ["make_mesh", "local_mesh", "shard_batch", "shard_operator",
           "shard_params_tp", "sharded_ridge", "sharded_spmm"]

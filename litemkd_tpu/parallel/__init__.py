from .mesh import (make_mesh, batch_sharding, replicated, param_spec,
                   variables_shardings, shard_variables, batch_shardings,
                   shard_batch)
from .multihost import (local_episode_count, host_rng, global_batch_from_local)

__all__ = ["make_mesh", "batch_sharding", "replicated", "param_spec",
           "variables_shardings", "shard_variables", "batch_shardings",
           "shard_batch", "local_episode_count", "host_rng",
           "global_batch_from_local"]

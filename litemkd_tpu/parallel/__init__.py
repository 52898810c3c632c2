from .mesh import (make_mesh, batch_sharding, replicated, param_spec,
                   variables_shardings, shard_variables, batch_shardings,
                   shard_batch)

__all__ = ["make_mesh", "batch_sharding", "replicated", "param_spec",
           "variables_shardings", "shard_variables", "batch_shardings",
           "shard_batch"]

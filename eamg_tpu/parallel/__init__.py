"""Device mesh + sharding rules (DP 'data' axis, optional TP 'model' axis)."""

from .mesh import (batch_pspec, data_sharding, make_mesh, param_pspecs,
                   shard_params)

__all__ = ["batch_pspec", "data_sharding", "make_mesh", "param_pspecs",
           "shard_params"]

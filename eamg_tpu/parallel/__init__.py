"""Device mesh + sharding rules (DP 'data' axis, optional TP 'model'
axis) and ring attention (sequence-parallel long-context growth path)."""

from .mesh import (batch_pspec, data_sharding, make_mesh, param_pspecs,
                   shard_params)
from .ring_attention import forward_seq_parallel, ring_attention

__all__ = ["batch_pspec", "data_sharding", "forward_seq_parallel",
           "make_mesh", "param_pspecs", "ring_attention", "shard_params"]

"""Device mesh + sharding rules (DP 'data' axis, optional TP 'model'
axis), ring attention (sequence-parallel long-context growth path), and
GPipe-style pipeline parallelism ('stage' axis)."""

from .mesh import (batch_pspec, data_sharding, make_mesh, param_pspecs,
                   shard_params)
from .pipeline import (PipelineTrainer, make_pp_mesh, pipeline_forward,
                       stack_layers, unstack_layers)
from .ring_attention import forward_seq_parallel, ring_attention

__all__ = ["PipelineTrainer", "batch_pspec", "data_sharding",
           "forward_seq_parallel", "make_mesh", "make_pp_mesh",
           "param_pspecs", "pipeline_forward", "ring_attention",
           "shard_params", "stack_layers", "unstack_layers"]

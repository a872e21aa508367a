"""Pallas fused FFN: out = act(x @ W1^T + b1) @ W2^T + b2 in one kernel.

The reference's FFN is two torch Linears with an activation between
(nn.TransformerEncoderLayer linear1/linear2, GPTBlock.mlp,
api_cache.py:45-49). XLA already fuses the bias+activation into the
matmuls; this kernel additionally keeps the [rows, FF] intermediate in
VMEM — it never round-trips through HBM — tiling rows so weights stream
once per row-tile.

Weights use torch layout ([out, in]) like the rest of the framework.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ffn_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, *,
                activation: str):
    x = x_ref[...]
    h = jnp.dot(x, w1_ref[...].T.astype(x.dtype),
                preferred_element_type=jnp.float32) + b1_ref[...]
    if activation == "gelu":
        h = jax.nn.gelu(h, approximate=False)
    else:
        h = jnp.maximum(h, 0.0)
    out = jnp.dot(h.astype(x.dtype), w2_ref[...].T.astype(x.dtype),
                  preferred_element_type=jnp.float32) + b2_ref[...]
    o_ref[...] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("activation", "block_rows",
                                             "interpret"))
def fused_ffn(x: jax.Array, w1: jax.Array, b1: jax.Array, w2: jax.Array,
              b2: jax.Array, activation: str = "relu",
              block_rows: int = 256,
              interpret: bool | None = None) -> jax.Array:
    """x [..., D], w1 [FF, D], b1 [FF], w2 [D, FF], b2 [D] -> [..., D]."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    orig_shape = x.shape
    D = orig_shape[-1]
    FF = w1.shape[0]
    rows = 1
    for s in orig_shape[:-1]:
        rows *= s
    xf = x.reshape(rows, D)
    block_rows = min(block_rows, rows)
    # pad rows to a multiple of the block
    padded = pl.cdiv(rows, block_rows) * block_rows
    if padded != rows:
        xf = jnp.pad(xf, ((0, padded - rows), (0, 0)))
    b1r = b1.reshape(1, FF)
    b2r = b2.reshape(1, D)

    out = pl.pallas_call(
        functools.partial(_ffn_kernel, activation=activation),
        grid=(padded // block_rows,),
        in_specs=[
            pl.BlockSpec((block_rows, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((FF, D), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, FF), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, FF), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, D), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((padded, D), x.dtype),
        interpret=interpret,
    )(xf, w1, b1r, w2, b2r)
    return out[:rows].reshape(orig_shape)

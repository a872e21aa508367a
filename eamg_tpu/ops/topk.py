"""Exact top-k *threshold* without sorting: radix binary search.

The reference sampler (api_cache.py:171-177) only uses top-k to build an
additive mask — it needs the k-th largest *value*, not the sorted indices.
``lax.top_k`` computes a full sort-based selection (~76 µs/step over the
8,324-token vocabulary on v5e); the k-th value alone is computable in 32
vectorized compare-and-count passes via binary search over the monotone
integer key space of float32:

    key(x) = bits(x) | 0x80000000   if x >= 0
             ~bits(x)               if x <  0

is a strictly order-preserving map float -> uint32, so the k-th largest
float is recovered by a most-significant-bit-first binary search for the
largest key ``t`` with ``count(keys >= t) >= k``. Every pass is one
broadcast-compare + row-sum over [B, V] on the VPU — no sort, no data
movement, exact (ties included, identical to ``lax.top_k``'s
``vals[..., -1]`` threshold semantics).

Two implementations with identical numerics:
- :func:`kth_value_bitsearch` — pure XLA (32 unrolled fused passes);
- :func:`kth_value_pallas` — one Pallas kernel: logits are read from HBM
  into VMEM once and all 32 passes run on-chip.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# numpy scalars: inlined as literals when traced inside a Pallas kernel
# (module-level jnp arrays would be captured constants, which pallas_call
# rejects).
_SIGN = np.uint32(0x80000000)
_REST = np.uint32(0x7FFFFFFF)


def _float_to_key(x: jax.Array) -> jax.Array:
    """Order-preserving float32 -> uint32 (larger float => larger key)."""
    bits = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
    return jnp.where(bits >= _SIGN, ~bits, bits | _SIGN)


def _key_to_float(t: jax.Array) -> jax.Array:
    bits = jnp.where(t >= _SIGN, t & _REST, ~t)
    return jax.lax.bitcast_convert_type(bits, jnp.float32)


def _radix_search(keys: jax.Array, predicate) -> jax.Array:
    """[B, V] uint32 keys -> [B, 1]: the largest uint32 t with
    ``predicate(mask of keys >= t)`` true, by MSB-first binary search.
    ``predicate`` maps a [B, V] bool membership mask to [B, 1] bool and
    must be monotone non-increasing in t (shrinking sets stay true until
    they become false)."""
    B = keys.shape[0]
    t = jnp.zeros((B, 1), jnp.uint32)
    for bit in range(31, -1, -1):
        cand = t | np.uint32(1 << bit)
        t = jnp.where(predicate(keys >= cand), cand, t)
    return t


def _search(keys: jax.Array, k: int) -> jax.Array:
    """[B, V] uint32 keys -> [B, 1] key of the k-th largest element."""
    return _radix_search(
        keys, lambda m: jnp.sum(m.astype(jnp.int32), axis=-1,
                                keepdims=True) >= k)


def kth_value_bitsearch(logits: jax.Array, k: int) -> jax.Array:
    """[B, V] float -> [B, 1] exact k-th largest value per row (pure XLA)."""
    return _key_to_float(_search(_float_to_key(logits), k)).astype(
        logits.dtype)


def top_p_threshold_bitsearch(logits: jax.Array, p) -> jax.Array:
    """[B, V] logits -> [B, 1] nucleus (top-p) value threshold, sort-free.

    The nucleus is the smallest set of highest-probability tokens whose
    total mass is >= p — equivalently ``{x : x >= t*}`` where ``t*`` is the
    largest threshold with ``sum(softmax(logits)[logits >= t*]) >= p``.
    Because masked probability mass is monotone non-increasing in the
    threshold, ``t*`` is found by the same MSB-first radix binary search as
    :func:`kth_value_bitsearch`, with the count predicate replaced by a
    masked probability sum: 32 broadcast-compare + masked-row-sum passes,
    no sort. Ties at the boundary are all included (deterministic; standard
    sorted-cumsum implementations break ties by arbitrary sort order).

    ``p`` may be a Python float or a traced scalar / [B, 1] array (per-row
    nuclei) — keep it a traced operand on serving paths so distinct values
    share one compiled program. ``p >= 1`` degenerates safely to keeping
    the whole vocabulary and ``p <= 0`` to keeping the argmax (and ties).
    """
    x = logits.astype(jnp.float32)
    probs = jax.nn.softmax(x, axis=-1)
    keys = _float_to_key(x)
    # p <= 0 would satisfy the mass predicate at every candidate, driving t
    # to all-ones (a NaN bit pattern that masks the whole vocabulary);
    # clamping to a positive subnormal keeps "p -> 0 keeps the argmax".
    p = jnp.maximum(jnp.asarray(p, jnp.float32), 1e-30)
    t = _radix_search(
        keys, lambda m: jnp.sum(jnp.where(m, probs, 0.0), axis=-1,
                                keepdims=True) >= p)
    # p above the attainable float32 mass: every candidate fails, t stays 0,
    # and key 0 decodes into NaN bit patterns — degrade to keep-everything.
    return jnp.where(t == 0, -jnp.inf,
                     _key_to_float(t)).astype(logits.dtype)


def _threshold_kernel(logits_ref, out_ref, *, k: int):
    x = logits_ref[:]                                   # [B, Vp] f32 in VMEM
    bits = pltpu.bitcast(x, jnp.uint32)
    keys = jnp.where(bits >= _SIGN, ~bits, bits | _SIGN)
    B = x.shape[0]
    t = jnp.zeros((B, 1), jnp.uint32)
    for bit in range(31, -1, -1):                       # MSB-first radix
        cand = t | np.uint32(1 << bit)
        cnt = jnp.sum((keys >= cand).astype(jnp.int32), axis=-1,
                      keepdims=True)
        t = jnp.where(cnt >= k, cand, t)
    bits_out = jnp.where(t >= _SIGN, t & _REST, ~t)
    out_ref[:] = pltpu.bitcast(bits_out, jnp.float32)


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def kth_value_pallas(logits: jax.Array, k: int,
                     interpret: bool | None = None) -> jax.Array:
    """[B, V] float -> [B, 1] exact k-th largest value per row.

    One plain-VMEM Pallas kernel (no manual DMA — compiles on the remote
    helper, CLAUDE.md). The vocab axis is padded to a lane multiple with
    -inf; key(-inf) = 0x007FFFFF, below every representable logit's key,
    so padding never enters the count for k <= V.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    orig_dtype = logits.dtype
    x = logits.astype(jnp.float32)
    B, V = x.shape
    assert 0 < k <= V
    Vp = ((V + 127) // 128) * 128
    if Vp != V:
        x = jnp.pad(x, ((0, 0), (0, Vp - V)), constant_values=-jnp.inf)
    out = pl.pallas_call(
        functools.partial(_threshold_kernel, k=k),
        out_shape=jax.ShapeDtypeStruct((B, 1), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x)
    return out.astype(orig_dtype)

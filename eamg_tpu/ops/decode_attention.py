"""Pallas flash-decode: single-query attention against the KV cache.

The decode step's dominant HBM traffic is the cache read: with XLA's static
shapes every step streams all ``max_len`` key/value rows (48MB/step for the
flagship config) even when only ``t+1`` are valid. This kernel loops over
key blocks with a *dynamic* bound — ``fori_loop(0, cdiv(t+1, block))`` — so
HBM reads scale with the actual prefix length. K/V stay in HBM (``pl.ANY``)
and stream block-by-block through VMEM scratch via async DMA.

Semantics match the XLA decode path exactly: q attends to cache positions
0..t (inclusive), softmax statistics in float32.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _decode_kernel(len_ref, q_ref, k_hbm, v_hbm, o_ref, k_buf, v_buf, sem,
                   *, block_k: int, sm_scale: float):
    """Grid (BH,): one program per batch*head row; online softmax over
    dynamically-bounded key blocks DMA'd from HBM."""
    t = len_ref[0]                       # valid keys = t+1
    n_blocks = (t + block_k) // block_k  # cdiv(t+1, block_k)
    q = q_ref[0]                         # [1, Dh] (min sublane handled by pad)
    b = pl.program_id(0)

    def body(kb, carry):
        acc, m_prev, l_prev = carry
        copy_k = pltpu.make_async_copy(
            k_hbm.at[b, pl.ds(kb * block_k, block_k), :], k_buf, sem.at[0])
        copy_v = pltpu.make_async_copy(
            v_hbm.at[b, pl.ds(kb * block_k, block_k), :], v_buf, sem.at[1])
        copy_k.start()
        copy_v.start()
        copy_k.wait()
        copy_v.wait()
        k = k_buf[...]
        v = v_buf[...]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s * sm_scale                                    # [1, Bk]
        k_pos = kb * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (1, block_k), 1)
        s = jnp.where(k_pos <= t, s, -jnp.inf)
        m_cur = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_cur)
        p = jnp.where(k_pos <= t, p, 0.0)
        alpha = jnp.exp(m_prev - m_cur)
        l_cur = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.dot(p.astype(v.dtype), v,
                                    preferred_element_type=jnp.float32)
        return acc, m_cur, l_cur

    dh = q.shape[-1]
    acc0 = jnp.zeros((1, dh), jnp.float32)
    m0 = jnp.full((1, 1), -1e30, jnp.float32)
    l0 = jnp.zeros((1, 1), jnp.float32)
    acc, _, l = jax.lax.fori_loop(0, n_blocks, body, (acc0, m0, l0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_k", "interpret"))
def flash_decode(q: jax.Array, k_cache: jax.Array, v_cache: jax.Array,
                 t, block_k: int = 256,
                 interpret: bool | None = None) -> jax.Array:
    """q [B, H, 1, Dh], caches [B, H, M, Dh], t = index of the newest valid
    position -> [B, H, 1, Dh] attention output over positions 0..t."""
    B, H, _, Dh = q.shape
    M = k_cache.shape[2]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    block_k = min(block_k, M)
    assert M % block_k == 0, "cache length must be a block multiple"
    sm_scale = 1.0 / math.sqrt(Dh)

    qf = q.reshape(B * H, 1, Dh)
    kf = k_cache.reshape(B * H, M, Dh)
    vf = v_cache.reshape(B * H, M, Dh)
    tl = jnp.broadcast_to(jnp.asarray(t, jnp.int32), (1,))

    out = pl.pallas_call(
        functools.partial(_decode_kernel, block_k=block_k,
                          sm_scale=sm_scale),
        grid=(B * H,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # t (whole array)
            pl.BlockSpec((1, 1, Dh), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            # ANY-space refs must be whole-array; the kernel indexes by
            # program id
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, 1, Dh), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, 1, Dh), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_k, Dh), q.dtype),
            pltpu.VMEM((block_k, Dh), q.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(tl, qf, kf, vf)
    return out.reshape(B, H, 1, Dh)


def _decode_vmem_kernel(len_ref, q_ref, k_ref, v_ref, o_ref, *,
                        sm_scale: float):
    """One (batch*head) program, K/V auto-pipelined into VMEM: fused
    mask+softmax+two-matmul single-query attention."""
    t = len_ref[0, 0]
    q = q_ref[0]                                        # [1, Dh]
    k = k_ref[0]                                        # [M, Dh]
    v = v_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * sm_scale
    M = k.shape[0]
    k_pos = jax.lax.broadcasted_iota(jnp.int32, (1, M), 1)
    s = jnp.where(k_pos <= t, s, -jnp.inf)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = jnp.where(k_pos <= t, p, 0.0)
    l = jnp.sum(p, axis=-1, keepdims=True)
    acc = jnp.dot(p.astype(v.dtype), v,
                  preferred_element_type=jnp.float32)
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def flash_decode_vmem(q: jax.Array, k_cache: jax.Array, v_cache: jax.Array,
                      t, interpret: bool | None = None) -> jax.Array:
    """Fused single-query cached attention, K/V streamed by the pallas
    pipeline (no manual DMA — compiles everywhere). Reads the full cache
    like the XLA path; saves the op-dispatch overhead of the unfused
    mask/softmax/matmul chain."""
    B, H, _, Dh = q.shape
    M = k_cache.shape[2]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    sm_scale = 1.0 / math.sqrt(Dh)
    qf = q.reshape(B * H, 1, Dh)
    kf = k_cache.reshape(B * H, M, Dh)
    vf = v_cache.reshape(B * H, M, Dh)
    tl = jnp.full((1, 1), jnp.asarray(t, jnp.int32))

    out = pl.pallas_call(
        functools.partial(_decode_vmem_kernel, sm_scale=sm_scale),
        grid=(B * H,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda b: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, Dh), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, Dh), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, Dh), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, Dh), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, 1, Dh), q.dtype),
        interpret=interpret,
    )(tl, qf, kf, vf)
    return out.reshape(B, H, 1, Dh)


def _decode_sp_kernel(n_ref, len_ref, q_ref, k_ref, v_ref, o_ref, acc_ref,
                      m_ref, l_ref, *, block_k: int, sm_scale: float):
    """Grid (BH, max_blocks): online softmax, one K/V block per program.

    The index_map clamps the block index to the valid range (driven by the
    scalar-prefetched block count), so out-of-range grid steps revisit the
    last valid block — the pallas pipeline skips the re-copy, making HBM
    traffic scale with the true prefix length without manual DMA.
    """
    t = len_ref[0]
    kb = pl.program_id(1)
    n_blocks = n_ref[0]

    @pl.when(kb == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, -1e30)
        l_ref[...] = jnp.zeros_like(l_ref)

    @pl.when(kb < n_blocks)
    def _():
        q = q_ref[0]                                   # [1, Dh]
        k = k_ref[0]                                   # [Bk, Dh]
        v = v_ref[0]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s * sm_scale
        k_pos = kb * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (1, block_k), 1)
        s = jnp.where(k_pos <= t, s, -jnp.inf)
        m_prev, l_prev = m_ref[...], l_ref[...]
        m_cur = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_cur)
        p = jnp.where(k_pos <= t, p, 0.0)
        alpha = jnp.exp(m_prev - m_cur)
        l_ref[...] = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        acc_ref[...] = acc_ref[...] * alpha + jnp.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32)
        m_ref[...] = m_cur

    @pl.when(kb == pl.num_programs(1) - 1)
    def _():
        o_ref[0] = (acc_ref[...] / jnp.maximum(l_ref[...], 1e-30)
                    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_k", "interpret"))
def flash_decode_sp(q: jax.Array, k_cache: jax.Array, v_cache: jax.Array,
                    t, block_k: int = 128,
                    interpret: bool | None = None) -> jax.Array:
    """Scalar-prefetch flash-decode: like :func:`flash_decode` but built on
    PrefetchScalarGridSpec index clamping instead of manual DMA."""
    B, H, _, Dh = q.shape
    M = k_cache.shape[2]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    block_k = min(block_k, M)
    assert M % block_k == 0
    sm_scale = 1.0 / math.sqrt(Dh)
    qf = q.reshape(B * H, 1, Dh)
    kf = k_cache.reshape(B * H, M, Dh)
    vf = v_cache.reshape(B * H, M, Dh)
    t_arr = jnp.asarray(t, jnp.int32).reshape(1)
    n_blocks = (t_arr + block_k) // block_k            # cdiv(t+1, Bk)
    max_blocks = M // block_k

    def kv_index(b, kb, n_ref, len_ref):
        # clamp: out-of-range steps revisit the last valid block (no copy)
        return (b, jnp.minimum(kb, n_ref[0] - 1), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B * H, max_blocks),
        in_specs=[
            pl.BlockSpec((1, 1, Dh), lambda b, kb, n, ln: (b, 0, 0)),
            pl.BlockSpec((1, block_k, Dh), kv_index),
            pl.BlockSpec((1, block_k, Dh), kv_index),
        ],
        out_specs=pl.BlockSpec((1, 1, Dh), lambda b, kb, n, ln: (b, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((1, Dh), jnp.float32),
            pltpu.VMEM((1, 1), jnp.float32),
            pltpu.VMEM((1, 1), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_decode_sp_kernel, block_k=block_k,
                          sm_scale=sm_scale),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B * H, 1, Dh), q.dtype),
        interpret=interpret,
    )(n_blocks, t_arr, qf, kf, vf)
    return out.reshape(B, H, 1, Dh)


def xla_decode_attention(q, k_cache, v_cache, t):
    """Reference XLA path (parity bisect): full-cache masked softmax."""
    Dh = q.shape[-1]
    M = k_cache.shape[2]
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k_cache) / math.sqrt(Dh)
    mask = jnp.arange(M)[None, None, None, :] <= t
    s = jnp.where(mask, s, jnp.finfo(s.dtype).min)
    p = jax.nn.softmax(s.astype(jnp.float32), -1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v_cache)

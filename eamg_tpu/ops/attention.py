"""Pallas TPU flash attention (full-sequence path).

Replaces the XLA einsum-softmax-einsum attention in the forward/prefill
paths (the reference's equivalent hot path is torch MHA inside
nn.TransformerEncoder, api.py:46-50) with an online-softmax tiled kernel:
K/V stream through VMEM block by block, scores never materialize in HBM.

Variants, matching the model's quirk flags:
- non-causal (the reference's bidirectional attention),
- causal (corrected mode),
- optional ``valid_len`` key masking (bucketed/padded prefill).

Numerics: scores and the softmax accumulate in float32 regardless of the
input dtype (bf16 in production), same as the XLA path, so the parity
suite can run with either backend. Falls back to interpret mode off-TPU.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float("-inf")


def _attn_kernel(q_ref, k_ref, v_ref, len_ref, o_ref, *, block_k: int,
                 causal: bool, sm_scale: float, seq_len: int):
    """One (batch*head, q-block) program: online softmax over K/V blocks.

    Matmuls run in the input dtype (bf16 in production) with float32
    accumulation on the MXU; the softmax statistics stay float32.
    """
    q = q_ref[0]                                       # [Bq, Dh], in dtype
    block_q = q.shape[0]
    qi = pl.program_id(1)
    q_pos = qi * block_q + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, 1), 0)                    # [Bq, 1]
    valid_len = len_ref[0, 0]

    num_kb = pl.cdiv(seq_len, block_k)

    def body(kb, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[0, pl.ds(kb * block_k, block_k), :]
        v = v_ref[0, pl.ds(kb * block_k, block_k), :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale  # [Bq, Bk] f32
        k_pos = kb * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (1, block_k), 1)                # [1, Bk]
        mask = k_pos < valid_len
        if causal:
            mask = jnp.logical_and(mask, k_pos <= q_pos)
        s = jnp.where(mask, s, NEG_INF)
        m_cur = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        # guard fully-masked rows (exp(-inf - -inf))
        m_safe = jnp.where(jnp.isfinite(m_cur), m_cur, 0.0)
        p = jnp.exp(s - m_safe)
        p = jnp.where(mask, p, 0.0)
        alpha = jnp.exp(jnp.where(jnp.isfinite(m_prev), m_prev - m_safe,
                                  NEG_INF))
        alpha = jnp.where(jnp.isfinite(m_prev), alpha, 0.0)
        l_cur = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        pv = jnp.dot(p.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
        acc = acc * alpha + pv
        return acc, m_cur, l_cur

    block_q_, dh = q.shape
    acc0 = jnp.zeros((block_q_, dh), jnp.float32)
    m0 = jnp.full((block_q_, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q_, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, num_kb, body, (acc0, m0, l0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("causal", "block_q", "block_k",
                                             "interpret"))
def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    valid_len=None, causal: bool = False,
                    block_q: int = 128, block_k: int = 128,
                    interpret: bool | None = None) -> jax.Array:
    """[B, H, T, Dh] q/k/v -> [B, H, T, Dh], softmax(QK^T/sqrt(Dh))V.

    valid_len: scalar count of real key positions (padding masked out);
    None means all T keys are valid.
    """
    B, H, T, Dh = q.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    sm_scale = 1.0 / math.sqrt(Dh)
    block_q = min(block_q, T)
    block_k = min(block_k, T)
    # pad T to a common block multiple: partial blocks would otherwise read
    # clamped (misaligned) rows; padded keys are masked via valid_len
    blk = max(block_q, block_k)
    T_pad = pl.cdiv(T, blk) * blk
    qf = q.reshape(B * H, T, Dh)
    kf = k.reshape(B * H, T, Dh)
    vf = v.reshape(B * H, T, Dh)
    if T_pad != T:
        pad = ((0, 0), (0, T_pad - T), (0, 0))
        qf, kf, vf = (jnp.pad(a, pad) for a in (qf, kf, vf))
    # valid_len is request-wide (same for every batch*head program)
    vl = jnp.full((1, 1), T if valid_len is None else valid_len, jnp.int32)
    vl = jnp.minimum(vl, T)

    grid = (B * H, pl.cdiv(T_pad, block_q))
    out = pl.pallas_call(
        functools.partial(_attn_kernel, block_k=block_k, causal=causal,
                          sm_scale=sm_scale, seq_len=T_pad),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, Dh), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T_pad, Dh), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T_pad, Dh), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda b, i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, Dh), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, T_pad, Dh), q.dtype),
        interpret=interpret,
    )(qf, kf, vf, vl)
    return out[:, :T].reshape(B, H, T, Dh)


def xla_attention(q, k, v, valid_len=None, causal: bool = False):
    """Reference XLA path with identical semantics (parity bisect tool)."""
    B, H, T, Dh = q.shape
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) / math.sqrt(Dh)
    k_pos = jnp.arange(T)
    mask = jnp.ones((T, T), bool)
    if valid_len is not None:
        mask = mask & (k_pos[None, :] < valid_len)
    if causal:
        mask = mask & (k_pos[None, :] <= k_pos[:, None])
    s = jnp.where(mask[None, None], s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    p = jnp.where(jnp.isnan(p), 0.0, p)
    return jnp.einsum("bhqk,bhkd->bhqd", p,
                      v.astype(jnp.float32)).astype(q.dtype)

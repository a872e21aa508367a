"""Ring attention: sequence-parallel exact attention over a device mesh.

The long-context growth path SURVEY.md §5.7 scoped as future work, built:
when a sequence no longer fits one chip's attention working set, shard the
TIME axis over a ``seq`` mesh axis. Each device owns Q/K/V for its local
block; K/V blocks rotate around the ring with ``lax.ppermute`` over ICI
while every device accumulates online-softmax partial attention of its
resident queries against each passing block — N steps, N devices, exact
result, O(T/N) memory per device, and the collective is a neighbor
exchange that rides ICI (no all-gather of the full sequence anywhere).

This is the idiomatic TPU construction (shard_map + ppermute + log-sum-exp
accumulation; the public "ring attention" recipe) rather than a port of
anything in the reference — the reference caps context at 512 tokens and
truncates (train/train_large2.py:65). Parity-tested against the
single-device XLA path on the 8-virtual-device CPU mesh at T=2048
(tests/test_ring_attention.py).

Semantics match models/gpt.py::attention for both causal and
bidirectional masking, in fp32 statistics.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _block_attend(q, k, v, q_start, k_start, causal: bool, sm_scale,
                  acc, m_prev, l_prev):
    """Online-softmax update of local queries against one K/V block.

    q [B, H, Tq, Dh], k/v [B, H, Tk, Dh]; q_start/k_start are the blocks'
    global offsets (traced scalars) for causal masking.
    """
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * sm_scale
    if causal:
        Tq, Tk = q.shape[2], k.shape[2]
        qpos = q_start + jax.lax.broadcasted_iota(jnp.int32, (Tq, Tk), 0)
        kpos = k_start + jax.lax.broadcasted_iota(jnp.int32, (Tq, Tk), 1)
        s = jnp.where((kpos <= qpos)[None, None], s, -jnp.inf)
    m_cur = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    # fully-masked rows keep m = -inf; exp(s - m) would be NaN -> guard
    m_safe = jnp.where(jnp.isfinite(m_cur), m_cur, 0.0)
    p = jnp.exp(s - m_safe)
    p = jnp.where(jnp.isfinite(s), p, 0.0)
    alpha = jnp.where(jnp.isfinite(m_prev), jnp.exp(m_prev - m_safe), 0.0)
    l_cur = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
    acc = acc * alpha + jnp.einsum(
        "bhqk,bhkd->bhqd", p.astype(v.dtype), v,
        preferred_element_type=jnp.float32)
    return acc, m_cur, l_cur


def ring_attend(q, k, v, *, axis: str, n_shards: int, causal: bool,
                sm_scale: float):
    """Per-shard ring accumulation (must run inside a shard_map over
    ``axis``): local Tq queries attend to every K/V block as it rotates
    through; N-1 ppermutes total. Reused by the standalone op AND the
    sequence-parallel GPT forward."""
    idx = jax.lax.axis_index(axis)
    B, H, Tq, Dh = q.shape
    acc = jnp.zeros((B, H, Tq, Dh), jnp.float32)
    m = jnp.full((B, H, Tq, 1), -jnp.inf, jnp.float32)
    l = jnp.zeros((B, H, Tq, 1), jnp.float32)
    q_start = idx * Tq

    perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]

    # resident block first, then rotate-and-attend N-1 times — exactly
    # N-1 ppermutes; a rotate-after-attend loop would pay one extra
    # discarded K+V exchange per layer per step
    acc, m, l = _block_attend(q, k, v, q_start, idx * Tq, causal,
                              sm_scale, acc, m, l)

    def step(i, carry):
        acc, m, l, k, v, k_owner = carry
        k = jax.lax.ppermute(k, axis, perm)
        v = jax.lax.ppermute(v, axis, perm)
        k_owner = jax.lax.ppermute(k_owner, axis, perm)
        k_start = k_owner * Tq
        acc, m, l = _block_attend(q, k, v, q_start, k_start, causal,
                                  sm_scale, acc, m, l)
        return acc, m, l, k, v, k_owner

    acc, m, l, _, _, _ = jax.lax.fori_loop(
        0, n_shards - 1, step, (acc, m, l, k, v, idx))
    out = acc / jnp.maximum(l, 1e-30)
    return out.astype(q.dtype)


def _ring_shard(q, k, v, *, axis: str, n_shards: int, causal: bool,
                sm_scale: float):
    return ring_attend(q, k, v, axis=axis, n_shards=n_shards,
                       causal=causal, sm_scale=sm_scale)


@functools.partial(jax.jit, static_argnames=("mesh", "axis", "causal"))
def ring_attention(q: jax.Array, k: jax.Array, v: jax.Array, mesh: Mesh,
                   axis: str = "seq", causal: bool = True) -> jax.Array:
    """Exact sequence-parallel attention.

    q/k/v: [B, H, T, Dh] with T divisible by the ``axis`` mesh dimension.
    Returns [B, H, T, Dh] equal (to fp32-accumulation tolerance) to the
    single-device masked softmax attention. The time axis is sharded over
    ``axis``; K/V travel the ring via ppermute.
    """
    n = mesh.shape[axis]
    T = q.shape[2]
    assert T % n == 0, f"T={T} not divisible by {axis}={n}"
    sm_scale = 1.0 / math.sqrt(q.shape[-1])
    spec = P(None, None, axis, None)
    fn = jax.shard_map(
        functools.partial(_ring_shard, axis=axis, n_shards=n,
                          causal=causal, sm_scale=sm_scale),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False)
    sh = NamedSharding(mesh, spec)
    return fn(jax.device_put(q, sh), jax.device_put(k, sh),
              jax.device_put(v, sh))


@functools.partial(jax.jit, static_argnames=("cfg", "mesh", "axis"))
def forward_seq_parallel(params: dict, ids: jax.Array, cfg, mesh: Mesh,
                         axis: str = "seq") -> jax.Array:
    """Sequence-parallel GPT forward: [B, T] ids -> [B, T, V] logits with
    the TIME axis sharded over ``axis`` — activations, attention, and the
    head all stay O(T/N) per device; only K/V blocks move (ring).

    Matches models/gpt.py::forward for corrected causal configs (asserted)
    to fp32-accumulation tolerance. This is the long-context TRAINING
    path: run your loss on the (still seq-sharded) logits and grad through
    it — ppermute is differentiable, so the backward pass rotates
    gradients the other way automatically.
    """
    from ..models.gpt import (_attn_input, _finish_block, _heads, _linear,
                              _unheads)

    assert cfg.causal and not cfg.batch_first_bug, (
        "sequence-parallel forward supports the corrected causal "
        "architecture")
    n = mesh.shape[axis]
    B, T = ids.shape
    assert T % n == 0, f"T={T} not divisible by {axis}={n}"
    assert T <= cfg.n_pos, (
        f"T={T} exceeds the positional table (n_pos={cfg.n_pos}); "
        "dynamic_slice would silently clamp the last shard's positions")
    Tl = T // n
    sm_scale = 1.0 / math.sqrt(cfg.head_dim)
    D, KVD = cfg.d_model, cfg.kv_dim
    g = cfg.n_head // cfg.kv_heads

    def body(params, ids_local):
        idx = jax.lax.axis_index(axis)
        dt = cfg.jnp_dtype
        pos = jax.lax.dynamic_slice_in_dim(params["pos"], idx * Tl, Tl, 0)
        x = (params["tok_emb"][ids_local] + pos).astype(dt)
        for p in params["layers"]:
            xn = _attn_input(p, x, cfg)
            qkv = _linear(xn, p["attn"]["in_w"], p["attn"]["in_b"])
            q = _heads(qkv[..., :D], cfg.n_head)
            k = _heads(qkv[..., D:D + KVD], cfg.kv_heads)
            v = _heads(qkv[..., D + KVD:], cfg.kv_heads)
            if g > 1:  # expand KV groups: ring_attend is head-aligned
                k = jnp.repeat(k, g, axis=1)
                v = jnp.repeat(v, g, axis=1)
            attn = ring_attend(q, k, v, axis=axis, n_shards=n,
                               causal=True, sm_scale=sm_scale)
            attn_out = _linear(_unheads(attn), p["attn"]["out_w"],
                               p["attn"]["out_b"])
            x = _finish_block(p, x, attn_out, cfg)
        return _linear(x.astype(jnp.float32), params["head"]["w"],
                       params["head"]["b"])

    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(None, axis)),
        out_specs=P(None, axis, None), check_vma=False)
    sh = NamedSharding(mesh, P(None, axis))
    return fn(params, jax.device_put(ids, sh))

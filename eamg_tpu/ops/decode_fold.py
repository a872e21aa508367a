"""All-heads-per-program flash-decode over a position-major fused KV cache.

Why: subtraction-profiling the flagship greedy decode step (d512 L6 V8324,
batch 8) shows XLA's cached attention costs ~196 us of the ~222 us device
step — 3.4x its HBM floor. The per-(b,h) pallas kernels in
ops/decode_attention.py lose to XLA because 64 programs of [1,64]x[64,512]
work drown in per-program overhead (docs/DESIGN.md §3). This kernel fixes
the shape of the problem instead: ONE program per batch row computes every
head's attention, expressed entirely in 2-D matmuls on a position-major
cache block — the pallas idiom this backend's remote-compile helper
accepts (no manual DMA, no 4-D blocks, no batched dot_general).

Layout: the cache stores K and V fused and position-major,
``kv[B, M, 2*KVD]`` with K at ``[..., :KVD]`` — exactly the tail of the
fused QKV projection, so the decode step writes one contiguous
``dynamic_update_slice`` per layer and never transposes.

The per-head score/value contractions become plain 2-D dots via a
block-diagonal trick (reference comparison: the reference's torch
``scaled_dot_product_attention`` per head, api_cache.py:51-74):

- scores  [M, H]  = kv_k [M, KVD] @ qexp [KVD, H], where qexp is q tiled
  KV-head-wise and masked block-diagonally (column h nonzero only in KV
  head kv(h)'s row range) — each output column is that head's q·k.
- context [H, KVD] = p.T [H, M] @ kv_v [M, KVD]; row h's slice at kv(h)
  holds head h's context, everything else is garbage.
- flatten: zero the off-diagonal garbage and collapse — for MHA a column
  sum; for GQA a per-group extraction — giving [1, D] directly in the
  concat-heads order the output projection consumes (no _unheads).

Per-row valid lengths come from an SMEM array indexed by the program id,
so the SAME kernel serves the uniform loop (broadcast scalar) and the
ragged/continuous-batching engine (per-row lengths).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fold_kernel(len_ref, qt_ref, kv_ref, o_ref, *, n_head: int,
                 kv_heads: int, sm_scale: float):
    """Grid (B,): all heads of one batch row. qt [Dh, H] (q transposed),
    kv [M, 2*KVD], out [1, H*Dh]."""
    t = len_ref[pl.program_id(0)]
    qt = qt_ref[0]                                   # [Dh, H]
    M = kv_ref.shape[1]
    KVD = kv_ref.shape[2] // 2
    Dh = qt.shape[0]
    H = n_head
    g = n_head // kv_heads

    k = kv_ref[0, :, :KVD]                           # [M, KVD]
    v = kv_ref[0, :, KVD:]

    # qexp[c, h] = q[h, c % Dh] if c // Dh == h // g else 0
    qexp = jnp.concatenate([qt] * kv_heads, axis=0)  # [KVD, H] tiled
    c_kv = jax.lax.broadcasted_iota(jnp.int32, (KVD, H), 0) // Dh
    h_of = jax.lax.broadcasted_iota(jnp.int32, (KVD, H), 1) // g
    qexp = jnp.where(c_kv == h_of, qexp, 0.0)

    s = jax.lax.dot_general(k, qexp, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = s * sm_scale                                 # [M, H]
    pos = jax.lax.broadcasted_iota(jnp.int32, (M, H), 0)
    valid = pos <= t
    s = jnp.where(valid, s, -jnp.inf)
    m = jnp.max(s, axis=0, keepdims=True)            # [1, H]
    p = jnp.exp(s - m)
    p = jnp.where(valid, p, 0.0)
    l = jnp.sum(p, axis=0, keepdims=True)            # [1, H]

    ctx = jax.lax.dot_general(p.astype(v.dtype), v,
                              (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    ctx = ctx / jnp.maximum(l.reshape(H, 1), 1e-30)  # [H, KVD]

    # keep only row h's kv(h) block, then collapse to concat-heads [1, D].
    kv_col = jax.lax.broadcasted_iota(jnp.int32, (H, KVD), 1) // Dh
    h_row = jax.lax.broadcasted_iota(jnp.int32, (H, KVD), 0) // g
    ctx = jnp.where(kv_col == h_row, ctx, 0.0)
    if g == 1:
        o = jnp.sum(ctx, axis=0).reshape(1, H * Dh)  # blocks are disjoint
    else:
        # GQA: rows in a group share a kv block; extract each row's block
        # ([H, KV, Dh] ops are tiny: H*KVD elements)
        grp = ctx.reshape(H, kv_heads, Dh)
        o = jnp.sum(grp, axis=1).reshape(1, H * Dh)
    o_ref[0] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n_head", "interpret"))
def flash_decode_fold(q: jax.Array, kv: jax.Array, t, n_head: int,
                      interpret: bool | None = None) -> jax.Array:
    """q [B, 1, D] (concat-heads), kv [B, M, 2*KVD] position-major fused
    cache, t: scalar or [B] newest-valid index -> [B, 1, D] attention
    output over positions 0..t (inclusive), concat-heads order."""
    B, _, D = q.shape
    M = kv.shape[1]
    KVD = kv.shape[2] // 2
    Dh = D // n_head
    kv_heads = KVD // Dh
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    sm_scale = 1.0 / math.sqrt(Dh)

    qt = q.reshape(B, n_head, Dh).swapaxes(1, 2)     # [B, Dh, H] (tiny)
    tl = jnp.broadcast_to(jnp.asarray(t, jnp.int32), (B,))

    out = pl.pallas_call(
        functools.partial(_fold_kernel, n_head=n_head, kv_heads=kv_heads,
                          sm_scale=sm_scale),
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # per-row t
            pl.BlockSpec((1, Dh, n_head), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, 2 * KVD), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, D), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1, D), q.dtype),
        interpret=interpret,
    )(tl, qt, kv)
    return out


def _fold_sp_kernel(nb_ref, len_ref, qt_ref, kv_ref, o_ref, acc_ref, m_ref,
                    l_ref, *, n_head: int, kv_heads: int, block_k: int,
                    sm_scale: float):
    """Grid (B, max_blocks): like :func:`_fold_kernel` but online-softmax
    over key blocks whose index_map clamps at this row's valid block count
    (scalar-prefetch), so HBM reads scale with the true prefix length."""
    b = pl.program_id(0)
    kb = pl.program_id(1)
    t = len_ref[b]
    n_blocks = nb_ref[b]
    qt = qt_ref[0]                                   # [Dh, H]
    KVD = kv_ref.shape[2] // 2
    Dh = qt.shape[0]
    H = n_head
    g = n_head // kv_heads

    @pl.when(kb == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, -1e30)
        l_ref[...] = jnp.zeros_like(l_ref)

    @pl.when(kb < n_blocks)
    def _():
        k = kv_ref[0, :, :KVD]                       # [Bk, KVD]
        v = kv_ref[0, :, KVD:]
        qexp = jnp.concatenate([qt] * kv_heads, axis=0)
        c_kv = jax.lax.broadcasted_iota(jnp.int32, (KVD, H), 0) // Dh
        h_of = jax.lax.broadcasted_iota(jnp.int32, (KVD, H), 1) // g
        qexp = jnp.where(c_kv == h_of, qexp, 0.0)
        s = jax.lax.dot_general(k, qexp, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s * sm_scale                             # [Bk, H]
        pos = kb * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_k, H), 0)
        valid = pos <= t
        s = jnp.where(valid, s, -jnp.inf)
        m_prev, l_prev = m_ref[...], l_ref[...]      # [1, H]
        m_cur = jnp.maximum(m_prev, jnp.max(s, axis=0, keepdims=True))
        p = jnp.exp(s - m_cur)
        p = jnp.where(valid, p, 0.0)
        alpha = jnp.exp(m_prev - m_cur)              # [1, H]
        l_ref[...] = alpha * l_prev + jnp.sum(p, axis=0, keepdims=True)
        ctx = jax.lax.dot_general(p.astype(v.dtype), v,
                                  (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        acc_ref[...] = acc_ref[...] * alpha.reshape(H, 1) + ctx
        m_ref[...] = m_cur

    @pl.when(kb == pl.num_programs(1) - 1)
    def _():
        ctx = acc_ref[...] / jnp.maximum(l_ref[...].reshape(H, 1), 1e-30)
        kv_col = jax.lax.broadcasted_iota(jnp.int32, (H, KVD), 1) // Dh
        h_row = jax.lax.broadcasted_iota(jnp.int32, (H, KVD), 0) // g
        ctx = jnp.where(kv_col == h_row, ctx, 0.0)
        if g == 1:
            o = jnp.sum(ctx, axis=0).reshape(1, H * Dh)
        else:
            o = jnp.sum(ctx.reshape(H, kv_heads, Dh), axis=1).reshape(
                1, H * Dh)
        o_ref[0] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n_head", "block_k",
                                             "interpret"))
def flash_decode_fold_sp(q: jax.Array, kv: jax.Array, t, n_head: int,
                         block_k: int = 128,
                         interpret: bool | None = None) -> jax.Array:
    """Dynamic-length variant of :func:`flash_decode_fold`: per-row HBM
    cache reads scale with that row's prefix length (index-map clamping,
    no manual DMA). Same [B, 1, D] output."""
    B, _, D = q.shape
    M = kv.shape[1]
    KVD = kv.shape[2] // 2
    Dh = D // n_head
    kv_heads = KVD // Dh
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    block_k = min(block_k, M)
    assert M % block_k == 0
    sm_scale = 1.0 / math.sqrt(Dh)

    qt = q.reshape(B, n_head, Dh).swapaxes(1, 2)     # [B, Dh, H]
    tl = jnp.broadcast_to(jnp.asarray(t, jnp.int32), (B,))
    n_blocks = (tl + block_k) // block_k             # cdiv(t+1, Bk)
    max_blocks = M // block_k

    def kv_index(b, kb, nb_ref, len_ref):
        return (b, jnp.minimum(kb, nb_ref[b] - 1), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, max_blocks),
        in_specs=[
            pl.BlockSpec((1, Dh, n_head), lambda b, kb, nb, ln: (b, 0, 0)),
            pl.BlockSpec((1, block_k, 2 * KVD), kv_index),
        ],
        out_specs=pl.BlockSpec((1, 1, D), lambda b, kb, nb, ln: (b, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((n_head, KVD), jnp.float32),
            pltpu.VMEM((1, n_head), jnp.float32),
            pltpu.VMEM((1, n_head), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_fold_sp_kernel, n_head=n_head,
                          kv_heads=kv_heads, block_k=block_k,
                          sm_scale=sm_scale),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, 1, D), q.dtype),
        interpret=interpret,
    )(n_blocks, tl, qt, kv)
    return out


def _fold2_kernel(len_ref, qt_ref, kv_ref, o_ref, *, n_head: int,
                  kv_heads: int, rows: int, m_len: int, sm_scale: float):
    """Grid (B // rows,): ``rows`` batch rows per program — fewer, fatter
    programs than :func:`_fold_kernel` (per-program fixed cost dominates at
    8 thin programs; measured). kv is pre-folded to [B*M, 2*KVD] OUTSIDE
    the kernel (free reshape), so the block is 2-D and no in-kernel
    relayout is needed. Cross-row score/value terms are masked off
    block-diagonally, exactly like the per-head fold."""
    i = pl.program_id(0)
    qt = qt_ref[...]                                 # [rows, Dh, H]
    KVD = kv_ref.shape[1] // 2
    Dh = qt.shape[1]
    H = n_head
    g = n_head // kv_heads
    RM = rows * m_len

    k = kv_ref[:, :KVD]                              # [rows*M, KVD]
    v = kv_ref[:, KVD:]

    # qexp [KVD, rows*H]: column r*H+h = q of row r head h, tiled to its
    # kv-head block and zeroed elsewhere
    c_kv = jax.lax.broadcasted_iota(jnp.int32, (KVD, H), 0) // Dh
    h_of = jax.lax.broadcasted_iota(jnp.int32, (KVD, H), 1) // g
    diag = c_kv == h_of
    qexp = jnp.concatenate(
        [jnp.where(diag, jnp.concatenate([qt[r]] * kv_heads, axis=0), 0.0)
         for r in range(rows)], axis=1)              # [KVD, rows*H]

    s = jax.lax.dot_general(k, qexp, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = s * sm_scale                                 # [rows*M, rows*H]
    r_row = jax.lax.broadcasted_iota(jnp.int32, (RM, rows * H), 0) // m_len
    r_col = jax.lax.broadcasted_iota(jnp.int32, (RM, rows * H), 1) // H
    pos = jax.lax.broadcasted_iota(jnp.int32, (RM, rows * H), 0) % m_len
    # t for the col's row, gathered via the small static loop
    t_col = len_ref[i * rows] * jnp.int32(0)
    tcols = [len_ref[i * rows + r] for r in range(rows)]
    for r in range(rows):
        t_col = jnp.where(r_col == r, tcols[r], t_col)
    valid = (r_row == r_col) & (pos <= t_col)
    s = jnp.where(valid, s, -jnp.inf)
    m = jnp.max(s, axis=0, keepdims=True)            # [1, rows*H]
    p = jnp.exp(s - m)
    p = jnp.where(valid, p, 0.0)
    l = jnp.sum(p, axis=0, keepdims=True)

    ctx = jax.lax.dot_general(p.astype(v.dtype), v,
                              (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    ctx = ctx / jnp.maximum(l.reshape(rows * H, 1), 1e-30)  # [rows*H, KVD]

    kv_col = jax.lax.broadcasted_iota(jnp.int32, (rows * H, KVD), 1) // Dh
    h_row = (jax.lax.broadcasted_iota(jnp.int32, (rows * H, KVD), 0)
             % H) // g
    ctx = jnp.where(kv_col == h_row, ctx, 0.0)
    for r in range(rows):
        blk = ctx[r * H:(r + 1) * H]                 # [H, KVD]
        if g == 1:
            o = jnp.sum(blk, axis=0).reshape(1, H * Dh)
        else:
            o = jnp.sum(blk.reshape(H, kv_heads, Dh), axis=1).reshape(
                1, H * Dh)
        o_ref[r] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n_head", "rows", "interpret"))
def flash_decode_fold2(q: jax.Array, kv: jax.Array, t, n_head: int,
                       rows: int = 4,
                       interpret: bool | None = None) -> jax.Array:
    """Multi-row fold decode: q [B, 1, D], kv [B, M, 2*KVD], t scalar/[B]
    -> [B, 1, D]. ``rows`` batch rows per program (B % rows == 0)."""
    B, _, D = q.shape
    M = kv.shape[1]
    KVD = kv.shape[2] // 2
    Dh = D // n_head
    kv_heads = KVD // Dh
    assert B % rows == 0
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    sm_scale = 1.0 / math.sqrt(Dh)

    qt = q.reshape(B, n_head, Dh).swapaxes(1, 2)     # [B, Dh, H]
    kvf = kv.reshape(B * M, 2 * KVD)                 # free fold
    tl = jnp.broadcast_to(jnp.asarray(t, jnp.int32), (B,))

    out = pl.pallas_call(
        functools.partial(_fold2_kernel, n_head=n_head, kv_heads=kv_heads,
                          rows=rows, m_len=M, sm_scale=sm_scale),
        grid=(B // rows,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((rows, Dh, n_head), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows * M, 2 * KVD), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, 1, D), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1, D), q.dtype),
        interpret=interpret,
    )(tl, qt, kvf)
    return out


def _fold3_kernel(len_ref, qt_ref, kv_ref, o_ref, *, n_head: int,
                  kv_heads: int, sm_scale: float):
    """Grid (B,): like :func:`_fold_kernel` but the softmax runs on the
    TRANSPOSED score matrix [H, M] — reductions along the lane axis with
    full vector-unit utilization, instead of along 512 sublanes with 8/128
    lanes live (measured: the [M, H]-layout softmax, not DMA, is what held
    the v1 kernel at 27 us/layer vs the 8.3 us/layer streaming floor).
    The values contraction [H, M] @ [M, KVD] is then also MXU-shaped."""
    t = len_ref[pl.program_id(0)]
    qt = qt_ref[0]                                   # [Dh, H]
    M = kv_ref.shape[1]
    KVD = kv_ref.shape[2] // 2
    Dh = qt.shape[0]
    H = n_head
    g = n_head // kv_heads

    k = kv_ref[0, :, :KVD]                           # [M, KVD]
    v = kv_ref[0, :, KVD:]

    c_kv = jax.lax.broadcasted_iota(jnp.int32, (KVD, H), 0) // Dh
    h_of = jax.lax.broadcasted_iota(jnp.int32, (KVD, H), 1) // g
    qexp = jnp.where(c_kv == h_of,
                     jnp.concatenate([qt] * kv_heads, axis=0), 0.0)

    s = jax.lax.dot_general(k, qexp, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = s.T * sm_scale                               # [H, M]
    pos = jax.lax.broadcasted_iota(jnp.int32, (H, M), 1)
    valid = pos <= t
    s = jnp.where(valid, s, -jnp.inf)
    m = jnp.max(s, axis=1, keepdims=True)            # [H, 1] lane reduce
    p = jnp.exp(s - m)
    p = jnp.where(valid, p, 0.0)
    l = jnp.sum(p, axis=1, keepdims=True)
    p = p / jnp.maximum(l, 1e-30)                    # pre-normalized

    ctx = jax.lax.dot_general(p.astype(v.dtype), v,
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    # ctx [H, KVD]: keep row h's kv(h) block, collapse to concat-heads
    kv_col = jax.lax.broadcasted_iota(jnp.int32, (H, KVD), 1) // Dh
    h_row = jax.lax.broadcasted_iota(jnp.int32, (H, KVD), 0) // g
    ctx = jnp.where(kv_col == h_row, ctx, 0.0)
    if g == 1:
        o = jnp.sum(ctx, axis=0).reshape(1, H * Dh)
    else:
        o = jnp.sum(ctx.reshape(H, kv_heads, Dh), axis=1).reshape(
            1, H * Dh)
    o_ref[0] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n_head", "interpret"))
def flash_decode_fold3(q: jax.Array, kv: jax.Array, t, n_head: int,
                       interpret: bool | None = None) -> jax.Array:
    """Transposed-softmax fold decode: q [B, 1, D], kv [B, M, 2*KVD],
    t scalar/[B] -> [B, 1, D]."""
    B, _, D = q.shape
    M = kv.shape[1]
    KVD = kv.shape[2] // 2
    Dh = D // n_head
    kv_heads = KVD // Dh
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    sm_scale = 1.0 / math.sqrt(Dh)
    qt = q.reshape(B, n_head, Dh).swapaxes(1, 2)     # [B, Dh, H]
    tl = jnp.broadcast_to(jnp.asarray(t, jnp.int32), (B,))
    return pl.pallas_call(
        functools.partial(_fold3_kernel, n_head=n_head, kv_heads=kv_heads,
                          sm_scale=sm_scale),
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, Dh, n_head), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, 2 * KVD), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, D), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1, D), q.dtype),
        interpret=interpret,
    )(tl, qt, kv)


def _fold3_sp_kernel(nb_ref, len_ref, qt_ref, kv_ref, o_ref, acc_ref,
                     m_ref, l_ref, *, n_head: int, kv_heads: int,
                     block_k: int, sm_scale: float):
    """Dynamic-length fold3: grid (B, max_blocks), online softmax in the
    transposed [H, Bk] layout, index-map clamping for length-proportional
    HBM reads."""
    b = pl.program_id(0)
    kb = pl.program_id(1)
    t = len_ref[b]
    n_blocks = nb_ref[b]
    qt = qt_ref[0]                                   # [Dh, H]
    KVD = kv_ref.shape[2] // 2
    Dh = qt.shape[0]
    H = n_head
    g = n_head // kv_heads

    @pl.when(kb == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, -1e30)
        l_ref[...] = jnp.zeros_like(l_ref)

    @pl.when(kb < n_blocks)
    def _():
        k = kv_ref[0, :, :KVD]                       # [Bk, KVD]
        v = kv_ref[0, :, KVD:]
        c_kv = jax.lax.broadcasted_iota(jnp.int32, (KVD, H), 0) // Dh
        h_of = jax.lax.broadcasted_iota(jnp.int32, (KVD, H), 1) // g
        qexp = jnp.where(c_kv == h_of,
                         jnp.concatenate([qt] * kv_heads, axis=0), 0.0)
        s = jax.lax.dot_general(k, qexp, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s.T * sm_scale                           # [H, Bk]
        pos = kb * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (H, block_k), 1)
        valid = pos <= t
        s = jnp.where(valid, s, -jnp.inf)
        m_prev, l_prev = m_ref[...], l_ref[...]      # [H, 1]
        m_cur = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_cur)
        p = jnp.where(valid, p, 0.0)
        alpha = jnp.exp(m_prev - m_cur)
        l_ref[...] = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        ctx = jax.lax.dot_general(p.astype(v.dtype), v,
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        acc_ref[...] = acc_ref[...] * alpha + ctx
        m_ref[...] = m_cur

    @pl.when(kb == pl.num_programs(1) - 1)
    def _():
        ctx = acc_ref[...] / jnp.maximum(l_ref[...], 1e-30)
        kv_col = jax.lax.broadcasted_iota(jnp.int32, (H, KVD), 1) // Dh
        h_row = jax.lax.broadcasted_iota(jnp.int32, (H, KVD), 0) // g
        ctx = jnp.where(kv_col == h_row, ctx, 0.0)
        if g == 1:
            o = jnp.sum(ctx, axis=0).reshape(1, H * Dh)
        else:
            o = jnp.sum(ctx.reshape(H, kv_heads, Dh), axis=1).reshape(
                1, H * Dh)
        o_ref[0] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n_head", "block_k",
                                             "interpret"))
def flash_decode_fold3_sp(q: jax.Array, kv: jax.Array, t, n_head: int,
                          block_k: int = 128,
                          interpret: bool | None = None) -> jax.Array:
    """Dynamic-length transposed-softmax fold decode (per-row HBM reads
    scale with that row's prefix length)."""
    B, _, D = q.shape
    M = kv.shape[1]
    KVD = kv.shape[2] // 2
    Dh = D // n_head
    kv_heads = KVD // Dh
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    block_k = min(block_k, M)
    assert M % block_k == 0
    sm_scale = 1.0 / math.sqrt(Dh)
    qt = q.reshape(B, n_head, Dh).swapaxes(1, 2)
    tl = jnp.broadcast_to(jnp.asarray(t, jnp.int32), (B,))
    n_blocks = (tl + block_k) // block_k
    max_blocks = M // block_k

    def kv_index(b, kb, nb_ref, len_ref):
        return (b, jnp.minimum(kb, nb_ref[b] - 1), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, max_blocks),
        in_specs=[
            pl.BlockSpec((1, Dh, n_head), lambda b, kb, nb, ln: (b, 0, 0)),
            pl.BlockSpec((1, block_k, 2 * KVD), kv_index),
        ],
        out_specs=pl.BlockSpec((1, 1, D), lambda b, kb, nb, ln: (b, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((n_head, KVD), jnp.float32),
            pltpu.VMEM((n_head, 1), jnp.float32),
            pltpu.VMEM((n_head, 1), jnp.float32),
        ],
    )
    return pl.pallas_call(
        functools.partial(_fold3_sp_kernel, n_head=n_head,
                          kv_heads=kv_heads, block_k=block_k,
                          sm_scale=sm_scale),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, 1, D), q.dtype),
        interpret=interpret,
    )(n_blocks, tl, qt, kv)


def _stream_kernel(kv_ref, o_ref):
    """Pure-streaming floor probe: reduce the block to one row."""
    o_ref[...] = jnp.sum(kv_ref[...], axis=0, keepdims=True,
                         dtype=jnp.float32).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("rows", "interpret"))
def stream_reduce(kv: jax.Array, rows: int = 4,
                  interpret: bool | None = None) -> jax.Array:
    """Measures the backend's achievable HBM read rate through the pallas
    pipeline at this block shape (the attention kernels' speed-of-light)."""
    B, M, W = kv.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    kvf = kv.reshape(B * M, W)
    return pl.pallas_call(
        _stream_kernel,
        grid=(B // rows,),
        in_specs=[pl.BlockSpec((rows * M, W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, W), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, W), kv.dtype),
        interpret=interpret,
    )(kvf)


def xla_decode_attention_pm(q, kv, t, n_head: int):
    """XLA reference on the position-major fused layout (parity bisect +
    the CPU-test fallback): q [B, 1, D], kv [B, M, 2*KVD], t scalar or [B]
    -> [B, 1, D]."""
    B, _, D = q.shape
    M = kv.shape[1]
    KVD = kv.shape[2] // 2
    Dh = D // n_head
    kv_heads = KVD // Dh
    g = n_head // kv_heads
    k = kv[..., :KVD].reshape(B, M, kv_heads, Dh)
    v = kv[..., KVD:].reshape(B, M, kv_heads, Dh)
    qg = q.reshape(B, kv_heads, g, Dh)
    s = jnp.einsum("bkgd,bmkd->bkgm", qg, k) / math.sqrt(Dh)
    tb = jnp.broadcast_to(jnp.asarray(t, jnp.int32), (B,))
    mask = jnp.arange(M)[None, None, None, :] <= tb[:, None, None, None]
    s = jnp.where(mask, s, jnp.finfo(s.dtype).min)
    p = jax.nn.softmax(s.astype(jnp.float32), -1).astype(q.dtype)
    o = jnp.einsum("bkgm,bmkd->bkgd", p, v)
    return o.reshape(B, 1, D)

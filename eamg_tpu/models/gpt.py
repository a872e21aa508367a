"""The GPT decoder family — functional JAX, quirk-exact vs the reference.

One configurable model covers every geometry/architecture the reference
ships (SURVEY.md §2.3):

- the post-LN ``nn.TransformerEncoder`` trainer/server arch
  (reference api.py:41-50, train/train_large2.py:83-94): ``ln_placement="post"``,
  ``activation="relu"``;
- the pre-LN KV-cache serving arch (api_cache.py:39-106):
  ``ln_placement="pre"``, ``activation="gelu"``;
- the train_mini ``batch_first`` bug (train/train_mini.py:58): the encoder
  reads ``[B, T, C]`` as ``[T, B, C]``, so attention mixes across the batch —
  ``batch_first_bug=True`` reproduces it exactly;
- **no causal mask anywhere** (api.py:49-50): ``causal=False`` is the
  reference default; ``causal=True`` is the corrected mode.

Parameters are stored in *torch layout* (``Linear.weight`` is ``[out, in]``,
attention uses the fused ``in_proj`` ``[3D, D]``) so the checkpoint importer
is a direct copy with no transposes (see models/import_torch.py). Compute is
plain jnp — jit/pjit-friendly, static shapes, no Python control flow on
traced values.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class GPTConfig:
    vocab_size: int
    seq_len: int            # model context (positions table semantics below)
    d_model: int
    n_head: int
    n_layer: int
    d_ff: int | None = None            # default 4*d_model (reference default)
    causal: bool = False               # reference: never masked
    ln_placement: str = "post"         # "post" (trainer arch) | "pre" (KV arch)
    activation: str = "relu"           # "relu" (post-LN) | "gelu" (pre-LN)
    pos_rows: int | None = None        # rows in pos table; default seq_len-1
    batch_first_bug: bool = False      # train_mini.py:58 emulation
    # api_cache.py:99 — the incremental KV step computes pos_emb[:T] with
    # T == 1, so every generated token receives the position-0 embedding.
    # True reproduces that serving behavior; False uses the true position.
    pos_broadcast_bug: bool = False
    ln_eps: float = 1e-5               # torch nn.LayerNorm default
    dtype: str = "float32"             # compute dtype ("float32"|"bfloat16")
    kernels: str = "xla"               # "xla" | "pallas" (fused hot ops)
    # Grouped-query attention: number of K/V heads (None = n_head = MHA,
    # the reference arch). GQA shrinks the KV cache by n_head/n_kv_heads —
    # the decode step's dominant HBM traffic — for newly-trained models;
    # reference checkpoints are always MHA.
    n_kv_heads: int | None = None
    # Blockwise online-softmax training attention (VERDICT r4 #3): when
    # set, attention() iterates KV blocks of this size with a running
    # (max, denominator, accumulator) carry, so the [B, H, T, T] f32
    # score tensor never materializes in HBM — pure XLA, plain autodiff,
    # no pallas bwd rule needed. Deliberately an UNROLLED python loop,
    # NOT lax.scan: scan measured 30.4 vs 19.3 ms/step unrolled and its
    # long body crashes the axon remote compiler at T=2048 (DESIGN §3.8
    # r5 addendum). None = the dense score-tensor path (the numerics
    # oracle). Grad parity tested.
    attn_block: int | None = None
    # Mixture-of-experts FFN (None = dense, the reference arch). When set,
    # every ``moe_every``-th layer (counting from the moe_every-1-th)
    # replaces its MLP with n_experts routed experts of width d_ff each
    # (parallel/moe.py math). Training uses capacity-bounded dispatch
    # (per-row, token-major — causal, batch-decoupled drops); inference
    # and decode use exact no-drop pointwise routing, so KV decode ==
    # full forward for any router. Beyond-reference.
    n_experts: int | None = None
    moe_top_k: int = 2
    moe_every: int = 1
    moe_capacity_factor: float = 2.0

    @property
    def ff(self) -> int:
        return self.d_ff if self.d_ff is not None else 4 * self.d_model

    @property
    def n_pos(self) -> int:
        # Trainer GPTs allocate seq_len-1 rows (train/train_large2.py:87);
        # GPTWithKV and MiniGPT allocate seq_len (api_cache.py:80,
        # train/train_mini.py:57).
        return self.pos_rows if self.pos_rows is not None else self.seq_len - 1

    @property
    def head_dim(self) -> int:
        assert self.d_model % self.n_head == 0
        return self.d_model // self.n_head

    @property
    def kv_heads(self) -> int:
        h = self.n_kv_heads if self.n_kv_heads is not None else self.n_head
        assert self.n_head % h == 0, "n_head must divide by n_kv_heads"
        return h

    @property
    def kv_dim(self) -> int:
        return self.kv_heads * self.head_dim

    @property
    def jnp_dtype(self):
        return jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32


# Reference presets (geometry from SURVEY.md §2.1).
def preset(name: str, vocab_size: int) -> GPTConfig:
    presets = {
        # train/train_mini.py:52-58 — d256 h4 L2, post-LN, batch_first bug,
        # pos rows = SEQ_LEN.
        "mini": dict(seq_len=512, d_model=256, n_head=4, n_layer=2,
                     pos_rows=512, batch_first_bug=True),
        # train/train_large.py:3-13 — d256 h8 L4, SEQ_LEN 256.
        "large": dict(seq_len=256, d_model=256, n_head=8, n_layer=4),
        # train/train_large2.py:10-13 — d512 h8 L6, SEQ_LEN 512.
        "large2": dict(seq_len=512, d_model=512, n_head=8, n_layer=6),
        # train/train_no_inst.py — same geometry as large2.
        "no_inst": dict(seq_len=512, d_model=512, n_head=8, n_layer=6),
        # api_cache.py:108-114 — pre-LN GPTWithKV serving arch (n_head=8).
        "kv_server": dict(seq_len=512, d_model=512, n_head=8, n_layer=6,
                          pos_rows=512, ln_placement="pre",
                          activation="gelu", pos_broadcast_bug=True),
        # BASELINE config 4: 2048-token context, batch 8.
        "longform": dict(seq_len=2048, d_model=512, n_head=8, n_layer=6,
                         causal=True),
    }
    return GPTConfig(vocab_size=vocab_size, **presets[name])


# ------------------------------------------------------------------- init

def init_params(rng: jax.Array, cfg: GPTConfig) -> dict:
    """Initialize parameters matching torch's default initializers:
    Embedding ~ N(0,1); pos = zeros (reference uses torch.zeros);
    MultiheadAttention in_proj ~ Xavier-uniform, out_proj ~ Kaiming-uniform;
    Linear ~ Kaiming-uniform(a=sqrt(5)) with fan-in bias bounds."""
    keys = iter(jax.random.split(rng, 6 + 12 * cfg.n_layer))
    D, FF, V = cfg.d_model, cfg.ff, cfg.vocab_size

    def kaiming_linear(kw, kb, fan_out, fan_in):
        bound_w = math.sqrt(6.0 / ((1 + 5) * fan_in))  # a=sqrt(5) kaiming
        w = jax.random.uniform(kw, (fan_out, fan_in), jnp.float32,
                               -bound_w, bound_w)
        bound_b = 1.0 / math.sqrt(fan_in)
        b = jax.random.uniform(kb, (fan_out,), jnp.float32,
                               -bound_b, bound_b)
        return {"w": w, "b": b}

    in_rows = D + 2 * cfg.kv_dim  # == 3D for MHA (torch fused in_proj)

    def xavier_in_proj(k):
        bound = math.sqrt(6.0 / (3 * D + D))
        return jax.random.uniform(k, (in_rows, D), jnp.float32, -bound,
                                  bound)

    layers = []
    for li in range(cfg.n_layer):
        # key-consumption order is part of the seeded-init contract:
        # attn first, then mlp — keep it so dense inits stay bit-stable
        attn = {
            "in_w": xavier_in_proj(next(keys)),
            "in_b": jnp.zeros((in_rows,)),
            **{f"out_{n}": v for n, v in
               kaiming_linear(next(keys), next(keys), D, D).items()},
        }
        if is_moe_layer(cfg, li):
            from ..parallel.moe import init_moe_params

            mlp = init_moe_params(next(keys), _moe_cfg(cfg))
        else:
            mlp = {
                "w1": kaiming_linear(next(keys), next(keys), FF, D)["w"],
                "b1": jax.random.uniform(next(keys), (FF,), jnp.float32,
                                         -1 / math.sqrt(D),
                                         1 / math.sqrt(D)),
                "w2": kaiming_linear(next(keys), next(keys), D, FF)["w"],
                "b2": jax.random.uniform(next(keys), (D,), jnp.float32,
                                         -1 / math.sqrt(FF),
                                         1 / math.sqrt(FF)),
            }
        layers.append({
            "attn": attn,
            "ln1": {"g": jnp.ones((D,)), "b": jnp.zeros((D,))},
            "ln2": {"g": jnp.ones((D,)), "b": jnp.zeros((D,))},
            "mlp": mlp,
        })
    head = kaiming_linear(next(keys), next(keys), V, D)
    return {
        "tok_emb": jax.random.normal(next(keys), (V, D), jnp.float32),
        "pos": jnp.zeros((cfg.n_pos, D), jnp.float32),
        "layers": layers,
        "head": head,
    }


# ---------------------------------------------------------------- compute

def _layer_norm(x, g, b, eps):
    """LayerNorm in float32 (stability), output in the input dtype."""
    dt = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    out = (x32 - mean) * jax.lax.rsqrt(var + eps) * g + b
    return out.astype(dt)


def _linear(x, w, b):
    """torch layout: w is [out, in]. Weights cast to the activation dtype so
    bfloat16 mode actually runs the MXU in bf16 (f32 weights would silently
    promote every matmul back to f32). Accepts int8 per-channel-quantized
    weights ({"q", "s"}, models/quant.py) — the convert fuses into the dot,
    so HBM reads stay int8."""
    if isinstance(w, dict):
        y = x @ w["q"].T.astype(x.dtype)
        return y * w["s"].astype(x.dtype) + b.astype(x.dtype)
    return x @ w.T.astype(x.dtype) + b.astype(x.dtype)


def _split_qkv(p):
    """Fused in_proj split: q rows = d_model, k/v rows = kv_dim each
    (== d_model for MHA, smaller under GQA). Handles quantized in_w."""
    w = p["in_w"]
    if isinstance(w, dict):
        D = w["q"].shape[1]
        kvd = (w["q"].shape[0] - D) // 2

        def seg(a, b):
            return {"q": w["q"][a:b], "s": w["s"][a:b]}

        return ((seg(0, D), p["in_b"][:D]),
                (seg(D, D + kvd), p["in_b"][D:D + kvd]),
                (seg(D + kvd, D + 2 * kvd), p["in_b"][D + kvd:]))
    D = w.shape[1]
    kvd = (w.shape[0] - D) // 2
    return ((w[:D], p["in_b"][:D]),
            (w[D:D + kvd], p["in_b"][D:D + kvd]),
            (w[D + kvd:], p["in_b"][D + kvd:]))


def _heads(x, n_head):
    B, T, D = x.shape
    return x.reshape(B, T, n_head, D // n_head).transpose(0, 2, 1, 3)


def _gqa_scores(q, k, sm_scale):
    """q [B, H, T, Dh] x k [B, Hkv, M, Dh] -> [B, H, T, M] with K/V heads
    shared across groups of H // Hkv query heads (no materialized repeat)."""
    B, H, T, Dh = q.shape
    Hkv = k.shape[1]
    qg = q.reshape(B, Hkv, H // Hkv, T, Dh)
    s = jnp.einsum("bkgqd,bkmd->bkgqm", qg, k) * sm_scale
    return s.reshape(B, H, T, k.shape[2])


def _gqa_values(probs, v):
    """probs [B, H, T, M] x v [B, Hkv, M, Dh] -> [B, H, T, Dh]."""
    B, H, T, M = probs.shape
    Hkv = v.shape[1]
    pg = probs.reshape(B, Hkv, H // Hkv, T, M)
    out = jnp.einsum("bkgqm,bkmd->bkgqd", pg, v)
    return out.reshape(B, H, T, v.shape[3])


def _unheads(x):
    B, H, T, Dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(B, T, H * Dh)


def _blockwise_attention(q, k, v, sm_scale, causal, valid_len, block):
    """Online-softmax attention over KV blocks (pure XLA, UNROLLED).

    Never materializes the [B, H, T, T_k] f32 score tensor — each block
    computes one [B, H, T, block] score slab and folds it into a
    running (row max, denominator, weighted-value accumulator) carry,
    the flash-attention recurrence. The loop is a python unroll, NOT
    lax.scan: measured on the v5e, the scan barrier costs 30.35 vs
    19.31 ms/step unrolled at the flagship shape (DESIGN §3.8 round-5
    addendum), and long-scan bodies crash the axon remote-compile
    helper at T=2048 where the unroll compiles. Autodiff just works, so
    training needs no custom bwd rule (the two documented pallas
    blockers don't apply). Numerics match the dense path to
    f32-association tolerance; grad parity is pinned in test_ops.py."""
    B, H, T, Dh = q.shape
    Hkv = v.shape[1]
    T_k = k.shape[2]
    nb = -(-T_k // block)
    pad = nb * block - T_k
    if pad:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
    qg = q.reshape(B, Hkv, H // Hkv, T, Dh)
    rows = jnp.arange(T)[:, None]                       # [T, 1]
    m = jnp.full((B, Hkv, H // Hkv, T), -jnp.inf, jnp.float32)
    l = jnp.zeros((B, Hkv, H // Hkv, T), jnp.float32)
    acc = jnp.zeros((B, Hkv, H // Hkv, T, Dh), jnp.float32)
    for b in range(nb):
        kblk = k[:, :, b * block:(b + 1) * block]
        vblk = v[:, :, b * block:(b + 1) * block]
        s = jnp.einsum("bkgqd,bkmd->bkgqm", qg, kblk) * sm_scale
        s = s.astype(jnp.float32)                       # [B,Hkv,g,T,bk]
        cols = b * block + jnp.arange(block)[None, :]   # [1, bk]
        mask = cols < T_k
        if causal:
            mask = mask & (cols <= rows)
        if valid_len is not None:
            mask = mask & (cols < valid_len)
        s = jnp.where(mask[None, None, None], s, -jnp.inf)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1))
        # all-masked rows keep m == -inf; shift by 0 there (exp(-inf-0))
        shift = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
        p = jnp.exp(s - shift[..., None])               # [B,Hkv,g,T,bk]
        corr = jnp.exp(jnp.where(jnp.isfinite(m), m - shift, -jnp.inf))
        l = l * corr + jnp.sum(p, axis=-1)
        pv = jnp.einsum("bkgqm,bkmd->bkgqd", p.astype(vblk.dtype), vblk,
                        preferred_element_type=jnp.float32)
        acc = acc * corr[..., None] + pv
        m = m_new
    out = acc / jnp.maximum(l, 1e-30)[..., None]
    return out.reshape(B, H, T, Dh).astype(v.dtype)


def attention(p_attn: dict, q_in, k_in, v_in, cfg: GPTConfig,
              causal: bool = False, valid_len=None, seg=None):
    """torch nn.MultiheadAttention semantics with fused in_proj.

    causal=False, valid_len=None is the reference default — fully
    bidirectional, no masks ever passed (api.py:49-50). With
    cfg.kernels == "pallas" the softmax runs as the flash kernel
    (ops/attention.py); the XLA path is the numerics oracle.
    ``seg`` ([B, T] int32 segment ids, 0 = pad) adds block-diagonal
    isolation for packed training rows: position i attends to j only when
    seg[i] == seg[j] (XLA path only).
    """
    (wq, bq), (wk, bk), (wv, bv) = _split_qkv(p_attn)
    q = _heads(_linear(q_in, wq, bq), cfg.n_head)
    k = _heads(_linear(k_in, wk, bk), cfg.kv_heads)
    v = _heads(_linear(v_in, wv, bv), cfg.kv_heads)
    if cfg.kernels == "pallas":
        from ..ops.attention import flash_attention

        assert seg is None, \
            "packed segment masking needs the XLA path (kernels='xla')"
        if cfg.kv_heads != cfg.n_head:  # kernel is MHA; expand groups
            g = cfg.n_head // cfg.kv_heads
            k = jnp.repeat(k, g, axis=1)
            v = jnp.repeat(v, g, axis=1)
        out = _unheads(flash_attention(q, k, v, valid_len=valid_len,
                                       causal=causal))
        return _linear(out, p_attn["out_w"], p_attn["out_b"])
    if cfg.attn_block is not None and seg is None:
        # blockwise online softmax (VERDICT r4 #3): the score tensor
        # stays block-local. seg (packed rows) keeps the dense path.
        out = _unheads(_blockwise_attention(
            q, k, v, 1.0 / math.sqrt(cfg.head_dim), causal, valid_len,
            cfg.attn_block))
        return _linear(out, p_attn["out_w"], p_attn["out_b"])
    scores = _gqa_scores(q, k, 1.0 / math.sqrt(cfg.head_dim))
    T_q, T_k = scores.shape[-2], scores.shape[-1]
    if causal or valid_len is not None or seg is not None:
        neg = jnp.finfo(scores.dtype).min
        mask = jnp.ones((T_q, T_k), bool)
        if valid_len is not None:
            mask = mask & (jnp.arange(T_k)[None, :] < valid_len)
        if causal:
            mask = mask & (jnp.arange(T_k)[None, :]
                           <= jnp.arange(T_q)[:, None])
        mask = mask[None, None]
        if seg is not None:
            mask = mask & (seg[:, None, :, None] == seg[:, None, None, :])
        scores = jnp.where(mask, scores, neg)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    probs = probs.astype(v.dtype)
    out = _unheads(_gqa_values(probs, v))
    return _linear(out, p_attn["out_w"], p_attn["out_b"])


def _activation(x, cfg: GPTConfig):
    if cfg.activation == "gelu":
        return jax.nn.gelu(x, approximate=False)  # torch nn.GELU default
    return jax.nn.relu(x)


def is_moe_layer(cfg: GPTConfig, li: int) -> bool:
    return bool(cfg.n_experts) and li % cfg.moe_every == cfg.moe_every - 1


def _moe_cfg(cfg: GPTConfig):
    from ..parallel.moe import MoEConfig  # lazy: models <-> parallel

    return MoEConfig(d_model=cfg.d_model, d_ff=cfg.ff,
                     n_experts=cfg.n_experts, top_k=cfg.moe_top_k,
                     capacity_factor=cfg.moe_capacity_factor,
                     activation=cfg.activation)


def _mlp(p, x, cfg, sink=None):
    if "router" in p:  # MoE layer (cfg.n_experts): routed expert FFN
        from ..parallel.moe import (load_balance_loss, moe_mlp_dense,
                                    moe_mlp_pointwise)

        if sink is not None:
            # training (the aux-loss sink is only threaded by the
            # trainer's forward): capacity-bounded dispatch — per-row,
            # token-major, so drops are causal and batch-decoupled
            sink.append(load_balance_loss(p, x.reshape(-1, cfg.d_model),
                                          _moe_cfg(cfg)))
            return moe_mlp_dense(p, x, _moe_cfg(cfg))
        # inference/decode: exact no-drop routing — pointwise per token,
        # so full-forward == KV decode == any-batch-composition for ANY
        # router (capacity paths only agree while nothing overflows)
        return moe_mlp_pointwise(p, x, _moe_cfg(cfg))
    if cfg.kernels == "pallas":
        from ..ops.ffn import fused_ffn

        return fused_ffn(x, p["w1"], p["b1"], p["w2"], p["b2"],
                         activation=cfg.activation)
    return _linear(_activation(_linear(x, p["w1"], p["b1"]), cfg),
                   p["w2"], p["b2"])


def _attn_input(p: dict, x, cfg: GPTConfig):
    """The tensor attention consumes: x itself for post-LN (torch
    TransformerEncoderLayer), LN1(x) for pre-LN (api_cache GPTBlock)."""
    if cfg.ln_placement == "post":
        return x
    return _layer_norm(x, p["ln1"]["g"], p["ln1"]["b"], cfg.ln_eps)


def _finish_block(p: dict, x, attn_out, cfg: GPTConfig, sink=None):
    """Residual + FFN wiring after attention, for both LN placements.
    ``sink`` (a plain list, optional, single-trace only) collects MoE
    load-balance loss terms for the trainer."""
    eps = cfg.ln_eps
    if cfg.ln_placement == "post":
        x = _layer_norm(x + attn_out, p["ln1"]["g"], p["ln1"]["b"], eps)
        return _layer_norm(x + _mlp(p["mlp"], x, cfg, sink),
                           p["ln2"]["g"], p["ln2"]["b"], eps)
    x = x + attn_out
    return x + _mlp(p["mlp"],
                    _layer_norm(x, p["ln2"]["g"], p["ln2"]["b"], eps),
                    cfg, sink)


def block(p: dict, x, cfg: GPTConfig, causal: bool = False, valid_len=None,
          sink=None, seg=None):
    """One transformer block; post-LN (torch TransformerEncoderLayer,
    norm_first=False) or pre-LN (api_cache GPTBlock)."""
    xn = _attn_input(p, x, cfg)
    attn_out = attention(p["attn"], xn, xn, xn, cfg, causal, valid_len,
                         seg=seg)
    return _finish_block(p, x, attn_out, cfg, sink)


def _pos_from_seg(seg: jax.Array) -> jax.Array:
    """[B, T] segment ids -> [B, T] per-segment position indices (each
    segment restarts at 0, so a packed song sees the SAME learned position
    rows it would unpacked). Log-depth: running max over boundary-stamped
    indices gives each position its segment's start."""
    B, T = seg.shape
    ar = jnp.arange(T, dtype=jnp.int32)[None, :]
    boundary = jnp.concatenate(
        [jnp.ones((B, 1), bool), seg[:, 1:] != seg[:, :-1]], axis=1)
    starts = jax.lax.associative_scan(
        jnp.maximum, jnp.where(boundary, ar, 0), axis=1)
    return ar - starts


def _forward_hidden_impl(params: dict, ids: jax.Array, cfg: GPTConfig,
                         sink=None, seg=None):
    B, T = ids.shape
    dt = cfg.jnp_dtype
    if seg is None:
        pos = params["pos"][:T]
    else:
        # packed rows: positions restart at each segment boundary, and
        # attention isolates segments — requires the corrected causal
        # config (packing is meaningless bidirectionally / with the
        # batch_first quirk)
        assert cfg.causal and not cfg.batch_first_bug, \
            "packed training requires causal=True without batch_first_bug"
        pos = params["pos"][_pos_from_seg(seg)]
    x = (params["tok_emb"][ids] + pos).astype(dt)
    if cfg.batch_first_bug:
        # train_mini.py:58 — the encoder consumed [B, T, C] as [T, B, C]:
        # attention runs across the batch at every time position.
        x = x.swapaxes(0, 1)
    for p in params["layers"]:
        x = block(p, x, cfg, causal=cfg.causal, sink=sink, seg=seg)
    if cfg.batch_first_bug:
        x = x.swapaxes(0, 1)
    return x


@partial(jax.jit, static_argnames=("cfg",))
def forward_hidden(params: dict, ids: jax.Array, cfg: GPTConfig,
                   seg=None):
    """Transformer stack WITHOUT the head: [B, T] ids -> [B, T, D] states.
    The training stack's chunked cross-entropy applies the head per
    time-chunk so the [B, T, V] logits tensor never materializes.
    ``seg`` ([B, T] ids, 0 = pad) runs the packed-row mode: per-segment
    positions + block-diagonal attention (see train/data.py pack_rows)."""
    return _forward_hidden_impl(params, ids, cfg, seg=seg)


def forward_hidden_with_aux(params: dict, ids: jax.Array, cfg: GPTConfig):
    """Like :func:`forward_hidden` but also returns the mean MoE
    load-balance loss over the model's MoE layers (0.0 for dense models).
    NOT jitted — call it inside your own jit (the trainer does)."""
    sink: list = []
    x = _forward_hidden_impl(params, ids, cfg, sink)
    aux = (sum(sink) / len(sink)) if sink else jnp.zeros(())
    return x, aux


@partial(jax.jit, static_argnames=("cfg",))
def forward(params: dict, ids: jax.Array, cfg: GPTConfig) -> jax.Array:
    """Full-sequence forward: [B, T] ids -> [B, T, V] logits.

    Matches reference ``GPT.forward`` (api.py:49-50): embed + learned pos,
    transformer stack (bidirectional unless cfg.causal), linear head.
    """
    x = forward_hidden(params, ids, cfg)
    return _linear(x.astype(jnp.float32), params["head"]["w"],
                   params["head"]["b"])


@partial(jax.jit, static_argnames=("cfg",))
def forward_masked(params: dict, ids: jax.Array, cfg: GPTConfig,
                   valid_len) -> jax.Array:
    """Fixed-shape forward with only the first ``valid_len`` positions
    treated as present: attention keys beyond valid_len are masked out for
    every query, which is exactly equivalent to running :func:`forward` on
    the physically-shorter ``ids[:, :valid_len]``. Lets the uncached decode
    loop (reference sample(), api.py:81-91) compile once instead of once
    per prefix length.

    Not supported with batch_first_bug (attention crosses the batch there;
    at the reference's serving batch of 1 the bug makes every position
    attend only to itself, so masking is unnecessary — plain forward works).
    """
    B, T = ids.shape
    dt = cfg.jnp_dtype
    x = (params["tok_emb"][ids] + params["pos"][:T]).astype(dt)
    if cfg.batch_first_bug:
        return forward(params, ids, cfg)
    for p in params["layers"]:
        x = block(p, x, cfg, causal=cfg.causal, valid_len=valid_len)
    return _linear(x.astype(jnp.float32), params["head"]["w"],
                   params["head"]["b"])


# ------------------------------------------------------------ KV decoding

def init_kv_cache(cfg: GPTConfig, batch: int, max_len: int | None = None):
    """Preallocated HBM cache: per-layer tuples of [B, H, max_len, Dh] keys
    and values. Per-layer arrays (instead of one stacked [L, ...] tensor)
    keep every dynamic_update_slice trivially aliasable inside the
    while_loop (measured neutral-to-better vs the stacked layout)."""
    max_len = max_len or cfg.seq_len
    shape = (batch, cfg.kv_heads, max_len, cfg.head_dim)
    dt = cfg.jnp_dtype
    return {"k": tuple(jnp.zeros(shape, dt) for _ in range(cfg.n_layer)),
            "v": tuple(jnp.zeros(shape, dt) for _ in range(cfg.n_layer)),
            "length": jnp.zeros((), jnp.int32)}


def prefill(params: dict, ids: jax.Array, cfg: GPTConfig, cache: dict,
            prompt_len=None):
    """Warm-up pass over the prompt; fills the cache, returns (logits, cache).

    Reproduces GPTWithKV's unmasked warm-up (api_cache.py:163): every prompt
    position attends to the full prompt. ``prompt_len`` (static or traced)
    masks padded prompt slots so bucketed compilation is possible.
    """
    B, T = ids.shape
    dt = cfg.jnp_dtype
    x = (params["tok_emb"][ids] + params["pos"][:T]).astype(dt)
    new_k, new_v = [], []
    for li, p in enumerate(params["layers"]):
        attn_in = _attn_input(p, x, cfg)
        (_, _), (wk, bk), (wv, bv) = _split_qkv(p["attn"])
        new_k.append(_heads(_linear(attn_in, wk, bk), cfg.kv_heads))
        new_v.append(_heads(_linear(attn_in, wv, bv), cfg.kv_heads))
        x = block(p, x, cfg, causal=cfg.causal, valid_len=prompt_len)
    logits = _linear(x.astype(jnp.float32), params["head"]["w"],
                     params["head"]["b"])
    plen = prompt_len if prompt_len is not None else T
    k = tuple(jax.lax.dynamic_update_slice(
        cache["k"][i], new_k[i], (0, 0, 0, 0)) for i in range(cfg.n_layer))
    v = tuple(jax.lax.dynamic_update_slice(
        cache["v"][i], new_v[i], (0, 0, 0, 0)) for i in range(cfg.n_layer))
    return logits, {"k": k, "v": v,
                    "length": jnp.asarray(plen, jnp.int32)}


def decode_step(params: dict, last_ids: jax.Array, cache: dict,
                cfg: GPTConfig):
    """One incremental decode step: [B, 1] ids + cache -> ([B, V], cache).

    Math matches GPTWithKV's incremental path (api_cache.py:51-74): the new
    token's q attends to every cached position plus itself; no mask. The
    cache stores *projected* K/V — mathematically identical to the
    reference's cached-pre-projection scheme (projection is per-position),
    but O(1) instead of O(T) projection work per step.
    """
    B = last_ids.shape[0]
    dt = cfg.jnp_dtype
    t = cache["length"]
    max_len = cache["k"][0].shape[2]
    pos_idx = jnp.zeros_like(t) if cfg.pos_broadcast_bug else t
    x = (params["tok_emb"][last_ids]
         + jax.lax.dynamic_slice_in_dim(params["pos"], pos_idx, 1,
                                        0)).astype(dt)
    # per-layer cache arrays: each dynamic_update_slice aliases in place
    # inside the while_loop
    ks, vs = list(cache["k"]), list(cache["v"])
    key_valid = (jnp.arange(max_len) <= t)[None, None, None, :]
    zero = jnp.asarray(0, jnp.int32)
    for li, p in enumerate(params["layers"]):
        attn_in = _attn_input(p, x, cfg)
        # one fused QKV matmul (the projections are [1, D] x [D, 3D])
        qkv = _linear(attn_in, p["attn"]["in_w"], p["attn"]["in_b"])
        D, KVD = cfg.d_model, cfg.kv_dim
        q = _heads(qkv[..., :D], cfg.n_head)                 # [B,H,1,Dh]
        k_new = _heads(qkv[..., D:D + KVD], cfg.kv_heads)
        v_new = _heads(qkv[..., D + KVD:], cfg.kv_heads)
        ks[li] = jax.lax.dynamic_update_slice(ks[li], k_new,
                                              (zero, zero, t, zero))
        vs[li] = jax.lax.dynamic_update_slice(vs[li], v_new,
                                              (zero, zero, t, zero))
        k_all, v_all = ks[li], vs[li]
        if cfg.kernels == "pallas":
            # scalar-prefetch flash-decode: HBM cache reads scale with the
            # true prefix length (index_map clamping skips re-copies)
            from ..ops.decode_attention import flash_decode_sp

            if cfg.kv_heads != cfg.n_head:  # kernel is MHA; expand groups
                g = cfg.n_head // cfg.kv_heads
                k_all = jnp.repeat(k_all, g, axis=1)
                v_all = jnp.repeat(v_all, g, axis=1)
            attn_out = _unheads(flash_decode_sp(q, k_all, v_all, t))
        else:
            scores = _gqa_scores(q, k_all, 1.0 / math.sqrt(cfg.head_dim))
            scores = jnp.where(key_valid, scores, jnp.finfo(dt).min)
            probs = jax.nn.softmax(scores.astype(jnp.float32),
                                   -1).astype(dt)
            attn_out = _unheads(_gqa_values(probs, v_all))
        attn_out = _linear(attn_out, p["attn"]["out_w"], p["attn"]["out_b"])
        x = _finish_block(p, x, attn_out, cfg)
    logits = _linear(x.astype(jnp.float32), params["head"]["w"],
                     params["head"]["b"])[:, 0]
    return logits, {"k": tuple(ks), "v": tuple(vs), "length": t + 1}


def decode_block(params: dict, ids: jax.Array, cache: dict, cfg: GPTConfig,
                 return_hidden: bool = False):
    """Multi-token cached decode: [B, G] ids starting at cache position t ->
    ([B, G, V] logits, cache with length t+G), or with
    ``return_hidden=True`` ([B, G, V] logits, [B, G, D] final hidden
    states, cache) — the Medusa heads propose from the hidden states.

    The verify step of speculative decoding (and a chunked-prefill
    building block): each of the G tokens attends to all cached positions
    plus the block prefix up to itself (causal within the block). Requires
    a corrected causal model (cfg.causal, no pos/refeed quirks).
    """
    assert cfg.causal and not cfg.pos_broadcast_bug, \
        "decode_block requires the corrected causal configuration"
    B, G = ids.shape
    dt = cfg.jnp_dtype
    t = cache["length"]
    max_len = cache["k"][0].shape[2]
    pos = jax.lax.dynamic_slice_in_dim(params["pos"], t, G, 0)
    x = (params["tok_emb"][ids] + pos[None]).astype(dt)
    ks, vs = list(cache["k"]), list(cache["v"])
    zero = jnp.asarray(0, jnp.int32)
    key_pos = jnp.arange(max_len)[None, None, None, :]       # [1,1,1,M]
    q_pos = (t + jnp.arange(G))[None, None, :, None]         # [1,1,G,1]
    valid = key_pos <= q_pos
    for li, p in enumerate(params["layers"]):
        attn_in = _attn_input(p, x, cfg)
        qkv = _linear(attn_in, p["attn"]["in_w"], p["attn"]["in_b"])
        D, KVD = cfg.d_model, cfg.kv_dim
        q = _heads(qkv[..., :D], cfg.n_head)                 # [B,H,G,Dh]
        k_new = _heads(qkv[..., D:D + KVD], cfg.kv_heads)
        v_new = _heads(qkv[..., D + KVD:], cfg.kv_heads)
        ks[li] = jax.lax.dynamic_update_slice(ks[li], k_new,
                                              (zero, zero, t, zero))
        vs[li] = jax.lax.dynamic_update_slice(vs[li], v_new,
                                              (zero, zero, t, zero))
        scores = _gqa_scores(q, ks[li], 1.0 / math.sqrt(cfg.head_dim))
        scores = jnp.where(valid, scores, jnp.finfo(dt).min)
        probs = jax.nn.softmax(scores.astype(jnp.float32), -1).astype(dt)
        attn_out = _unheads(_gqa_values(probs, vs[li]))
        attn_out = _linear(attn_out, p["attn"]["out_w"], p["attn"]["out_b"])
        x = _finish_block(p, x, attn_out, cfg)
    logits = _linear(x.astype(jnp.float32), params["head"]["w"],
                     params["head"]["b"])
    new_cache = {"k": tuple(ks), "v": tuple(vs), "length": t + G}
    if return_hidden:
        return logits, x, new_cache
    return logits, new_cache


def decode_tree(params: dict, ids: jax.Array, depths: jax.Array,
                anc: jax.Array, cache: dict, cfg: GPTConfig):
    """Tree-attention cached decode (the Medusa-2 verify step,
    decode/medusa_tree.py): [1, N] candidate tokens arranged as a tree
    over the cache position t -> ([1, N, V] logits, cache with the N
    staged entries written at slots t..t+N-1 and length UNCHANGED — the
    caller commits the accepted path).

    Returns (logits [1, N, V], hidden [1, N, D], staged cache) — the
    hidden states feed the next step's head proposals (the accepted
    node's hidden), like decode_block's return_hidden.

    ``depths`` [N]: node depth (root 0) — node positions are t+depth,
    so sibling candidates share a position. ``anc`` [N, N] bool:
    anc[q, j] = node j is an ancestor of q or q itself — the intra-block
    visibility; all nodes see the full cache prefix."""
    assert cfg.causal and not cfg.pos_broadcast_bug
    B, N = ids.shape
    assert B == 1, "tree verify is a batch-1 latency optimization"
    dt = cfg.jnp_dtype
    t = cache["length"]
    max_len = cache["k"][0].shape[2]
    pos_ids = jnp.minimum(t + depths, params["pos"].shape[0] - 1)
    x = (params["tok_emb"][ids] + params["pos"][pos_ids][None]).astype(dt)
    ks, vs = list(cache["k"]), list(cache["v"])
    zero = jnp.asarray(0, jnp.int32)
    key_pos = jnp.arange(max_len)
    block_idx = key_pos - t                                  # [M]
    in_block = (block_idx >= 0) & (block_idx < N)
    # [N, M]: query q sees prefix keys (< t) plus its ancestor chain
    valid = ((key_pos[None, :] < t)
             | (in_block[None, :]
                & anc[:, jnp.clip(block_idx, 0, N - 1)]))[None, None]
    for li, p in enumerate(params["layers"]):
        attn_in = _attn_input(p, x, cfg)
        qkv = _linear(attn_in, p["attn"]["in_w"], p["attn"]["in_b"])
        D, KVD = cfg.d_model, cfg.kv_dim
        q = _heads(qkv[..., :D], cfg.n_head)                 # [1,H,N,Dh]
        k_new = _heads(qkv[..., D:D + KVD], cfg.kv_heads)
        v_new = _heads(qkv[..., D + KVD:], cfg.kv_heads)
        ks[li] = jax.lax.dynamic_update_slice(ks[li], k_new,
                                              (zero, zero, t, zero))
        vs[li] = jax.lax.dynamic_update_slice(vs[li], v_new,
                                              (zero, zero, t, zero))
        scores = _gqa_scores(q, ks[li], 1.0 / math.sqrt(cfg.head_dim))
        scores = jnp.where(valid, scores, jnp.finfo(dt).min)
        probs = jax.nn.softmax(scores.astype(jnp.float32), -1).astype(dt)
        attn_out = _unheads(_gqa_values(probs, vs[li]))
        attn_out = _linear(attn_out, p["attn"]["out_w"], p["attn"]["out_b"])
        x = _finish_block(p, x, attn_out, cfg)
    logits = _linear(x.astype(jnp.float32), params["head"]["w"],
                     params["head"]["b"])
    return logits, x, {"k": tuple(ks), "v": tuple(vs), "length": t}


def count_params(params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))

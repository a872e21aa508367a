"""pjit training stack: DP/TP mesh, lax.scan gradient accumulation, optax.

Behavioral contract reproduced from the reference trainers:
- next-token CE with PAD ignored (``ignore_index=PAD``, train/train_mini.py:74)
- AdamW, lr 3e-4, torch-default betas, no scheduler (train/train_large2.py:97)
- logical-batch = micro-batch x accumulation steps (train_large.py:58:
  ``Accelerator(gradient_accumulation_steps=8)``, batch 8 -> logical 64);
  here accumulation is a ``lax.scan`` over microbatches inside ONE compiled
  step, and the DP gradient all-reduce is the psum XLA inserts for the
  ``data``-sharded batch — no NCCL, no DDP wrapper.
- the paper's Table-5 recipe (AdamW β=(0.9, 0.95), warmup+cosine, grad-clip
  1.0 — claimed in §10.2 but absent from the code) is the opt-in
  ``paper`` preset.
"""

from __future__ import annotations

import dataclasses
from functools import partial


import jax
import jax.numpy as jnp
import optax

from ..models.gpt import GPTConfig, forward, forward_hidden
from ..parallel.mesh import shard_params
from jax.sharding import NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    lr: float = 3e-4
    accum_steps: int = 1
    micro_batch: int = 8          # per-step batch BEFORE accumulation
    epochs: int = 6
    pad_id: int = 0
    b1: float = 0.9
    b2: float = 0.999             # torch AdamW default (reference)
    weight_decay: float = 0.01    # torch AdamW default
    clip_norm: float | None = None
    warmup_steps: int = 0
    total_steps: int | None = None  # for cosine decay
    schedule: str = "constant"    # "constant" | "warmup_cosine"
    tp: bool = False              # tensor-parallel params over 'model' axis
    # ZeRO/FSDP: shard params + Adam moments over the 'data' axis too
    # (GSPMD all-gathers weights at use, reduce-scatters grads); composes
    # with tp. Per-device param+optimizer memory drops ~data-fold.
    fsdp: bool = False
    # Time-chunked cross-entropy: the head + CE run per ``loss_chunk``
    # positions under jax.checkpoint, so the [B, T, V] logits tensor never
    # materializes (2.2 GB at micro_batch 128 on the flagship vocab —
    # the OOM wall for micro_batch >= 256 on one v5e). None = monolithic.
    loss_chunk: int | None = None
    # Weight on the Switch-style MoE load-balance auxiliary loss; only
    # active for MoE configs (GPTConfig.n_experts). 0 disables.
    moe_aux_weight: float = 0.01
    # Sequence packing (beyond-reference): train on rows built by
    # data.pack_rows — several whole songs per row with block-diagonal
    # attention and per-segment positions, so short songs stop wasting
    # the row as PAD. Batches must come from data.packed_batches and
    # carry the [.., T] segment ids. Requires the corrected causal
    # config; incompatible with the MoE aux path for now.
    pack: bool = False


def reference_preset(name: str) -> TrainConfig:
    """Presets mirroring the four reference trainers + the paper recipe."""
    presets = {
        # train/train_mini.py: batch 8, 5 epochs, AdamW 3e-4
        "mini": TrainConfig(micro_batch=8, epochs=5),
        # train/train_large.py: phys batch 8 x accum 8 = logical 64, 6 epochs
        "large": TrainConfig(micro_batch=8, accum_steps=8, epochs=6),
        # train/train_large2.py: batch 16, 6 epochs
        "large2": TrainConfig(micro_batch=16, epochs=6),
        # train/train_no_inst.py: same as large2
        "no_inst": TrainConfig(micro_batch=16, epochs=6),
        # paper §10.1-10.2 Table 5: β2=0.95, clip 1.0, warmup+cosine, ~200k
        "paper": TrainConfig(micro_batch=16, epochs=6, b2=0.95,
                             clip_norm=1.0, warmup_steps=2000,
                             total_steps=200_000,
                             schedule="warmup_cosine"),
    }
    return presets[name]


def make_optimizer(tcfg: TrainConfig) -> optax.GradientTransformation:
    if tcfg.schedule == "warmup_cosine":
        lr = optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=tcfg.lr,
            warmup_steps=max(tcfg.warmup_steps, 1),
            decay_steps=tcfg.total_steps or 100_000)
    else:
        lr = tcfg.lr
    chain = []
    if tcfg.clip_norm:
        chain.append(optax.clip_by_global_norm(tcfg.clip_norm))
    chain.append(optax.adamw(lr, b1=tcfg.b1, b2=tcfg.b2,
                             weight_decay=tcfg.weight_decay))
    return optax.chain(*chain)


def masked_ce_sums(logits: jax.Array, y: jax.Array, pad_id: int):
    """The loss contract shared by every trainer (DP, chunked, pipeline):
    PAD-masked next-token CE — CrossEntropyLoss(ignore_index=PAD),
    train/train_mini.py:74. Returns SUMS (total_nll, count) so callers
    can accumulate before dividing."""
    mask = (y != pad_id)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, y[..., None], axis=-1)[..., 0]
    return jnp.sum(nll * mask), jnp.sum(mask)


def loss_fn(params: dict, x: jax.Array, y: jax.Array, cfg: GPTConfig,
            pad_id: int):
    """Next-token CE, PAD-masked — CrossEntropyLoss(ignore_index=PAD)."""
    total, count = masked_ce_sums(forward(params, x, cfg), y, pad_id)
    count = jnp.maximum(count, 1)
    return total / count, count


def loss_fn_moe(params: dict, x: jax.Array, y: jax.Array, cfg: GPTConfig,
                pad_id: int, aux_weight: float):
    """CE + the Switch load-balance auxiliary loss averaged over the
    model's MoE layers (keeps top-k routing from collapsing)."""
    from ..models.gpt import forward_hidden_with_aux

    h, aux = forward_hidden_with_aux(params, x, cfg)
    total, count = masked_ce_sums(_head(params, h), y, pad_id)
    count = jnp.maximum(count, 1)
    return total / count + aux_weight * aux, count


def loss_fn_packed(params: dict, x: jax.Array, y: jax.Array,
                   seg: jax.Array, cfg: GPTConfig, pad_id: int):
    """CE over packed rows (data.packed_batches): block-diagonal
    attention + per-segment positions via the seg ids; boundary-crossing
    targets arrive pre-masked to PAD, so the same masked CE applies."""
    h = forward_hidden(params, x, cfg, seg=seg)
    total, count = masked_ce_sums(_head(params, h), y, pad_id)
    count = jnp.maximum(count, 1)
    return total / count, count


def loss_fn_chunked(params: dict, x: jax.Array, y: jax.Array,
                    cfg: GPTConfig, pad_id: int, chunk: int, seg=None):
    """Same CE, but the head + log-softmax run per time-chunk inside a
    rematerialized scan: peak logits memory is [B, chunk, V] instead of
    [B, T, V], and the backward pass recomputes each chunk's logits
    (one extra head matmul, ~8% of model FLOPs) instead of storing them.
    ``seg`` composes packing with the chunked head (the chunking is a
    pure head-side transform; attention isolation happened upstream)."""
    h = forward_hidden(params, x, cfg, seg=seg)         # [B, T, D]
    B, T, D = h.shape
    pad = (-T) % chunk
    if pad:
        h = jnp.pad(h, ((0, 0), (0, pad), (0, 0)))
        y = jnp.pad(y, ((0, 0), (0, pad)), constant_values=pad_id)
    n = (T + pad) // chunk
    hs = h.reshape(B, n, chunk, D).swapaxes(0, 1)       # [n, B, chunk, D]
    ys = y.reshape(B, n, chunk).swapaxes(0, 1)

    @jax.checkpoint
    def ce_chunk(carry, hy):
        total, count = carry
        hc, yc = hy
        t, c = masked_ce_sums(_head(params, hc), yc, pad_id)
        return (total + t, count + c), None

    (total, count), _ = jax.lax.scan(
        ce_chunk, (jnp.zeros(()), jnp.zeros((), jnp.int32)), (hs, ys))
    count = jnp.maximum(count, 1)
    return total / count, count


def _head(params, h):
    from ..models.gpt import _linear

    return _linear(h.astype(jnp.float32), params["head"]["w"],
                   params["head"]["b"])


def make_train_step(cfg: GPTConfig, tcfg: TrainConfig, optimizer=None,
                    donate: bool = False):
    """Returns a jitted step: (params, opt_state, x, y) -> (params,
    opt_state, metrics).

    x, y: [accum_steps, micro_batch, T]; the scan accumulates PAD-weighted
    gradients so the result equals one big batch of accum*micro rows — the
    exact contract of accelerate's accumulate() (train_large.py:149-155).

    ``donate=True`` donates params + opt_state buffers to XLA (in-place
    update: peak memory drops by one params+adam copy, ~333 MB at the
    flagship geometry). The caller's input trees are INVALIDATED each call
    — only safe when the old values are discarded, as Trainer does.
    """
    optimizer = optimizer or make_optimizer(tcfg)

    moe = bool(cfg.n_experts) and tcfg.moe_aux_weight > 0
    assert not (moe and tcfg.loss_chunk), (
        "loss_chunk with the MoE aux loss is unsupported — set "
        "moe_aux_weight=0 or chunk off")
    assert not (moe and tcfg.pack), (
        "packed rows with the MoE aux loss are unsupported yet")

    @partial(jax.jit, donate_argnums=(0, 1) if donate else ())
    def step(params, opt_state, x, y, seg=None):
        if tcfg.loss_chunk:
            def lfn(p, xi, yi, si):
                return loss_fn_chunked(p, xi, yi, cfg, tcfg.pad_id,
                                       tcfg.loss_chunk, seg=si)
        elif moe:
            def lfn(p, xi, yi, si):
                return loss_fn_moe(p, xi, yi, cfg, tcfg.pad_id,
                                   tcfg.moe_aux_weight)
        elif tcfg.pack:
            def lfn(p, xi, yi, si):
                return loss_fn_packed(p, xi, yi, si, cfg, tcfg.pad_id)
        else:
            def lfn(p, xi, yi, si):
                return loss_fn(p, xi, yi, cfg, tcfg.pad_id)

        def micro(carry, xy):
            grad_acc, loss_acc, count_acc = carry
            xi, yi = xy[0], xy[1]
            si = xy[2] if len(xy) == 3 else None
            (loss, count), grads = jax.value_and_grad(
                lfn, has_aux=True)(params, xi, yi, si)
            grad_acc = jax.tree.map(
                lambda a, g: a + g * count, grad_acc, grads)
            return (grad_acc, loss_acc + loss * count,
                    count_acc + count), None

        zeros = jax.tree.map(jnp.zeros_like, params)
        carry_in = (x, y) if seg is None else (x, y, seg)
        (grads, loss_sum, count), _ = jax.lax.scan(
            micro, (zeros, jnp.zeros(()), jnp.zeros((), jnp.int32)),
            carry_in)
        grads = jax.tree.map(lambda g: g / count, grads)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"loss": loss_sum / count,
                                   "tokens": count}

    return step


class Trainer:
    """Owns params/opt_state/mesh; feeds [accum, micro, T] batches to the
    compiled step. On a multi-device mesh the micro-batch dim is sharded
    over 'data' (DP) and params optionally over 'model' (TP)."""

    def __init__(self, cfg: GPTConfig, tcfg: TrainConfig, params: dict,
                 mesh=None):
        self.cfg, self.tcfg = cfg, tcfg
        self.mesh = mesh
        self.optimizer = make_optimizer(tcfg)
        if mesh is not None:
            params = shard_params(params, mesh, tp=tcfg.tp,
                                  fsdp=tcfg.fsdp)
        # the donated step invalidates its input buffers each call; copy
        # once so the CALLER's params tree stays alive (tests/users compare
        # against the initial params after training)
        self.params = jax.tree.map(jnp.copy, params)
        self.opt_state = self.optimizer.init(params)
        # Trainer discards the previous params/opt_state every step, so
        # buffer donation is safe here (in-place optimizer update in HBM)
        self.step_fn = make_train_step(cfg, tcfg, self.optimizer,
                                       donate=True)
        self.step = 0

    def train_step(self, x, y, seg=None, sync: bool = True):
        """x, y (and seg with TrainConfig.pack): [accum, micro, T] int
        arrays (host or device).

        ``sync=False`` returns the metrics as device arrays without
        blocking — on the axon tunnel every ``float()`` is a ~25 ms
        host RPC that serializes the step stream, so throughput loops
        (train/run.py) fetch metrics only at log points."""
        assert (seg is not None) == bool(self.tcfg.pack), (
            "TrainConfig.pack and the seg operand must agree "
            "(use data.packed_batches for packed training)")
        if self.mesh is not None:
            sh = NamedSharding(self.mesh, P(None, "data", None))
            x = jax.device_put(jnp.asarray(x), sh)
            y = jax.device_put(jnp.asarray(y), sh)
            if seg is not None:
                seg = jax.device_put(jnp.asarray(seg), sh)
        else:
            x, y = jnp.asarray(x), jnp.asarray(y)
            if seg is not None:
                seg = jnp.asarray(seg)
        self.params, self.opt_state, metrics = self.step_fn(
            self.params, self.opt_state, x, y, seg)
        self.step += 1
        if sync:
            return {k: float(v) for k, v in metrics.items()}
        return metrics

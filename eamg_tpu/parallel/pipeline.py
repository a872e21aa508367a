"""Pipeline parallelism: GPipe-style microbatch pipelining over a
``stage`` mesh axis.

The reference has no pipeline parallelism (its largest model is ~30 M
params — SURVEY.md §2.2 scopes PP out for parity). This is the TPU-native
growth path for models whose LAYERS no longer fit one chip: split the
transformer stack into contiguous stages, one per device along a
``stage`` mesh axis; microbatches stream through the stages while
activations hop stage→stage over ICI with ``lax.ppermute``.

Idiomatic-JAX construction (no torch-style schedule objects):

- stage weights are the SAME pytree as models/gpt.py, with every layer
  array stacked on a leading ``[n_stages, layers_per_stage, ...]`` axis
  sharded ``P("stage")`` — each device physically holds only its own
  layers;
- one ``lax.scan`` over ``n_micro + n_stages - 1`` ticks is the whole
  schedule: every tick each stage applies its layers to its resident
  activation and ppermutes the result to its neighbor (S-1 edge
  exchanges, no wrap-around traffic);
- fill/drain bubbles are the standard GPipe cost: utilization is
  ``n_micro / (n_micro + n_stages - 1)`` — pick ``n_micro >= 4*stages``
  in real training;
- the backward pass is free: ``ppermute`` is differentiable (its
  transpose is the reverse rotation), so ``jax.grad`` through this
  forward IS the backward pipeline, bit-comparable to the sequential
  stack (tests/test_pipeline.py asserts grad-exactness).

Composes with data parallelism on a 2-D ``(data, stage)`` mesh: the
microbatch batch dim shards over ``data`` (gradient psum inserted by
shard_map's transpose), layers over ``stage``.

Embedding and LM head stay outside the pipelined region (replicated/DP):
at reference scale they are ~35% of params but <10% of FLOPs, and keeping
them out of the stage loop lets the PAD-masked CE reuse the exact
train/trainer.py loss. A vocab-parallel head would be the next step at
larger scale.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.gpt import GPTConfig, _linear, block


def make_pp_mesh(stages: int, data: int = 1, model: int = 1,
                 devices=None) -> Mesh:
    """A (data, stage[, model]) mesh. Pure PP = data 1; DP x PP
    otherwise; ``model > 1`` adds Megatron tensor parallelism INSIDE each
    stage (3-axis dp x pp x tp composition)."""
    devices = devices if devices is not None else jax.devices()
    n = data * stages * model
    assert n <= len(devices), (
        f"mesh {data}x{stages}x{model} > {len(devices)} devices")
    if model == 1:
        grid = np.asarray(devices[:n]).reshape(data, stages)
        return Mesh(grid, axis_names=("data", "stage"))
    grid = np.asarray(devices[:n]).reshape(data, stages, model)
    return Mesh(grid, axis_names=("data", "stage", "model"))


def stack_layers(params: dict, n_stages: int) -> dict:
    """Restack the per-layer param list into stage-major stacked arrays:
    every leaf becomes ``[n_stages, layers_per_stage, ...]``. The
    embedding/pos/head subtrees pass through unchanged."""
    L = len(params["layers"])
    assert L % n_stages == 0, (
        f"n_layer={L} not divisible by {n_stages} stages")
    structures = {tuple(sorted(layer["mlp"])) for layer in params["layers"]}
    assert len(structures) == 1, (
        "stack_layers needs structurally identical layers; got mixed MLP "
        f"structures {structures} (GPTConfig.moe_every > 1 interleaves "
        "dense and MoE layers — pipeline parallelism requires moe_every"
        "=1 or a dense model)")
    lps = L // n_stages
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *params["layers"])
    stacked = jax.tree.map(
        lambda a: a.reshape((n_stages, lps) + a.shape[1:]), stacked)
    return {**{k: v for k, v in params.items() if k != "layers"},
            "layers": stacked}


def unstack_layers(params: dict) -> dict:
    """Inverse of :func:`stack_layers` — back to the per-layer list layout
    (checkpoint/save interop)."""
    st = params["layers"]
    S, lps = jax.tree.leaves(st)[0].shape[:2]
    flat = jax.tree.map(lambda a: a.reshape((S * lps,) + a.shape[2:]), st)
    layers = [jax.tree.map(lambda a: a[i], flat) for i in range(S * lps)]
    return {**{k: v for k, v in params.items() if k != "layers"},
            "layers": layers}


def pp_pspecs(params_stacked: dict, tp: bool = False) -> dict:
    """PartitionSpec tree: stage-stacked layers shard on the leading
    ``stage`` axis; everything else replicated. ``tp=True`` additionally
    shards each stage's weights over a ``model`` axis with the Megatron
    column/row layout (parallel/mesh.py::param_pspecs shifted by the two
    leading [n_stages, layers_per_stage] axes) — the 3-axis dp x pp x tp
    composition. The pipeline shard_map stays MANUAL over (data, stage)
    only; ``model`` remains an auto axis, so GSPMD inserts the same
    per-stage TP psums it inserts for the unpipelined TP trainer."""
    if tp:
        layers = {
            "attn": {"in_w": P("stage", None, "model", None),
                     "in_b": P("stage", None, "model"),
                     "out_w": P("stage", None, None, "model"),
                     "out_b": P("stage", None)},
            "ln1": {"g": P("stage", None), "b": P("stage", None)},
            "ln2": {"g": P("stage", None), "b": P("stage", None)},
            "mlp": {"w1": P("stage", None, "model", None),
                    "b1": P("stage", None, "model"),
                    "w2": P("stage", None, None, "model"),
                    "b2": P("stage", None)},
        }
    else:
        layers = jax.tree.map(lambda a: P("stage"),
                              params_stacked["layers"])
    return {
        "tok_emb": P(), "pos": P(),
        "layers": layers,
        "head": {"w": P(), "b": P()},
    }


def shard_pp_params(params_stacked: dict, mesh: Mesh,
                    tp: bool = False) -> dict:
    specs = pp_pspecs(params_stacked, tp=tp)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params_stacked, specs)


def _pipeline_body(pstage, xs, *, cfg: GPTConfig, n_stages: int,
                   axis: str):
    """Per-device pipeline schedule (runs inside shard_map over ``axis``).

    pstage: this device's layer stack, leading axes [1, layers_per_stage].
    xs: [n_micro, Bm, T, D] embedded microbatch activations (replicated
    over ``axis``). Returns [1, n_micro, Bm, T, D]; only the LAST stage's
    slot holds real outputs (callers index [-1] after shard_map
    concatenates stage-major).
    """
    sidx = lax.axis_index(axis)
    p = jax.tree.map(lambda a: a[0], pstage)          # [lps, ...]
    n_micro = xs.shape[0]

    def stage_apply(x):
        def one_layer(x, pl):
            return block(pl, x, cfg, causal=cfg.causal), None
        x, _ = lax.scan(one_layer, x, p)
        return x

    # S-1 edge exchanges; the last stage's output leaves via outbuf, not
    # the ring (no wrap-around traffic)
    perm = [(i, i + 1) for i in range(n_stages - 1)]

    def tick(carry, t):
        cur, outbuf = carry
        tin = jnp.clip(t, 0, n_micro - 1)
        inp = lax.dynamic_index_in_dim(xs, tin, 0, keepdims=False)
        x_in = jnp.where(sidx == 0, inp, cur)
        out = stage_apply(x_in)
        j = t - (n_stages - 1)
        jc = jnp.clip(j, 0, n_micro - 1)
        valid = (j >= 0) & (j < n_micro)
        prev = lax.dynamic_index_in_dim(outbuf, jc, 0, keepdims=False)
        outbuf = lax.dynamic_update_index_in_dim(
            outbuf, jnp.where(valid, out, prev), jc, 0)
        nxt = out if not perm else lax.ppermute(out, axis, perm)
        return (nxt, outbuf), None

    outbuf0 = jnp.zeros_like(xs)
    (_, outbuf), _ = lax.scan(
        tick, (jnp.zeros_like(xs[0]), outbuf0),
        jnp.arange(n_micro + n_stages - 1))
    return outbuf[None]


@functools.partial(jax.jit,
                   static_argnames=("cfg", "mesh", "n_micro", "axis"))
def pipeline_forward(params_stacked: dict, ids: jax.Array, cfg: GPTConfig,
                     mesh: Mesh, n_micro: int,
                     axis: str = "stage") -> jax.Array:
    """Pipelined GPT forward: [B, T] ids -> [B, T, V] logits, numerically
    equal to models/gpt.py::forward (same quirk semantics; asserted
    corrected-arch only).

    The batch splits into ``n_micro`` microbatches that stream through the
    stage pipeline. With a ``data`` axis in the mesh, the microbatch batch
    dim additionally shards over it (DP x PP).
    """
    assert not cfg.batch_first_bug, (
        "pipeline parallelism supports the corrected architectures "
        "(batch_first_bug attention crosses the batch, which microbatch "
        "splitting would change)")
    S = mesh.shape[axis]
    B, T = ids.shape
    assert B % n_micro == 0, f"B={B} not divisible by n_micro={n_micro}"
    Bm = B // n_micro
    if "data" in mesh.axis_names:
        nd = mesh.shape["data"]
        assert Bm % nd == 0, (
            f"microbatch size B/n_micro={Bm} not divisible by the data "
            f"axis ({nd}); pick n_micro so each microbatch DP-shards "
            f"evenly")

    x = (params_stacked["tok_emb"][ids]
         + params_stacked["pos"][:T]).astype(cfg.jnp_dtype)
    xs = x.reshape(n_micro, Bm, T, cfg.d_model)

    data = "data" if "data" in mesh.axis_names else None
    # manual over (data, stage) ONLY: a 3-axis mesh's 'model' axis stays
    # auto, so the layer arrays keep their Megatron sharding inside the
    # body and GSPMD inserts the per-stage TP psums (dp x pp x tp)
    fn = jax.shard_map(
        functools.partial(_pipeline_body, cfg=cfg, n_stages=S, axis=axis),
        mesh=mesh,
        in_specs=(jax.tree.map(lambda a: P(axis),
                               params_stacked["layers"]), P(None, data)),
        out_specs=P(axis, None, data), check_vma=False,
        axis_names={n for n in ("data", axis) if n in mesh.axis_names})
    hidden = fn(params_stacked["layers"], xs)[-1]      # [n_micro, Bm, T, D]
    h = hidden.reshape(B, T, cfg.d_model)
    return _linear(h.astype(jnp.float32), params_stacked["head"]["w"],
                   params_stacked["head"]["b"])


# ------------------------------------------------------------- training

def make_pp_train_step(cfg: GPTConfig, tcfg, mesh: Mesh, n_micro: int,
                       optimizer=None):
    """Jitted pipelined training step: (params_stacked, opt_state, x, y)
    -> (params_stacked, opt_state, metrics), with the train/trainer.py
    loss contract (PAD-masked next-token CE). The pipeline's microbatch
    streaming replaces the DP trainer's lax.scan gradient accumulation —
    x/y are plain [B, T] batches; B splits into ``n_micro`` microbatches
    in flight across the stages."""
    from ..train.trainer import make_optimizer  # local: avoids pkg cycle

    optimizer = optimizer or make_optimizer(tcfg)

    from functools import partial

    from ..train.trainer import masked_ce_sums

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, x, y):
        def lfn(p):
            logits = pipeline_forward(p, x, cfg, mesh, n_micro)
            total, count = masked_ce_sums(logits, y, tcfg.pad_id)
            count = jnp.maximum(count, 1)
            return total / count, count

        (loss, count), grads = jax.value_and_grad(lfn, has_aux=True)(
            params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, opt_state, {"loss": loss, "tokens": count}

    return step


class PipelineTrainer:
    """Trainer twin for the pipelined stack: owns stage-stacked params +
    opt_state on a (data, stage) mesh. ``train_step(x, y)`` takes plain
    [B, T] batches. ``export_params()`` returns the standard per-layer
    layout for checkpointing/serving interop."""

    def __init__(self, cfg: GPTConfig, tcfg, params: dict, mesh: Mesh,
                 n_micro: int):
        from ..train.trainer import make_optimizer

        self.cfg, self.tcfg, self.mesh = cfg, tcfg, mesh
        self.n_micro = n_micro
        self.optimizer = make_optimizer(tcfg)
        tp = "model" in mesh.axis_names and mesh.shape["model"] > 1
        # the donated step invalidates its inputs; copy so the caller's
        # per-layer params tree survives (head/embed pass through
        # stack_layers by reference)
        self.params = jax.tree.map(jnp.copy, shard_pp_params(
            stack_layers(params, mesh.shape["stage"]), mesh, tp=tp))
        self.opt_state = self.optimizer.init(self.params)
        self.step_fn = make_pp_train_step(cfg, tcfg, mesh, n_micro,
                                          self.optimizer)
        self.step = 0

    def train_step(self, x, y, sync: bool = True):
        data = ("data" if "data" in self.mesh.axis_names
                and self.mesh.shape["data"] > 1 else None)
        sh = NamedSharding(self.mesh, P(data))
        x = jax.device_put(jnp.asarray(x), sh)
        y = jax.device_put(jnp.asarray(y), sh)
        self.params, self.opt_state, metrics = self.step_fn(
            self.params, self.opt_state, x, y)
        self.step += 1
        if sync:
            return {k: float(v) for k, v in metrics.items()}
        return metrics

    def export_params(self) -> dict:
        return unstack_layers(self.params)

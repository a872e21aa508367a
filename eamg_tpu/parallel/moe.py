"""Expert parallelism: a mixture-of-experts FFN with all_to_all dispatch
over an ``expert`` mesh axis.

The reference has no MoE (SURVEY.md §2.2: EP n/a), so this is a
beyond-reference capability: the TPU-native building block you reach for
when scaling the generator's FFN past what dense layers afford. The
construction is the standard TPU MoE recipe (Mesh-TF / Switch / GShard
lineage), not a port of anything:

- routing: top-k gating over E experts; gate weights are the softmax of
  the selected router logits (renormalized top-k, Mixtral-style) for
  k >= 2, or the full-softmax winner probability (Switch-style) for
  k == 1 — renormalizing a single logit would zero the router gradient;
- dispatch/combine are ONE-HOT EINSUMS, not gathers — [N, E, C]
  dispatch tensors contracted on the MXU, the layout XLA pipelines best;
- capacity (TRAINING only): each expert accepts at most
  C = ceil(k*T/E * capacity_factor) tokens PER ROW, claimed in token
  order, so drops are causal (a token competes only with earlier
  positions of its own sequence) and batch-decoupled; overflow tokens
  fall through (their gate mass is simply not added — the residual
  stream carries them unchanged);
- inference (``moe_mlp_pointwise``): NO capacity — every token reaches
  its experts, so routing is pointwise and full-forward == per-token KV
  decode == any batch composition, exactly, for any router. This is what
  the decode parity and continuous-batching bit-identity contracts rest
  on (tests/test_moe.py::test_gpt_moe_kv_parity_with_adversarial_router);
- expert parallelism: experts shard over an ``expert`` mesh axis; tokens
  reach their expert's device via ``lax.all_to_all`` (ICI), run the
  expert FFN where the weights live, and return the same way. The DP
  gradient psum and the two all_to_alls are the only collectives.

``moe_mlp_dense`` is the sharding-free reference semantics; the EP path
is asserted equal to it (tests/test_moe.py) whenever capacity suffices,
and both are differentiable (router grads flow through the gate values).
"""

from __future__ import annotations

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class MoEConfig:
    d_model: int
    d_ff: int                 # per-expert hidden width
    n_experts: int
    top_k: int = 2
    capacity_factor: float = 1.25
    activation: str = "gelu"


def init_moe_params(rng: jax.Array, cfg: MoEConfig) -> dict:
    """Router + stacked per-expert FFNs (torch [out, in] layout per
    expert, matching the dense MLP initializer conventions)."""
    kr, k1, k2, kb1, kb2 = jax.random.split(rng, 5)
    D, FF, E = cfg.d_model, cfg.d_ff, cfg.n_experts
    bw1 = math.sqrt(6.0 / (6 * D))
    bw2 = math.sqrt(6.0 / (6 * FF))
    return {
        "router": jax.random.uniform(kr, (E, D), jnp.float32,
                                     -bw1, bw1),
        "w1": jax.random.uniform(k1, (E, FF, D), jnp.float32, -bw1, bw1),
        "b1": jax.random.uniform(kb1, (E, FF), jnp.float32,
                                 -1 / math.sqrt(D), 1 / math.sqrt(D)),
        "w2": jax.random.uniform(k2, (E, D, FF), jnp.float32, -bw2, bw2),
        "b2": jax.random.uniform(kb2, (E, D), jnp.float32,
                                 -1 / math.sqrt(FF), 1 / math.sqrt(FF)),
    }


def _act(x, cfg: MoEConfig):
    return jax.nn.gelu(x, approximate=False) if cfg.activation == "gelu" \
        else jax.nn.relu(x)


def _gates(params, x, cfg: MoEConfig):
    """Top-k routing. x: [N, D] -> (gate values [k, N], expert ids
    [k, N]). For k >= 2 gates are the softmax over the k selected logits
    (renormalized top-k, Mixtral-style). For k == 1 that renormalization
    is a softmax over ONE logit == constant 1.0 — zero router gradient —
    so top-1 uses the Switch-Transformer gate instead: the full-softmax
    probability of the selected expert, which keeps d(gate)/d(logits)
    alive."""
    logits = jnp.einsum("nd,ed->ne", x.astype(jnp.float32),
                        params["router"])
    top, idx = lax.top_k(logits, cfg.top_k)            # [N, k]
    if cfg.top_k == 1:
        gates = jnp.take_along_axis(jax.nn.softmax(logits, axis=-1),
                                    idx, axis=-1)
    else:
        gates = jax.nn.softmax(top, axis=-1)
    return gates.T, idx.T                              # [k, N]


def _dispatch_tensors(eidx, cfg: MoEConfig, capacity: int):
    """One-hot dispatch tensor [k, N, E, C] with TOKEN-MAJOR
    position-in-expert bookkeeping: token n's k choices claim capacity
    before token n+1's (and a token's 1st choice before its 2nd), so a
    token's keep/drop decision depends only on itself and EARLIER tokens
    — capacity dropping stays causal when N is a time axis. Overflow
    slots get all-zero one-hots; gate mass is applied by the callers at
    combine time."""
    k, N = eidx.shape
    E = cfg.n_experts
    order = eidx.T.reshape(N * k)                      # (n, j)-major
    keep_oh = jax.nn.one_hot(order, E, dtype=jnp.int32)
    pos = jnp.cumsum(keep_oh, axis=0) - 1              # position in expert
    keep = pos < capacity
    disp = (jax.nn.one_hot(order, E, dtype=jnp.float32)
            * keep.astype(jnp.float32))                # [Nk, E]
    posh = jax.nn.one_hot(jnp.clip(pos, 0, capacity - 1), capacity,
                          dtype=jnp.float32)           # [Nk, E, C]
    dispatch = disp[..., None] * posh                  # [Nk, E, C]
    return dispatch.reshape(N, k, E, capacity).swapaxes(0, 1)


def load_balance_loss(params: dict, x: jax.Array,
                      cfg: MoEConfig) -> jax.Array:
    """Switch-Transformer auxiliary loss: E * Σ_e f_e · P_e, where f_e is
    the fraction of routed slots assigned to expert e and P_e the mean
    router probability of e (full softmax). Minimized (=1) at a uniform
    routing; without it top-k routing collapses onto few experts.
    x: [N, D] token activations entering the MoE layer."""
    logits = jnp.einsum("nd,ed->ne", x.astype(jnp.float32),
                        params["router"])
    probs = jax.nn.softmax(logits, axis=-1)             # [N, E]
    _, idx = lax.top_k(logits, cfg.top_k)               # [N, k]
    f = jnp.mean(jax.nn.one_hot(idx, cfg.n_experts,
                                dtype=jnp.float32), axis=(0, 1))
    return cfg.n_experts * jnp.sum(f * jnp.mean(probs, axis=0))


def _moe_row(params, xf, cfg: MoEConfig, capacity: int):
    """Capacity-bounded MoE over ONE row of tokens xf: [N, D] -> [N, D]."""
    gates, eidx = _gates(params, xf, cfg)
    dispatch = _dispatch_tensors(eidx, cfg, capacity)
    xin = jnp.einsum("knec,nd->ecd", dispatch, xf.astype(jnp.float32))
    h = _act(jnp.einsum("ecd,efd->ecf", xin, params["w1"])
             + params["b1"][:, None], cfg)
    out = jnp.einsum("ecf,edf->ecd", h, params["w2"]) \
        + params["b2"][:, None]
    combine = dispatch * gates[..., None, None]        # [k, N, E, C]
    return jnp.einsum("knec,ecd->nd", combine, out)


def moe_mlp_dense(params: dict, x: jax.Array, cfg: MoEConfig,
                  capacity: int | None = None) -> jax.Array:
    """Reference semantics, no mesh: [.., D] -> [.., D]. Every expert runs
    on its dispatched slots; results combine with gate weights.

    Capacity is counted PER ROW (per leading-axis element when x is
    [B, T, D]): tokens only compete with their own sequence for expert
    slots, never with other batch rows, and — with the token-major
    bookkeeping in :func:`_dispatch_tensors` — only with EARLIER
    positions, so capacity dropping is causal and batch-decoupled."""
    shape = x.shape
    x2 = x.reshape((-1, shape[-1]) if x.ndim == 2 else
                   (-1, shape[-2], shape[-1]))
    if x2.ndim == 2:
        x2 = x2[None]
    n_row = x2.shape[1]
    capacity = capacity or max(
        1, int(math.ceil(cfg.top_k * n_row / cfg.n_experts
                         * cfg.capacity_factor)))
    y = jax.vmap(lambda r: _moe_row(params, r, cfg, capacity))(x2)
    return y.reshape(shape).astype(x.dtype)


def moe_mlp_pointwise(params: dict, x: jax.Array, cfg: MoEConfig,
                      chunk: int = 256) -> jax.Array:
    """Exact NO-DROP top-k MoE: [.., D] -> [.., D]. Every token reaches
    all of its selected experts — no capacity, so routing is pointwise:
    token t's output depends on token t alone. This is the inference
    semantics (Mixtral-style serving): causal by construction, identical
    between full-forward and per-token KV decode for ANY router (the
    capacity paths only match when nothing overflows), and decoupled
    across batch rows, which the continuous-batching engine's
    bit-identical-to-solo contract requires.

    Cost: runs ALL E experts on every token (E/k x the dispatched-slot
    FLOPs), chunked over tokens to bound the [chunk, E, FF] activation.
    Decode steps have N = batch tokens, where this is cheap; prefill pays
    the factor once per request."""
    shape = x.shape
    xf = x.reshape(-1, cfg.d_model)
    N = xf.shape[0]
    gates, eidx = _gates(params, xf, cfg)              # [k, N]
    chunk = max(1, min(chunk, N))  # decode steps have N = batch tokens
    pad = (-N) % chunk
    xp = jnp.pad(xf, ((0, pad), (0, 0)))
    gp = jnp.pad(gates, ((0, 0), (0, pad)))
    ep = jnp.pad(eidx, ((0, 0), (0, pad)))
    n_chunks = (N + pad) // chunk

    def run(args):
        xc, gc, ec = args                              # [C,D],[k,C],[k,C]
        h = _act(jnp.einsum("nd,efd->nef", xc.astype(jnp.float32),
                            params["w1"]) + params["b1"][None], cfg)
        out = jnp.einsum("nef,edf->ned", h, params["w2"]) \
            + params["b2"][None]                       # [C, E, D]
        sel = jax.nn.one_hot(ec, cfg.n_experts,
                             dtype=jnp.float32)        # [k, C, E]
        return jnp.einsum("kne,kn,ned->nd", sel, gc, out)

    y = lax.map(run, (xp.reshape(n_chunks, chunk, cfg.d_model),
                      gp.reshape(cfg.top_k, n_chunks, chunk)
                      .swapaxes(0, 1),
                      ep.reshape(cfg.top_k, n_chunks, chunk)
                      .swapaxes(0, 1)))
    return y.reshape(-1, cfg.d_model)[:N].reshape(shape).astype(x.dtype)


def _ep_body(params, xf, *, cfg: MoEConfig, capacity: int, n_shards: int,
             axis: str):
    """Per-device EP: local tokens route locally, hop to their expert's
    device via all_to_all, and hop back. params holds this device's
    E/n experts (leading axis already sliced by shard_map); the router is
    replicated."""
    Elocal = cfg.n_experts // n_shards
    gates, eidx = _gates(params, xf, cfg)
    dispatch = _dispatch_tensors(eidx, cfg, capacity)
    xin = jnp.einsum("knec,nd->ecd", dispatch,
                     xf.astype(jnp.float32))           # [E, C, D]
    # group by destination device and exchange: after the all_to_all the
    # leading axis is the SOURCE device, each holding our experts' slots
    xin = xin.reshape(n_shards, Elocal, capacity, cfg.d_model)
    xin = lax.all_to_all(xin, axis, 0, 0, tiled=False)  # [n, El, C, D]
    h = _act(jnp.einsum("necd,efd->necf", xin, params["w1"])
             + params["b1"][None, :, None], cfg)
    out = jnp.einsum("necf,edf->necd", h, params["w2"]) \
        + params["b2"][None, :, None]
    out = lax.all_to_all(out, axis, 0, 0, tiled=False)
    out = out.reshape(cfg.n_experts, capacity, cfg.d_model)
    combine = dispatch * gates[..., None, None]
    y = jnp.einsum("knec,ecd->nd", combine, out)
    return y.astype(xf.dtype)


@functools.partial(jax.jit,
                   static_argnames=("cfg", "mesh", "axis", "capacity"))
def moe_mlp_ep(params: dict, x: jax.Array, cfg: MoEConfig, mesh: Mesh,
               axis: str = "expert",
               capacity: int | None = None) -> jax.Array:
    """Expert-parallel MoE FFN: [B, T, D] -> [B, T, D], experts sharded
    over ``axis``, tokens sharded over the same axis (it doubles as the
    data axis); two all_to_alls move only dispatched slots over ICI.

    Capacity is PER DEVICE (each device's tokens claim expert slots from
    their own cumsum); the dense path counts positions globally, so the
    two drop different tokens when an expert overflows. When nothing
    overflows — `capacity >= top_k * local_tokens` guarantees it — the EP
    path equals :func:`moe_mlp_dense` exactly (tested).
    """
    n = mesh.shape[axis]
    E = cfg.n_experts
    assert E % n == 0, f"n_experts={E} not divisible by {axis}={n}"
    B, T, D = x.shape
    N = B * T
    assert N % n == 0, f"B*T={N} not divisible by {axis}={n}"
    capacity = capacity or max(
        1, int(math.ceil(cfg.top_k * (N // n) / E * cfg.capacity_factor)))

    pspecs = {"router": P(),
              "w1": P(axis), "b1": P(axis),
              "w2": P(axis), "b2": P(axis)}
    fn = jax.shard_map(
        functools.partial(_ep_body, cfg=cfg, capacity=capacity,
                          n_shards=n, axis=axis),
        mesh=mesh, in_specs=(pspecs, P(axis)), out_specs=P(axis),
        check_vma=False)
    xf = x.reshape(N, D)
    y = fn(params, jax.device_put(
        xf, NamedSharding(mesh, P(axis))))
    return y.reshape(B, T, D)


def shard_moe_params(params: dict, mesh: Mesh,
                     axis: str = "expert") -> dict:
    specs = {"router": P(), "w1": P(axis), "b1": P(axis),
             "w2": P(axis), "b2": P(axis)}
    return jax.tree.map(
        lambda a, s: jax.device_put(a, NamedSharding(mesh, s)),
        params, specs)

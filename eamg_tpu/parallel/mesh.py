"""Device mesh + sharding rules.

The reference's only distributed machinery is HF-accelerate DDP: an implicit
NCCL gradient all-reduce plus one control-plane ``broadcast_object_list`` for
the vocab (train/train_large.py:58-86). TPU-natively, both disappear into
compiler-inserted collectives: one ``jax.sharding.Mesh`` with a ``data``
axis (DP — the gradient psum rides ICI) and an optional ``model`` axis
(Megatron-style tensor parallelism for the head/FFN/attention projections).
The vocab broadcast is gone by construction — vocab building is
deterministic (tokenizer/vocab.py), every host computes the same bytes.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int | None = None, model: int = 1,
              devices=None) -> Mesh:
    """Create a (data, model) mesh. data=None uses all remaining devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data is None:
        assert n % model == 0, f"{n} devices not divisible by model={model}"
        data = n // model
    assert data * model <= n, f"mesh {data}x{model} > {n} devices"
    grid = np.asarray(devices[:data * model]).reshape(data, model)
    return Mesh(grid, axis_names=("data", "model"))


def param_pspecs(params: dict, tp: bool, fsdp_data: int | None = None) -> dict:
    """PartitionSpec tree for a GPT param pytree.

    tp=False: fully replicated (the reference models are <= ~30M params —
    DP-only is the faithful mode). tp=True: Megatron column/row parallel —
    QKV and FFN-in split on the output dim, attention-out and FFN-out on the
    input dim, LM head on the vocab dim; XLA inserts the psums.

    fsdp_data=N (the data-axis size) additionally shards every param (and
    therefore its Adam moments, which follow the param sharding through
    optax.init) over the ``data`` axis — ZeRO/FSDP semantics via GSPMD:
    the forward all-gathers each weight where it is used, gradients
    reduce-scatter, and per-device param+optimizer memory drops ~N-fold.
    Composes with tp: the ``data`` name lands on the largest N-divisible
    dim the ``model`` axis didn't take (see :func:`_with_fsdp`); leaves
    with no eligible dim stay replicated.
    """
    def mlp_spec(mlp_params):
        if "router" in mlp_params:
            # MoE layer: experts shard over 'model' (expert parallelism
            # via GSPMD — each device holds E/model experts; XLA inserts
            # the dispatch/combine collectives for the one-hot einsums);
            # the router stays replicated.
            if not tp:
                return {k: P() for k in mlp_params}
            return {"router": P(), "w1": P("model"), "b1": P("model"),
                    "w2": P("model"), "b2": P("model")}
        if not tp:
            return {"w1": P(), "b1": P(), "w2": P(), "b2": P()}
        return {"w1": P("model", None), "b1": P("model"),
                "w2": P(None, "model"), "b2": P()}

    def layer_spec(layer_params):
        base = {
            "attn": {"in_w": P(), "in_b": P(), "out_w": P(),
                     "out_b": P()},
            "ln1": {"g": P(), "b": P()}, "ln2": {"g": P(), "b": P()},
        } if not tp else {
            "attn": {"in_w": P("model", None), "in_b": P("model"),
                     "out_w": P(None, "model"), "out_b": P()},
            "ln1": {"g": P(), "b": P()}, "ln2": {"g": P(), "b": P()},
        }
        return {**base, "mlp": mlp_spec(layer_params["mlp"])}

    head = {"w": P("model", None), "b": P("model")} if tp else \
        {"w": P(), "b": P()}
    specs = {
        "tok_emb": P(),
        "pos": P(),
        "layers": [layer_spec(la) for la in params["layers"]],
        "head": head,
    }
    if fsdp_data and fsdp_data > 1:
        specs = jax.tree.map(
            lambda leaf, s: _with_fsdp(leaf, s, fsdp_data),
            params, specs,
            is_leaf=lambda x: isinstance(x, P))
    return specs


def _with_fsdp(leaf, spec: P, data: int) -> P:
    """Add 'data' to the largest unsharded dim divisible by the data-axis
    size. NamedSharding needs divisibility; non-divisible leaves (e.g. the
    8,324-vocab dim on an 8-way axis) fall to their next-largest dim or
    stay replicated."""
    shape = getattr(leaf, "shape", ())
    entries = list(spec) + [None] * (len(shape) - len(spec))
    best, best_dim = None, 0
    for i, e in enumerate(entries):
        if e is None and shape[i] > best_dim and shape[i] % data == 0:
            best, best_dim = i, shape[i]
    if best is not None:
        entries[best] = "data"
    return P(*entries)


def shard_params(params: dict, mesh: Mesh, tp: bool = False,
                 fsdp: bool = False) -> dict:
    """Place a param pytree onto the mesh per :func:`param_pspecs`."""
    specs = param_pspecs(
        params, tp, fsdp_data=mesh.shape["data"] if fsdp else None)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, specs)


def batch_pspec() -> P:
    """Batches shard over the data axis: [B, ...] -> P('data', ...)."""
    return P("data")


def data_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, batch_pspec())

"""Expert-parallel MoE FFN (parallel/moe.py): EP all_to_all path vs the
dense reference semantics, routing/capacity behavior, differentiability."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from eamg_tpu.parallel.moe import (MoEConfig, init_moe_params,
                                   moe_mlp_dense, moe_mlp_ep,
                                   shard_moe_params)
from eamg_tpu.parallel.moe import _dispatch_tensors, _gates


CFG = MoEConfig(d_model=16, d_ff=32, n_experts=8, top_k=2)


def _mesh(n):
    devs = jax.devices()
    if len(devs) < n:
        pytest.skip(f"needs {n} devices")
    return Mesh(np.asarray(devs[:n]), ("expert",))


def _xp(seed=0, B=4, T=16, cfg=CFG):
    rng = np.random.default_rng(seed)
    params = init_moe_params(jax.random.PRNGKey(seed), cfg)
    x = jnp.asarray(rng.normal(size=(B, T, cfg.d_model)), jnp.float32)
    return params, x


def _nodrop_caps(x, n, cfg=CFG):
    """(dense_capacity, ep_capacity) large enough that NO token drops in
    either path — the regime where EP == dense exactly."""
    N = x.shape[0] * x.shape[1]
    return cfg.top_k * N, cfg.top_k * (N // n)


@pytest.mark.parametrize("n", [2, 4, 8])
def test_ep_matches_dense(n):
    """Drop-free capacity: the expert-parallel path is exactly the dense
    math — all_to_all moves tokens, it doesn't change values."""
    params, x = _xp()
    mesh = _mesh(n)
    cap_dense, cap_ep = _nodrop_caps(x, n)
    got = moe_mlp_ep(shard_moe_params(params, mesh), x, CFG, mesh,
                     capacity=cap_ep)
    ref = moe_mlp_dense(params, x, CFG, capacity=cap_dense)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-4)


def test_top1_routing():
    cfg = MoEConfig(d_model=16, d_ff=32, n_experts=4, top_k=1)
    params, x = _xp(seed=1, B=2, T=16, cfg=cfg)
    mesh = _mesh(4)
    cap_dense, cap_ep = _nodrop_caps(x, 4, cfg)
    got = moe_mlp_ep(shard_moe_params(params, mesh), x, cfg, mesh,
                     capacity=cap_ep)
    ref = moe_mlp_dense(params, x, cfg, capacity=cap_dense)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-4)


def test_capacity_overflow_drops_tokens():
    """Capacity 1: overflow slots contribute nothing. Rows whose every
    routed slot was kept are unchanged; at least one slot must drop
    (16 slots into 8 experts can't all be first)."""
    params, x = _xp(seed=2, B=1, T=8)
    y_full = moe_mlp_dense(params, x, CFG, capacity=16)
    y_tight = moe_mlp_dense(params, x, CFG, capacity=1)

    xf = x.reshape(-1, CFG.d_model)
    gates, eidx = _gates(params, xf, CFG)
    disp = np.asarray(_dispatch_tensors(eidx, CFG, 1))
    kept = disp.sum(axis=(2, 3))               # [k, N] 1 if slot kept
    assert kept.sum() < kept.size              # something dropped
    full_rows = np.asarray(kept.prod(axis=0), bool)  # all slots kept
    yf = np.asarray(y_full).reshape(-1, CFG.d_model)
    yt = np.asarray(y_tight).reshape(-1, CFG.d_model)
    np.testing.assert_allclose(yt[full_rows], yf[full_rows], atol=1e-6)
    assert not np.allclose(yt[~full_rows], yf[~full_rows])


def test_moe_grads_flow_to_router_and_experts():
    params, x = _xp(seed=3)
    mesh = _mesh(4)
    sharded = shard_moe_params(params, mesh)
    cap_dense, cap_ep = _nodrop_caps(x, 4)

    def loss(p):
        return jnp.sum(moe_mlp_ep(p, x, CFG, mesh, capacity=cap_ep) ** 2)

    g = jax.grad(loss)(sharded)
    assert float(jnp.abs(g["router"]).sum()) > 0
    assert float(jnp.abs(g["w1"]).sum()) > 0
    assert float(jnp.abs(g["w2"]).sum()) > 0

    def loss_dense(p):
        return jnp.sum(moe_mlp_dense(p, x, CFG, capacity=cap_dense) ** 2)

    gd = jax.grad(loss_dense)(params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-3),
        jax.tree.map(np.asarray, g), gd)


def test_expert_weights_physically_sharded():
    params, _ = _xp()
    mesh = _mesh(8)
    w1 = shard_moe_params(params, mesh)["w1"]
    shard_shapes = {s.data.shape for s in w1.addressable_shards}
    assert shard_shapes == {(1, CFG.d_ff, CFG.d_model)}

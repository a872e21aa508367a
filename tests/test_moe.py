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

def test_pointwise_matches_dense_when_dropfree():
    """No-drop pointwise MoE == capacity path whenever capacity suffices
    — same routing, same gates, different dispatch mechanics."""
    from eamg_tpu.parallel.moe import moe_mlp_pointwise

    params, x = _xp(seed=9)
    cap, _ = _nodrop_caps(x, 1)
    ref = moe_mlp_dense(params, x, CFG, capacity=cap)
    got = moe_mlp_pointwise(params, x, CFG, chunk=8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-4)


def test_top1_router_gets_gradient():
    """Switch-style top-1 gate (full-softmax prob of the winner) keeps
    the router trainable; renormalized-top-1 would be constant 1.0."""
    cfg = MoEConfig(d_model=16, d_ff=32, n_experts=4, top_k=1)
    params, x = _xp(seed=10, cfg=cfg)

    def loss(p):
        return jnp.sum(moe_mlp_dense(p, x, cfg, capacity=128) ** 2)

    g = jax.grad(loss)(params)
    assert float(jnp.abs(g["router"]).sum()) > 1e-6


def test_dense_capacity_is_per_row_and_causal():
    """Capacity drops must be causal (later tokens can't change earlier
    outputs) and batch-decoupled (a row's output doesn't depend on which
    other rows share the batch) — the properties KV-decode parity and
    the continuous engine's bit-identical-to-solo contract rest on."""
    rng = np.random.default_rng(11)
    params = init_moe_params(jax.random.PRNGKey(11), CFG)
    # adversarial router: every token wants expert 0 -> guaranteed drops
    params["router"] = params["router"].at[:].set(0.0)
    params["router"] = params["router"].at[0].set(
        jnp.ones(CFG.d_model) * 3.0)
    x = jnp.asarray(rng.normal(size=(2, 8, CFG.d_model)), jnp.float32)

    y = np.asarray(moe_mlp_dense(params, x, CFG, capacity=2))
    # causal: perturb the LAST token of row 0 -> earlier outputs equal
    x2 = x.at[0, -1].add(1.0)
    y2 = np.asarray(moe_mlp_dense(params, x2, CFG, capacity=2))
    np.testing.assert_allclose(y2[0, :-1], y[0, :-1], atol=1e-6)
    np.testing.assert_allclose(y2[1], y[1], atol=1e-6)
    # batch-decoupled: row 1 alone == row 1 in the batch
    y_solo = np.asarray(moe_mlp_dense(params, x[1:], CFG, capacity=2))
    np.testing.assert_allclose(y_solo[0], y[1], atol=1e-6)


def test_gpt_moe_kv_parity_with_adversarial_router():
    """The inference MoE path is drop-free pointwise routing, so KV
    decode == full decode even when every token routes to ONE expert
    (the capacity paths would disagree here: per-token decode never
    overflows, the full forward would)."""
    from eamg_tpu.decode import generate_full, generate_kv
    from eamg_tpu.models import GPTConfig, init_params

    cfg = GPTConfig(vocab_size=64, seq_len=32, d_model=32, n_head=4,
                    n_layer=2, causal=True, ln_placement="pre",
                    activation="gelu", n_experts=4,
                    moe_capacity_factor=0.25)
    params = init_params(jax.random.PRNGKey(12), cfg)
    # skew the routers hard toward expert 0 along a RANDOM direction
    # (a constant direction would see sum(LN(x)) == 0 and tie-break on
    # float noise); capacity_factor=0.25 would overflow any capacity-
    # bounded inference path on every prefix
    for li in range(2):
        r = params["layers"][li]["mlp"]["router"]
        skew = jax.random.normal(jax.random.PRNGKey(100 + li), r.shape)
        params["layers"][li]["mlp"]["router"] = (
            skew * 0.5).at[0].multiply(8.0)
    prompt = np.zeros((2, 4), np.int32)
    prompt[:, :3] = [[1, 2, 3], [4, 5, 6]]
    a, _ = generate_kv(params, jnp.asarray(prompt), 3,
                       jax.random.PRNGKey(0), cfg, 16, greedy=True,
                       eos_id=-1, pad_id=0, refeed_last_prompt=False)
    b, _ = generate_full(params, jnp.asarray(prompt), 3,
                         jax.random.PRNGKey(0), cfg, 16, greedy=True,
                         eos_id=-1, pad_id=0)
    assert np.asarray(a).tolist() == np.asarray(b).tolist()

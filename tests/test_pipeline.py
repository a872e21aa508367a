"""Pipeline parallelism (parallel/pipeline.py) vs the sequential stack on
the 8-virtual-device CPU mesh: forward equality, grad-exactness through
the ppermute schedule, DP x PP composition, and layout round-trips."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eamg_tpu.models import init_params
from eamg_tpu.models.gpt import GPTConfig, forward
from eamg_tpu.parallel.pipeline import (make_pp_mesh, pipeline_forward,
                                        shard_pp_params, stack_layers,
                                        unstack_layers)


CFG = GPTConfig(vocab_size=97, seq_len=32, d_model=32, n_head=4,
                n_layer=4, causal=True, ln_placement="pre",
                activation="gelu")


def _setup(stages, data=1, seed=0):
    if len(jax.devices()) < stages * data:
        pytest.skip(f"needs {stages * data} devices")
    mesh = make_pp_mesh(stages, data=data)
    params = init_params(jax.random.PRNGKey(seed), CFG)
    stacked = shard_pp_params(stack_layers(params, stages), mesh)
    rng = np.random.default_rng(seed)
    ids = jnp.asarray(rng.integers(0, CFG.vocab_size, (8, 16)), jnp.int32)
    return mesh, params, stacked, ids


def test_stack_unstack_roundtrip():
    params = init_params(jax.random.PRNGKey(0), CFG)
    back = unstack_layers(stack_layers(params, 2))
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), params, back)


@pytest.mark.parametrize("stages,n_micro", [(1, 1), (2, 4), (4, 2),
                                            (4, 8)])
def test_pipeline_forward_matches_sequential(stages, n_micro):
    mesh, params, stacked, ids = _setup(stages)
    got = pipeline_forward(stacked, ids, CFG, mesh, n_micro)
    ref = forward(params, ids, CFG)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_pipeline_8_stages_one_layer_each():
    """Full-width pipeline: all 8 virtual devices, one layer per stage."""
    cfg = GPTConfig(vocab_size=61, seq_len=32, d_model=16, n_head=2,
                    n_layer=8, causal=True, ln_placement="pre",
                    activation="gelu")
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    mesh = make_pp_mesh(8)
    params = init_params(jax.random.PRNGKey(2), cfg)
    stacked = shard_pp_params(stack_layers(params, 8), mesh)
    rng = np.random.default_rng(2)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (4, 16)), jnp.int32)
    got = pipeline_forward(stacked, ids, cfg, mesh, n_micro=4)
    ref = forward(params, ids, cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_pipeline_dp_x_pp():
    """2-D (data=2, stage=4) mesh: batch shards over data, layers over
    stage; result still matches the single-device forward."""
    mesh, params, stacked, ids = _setup(4, data=2)
    got = pipeline_forward(stacked, ids, CFG, mesh, n_micro=4)
    ref = forward(params, ids, CFG)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def _ce(logits, y):
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, y[..., None], -1))


def test_pipeline_grad_exact():
    """jax.grad through the pipelined forward (scan + ppermute) equals the
    sequential-stack gradient — the backward pipeline comes from autodiff,
    with no hand-written schedule."""
    mesh, params, stacked, ids = _setup(4)
    y = jnp.asarray((np.asarray(ids) + 1) % CFG.vocab_size, jnp.int32)

    def loss_pp(p):
        return _ce(pipeline_forward(p, ids, CFG, mesh, n_micro=4), y)

    def loss_seq(p):
        return _ce(forward(p, ids, CFG), y)

    g_pp = unstack_layers(jax.grad(loss_pp)(stacked))
    g_seq = jax.grad(loss_seq)(params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4),
        g_pp, g_seq)


def test_pipeline_dp_x_pp_grad_exact():
    """Gradients through DP x PP (data=2, stage=4): the stage-sharded
    params are replicated over the data axis, so the shard_map transpose
    must psum their grads over 'data' — pin that against the sequential
    gradient."""
    mesh, params, stacked, ids = _setup(4, data=2)
    y = jnp.asarray((np.asarray(ids) + 1) % CFG.vocab_size, jnp.int32)

    def loss_pp(p):
        return _ce(pipeline_forward(p, ids, CFG, mesh, n_micro=4), y)

    def loss_seq(p):
        return _ce(forward(p, ids, CFG), y)

    g_pp = unstack_layers(jax.grad(loss_pp)(stacked))
    g_seq = jax.grad(loss_seq)(params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4),
        g_pp, g_seq)


def test_pipeline_uneven_dp_shard_rejected():
    """B=8, n_micro=8 on a data=2 mesh gives microbatches of 1 row — the
    precondition assert must fire with a clear message, not a low-level
    sharding error."""
    mesh, params, stacked, ids = _setup(2, data=2)
    with pytest.raises(AssertionError, match="data"):
        pipeline_forward(stacked, ids, CFG, mesh, n_micro=8)


def test_pipeline_rejects_batch_first_bug():
    mesh, params, stacked, ids = _setup(2)
    bad = GPTConfig(vocab_size=97, seq_len=32, d_model=32, n_head=4,
                    n_layer=4, batch_first_bug=True)
    with pytest.raises(AssertionError):
        pipeline_forward(stacked, ids, bad, mesh, n_micro=2)


def test_pp_trainer_matches_dp_trainer():
    """One PipelineTrainer step (4 stages, 4 microbatches in flight)
    produces the same loss and the same updated params as the plain
    Trainer on the identical batch — pipelining is a layout change, not a
    math change."""
    from eamg_tpu.parallel.pipeline import PipelineTrainer
    from eamg_tpu.train import TrainConfig, Trainer

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    mesh = make_pp_mesh(4)
    params = init_params(jax.random.PRNGKey(7), CFG)
    tcfg = TrainConfig(micro_batch=8, accum_steps=1)
    rng = np.random.default_rng(7)
    x = rng.integers(1, CFG.vocab_size, (8, 16)).astype(np.int32)
    y = rng.integers(1, CFG.vocab_size, (8, 16)).astype(np.int32)

    pp = PipelineTrainer(CFG, tcfg, params, mesh, n_micro=4)
    m_pp = pp.train_step(x, y)
    ref = Trainer(CFG, tcfg, params)
    m_ref = ref.train_step(x[None], y[None])

    assert abs(m_pp["loss"] - m_ref["loss"]) < 1e-5, (m_pp, m_ref)
    # atol 5e-5 on post-Adam params: near-zero grads put the update on the
    # m/sqrt(v) knife edge where 1e-7 fwd differences move it ~1e-5
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=0),
        pp.export_params(), ref.params)


def test_layers_physically_sharded():
    """Each stage's layer arrays live only on that stage's devices."""
    mesh, params, stacked, ids = _setup(4)
    w = stacked["layers"]["mlp"]["w1"]        # [4, 1, FF, D]
    assert w.sharding.spec[0] == "stage"
    shard_shapes = {s.data.shape for s in w.addressable_shards}
    assert shard_shapes == {(1, 1, CFG.ff, CFG.d_model)}

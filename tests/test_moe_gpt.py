"""MoE-GPT model family (GPTConfig.n_experts): forward/decode/training
end-to-end with routed expert FFNs, including the KV decode path and the
load-balance auxiliary loss."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eamg_tpu.decode import generate_full, generate_kv
from eamg_tpu.models import GPTConfig, forward, init_params
from eamg_tpu.models.gpt import forward_hidden_with_aux, is_moe_layer

BASE = dict(vocab_size=64, seq_len=32, d_model=32, n_head=4, n_layer=2,
            causal=True, ln_placement="pre", activation="gelu")
CFG = GPTConfig(**BASE, n_experts=4)


def test_moe_param_structure():
    params = init_params(jax.random.PRNGKey(0), CFG)
    mlp = params["layers"][0]["mlp"]
    assert set(mlp) == {"router", "w1", "b1", "w2", "b2"}
    assert mlp["w1"].shape == (4, CFG.ff, CFG.d_model)
    assert mlp["router"].shape == (4, CFG.d_model)


def test_moe_every_2_mixes_dense_and_moe():
    cfg = GPTConfig(**{**BASE, "n_layer": 4}, n_experts=4, moe_every=2)
    assert [is_moe_layer(cfg, i) for i in range(4)] == [
        False, True, False, True]
    params = init_params(jax.random.PRNGKey(1), cfg)
    assert "router" not in params["layers"][0]["mlp"]
    assert "router" in params["layers"][1]["mlp"]
    ids = jnp.asarray(np.random.default_rng(1).integers(0, 64, (2, 8)))
    logits = forward(params, ids, cfg)
    assert logits.shape == (2, 8, 64)
    assert bool(jnp.isfinite(logits).all())


def test_moe_forward_is_causal():
    params = init_params(jax.random.PRNGKey(2), CFG)
    rng = np.random.default_rng(2)
    a = rng.integers(0, 64, (1, 12))
    b = a.copy()
    b[0, 8:] = rng.integers(0, 64, 4)
    la = np.asarray(forward(params, jnp.asarray(a), CFG))
    lb = np.asarray(forward(params, jnp.asarray(b), CFG))
    np.testing.assert_allclose(la[0, :8], lb[0, :8], atol=1e-5)


def test_moe_kv_decode_equals_full_decode():
    """The per-token dense-dispatch MoE path inside decode_step must agree
    with the full re-encode loop — routing included."""
    params = init_params(jax.random.PRNGKey(3), CFG)
    prompt = np.zeros((2, 4), np.int32)
    prompt[:, :3] = [[1, 2, 3], [4, 5, 6]]
    a, _ = generate_kv(params, jnp.asarray(prompt), 3,
                       jax.random.PRNGKey(0), CFG, 16, greedy=True,
                       eos_id=-1, pad_id=0, refeed_last_prompt=False)
    b, _ = generate_full(params, jnp.asarray(prompt), 3,
                         jax.random.PRNGKey(0), CFG, 16, greedy=True,
                         eos_id=-1, pad_id=0)
    assert np.asarray(a).tolist() == np.asarray(b).tolist()


def test_aux_loss_positive_for_moe_zero_for_dense():
    ids = jnp.asarray(np.random.default_rng(4).integers(0, 64, (2, 8)))
    params = init_params(jax.random.PRNGKey(4), CFG)
    _, aux = jax.jit(forward_hidden_with_aux,
                     static_argnames="cfg")(params, ids, CFG)
    assert float(aux) >= 1.0 - 1e-5  # Switch loss is minimized at 1
    dense = GPTConfig(**BASE)
    dparams = init_params(jax.random.PRNGKey(4), dense)
    _, aux0 = jax.jit(forward_hidden_with_aux,
                      static_argnames="cfg")(dparams, ids, dense)
    assert float(aux0) == 0.0


def test_moe_training_learns():
    from eamg_tpu.train import TrainConfig, Trainer

    params = init_params(jax.random.PRNGKey(5), CFG)
    tcfg = TrainConfig(lr=1e-2, micro_batch=8, accum_steps=1)
    tr = Trainer(CFG, tcfg, params)
    rng = np.random.default_rng(5)
    x = rng.integers(1, 64, (1, 8, 16)).astype(np.int32)
    y = np.roll(x, -1, axis=2)
    losses = [tr.train_step(x, y)["loss"] for _ in range(6)]
    assert losses[-1] < losses[0] - 0.5, losses


def test_moe_training_tp_expert_sharded():
    """tp=True on a (data=2, model=2) mesh shards the experts over the
    model axis (expert parallelism through GSPMD); the step must run and
    produce a finite loss with physically sharded expert weights."""
    from eamg_tpu.parallel import make_mesh
    from eamg_tpu.train import TrainConfig, Trainer

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    mesh = make_mesh(data=2, model=2)
    params = init_params(jax.random.PRNGKey(6), CFG)
    tr = Trainer(CFG, TrainConfig(micro_batch=4, tp=True), params,
                 mesh=mesh)
    w1 = tr.params["layers"][0]["mlp"]["w1"]
    shard_shapes = {s.data.shape for s in w1.addressable_shards}
    assert shard_shapes == {(2, CFG.ff, CFG.d_model)}  # 4 experts / 2
    rng = np.random.default_rng(6)
    x = rng.integers(1, 64, (1, 4, 16)).astype(np.int32)
    y = np.roll(x, -1, axis=2)
    m = tr.train_step(x, y)
    assert np.isfinite(m["loss"])


def test_moe_checkpoint_roundtrip(tmp_path):
    from eamg_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    params = init_params(jax.random.PRNGKey(7), CFG)
    save_checkpoint(str(tmp_path / "moe"), params, {"[PAD]": 0}, CFG)
    ckpt = load_checkpoint(str(tmp_path / "moe"))
    assert ckpt["cfg"].n_experts == 4
    ids = jnp.asarray(np.random.default_rng(7).integers(0, 64, (1, 8)))
    np.testing.assert_allclose(
        np.asarray(forward(params, ids, CFG)),
        np.asarray(forward(ckpt["params"], ids, ckpt["cfg"])), atol=0)


def test_moe_export_to_torch_dialect_rejected():
    from eamg_tpu.models.import_torch import export_state_dict

    params = init_params(jax.random.PRNGKey(8), CFG)
    with pytest.raises(AssertionError, match="MoE"):
        export_state_dict(params)

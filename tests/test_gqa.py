"""Grouped-query attention tests: MHA equivalence, cache shrinkage,
causal consistency of the GQA cache path, training compatibility."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eamg_tpu.decode import generate_full, generate_kv
from eamg_tpu.models import (GPTConfig, forward, init_kv_cache, init_params)

BASE = dict(vocab_size=64, seq_len=32, d_model=32, n_head=4, n_layer=2,
            causal=True)


def test_kv_heads_equal_n_head_is_mha():
    cfg_mha = GPTConfig(**BASE)
    cfg_gqa = GPTConfig(**BASE, n_kv_heads=4)
    params = init_params(jax.random.PRNGKey(0), cfg_mha)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 64, (2, 12)))
    a = np.asarray(forward(params, ids, cfg_mha))
    b = np.asarray(forward(params, ids, cfg_gqa))
    np.testing.assert_array_equal(a, b)


def test_gqa_param_and_cache_shapes():
    cfg = GPTConfig(**BASE, n_kv_heads=2)
    params = init_params(jax.random.PRNGKey(1), cfg)
    D, KVD = 32, 2 * (32 // 4)
    assert params["layers"][0]["attn"]["in_w"].shape == (D + 2 * KVD, D)
    cache = init_kv_cache(cfg, batch=3, max_len=16)
    assert len(cache["k"]) == 2  # per-layer tuples
    assert cache["k"][0].shape == (3, 2, 16, 8)  # kv_heads=2, not 4


def test_gqa_forward_runs_and_is_causal():
    cfg = GPTConfig(**BASE, n_kv_heads=2)
    params = init_params(jax.random.PRNGKey(2), cfg)
    rng = np.random.default_rng(2)
    a = rng.integers(0, 64, (1, 12))
    b = a.copy()
    b[0, 8:] = rng.integers(0, 64, 4)
    la = np.asarray(forward(params, jnp.asarray(a), cfg))
    lb = np.asarray(forward(params, jnp.asarray(b), cfg))
    np.testing.assert_allclose(la[0, :8], lb[0, :8], atol=1e-5)


def test_gqa_kv_decode_equals_full_decode():
    cfg = GPTConfig(**BASE, n_kv_heads=1)  # MQA extreme
    params = init_params(jax.random.PRNGKey(3), cfg)
    prompt = np.zeros((1, 4), np.int32)
    prompt[0, :3] = [1, 2, 3]
    a, _ = generate_kv(params, jnp.asarray(prompt), 3, jax.random.PRNGKey(0),
                       cfg, 16, greedy=True, eos_id=-1, pad_id=0,
                       refeed_last_prompt=False)
    b, _ = generate_full(params, jnp.asarray(prompt), 3,
                         jax.random.PRNGKey(0), cfg, 16, greedy=True,
                         eos_id=-1, pad_id=0)
    assert np.asarray(a).tolist() == np.asarray(b).tolist()


def test_gqa_trains():
    from eamg_tpu.train import TrainConfig, Trainer

    cfg = GPTConfig(**BASE, n_kv_heads=2)
    params = init_params(jax.random.PRNGKey(4), cfg)
    trainer = Trainer(cfg, TrainConfig(lr=1e-3), params)
    rng = np.random.default_rng(4)
    x = rng.integers(1, 64, (1, 8, 31)).astype(np.int32)
    y = rng.integers(1, 64, (1, 8, 31)).astype(np.int32)
    losses = [trainer.train_step(x, y)["loss"] for _ in range(8)]
    assert losses[-1] < losses[0]


def test_gqa_invalid_kv_heads_rejected():
    cfg = GPTConfig(**BASE, n_kv_heads=3)  # 4 % 3 != 0
    with pytest.raises(AssertionError):
        _ = cfg.kv_heads

"""Int8 weight-only quantization: error bounds, forward closeness,
generation runs through all decode paths."""

import numpy as np

import jax
import jax.numpy as jnp

from eamg_tpu.decode import generate_kv
from eamg_tpu.models import GPTConfig, forward, init_params
from eamg_tpu.models.quant import (dequantize_weight, quantization_error,
                                   quantize_params, quantize_weight)

CFG = GPTConfig(vocab_size=64, seq_len=32, d_model=32, n_head=4, n_layer=2,
                causal=True)


def test_quantize_weight_round_trip():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(16, 8)).astype(np.float32))
    wq = quantize_weight(w)
    assert wq["q"].dtype == jnp.int8
    deq = dequantize_weight(wq)
    rel = float(jnp.linalg.norm(w - deq) / jnp.linalg.norm(w))
    assert rel < 0.01


def test_quantized_params_error_small():
    params = init_params(jax.random.PRNGKey(0), CFG)
    qparams = quantize_params(params)
    assert quantization_error(params, qparams) < 0.01
    # int8 leaves present
    assert qparams["layers"][0]["attn"]["in_w"]["q"].dtype == jnp.int8
    assert qparams["head"]["w"]["q"].dtype == jnp.int8


def test_quantized_forward_close():
    params = init_params(jax.random.PRNGKey(1), CFG)
    qparams = quantize_params(params)
    ids = jnp.asarray(np.random.default_rng(1).integers(0, 64, (2, 12)))
    a = np.asarray(forward(params, ids, CFG))
    b = np.asarray(forward(qparams, ids, CFG))
    # logits close in relative terms; argmax agreement high
    denom = np.maximum(np.abs(a).max(), 1e-6)
    assert np.abs(a - b).max() / denom < 0.05
    agree = (a.argmax(-1) == b.argmax(-1)).mean()
    assert agree > 0.9


def test_quantized_generation_runs():
    params = init_params(jax.random.PRNGKey(2), CFG)
    qparams = quantize_params(params)
    prompt = np.zeros((1, 4), np.int32)
    prompt[0, :3] = [1, 2, 3]
    buf, pos = generate_kv(qparams, jnp.asarray(prompt), 3,
                           jax.random.PRNGKey(0), CFG, 16, greedy=True,
                           eos_id=-1, pad_id=0, refeed_last_prompt=False)
    assert int(pos) == 16
    buf_f, _ = generate_full(qparams, prompt, CFG)


def generate_full(qparams, prompt, cfg):
    from eamg_tpu.decode import generate_full as gf

    return gf(qparams, jnp.asarray(prompt), 3, jax.random.PRNGKey(0), cfg,
              12, greedy=True, eos_id=-1, pad_id=0)

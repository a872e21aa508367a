"""MHA -> GQA conversion (models/gqa_convert.py): exactness when groups
are degenerate, shape/config correctness, checkpoint-dir round trip."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eamg_tpu.decode import generate_kv
from eamg_tpu.models import GPTConfig, forward, init_params
from eamg_tpu.models.gqa_convert import (convert_checkpoint_dir,
                                         convert_mha_to_gqa)

CFG = GPTConfig(vocab_size=64, seq_len=32, d_model=32, n_head=4,
                n_layer=2, causal=True)


def _tied_kv_params(seed=0):
    """MHA params whose K/V heads are identical within each group of 2 —
    mean-pooling them to GQA-2 must be EXACT."""
    params = init_params(jax.random.PRNGKey(seed), CFG)
    D, Dh = CFG.d_model, CFG.head_dim

    def tie(layer):
        in_w = np.asarray(layer["attn"]["in_w"]).copy()
        in_b = np.asarray(layer["attn"]["in_b"]).copy()
        for blk in (1, 2):  # K rows, V rows
            for g0 in range(0, CFG.n_head, 2):
                rows = blk * D + g0 * Dh
                in_w[rows + Dh:rows + 2 * Dh] = in_w[rows:rows + Dh]
                in_b[rows + Dh:rows + 2 * Dh] = in_b[rows:rows + Dh]
        return {**layer, "attn": {**layer["attn"],
                                  "in_w": jnp.asarray(in_w),
                                  "in_b": jnp.asarray(in_b)}}

    return {**params, "layers": [tie(la) for la in params["layers"]]}


def test_tied_heads_convert_exactly():
    params = _tied_kv_params()
    gqa_params, gqa_cfg = convert_mha_to_gqa(params, CFG, 2)
    assert gqa_cfg.n_kv_heads == 2
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 64, (2, 12)))
    a = np.asarray(forward(params, ids, CFG))
    b = np.asarray(forward(gqa_params, ids, gqa_cfg))
    np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5)


def test_identity_when_kv_heads_equal_n_head():
    params = init_params(jax.random.PRNGKey(1), CFG)
    gqa_params, gqa_cfg = convert_mha_to_gqa(params, CFG, CFG.n_head)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=0), params, gqa_params)
    assert gqa_cfg.kv_heads == CFG.n_head


def test_converted_model_decodes():
    params = init_params(jax.random.PRNGKey(2), CFG)
    gqa_params, gqa_cfg = convert_mha_to_gqa(params, CFG, 1)
    assert gqa_params["layers"][0]["attn"]["in_w"].shape == (
        CFG.d_model + 2 * CFG.head_dim, CFG.d_model)
    prompt = np.zeros((1, 4), np.int32)
    prompt[0, :3] = [1, 2, 3]
    buf, pos = generate_kv(gqa_params, jnp.asarray(prompt), 3,
                           jax.random.PRNGKey(0), gqa_cfg, 16,
                           greedy=True, eos_id=-1, pad_id=0,
                           refeed_last_prompt=False)
    assert int(pos) == 16


def test_rejects_non_mha_source():
    cfg = dataclasses.replace(CFG, n_kv_heads=2)
    params = init_params(jax.random.PRNGKey(3), cfg)
    with pytest.raises(AssertionError):
        convert_mha_to_gqa(params, cfg, 1)


def test_checkpoint_dir_roundtrip(tmp_path):
    from eamg_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    params = _tied_kv_params(seed=4)
    src, dst = str(tmp_path / "mha"), str(tmp_path / "gqa")
    save_checkpoint(src, params, {"[PAD]": 0}, CFG, step=7)
    convert_checkpoint_dir(src, dst, 2)
    ckpt = load_checkpoint(dst)
    assert ckpt["cfg"].n_kv_heads == 2 and ckpt["step"] == 7
    assert ckpt["extra"]["gqa_converted_from"] == "mha-4h"
    ids = jnp.asarray(np.random.default_rng(4).integers(0, 64, (1, 8)))
    np.testing.assert_allclose(
        np.asarray(forward(params, ids, CFG)),
        np.asarray(forward(ckpt["params"], ids, ckpt["cfg"])),
        atol=1e-5, rtol=1e-5)

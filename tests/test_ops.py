"""Pallas kernel tests (interpret mode on CPU): flash attention and fused
FFN must match the XLA paths bit-for-bit within fp32 tolerance, across
causal/non-causal/padded variants and non-aligned shapes."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eamg_tpu.models import GPTConfig, forward, init_params
from eamg_tpu.ops import flash_attention, fused_ffn, xla_attention

jax.config.update("jax_default_matmul_precision", "highest")


def qkv(shape, seed=0):
    rng = np.random.default_rng(seed)
    return tuple(jnp.asarray(rng.normal(size=shape).astype(np.float32))
                 for _ in range(3))


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("shape", [(2, 4, 64, 16), (1, 2, 96, 32)])
def test_flash_matches_xla(causal, shape):
    q, k, v = qkv(shape)
    got = flash_attention(q, k, v, causal=causal, block_q=32, block_k=32)
    ref = xla_attention(q, k, v, causal=causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5,
                               rtol=1e-5)


def test_flash_valid_len():
    q, k, v = qkv((2, 2, 64, 16), seed=1)
    got = flash_attention(q, k, v, valid_len=37, block_q=32, block_k=32)
    ref = xla_attention(q, k, v, valid_len=37)
    np.testing.assert_allclose(np.asarray(got[:, :, :37]),
                               np.asarray(ref[:, :, :37]), atol=1e-5,
                               rtol=1e-5)


def test_flash_valid_len_equals_physical_trim():
    """Masked attention over padded keys == attention over the trimmed
    sequence (the bucketed-prefill contract)."""
    q, k, v = qkv((1, 2, 64, 16), seed=2)
    full = flash_attention(q, k, v, valid_len=40, block_q=32, block_k=32)
    trim = flash_attention(q[:, :, :40], k[:, :, :40], v[:, :, :40],
                           block_q=32, block_k=32)
    np.testing.assert_allclose(np.asarray(full[:, :, :40]),
                               np.asarray(trim), atol=1e-5, rtol=1e-5)


def test_flash_non_divisible_blocks():
    q, k, v = qkv((1, 1, 80, 16), seed=3)  # 80 not a multiple of 32
    got = flash_attention(q, k, v, causal=True, block_q=32, block_k=32)
    ref = xla_attention(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5,
                               rtol=1e-5)


@pytest.mark.parametrize("act", ["relu", "gelu"])
def test_fused_ffn_matches_reference(act):
    rng = np.random.default_rng(4)
    D, FF = 32, 128
    x = jnp.asarray(rng.normal(size=(3, 17, D)).astype(np.float32))
    w1 = jnp.asarray(rng.normal(size=(FF, D)).astype(np.float32) * 0.1)
    b1 = jnp.asarray(rng.normal(size=(FF,)).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.normal(size=(D, FF)).astype(np.float32) * 0.1)
    b2 = jnp.asarray(rng.normal(size=(D,)).astype(np.float32) * 0.1)
    got = fused_ffn(x, w1, b1, w2, b2, activation=act, block_rows=16)
    h = x @ w1.T + b1
    h = jax.nn.gelu(h, approximate=False) if act == "gelu" else \
        jnp.maximum(h, 0)
    ref = h @ w2.T + b2
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4,
                               rtol=1e-4)


@pytest.mark.parametrize("arch", ["post", "pre"])
def test_full_model_pallas_equals_xla(arch):
    """End-to-end forward with kernels='pallas' matches kernels='xla'."""
    kw = dict(vocab_size=64, seq_len=40, d_model=32, n_head=2, n_layer=2,
              pos_rows=40, causal=True)
    if arch == "pre":
        kw.update(ln_placement="pre", activation="gelu")
    cfg_x = GPTConfig(**kw, kernels="xla")
    cfg_p = GPTConfig(**kw, kernels="pallas")
    params = init_params(jax.random.PRNGKey(5), cfg_x)
    ids = jnp.asarray(np.random.default_rng(5).integers(0, 64, (2, 24)))
    a = np.asarray(forward(params, ids, cfg_x))
    b = np.asarray(forward(params, ids, cfg_p))
    np.testing.assert_allclose(a, b, atol=2e-4, rtol=2e-4)


def test_pallas_generation_matches_xla():
    """Greedy KV generation with pallas prefill == xla prefill."""
    from eamg_tpu.decode import generate_kv

    kw = dict(vocab_size=64, seq_len=40, d_model=32, n_head=2, n_layer=2,
              pos_rows=40, ln_placement="pre", activation="gelu")
    cfg_x = GPTConfig(**kw, kernels="xla")
    cfg_p = GPTConfig(**kw, kernels="pallas")
    params = init_params(jax.random.PRNGKey(6), cfg_x)
    prompt = jnp.asarray(np.asarray([[1, 2, 3, 0, 0, 0, 0, 0]], np.int32))
    a, _ = generate_kv(params, prompt, 3, jax.random.PRNGKey(0), cfg_x, 24,
                       greedy=True, eos_id=-1, pad_id=0)
    b, _ = generate_kv(params, prompt, 3, jax.random.PRNGKey(0), cfg_p, 24,
                       greedy=True, eos_id=-1, pad_id=0)
    assert np.asarray(a).tolist() == np.asarray(b).tolist()


def test_flash_decode_matches_xla():
    from eamg_tpu.ops.decode_attention import (flash_decode,
                                               xla_decode_attention)

    rng = np.random.default_rng(7)
    B, H, M, Dh = 2, 3, 64, 16
    q = jnp.asarray(rng.normal(size=(B, H, 1, Dh)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, H, M, Dh)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, H, M, Dh)).astype(np.float32))
    for t in (0, 5, 31, 63):
        got = flash_decode(q, k, v, t, block_k=16)
        ref = xla_decode_attention(q, k, v, t)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5,
                                   err_msg=f"t={t}")


def test_flash_decode_ignores_stale_cache_tail():
    from eamg_tpu.ops.decode_attention import flash_decode

    rng = np.random.default_rng(8)
    B, H, M, Dh = 1, 2, 64, 16
    q = jnp.asarray(rng.normal(size=(B, H, 1, Dh)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, H, M, Dh)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, H, M, Dh)).astype(np.float32))
    a = flash_decode(q, k, v, 10, block_k=16)
    k2 = k.at[:, :, 20:].set(99.0)  # garbage beyond t must not matter
    v2 = v.at[:, :, 20:].set(-99.0)
    b = flash_decode(q, k2, v2, 10, block_k=16)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_flash_decode_vmem_matches_xla():
    from eamg_tpu.ops.decode_attention import (flash_decode_vmem,
                                               xla_decode_attention)

    rng = np.random.default_rng(9)
    B, H, M, Dh = 2, 3, 64, 16
    q = jnp.asarray(rng.normal(size=(B, H, 1, Dh)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, H, M, Dh)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, H, M, Dh)).astype(np.float32))
    for t in (0, 7, 63):
        got = flash_decode_vmem(q, k, v, t)
        ref = xla_decode_attention(q, k, v, t)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5, err_msg=f"t={t}")


def test_pallas_kv_generation_matches_xla_decode_steps():
    """Full generate_kv with pallas decode attention == xla, greedy."""
    from eamg_tpu.decode import generate_kv

    kw = dict(vocab_size=64, seq_len=64, d_model=32, n_head=2, n_layer=2,
              pos_rows=64, ln_placement="pre", activation="gelu")
    cfg_x = GPTConfig(**kw, kernels="xla")
    cfg_p = GPTConfig(**kw, kernels="pallas")
    params = init_params(jax.random.PRNGKey(7), cfg_x)
    prompt = jnp.asarray(np.asarray([[1, 2, 3, 0]], np.int32))
    a, _ = generate_kv(params, prompt, 3, jax.random.PRNGKey(0), cfg_x, 32,
                       greedy=True, eos_id=-1, pad_id=0)
    b, _ = generate_kv(params, prompt, 3, jax.random.PRNGKey(0), cfg_p, 32,
                       greedy=True, eos_id=-1, pad_id=0)
    assert np.asarray(a).tolist() == np.asarray(b).tolist()


def test_flash_decode_sp_matches_xla():
    from eamg_tpu.ops.decode_attention import (flash_decode_sp,
                                               xla_decode_attention)

    rng = np.random.default_rng(10)
    B, H, M, Dh = 2, 2, 64, 16
    q = jnp.asarray(rng.normal(size=(B, H, 1, Dh)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, H, M, Dh)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, H, M, Dh)).astype(np.float32))
    for t in (0, 9, 31, 63):
        got = flash_decode_sp(q, k, v, t, block_k=16)
        ref = xla_decode_attention(q, k, v, t)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5, err_msg=f"t={t}")


@pytest.mark.parametrize("kv_heads,block", [(4, 16), (2, 16), (4, 24)])
def test_blockwise_attention_forward_and_grad_parity(kv_heads, block):
    """VERDICT r4 #3: the blockwise online-softmax training attention
    (GPTConfig.attn_block — unrolled loop over KV blocks, score tensor
    never materialized) must match the dense path in FORWARD logits and
    in PARAMETER GRADIENTS (plain autodiff), including GQA and a block
    size that does not divide T."""
    from eamg_tpu.train.trainer import loss_fn

    kw = dict(vocab_size=64, seq_len=48, d_model=32, n_head=4, n_layer=2,
              pos_rows=48, causal=True, n_kv_heads=kv_heads)
    cfg_d = GPTConfig(**kw)
    cfg_b = GPTConfig(**kw, attn_block=block)
    params = init_params(jax.random.PRNGKey(3), cfg_d)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(1, 64, (2, 47)).astype(np.int32))
    y = jnp.asarray(rng.integers(1, 64, (2, 47)).astype(np.int32))

    fd = forward(params, x, cfg_d)
    fb = forward(params, x, cfg_b)
    np.testing.assert_allclose(np.asarray(fb), np.asarray(fd),
                               atol=2e-5, rtol=2e-5)

    def loss(p, cfg):
        return loss_fn(p, x, y, cfg, 0)[0]

    gd = jax.grad(loss)(params, cfg_d)
    gb = jax.grad(loss)(params, cfg_b)
    for pd, pb in zip(jax.tree.leaves(gd), jax.tree.leaves(gb)):
        np.testing.assert_allclose(np.asarray(pb), np.asarray(pd),
                                   atol=3e-5, rtol=3e-3)


def test_blockwise_attention_valid_len_masked_rows():
    """Fully-masked rows (position 0 .. with valid_len=0 blocks) must not
    NaN: the online-softmax carry handles all -inf score rows."""
    from eamg_tpu.models.gpt import (_blockwise_attention, _gqa_scores,
                                     _gqa_values)

    rng = np.random.default_rng(1)
    B, H, T, Dh = 1, 2, 12, 8
    q = jnp.asarray(rng.normal(size=(B, H, T, Dh)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, H, T, Dh)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, H, T, Dh)).astype(np.float32))
    out = _blockwise_attention(q, k, v, 0.5, True, 5, 4)
    assert np.isfinite(np.asarray(out)).all()
    # parity on the valid region vs the dense mask path
    s = _gqa_scores(q, k, 0.5)
    mask = (jnp.arange(T)[None, :] < 5) & (jnp.arange(T)[None, :]
                                           <= jnp.arange(T)[:, None])
    s = jnp.where(mask[None, None], s, jnp.finfo(s.dtype).min)
    probs = jax.nn.softmax(s.astype(jnp.float32), axis=-1)
    ref = _gqa_values(probs.astype(v.dtype), v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)

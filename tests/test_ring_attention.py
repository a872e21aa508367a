"""Ring attention (sequence-parallel exact attention, parallel/
ring_attention.py) vs the single-device XLA path, on the 8-virtual-device
CPU mesh — the SURVEY §5.7 long-context growth path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from eamg_tpu.ops import xla_attention
from eamg_tpu.parallel.ring_attention import ring_attention


def _mesh(n):
    devs = jax.devices()
    if len(devs) < n:
        pytest.skip(f"needs {n} devices")
    return Mesh(np.asarray(devs[:n]), ("seq",))


def _qkv(B, H, T, Dh, seed=0):
    rng = np.random.default_rng(seed)
    return tuple(jnp.asarray(rng.normal(size=(B, H, T, Dh)), jnp.float32)
                 for _ in range(3))


@pytest.mark.parametrize("causal", [True, False])
@pytest.mark.parametrize("n", [2, 8])
def test_ring_matches_single_device(causal, n):
    q, k, v = _qkv(2, 4, 64, 16)
    got = ring_attention(q, k, v, _mesh(n), causal=causal)
    ref = xla_attention(q, k, v, causal=causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_ring_long_context_2048():
    """The motivating case: T=2048 (the longform BASELINE context) sharded
    8 ways — each device holds 256 positions of K/V at a time."""
    q, k, v = _qkv(1, 2, 2048, 16, seed=3)
    got = ring_attention(q, k, v, _mesh(8), causal=True)
    ref = xla_attention(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-5, rtol=5e-4)


def test_ring_bf16():
    q, k, v = _qkv(1, 2, 128, 16, seed=5)
    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
    got = ring_attention(qb, kb, vb, _mesh(4), causal=True)
    ref = xla_attention(qb, kb, vb, causal=True)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               atol=3e-2, rtol=3e-2)


def test_forward_seq_parallel_matches_single_device():
    """The full seq-sharded GPT forward (embeddings, 2 layers with ring
    attention, head — all O(T/N) per device) matches models/gpt.forward."""
    from eamg_tpu.models import GPTConfig, init_params
    from eamg_tpu.models.gpt import forward
    from eamg_tpu.parallel.ring_attention import forward_seq_parallel

    cfg = GPTConfig(vocab_size=89, seq_len=129, d_model=32, n_head=4,
                    n_layer=2, causal=True, pos_rows=128)
    params = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, 89, (2, 128)), jnp.int32)
    mesh = _mesh(8)
    got = forward_seq_parallel(params, ids, cfg, mesh)
    ref = forward(params, ids, cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


def test_forward_seq_parallel_trains():
    """Gradients flow through the ring (ppermute transposes to the reverse
    rotation): a CE loss gradient matches the single-device gradient."""
    from eamg_tpu.models import GPTConfig, init_params
    from eamg_tpu.models.gpt import forward
    from eamg_tpu.parallel.ring_attention import forward_seq_parallel

    cfg = GPTConfig(vocab_size=31, seq_len=33, d_model=16, n_head=2,
                    n_layer=1, causal=True, pos_rows=32)
    params = init_params(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(1, 31, (2, 32)), jnp.int32)
    y = jnp.asarray(rng.integers(1, 31, (2, 32)), jnp.int32)
    mesh = _mesh(4)

    def ce(logits, y):
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        oh = jax.nn.one_hot(y, logits.shape[-1], dtype=jnp.float32)
        return -jnp.mean(jnp.sum(logp * oh, -1))

    g_sp = jax.grad(lambda p: ce(forward_seq_parallel(p, ids, cfg, mesh),
                                 y))(params)
    g_1d = jax.grad(lambda p: ce(forward(p, ids, cfg), y))(params)
    for a, b in zip(jax.tree.leaves(g_sp), jax.tree.leaves(g_1d)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=5e-3)

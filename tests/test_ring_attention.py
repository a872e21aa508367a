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

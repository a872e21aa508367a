"""Fold-family decode-attention kernels (interpret mode on CPU): the
all-heads-per-program designs in ops/decode_fold.py must match an
independent per-head reference exactly, across MHA/GQA, scalar and ragged
(per-row) lengths, and block sizes. On the v5e these kernels measured AT
or BELOW XLA's fused decode attention (docs/DESIGN.md §3.7 — decode
attention is MXU-streaming-bound, and the fold trick's H-fold FLOP
redundancy costs it the long-context case), so they ship as parity-tested
alternates, not the default."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eamg_tpu.ops.decode_fold import (flash_decode_fold, flash_decode_fold2,
                                      flash_decode_fold3,
                                      flash_decode_fold3_sp,
                                      flash_decode_fold_sp, stream_reduce,
                                      xla_decode_attention_pm)

jax.config.update("jax_default_matmul_precision", "highest")


def _ref_per_head(q, kv, t, H):
    """Slow per-head numpy reference, independent of every impl."""
    B, _, D = q.shape
    M = kv.shape[1]
    KVD = kv.shape[2] // 2
    Dh = D // H
    KV = KVD // Dh
    g = H // KV
    k = np.asarray(kv[..., :KVD], np.float32).reshape(B, M, KV, Dh)
    v = np.asarray(kv[..., KVD:], np.float32).reshape(B, M, KV, Dh)
    qq = np.asarray(q, np.float32).reshape(B, H, Dh)
    t = np.broadcast_to(np.asarray(t), (B,))
    out = np.zeros((B, H, Dh), np.float32)
    for b in range(B):
        for h in range(H):
            kh = k[b, :t[b] + 1, h // g]
            vh = v[b, :t[b] + 1, h // g]
            s = kh @ qq[b, h] / np.sqrt(Dh)
            p = np.exp(s - s.max())
            p /= p.sum()
            out[b, h] = p @ vh
    return out.reshape(B, 1, D)


def _case(B, H, KV, Dh, M, seed=0):
    rng = np.random.default_rng(seed)
    D = H * Dh
    q = jnp.asarray(rng.normal(size=(B, 1, D)), jnp.float32)
    kv = jnp.asarray(rng.normal(size=(B, M, 2 * KV * Dh)), jnp.float32)
    return q, kv


@pytest.mark.parametrize("geom", [(4, 8, 8, 16, 64), (4, 4, 2, 8, 32)],
                         ids=["mha", "gqa2"])
@pytest.mark.parametrize("tkind", ["zero", "mid", "full", "ragged"])
def test_fold_kernels_match_reference(geom, tkind):
    B, H, KV, Dh, M = geom
    q, kv = _case(B, H, KV, Dh, M)
    rng = np.random.default_rng(3)
    t = {"zero": 0, "mid": M // 3, "full": M - 1,
         "ragged": rng.integers(0, M, size=(B,))}[tkind]
    ref = _ref_per_head(q, kv, t, H)
    impls = {
        "fold": flash_decode_fold(q, kv, t, H, interpret=True),
        "fold2": flash_decode_fold2(q, kv, t, H, rows=2, interpret=True),
        "fold3": flash_decode_fold3(q, kv, t, H, interpret=True),
        "fold3_sp": flash_decode_fold3_sp(q, kv, t, H, block_k=16,
                                          interpret=True),
        "fold_sp": flash_decode_fold_sp(q, kv, t, H, block_k=16,
                                        interpret=True),
        "xla_pm": xla_decode_attention_pm(q, kv, t, H),
    }
    for name, got in impls.items():
        np.testing.assert_allclose(np.asarray(got), ref, atol=2e-5,
                                   rtol=1e-4, err_msg=name)


def test_fold2_rows_partition_is_invariant():
    q, kv = _case(8, 8, 8, 16, 64, seed=5)
    t = 40
    a = np.asarray(flash_decode_fold2(q, kv, t, 8, rows=2, interpret=True))
    b = np.asarray(flash_decode_fold2(q, kv, t, 8, rows=4, interpret=True))
    c = np.asarray(flash_decode_fold2(q, kv, t, 8, rows=8, interpret=True))
    np.testing.assert_allclose(a, b, atol=1e-6)
    np.testing.assert_allclose(b, c, atol=1e-6)


def test_stream_reduce_sums():
    rng = np.random.default_rng(7)
    kv = jnp.asarray(rng.normal(size=(4, 32, 64)), jnp.float32)
    got = np.asarray(stream_reduce(kv, rows=2, interpret=True))
    # output block is revisited by every program; the last grid step wins,
    # so the result is the LAST program's block sum (a bandwidth probe,
    # not a reduction op — asserting the defined behavior)
    want = np.asarray(kv).reshape(4 * 32, 64)[2 * 32:].sum(0, keepdims=True)
    np.testing.assert_allclose(got, want, rtol=1e-5)

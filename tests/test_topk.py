"""Exact top-k threshold kernels (ops/topk.py): the radix binary search —
pure-XLA and Pallas — must match ``lax.top_k``'s k-th value bit-for-bit,
including ties, negatives, signed zeros and bf16 inputs; and swapping the
impl inside the decode loop must leave sampled streams bit-identical
(same threshold => same mask => same categorical draw)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eamg_tpu.decode.sampling import apply_top_k, sample_token
from eamg_tpu.ops.topk import kth_value_bitsearch, kth_value_pallas

CASES = [
    ("normal", lambda r: r.normal(size=(8, 8324)).astype(np.float32) * 10),
    ("ties", lambda r: np.round(r.normal(size=(4, 513)), 1)
     .astype(np.float32)),
    ("allneg", lambda r: -np.abs(r.normal(size=(2, 128)))
     .astype(np.float32)),
    ("zeros", lambda r: np.concatenate(
        [np.zeros((2, 64), np.float32), -np.zeros((2, 64), np.float32)],
        axis=1)),
    ("tiny", lambda r: r.normal(size=(1, 50)).astype(np.float32)),
    ("const", lambda r: np.full((3, 200), 2.5, np.float32)),
]


@pytest.mark.parametrize("name,make", CASES)
@pytest.mark.parametrize("impl", ["bitsearch", "pallas"])
def test_kth_value_exact(name, make, impl):
    x = jnp.asarray(make(np.random.default_rng(0)))
    fn = kth_value_bitsearch if impl == "bitsearch" else kth_value_pallas
    for k in sorted({1, 2, 50, x.shape[1] // 2, x.shape[1]}):
        if not 0 < k <= x.shape[1]:
            continue
        ref = jax.lax.top_k(x, k)[0][..., -1:]
        got = fn(x, k)
        assert np.array_equal(np.asarray(got), np.asarray(ref)), (name, k)


def test_kth_value_bfloat16():
    x = jnp.asarray(np.random.default_rng(1).normal(size=(4, 300))
                    .astype(np.float32)).astype(jnp.bfloat16)
    ref = jax.lax.top_k(x.astype(jnp.float32), 7)[0][..., -1:]
    for fn in (kth_value_bitsearch, kth_value_pallas):
        got = fn(x, 7)
        assert got.dtype == jnp.bfloat16
        assert np.array_equal(np.asarray(got, np.float32),
                              np.asarray(ref, np.float32))


def test_apply_top_k_mask_identical_across_impls():
    x = jnp.asarray(np.random.default_rng(2).normal(size=(4, 997))
                    .astype(np.float32))
    ref = apply_top_k(x, 50, impl="sort")
    for impl in ("bitsearch", "pallas"):
        got = apply_top_k(x, 50, impl=impl)
        assert np.array_equal(np.asarray(got), np.asarray(ref)), impl


def test_sampled_stream_bit_identical_across_impls():
    """Same threshold + same PRNG key => identical categorical draws, so
    swapping the threshold impl must not change any sampled stream."""
    from eamg_tpu.decode import generate_kv
    from eamg_tpu.models import GPTConfig, init_params

    cfg = GPTConfig(vocab_size=300, seq_len=40, d_model=32, n_head=4,
                    n_layer=2, causal=True)
    params = init_params(jax.random.PRNGKey(0), cfg)
    prompt = jnp.asarray(np.asarray([[1, 2, 3, 0]], np.int32))
    outs = {}
    for impl in ("sort", "bitsearch", "pallas"):
        buf, pos = generate_kv(params, prompt, 3, jax.random.PRNGKey(9),
                               cfg, 32, temperature=0.9, top_k=50,
                               eos_id=-1, pad_id=0, top_k_impl=impl)
        outs[impl] = (np.asarray(buf).tolist(), int(pos))
    assert outs["sort"] == outs["bitsearch"] == outs["pallas"]


def _nucleus_oracle(logits: np.ndarray, p: float) -> np.ndarray:
    """Sorted-cumsum nucleus keep-mask (ties at the boundary included)."""
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    keep = np.zeros_like(logits, bool)
    for b in range(logits.shape[0]):
        order = np.argsort(-logits[b], kind="stable")
        cum = np.cumsum(probs[b][order])
        m = int(np.searchsorted(cum, p) + 1)  # smallest prefix mass >= p
        m = min(m, logits.shape[1])
        thresh = logits[b][order[m - 1]]
        keep[b] = logits[b] >= thresh
    return keep


@pytest.mark.parametrize("p", [0.1, 0.5, 0.9, 0.95])
def test_top_p_threshold_matches_sorted_cumsum(p):
    """The sort-free radix search over the probability-mass predicate
    selects exactly the sorted-cumsum nucleus (ties included)."""
    from eamg_tpu.ops.topk import top_p_threshold_bitsearch

    x = np.random.default_rng(4).normal(size=(6, 1000)).astype(
        np.float32) * 3
    thresh = np.asarray(top_p_threshold_bitsearch(jnp.asarray(x), p))
    got = x >= thresh
    assert np.array_equal(got, _nucleus_oracle(x, p))


def test_top_p_edge_cases():
    from eamg_tpu.decode.sampling import apply_top_p
    from eamg_tpu.ops.topk import top_p_threshold_bitsearch

    x = jnp.asarray(np.random.default_rng(5).normal(size=(3, 257))
                    .astype(np.float32))
    # p >= 1: no-op (compiled out)
    assert apply_top_p(x, 1.0) is x
    # p = 1.0 on the raw threshold: float32 rounding may shave tokens of
    # negligible mass, but essentially all probability must survive
    # (apply_top_p never reaches here — p >= 1 is compiled out above)
    t = np.asarray(top_p_threshold_bitsearch(x, 1.0))
    probs = np.exp(np.asarray(x, np.float64))
    probs /= probs.sum(-1, keepdims=True)
    kept_mass = np.where(np.asarray(x) >= t, probs, 0.0).sum(-1)
    assert (kept_mass >= 1 - 1e-6).all()
    # p -> 0 (including exactly 0, which would otherwise drive the radix
    # search into NaN bit patterns and mask EVERY token): keeps exactly
    # the argmax (and ties)
    for p in (1e-9, 0.0, -1.0):
        t = np.asarray(top_p_threshold_bitsearch(x, p))
        keep = np.asarray(x) >= t
        assert np.array_equal(keep.argmax(-1), np.asarray(x).argmax(-1)), p
        assert (keep.sum(-1) == 1).all(), p


def test_top_p_is_traced_not_static():
    """Serving paths must share ONE compiled program across distinct
    client-supplied top_p values (a fresh ragged compile costs minutes on
    the axon remote helper — a static float would be a compile-DoS)."""
    from eamg_tpu.decode.loop import _generate_kv
    from eamg_tpu.decode.ragged import _generate_kv_ragged
    from eamg_tpu.models import GPTConfig, init_params

    cfg = GPTConfig(vocab_size=64, seq_len=32, d_model=32, n_head=4,
                    n_layer=1, causal=True)
    params = init_params(jax.random.PRNGKey(0), cfg)
    prompt = jnp.asarray(np.asarray([[1, 2, 3, 0]], np.int32))
    from eamg_tpu.decode import generate_kv
    from eamg_tpu.decode.ragged import generate_kv_ragged

    # deltas, not absolute sizes: other tests in the same worker process
    # legitimately add entries for their own geometries
    generate_kv(params, prompt, 3, jax.random.PRNGKey(0), cfg, 16,
                top_p=0.9)
    base = _generate_kv._cache_size()
    for p in (0.8, 0.73, 0.61):
        generate_kv(params, prompt, 3, jax.random.PRNGKey(0), cfg, 16,
                    top_p=p)
    assert _generate_kv._cache_size() == base
    rngs = jax.random.PRNGKey(0)[None]
    generate_kv_ragged(params, prompt, jnp.asarray([3], np.int32),
                       rngs, cfg, 16, top_p=0.9)
    base = _generate_kv_ragged._cache_size()
    for p in (0.8, 0.73, 0.61):
        generate_kv_ragged(params, prompt, jnp.asarray([3], np.int32),
                           rngs, cfg, 16, top_p=p)
    assert _generate_kv_ragged._cache_size() == base


def test_top_p_one_matches_no_top_p_bitwise():
    """top_p=1.0 must leave sampled streams bit-identical to the
    pre-top-p sampler (reference parity is the default)."""
    logits = jnp.asarray(np.random.default_rng(6)
                         .normal(size=(4, 300)).astype(np.float32) * 2)
    keys = jax.random.split(jax.random.PRNGKey(1), 16)
    a = jax.vmap(lambda k: sample_token(k, logits, 0.8, 50))(keys)
    b = jax.vmap(lambda k: sample_token(k, logits, 0.8, 50,
                                        top_p=1.0))(keys)
    assert np.array_equal(np.asarray(a), np.asarray(b))


def test_sample_token_top_p_restricts_support():
    """With a peaked distribution, top_p=0.5 must only ever draw tokens
    inside the oracle nucleus."""
    rng = np.random.default_rng(7)
    logits_np = (rng.normal(size=(1, 200)) * 4).astype(np.float32)
    keep = _nucleus_oracle(logits_np, 0.5)[0]
    logits = jnp.asarray(logits_np)
    keys = jax.random.split(jax.random.PRNGKey(2), 500)
    toks = np.asarray(jax.vmap(
        lambda k: sample_token(k, logits, 1.0, 0, top_p=0.5)[0])(keys))
    assert keep[toks].all()


def test_sample_token_distribution_unchanged():
    """Top-50 sampling frequencies with the bitsearch threshold match the
    sort-based ones within noise (chi-square-ish tolerance)."""
    logits = jnp.asarray(np.random.default_rng(3)
                         .normal(size=(1, 200)).astype(np.float32) * 2)
    n = 2000
    keys = jax.random.split(jax.random.PRNGKey(0), n)
    draws = {}
    for impl in ("sort", "bitsearch"):
        toks = jax.vmap(
            lambda k: sample_token(k, logits, 1.0, 50,
                                   top_k_impl=impl)[0])(keys)
        draws[impl] = np.asarray(toks)
    # identical keys + identical masked logits => identical draws
    assert np.array_equal(draws["sort"], draws["bitsearch"])


def test_min_p_matches_oracle_and_noop():
    """Min-p: keep == probs >= min_p * max(probs); min_p=0 (Python OR
    traced) is bit-exact identity; sampled support is restricted."""
    from eamg_tpu.decode.sampling import apply_min_p

    rng = np.random.default_rng(8)
    x_np = (rng.normal(size=(5, 400)) * 3).astype(np.float32)
    x = jnp.asarray(x_np)
    for p in (0.05, 0.2, 0.7):
        got = np.asarray(apply_min_p(x, p)) > -1e9
        probs = np.exp(x_np - x_np.max(-1, keepdims=True))
        probs /= probs.sum(-1, keepdims=True)
        want = probs >= p * probs.max(-1, keepdims=True)
        # threshold in logit space is exact: max + ln(p); compare sets
        want_logit = x_np >= x_np.max(-1, keepdims=True) + np.log(
            np.float32(p))
        assert np.array_equal(got, want_logit), p
        # logit-space and prob-space definitions agree except for float
        # rounding at the exact boundary
        assert (got == want).mean() > 0.999, p
    # off: Python float -> compiled out; traced 0 -> per-row select
    assert apply_min_p(x, 0.0) is x
    traced = jax.jit(lambda lg, mp: apply_min_p(lg, mp, enabled=True))(
        x, 0.0)
    assert np.array_equal(np.asarray(traced), x_np)
    # min_p > 1 clamps to 1: the argmax must survive (an un-clamped
    # threshold of max + log(min_p) > max would mask the whole row and
    # sampling would degenerate to uniform over the vocab)
    for p in (1.0, 1.5, 100.0):
        kept = np.asarray(apply_min_p(x, p)) > -1e9
        argmax_kept = kept[np.arange(5), x_np.argmax(-1)]
        assert argmax_kept.all(), p
        assert (kept.sum(-1) >= 1).all(), p


def test_sample_token_min_p_restricts_support():
    from eamg_tpu.decode.sampling import sample_token as st

    rng = np.random.default_rng(9)
    logits_np = (rng.normal(size=(1, 150)) * 4).astype(np.float32)
    keep = logits_np[0] >= logits_np.max() + np.log(np.float32(0.3))
    keys = jax.random.split(jax.random.PRNGKey(3), 400)
    toks = np.asarray(jax.vmap(
        lambda k: st(k, jnp.asarray(logits_np), 1.0, 0, min_p=0.3)[0]
    )(keys))
    assert keep[toks].all()
    # min_p=0 bit-matches the min_p-free sampler
    a = jax.vmap(lambda k: st(k, jnp.asarray(logits_np), 0.9, 50))(keys)
    b = jax.vmap(lambda k: st(k, jnp.asarray(logits_np), 0.9, 50,
                              min_p=0.0))(keys)
    assert np.array_equal(np.asarray(a), np.asarray(b))

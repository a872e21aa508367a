"""On-device sampling: temperature / top-k / categorical, fused under jit.

Reproduces the reference sampler's math (api_cache.py:166-178): logits are
divided by temperature, a top-k additive mask (0 at the top-k indices,
``mask_value`` elsewhere) is applied, then softmax + multinomial. On device
this is ``jax.lax.top_k`` + ``jax.random.categorical`` — mathematically the
same distribution, with the PRNG threaded explicitly so every sampled run is
reproducible by construction (a property the reference lacks: its host RNG
is unseeded, EATS.py:27-28).

The reference uses mask constant -1e10 (api.py:85) in the servers and -1e9
in generate2.py:36; the constant is a parameter.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def apply_top_k(logits: jax.Array, top_k: int,
                mask_value: float = -1e10,
                approx: bool = False) -> jax.Array:
    """Additive top-k mask, reference semantics: logits + (0 at top-k,
    mask_value elsewhere). k is static (compiled into the program).

    approx=True uses the TPU-optimized ``lax.approx_max_k`` (recall 0.99)
    to find the k-th threshold — measurably faster per decode step on large
    vocabularies; exact is the default (reference semantics)."""
    if top_k is None or top_k <= 0 or top_k >= logits.shape[-1]:
        return logits
    if approx:
        vals, _ = jax.lax.approx_max_k(logits, top_k, recall_target=0.99)
    else:
        vals, _ = jax.lax.top_k(logits, top_k)
    thresh = vals[..., -1:]
    return logits + jnp.where(logits >= thresh, 0.0, mask_value)


def sample_token(rng: jax.Array, logits: jax.Array, temperature: float,
                 top_k: int, mask_value: float = -1e10,
                 greedy: bool = False,
                 approx_top_k: bool = False) -> jax.Array:
    """[B, V] logits -> [B] sampled token ids."""
    if greedy:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits / temperature
    logits = apply_top_k(logits, top_k, mask_value, approx=approx_top_k)
    return jax.random.categorical(rng, logits, axis=-1).astype(jnp.int32)


def token_log_prob(logits: jax.Array, token: jax.Array, temperature: float,
                   top_k: int, mask_value: float = -1e10) -> jax.Array:
    """log P(token) under the sampling distribution — used by the
    host-replay parity harness to validate recorded reference streams."""
    logits = apply_top_k(logits / temperature, top_k, mask_value)
    logp = jax.nn.log_softmax(logits, axis=-1)
    return jnp.take_along_axis(logp, token[..., None], axis=-1)[..., 0]

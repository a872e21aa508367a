"""On-device sampling: temperature / top-k / categorical, fused under jit.

Reproduces the reference sampler's math (api_cache.py:166-178): logits are
divided by temperature, a top-k additive mask (0 at the top-k indices,
``mask_value`` elsewhere) is applied, then softmax + multinomial. On device
this is a top-k threshold + ``jax.random.categorical`` — mathematically the
same distribution, with the PRNG threaded explicitly so every sampled run is
reproducible by construction (a property the reference lacks: its host RNG
is unseeded, EATS.py:27-28).

``top_k_impl`` selects how the k-th-value threshold is found:
- ``"sort"`` — ``lax.top_k`` (sort-based selection; ~76 µs/step over the
  8,324-token vocab on v5e);
- ``"bitsearch"`` — exact radix binary search, pure XLA (ops/topk.py);
- ``"pallas"`` — the same search as one Pallas VMEM kernel;
- ``"approx"`` — ``lax.approx_max_k`` (recall 0.99; compiles pathologically
  slowly on the axon backend, kept for standard runtimes).

All exact impls produce the same threshold, hence the same mask, hence —
given the same PRNG key — *bit-identical* sampled streams (tested).

The reference uses mask constant -1e10 (api.py:85) in the servers and -1e9
in generate2.py:36; the constant is a parameter.

Beyond the reference's top-k, nucleus (top-p) filtering is available via
``top_p`` — implemented with the same sort-free radix bitsearch, over the
probability-mass predicate instead of the count predicate (ops/topk.py) —
and min-p via ``min_p`` (confidence-relative cutoff, just a row max + a
compare). Defaults (1.0 / 0.0) compile to no-ops, preserving reference
parity.

Anti-repetition controls (also beyond-reference): repetition penalty
(CTRL/HF), frequency and presence penalties (OpenAI) via
:func:`apply_penalties` over per-row occurrence counts maintained by the
decode loops (:func:`token_counts` seeds them from the prompt). Neutral
values (1.0/0.0/0.0) compile the counts state out entirely.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _kth_threshold(logits: jax.Array, top_k: int, impl: str) -> jax.Array:
    """[B, V] -> [B, 1] k-th largest value per row."""
    if impl == "bitsearch":
        from ..ops.topk import kth_value_bitsearch

        return kth_value_bitsearch(logits, top_k)
    if impl == "pallas":
        from ..ops.topk import kth_value_pallas

        return kth_value_pallas(logits, top_k)
    if impl == "approx":
        vals, _ = jax.lax.approx_max_k(logits, top_k, recall_target=0.99)
    else:  # "sort"
        vals, _ = jax.lax.top_k(logits, top_k)
    return vals[..., -1:]


def apply_top_k(logits: jax.Array, top_k: int,
                mask_value: float = -1e10,
                approx: bool = False,
                impl: str = "bitsearch") -> jax.Array:
    """Additive top-k mask, reference semantics: logits + (0 at top-k,
    mask_value elsewhere). k is static (compiled into the program).
    ``approx=True`` is a back-compat alias for ``impl="approx"``."""
    if top_k is None or top_k <= 0 or top_k >= logits.shape[-1]:
        return logits
    if approx:
        impl = "approx"
    thresh = _kth_threshold(logits, top_k, impl)
    return logits + jnp.where(logits >= thresh, 0.0, mask_value)


def apply_top_p(logits: jax.Array, top_p, mask_value: float = -1e10,
                enabled: bool | None = None) -> jax.Array:
    """Additive nucleus (top-p) mask: keep the smallest set of
    highest-probability tokens with total mass >= top_p, ``mask_value``
    elsewhere. Sort-free (radix bitsearch over the probability-mass
    predicate, ops/topk.py). Beyond-reference capability: the reference
    sampler is top-k only (api_cache.py:171-177).

    ``enabled`` is the static on/off switch: None (default) decides from a
    concrete Python ``top_p`` (None or >= 1.0 compiles to a no-op); pass an
    explicit bool when ``top_p`` is a traced operand — serving paths keep
    it traced so every client-supplied value shares ONE compiled program
    (a fresh ragged compile costs minutes on the axon remote helper)."""
    if enabled is None:
        enabled = top_p is not None and (
            not isinstance(top_p, (int, float)) or top_p < 1.0)
    if not enabled or top_p is None:
        return logits
    from ..ops.topk import top_p_threshold_bitsearch

    thresh = top_p_threshold_bitsearch(logits, top_p)
    masked = logits + jnp.where(logits >= thresh, 0.0, mask_value)
    # Traced p >= 1 must be an EXACT no-op (float32 mass rounding could
    # otherwise shave negligible-mass tokens): select per row. For
    # concrete Python p < 1 the predicate is a constant and folds away.
    return jnp.where(jnp.asarray(top_p, jnp.float32) < 1.0, masked, logits)


def apply_min_p(logits: jax.Array, min_p, mask_value: float = -1e10,
                enabled: bool | None = None) -> jax.Array:
    """Min-p filter: keep tokens whose probability is at least ``min_p``
    times the top token's — equivalently ``logit >= max + ln(min_p)``, so
    no softmax and no search, just a row max and a compare. Scales the
    kept set with the model's confidence (peaked distribution -> few
    tokens, flat -> many), unlike fixed-k/fixed-mass filters.

    Same static/traced contract as apply_top_p: ``enabled`` is the static
    switch (None decides from a concrete Python ``min_p``; 0 or None is
    off); ``min_p`` itself stays traced on serving paths. A traced
    ``min_p <= 0`` selects the unfiltered logits per row, bit-exactly."""
    if enabled is None:
        enabled = min_p is not None and (
            not isinstance(min_p, (int, float)) or min_p > 0.0)
    if not enabled or min_p is None:
        return logits
    mp = jnp.asarray(min_p, jnp.float32)
    # clamp to [subnormal, 1]: min_p > 1 would put the threshold ABOVE the
    # row max, masking every token — float32 absorption at mask_value then
    # collapses all logits to one value and sampling turns uniform over
    # the whole vocabulary. Clamped, the strictest filter keeps the argmax.
    thresh = (jnp.max(logits, axis=-1, keepdims=True)
              + jnp.log(jnp.clip(mp, 1e-38, 1.0)))
    masked = logits + jnp.where(logits >= thresh, 0.0, mask_value)
    return jnp.where(mp > 0.0, masked, logits)


def token_counts(ids: jax.Array, valid: jax.Array,
                 vocab_size: int) -> jax.Array:
    """[B, T] token ids + [B, T] validity mask -> [B, V] float32 occurrence
    counts (scatter-add; duplicate ids accumulate). Seeds the penalty
    state from the prompt so repetition/frequency/presence penalties see
    prompt tokens too (matching the HF/OpenAI convention of penalizing
    over the full context, not just the generation)."""
    B = ids.shape[0]
    rows = jnp.broadcast_to(jnp.arange(B)[:, None], ids.shape)
    return jnp.zeros((B, vocab_size), jnp.float32).at[rows, ids].add(
        valid.astype(jnp.float32))


def no_repeat_ngram_ban(buf: jax.Array, pos, n: int,
                        vocab_size: int) -> jax.Array:
    """[B, L] token history + per-row length -> [B, V] bool ban mask of
    tokens that would complete an ``n``-gram already present in
    ``buf[:, :pos]`` (HF ``no_repeat_ngram_size`` semantics).

    ``n`` is STATIC (it shapes the comparison network); ``pos`` may be a
    scalar or [B]. For every start j with j + n - 1 <= pos - 1, if
    ``buf[:, j:j+n-1]`` equals the last n-1 tokens of the history, then
    ``buf[:, j+n-1]`` is banned. n=1 bans every token already seen.

    Vectorization: n-1 shifted elementwise compares over [B, L] build the
    per-start match mask, then one scatter-add collapses matching starts'
    successor tokens onto the vocab axis — no [B, L, V] intermediate and
    no sort, O(n·L) work per step."""
    B, L = buf.shape
    pos = jnp.broadcast_to(jnp.asarray(pos, jnp.int32), (B,))
    starts = jnp.arange(L)[None, :]
    # prior n-gram must end within history: j + n - 1 <= pos - 1
    match = (starts <= pos[:, None] - n) & (pos[:, None] >= n)
    if n > 1:
        tail_idx = jnp.clip(
            pos[:, None] - (n - 1) + jnp.arange(n - 1)[None, :], 0, L - 1)
        tail = jnp.take_along_axis(buf, tail_idx, axis=1)      # [B, n-1]
        for i in range(n - 1):
            # roll wraparound rows are excluded by the validity bound above
            match &= jnp.roll(buf, -i, axis=1) == tail[:, i:i + 1]
    banned_tok = jnp.roll(buf, -(n - 1), axis=1) if n > 1 else buf
    rows = jnp.broadcast_to(jnp.arange(B)[:, None], (B, L))
    hits = jnp.zeros((B, vocab_size), jnp.float32).at[rows, banned_tok].add(
        match.astype(jnp.float32))
    return hits > 0.0


def apply_no_repeat_ngram(logits: jax.Array, buf: jax.Array, pos, n: int,
                          mask_value: float = -1e10,
                          row_on: jax.Array | None = None) -> jax.Array:
    """Additive n-gram ban on raw logits (HF processor order: before
    temperature/filters; moves the greedy argmax too). ``n`` static, 0 =
    compiled out. ``row_on`` ([B] bool, traced) gates per row — False rows
    are bit-exact no-ops (the continuous engine's mixed-traffic
    contract). Beyond-reference capability (the reference sampler is
    plain top-k, api_cache.py:171-177)."""
    if not n:
        return logits
    ban = no_repeat_ngram_ban(buf, pos, n, logits.shape[-1])
    if row_on is not None:
        ban = ban & row_on[..., None]
    return logits + jnp.where(ban, mask_value, 0.0)


def _penalties_on(rep_p, freq_p, pres_p) -> bool:
    def neutral(v, n):
        return v is None or (isinstance(v, (int, float)) and float(v) == n)
    return not (neutral(rep_p, 1.0) and neutral(freq_p, 0.0)
                and neutral(pres_p, 0.0))


def apply_penalties(logits: jax.Array, counts: jax.Array,
                    repetition_penalty=1.0, frequency_penalty=0.0,
                    presence_penalty=0.0,
                    enabled: bool | None = None) -> jax.Array:
    """Anti-repetition logit transforms over occurrence ``counts`` ([..., V]
    float32, prompt + generated so far — see :func:`token_counts`). Applied
    to RAW logits, before temperature/top-k (the HF processor-vs-warper
    order). Beyond-reference capability: the reference sampler has no
    repetition controls (api_cache.py:171-177) — and symbolic music decoded
    with plain top-k loops badly, so these are the levers that matter here.

    - ``repetition_penalty`` (CTRL / HF semantics): tokens already seen get
      ``logit/p`` if positive else ``logit*p`` — p>1 discourages repeats,
      p<1 encourages them. Clamped to >= 1e-6 (p<=0 would divide by zero).
    - ``frequency_penalty`` / ``presence_penalty`` (OpenAI semantics):
      ``logit -= freq*count + pres*(count>0)``.

    Same static/traced contract as apply_top_p: ``enabled`` is the static
    switch (None decides from concrete Python values); the penalty values
    stay TRACED on serving paths so client-supplied floats share one
    compiled program. The neutral values (1.0/0.0/0.0) are bit-exact
    no-ops even when traced (x/1, x*1 and x-0 are exact in float32), so
    per-row mixes of penalized and plain rows preserve plain rows'
    bit-match-solo contract."""
    if enabled is None:
        enabled = _penalties_on(repetition_penalty, frequency_penalty,
                                presence_penalty)
    if not enabled:
        return logits
    rp = jnp.maximum(jnp.asarray(
        1.0 if repetition_penalty is None else repetition_penalty,
        jnp.float32), 1e-6)
    fp = jnp.asarray(0.0 if frequency_penalty is None else frequency_penalty,
                     jnp.float32)
    pp = jnp.asarray(0.0 if presence_penalty is None else presence_penalty,
                     jnp.float32)
    present = counts > 0.0
    penalized = jnp.where(logits < 0.0, logits * rp, logits / rp)
    out = jnp.where(present, penalized, logits)
    return out - fp * counts - pp * present.astype(jnp.float32)


def sample_token(rng: jax.Array, logits: jax.Array, temperature: float,
                 top_k: int, mask_value: float = -1e10,
                 greedy: bool = False,
                 approx_top_k: bool = False,
                 top_k_impl: str = "bitsearch",
                 top_p=1.0, use_top_p: bool | None = None,
                 min_p=0.0, use_min_p: bool | None = None,
                 counts: jax.Array | None = None,
                 repetition_penalty=1.0, frequency_penalty=0.0,
                 presence_penalty=0.0,
                 use_penalties: bool | None = None) -> jax.Array:
    """[B, V] logits -> [B] sampled token ids. Filter order matches the
    HF convention: penalties on raw logits (processors), then temperature,
    then top-k, then top-p, then min-p over the surviving distribution
    (warpers). ``use_top_p``/``use_min_p``/``use_penalties`` gate the
    transforms statically when their values are traced (see apply_top_p).
    Penalties apply in greedy mode too (they move the argmax; the filters
    don't)."""
    if use_penalties is None:
        use_penalties = counts is not None and _penalties_on(
            repetition_penalty, frequency_penalty, presence_penalty)
    if use_penalties and counts is not None:
        logits = apply_penalties(logits, counts, repetition_penalty,
                                 frequency_penalty, presence_penalty,
                                 enabled=True)
    if greedy:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits / temperature
    logits = apply_top_k(logits, top_k, mask_value, approx=approx_top_k,
                         impl=top_k_impl)
    logits = apply_top_p(logits, top_p, mask_value, enabled=use_top_p)
    logits = apply_min_p(logits, min_p, mask_value, enabled=use_min_p)
    return jax.random.categorical(rng, logits, axis=-1).astype(jnp.int32)


def token_log_prob(logits: jax.Array, token: jax.Array, temperature: float,
                   top_k: int, mask_value: float = -1e10,
                   top_p: float = 1.0, min_p: float = 0.0) -> jax.Array:
    """log P(token) under the sampling distribution — used by the
    host-replay parity harness to validate recorded reference streams.
    Pass the stream's top_p/min_p so filtered streams are scored against
    their true distribution."""
    logits = apply_top_k(logits / temperature, top_k, mask_value)
    logits = apply_top_p(logits, top_p, mask_value)
    logits = apply_min_p(logits, min_p, mask_value)
    logp = jax.nn.log_softmax(logits, axis=-1)
    return jnp.take_along_axis(logp, token[..., None], axis=-1)[..., 0]

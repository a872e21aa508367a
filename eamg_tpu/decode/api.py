"""High-level generation API: token strings in, token strings out.

``Generator`` mirrors the reference's serving entry points —
``sample_kvcache`` (api_cache.py:159-184) and ``sample`` (api.py:77-92) —
with the device work compiled and the RNG explicit/seedable.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..models.gpt import GPTConfig
from ..tokenizer.vocab import Vocab
from .loop import generate_full, generate_kv

END_TOKEN = "[END_SEQUENCE]"


def _bucket(n: int, sizes=(16, 32, 64, 128, 256, 512, 1024, 2048)) -> int:
    for s in sizes:
        if n <= s:
            return s
    return n


class Generator:
    """Owns (params, cfg, vocab); exposes reference-shaped sampling calls.

    Prompt buffers are padded to power-of-two buckets so repeated requests
    with different prompt lengths reuse compiled programs.
    """

    def __init__(self, params: dict, cfg: GPTConfig, vocab: Vocab,
                 eos_token: str = END_TOKEN, pad_token: str = "[PAD]"):
        # Pin params on device ONCE. Checkpoint loaders return numpy
        # trees, and jit re-transfers numpy arguments on EVERY call —
        # measured 2469 -> 501 us/step (4.9x) on demo_ckpt_b3 batch-1
        # greedy over the tunnel, where each call re-shipped the 10 MB
        # model. For params that are already jax arrays (init_params
        # output, mesh-sharded trees from sharded serving) asarray is an
        # identity: placement and shardings pass through untouched.
        self.params = jax.tree.map(jnp.asarray, params)
        self.cfg = cfg
        self.vocab = vocab
        self.eos_id = vocab.get(eos_token, -1)
        self.pad_id = vocab.get(pad_token, 0)

    def max_supported_len(self, use_cache: bool = True) -> int:
        """Longest total (prompt + generation) length the positional table
        supports. The cached path looks positions up to max_len-1
        (loop.py::generate_kv); the uncached path only re-encodes the first
        max_len-1 tokens, so it tolerates one more. The pos-broadcast quirk
        (api_cache.py:99) always reads row 0 during decode."""
        if self.cfg.pos_broadcast_bug or not use_cache:
            return self.cfg.seq_len if use_cache else self.cfg.n_pos + 1
        return min(self.cfg.seq_len, self.cfg.n_pos)

    # -- id-level ---------------------------------------------------------

    def generate_ids(self, prompt_ids: list[int], max_len: int | None = None,
                     temperature: float = 1.0, top_k: int = 50,
                     seed: int = 0, greedy: bool = False, batch: int = 1,
                     use_cache: bool = True,
                     refeed_last_prompt: bool = True,
                     mask_value: float = -1e10,
                     top_p: float = 1.0, min_p: float = 0.0,
                     penalties: tuple | None = None,
                     no_repeat_ngram: int = 0, grammar=None) -> np.ndarray:
        """Returns [batch, n_tokens] generated id rows (prompt included).

        mask_value: top-k mask constant — the servers use -1e10
        (api.py:85), generate2.py uses -1e9 (SURVEY.md §2.3.6).
        top_p/min_p: nucleus / confidence-relative filtering after top-k
        (1.0 / 0.0 = off, reference parity; the reference sampler is
        top-k only).
        penalties: optional (repetition, frequency, presence) tuple —
        anti-repetition transforms on the raw logits over prompt +
        generated token counts (sampling.apply_penalties); None or the
        neutral (1, 0, 0) is reference parity.
        no_repeat_ngram: HF no_repeat_ngram_size — ban tokens completing
        an n-gram already in the history (STATIC: each distinct n is one
        compiled program; 0 = off, reference parity).
        grammar: optional decode.grammar.Grammar — FSM-constrained
        decoding over the token scheme's surface grammar, with
        budget-aware closing (decode/grammar.py); None = off, reference
        parity."""
        max_len = max_len or self.cfg.seq_len
        max_len = min(max_len, self.max_supported_len(use_cache))
        p = len(prompt_ids)
        if p >= max_len:
            # Reference semantics: sample_kvcache's loop runs
            # range(max_len - len(prompt)) times — zero for over-length
            # prompts, prompt returned unchanged (api_cache.py:166-182).
            return np.tile(np.asarray(prompt_ids, np.int32)[None],
                           (batch, 1))
        bucket = min(_bucket(p), max_len)
        prompt = np.full((batch, bucket), self.pad_id, np.int32)
        prompt[:, :p] = prompt_ids
        rng = jax.random.PRNGKey(seed)
        if use_cache:
            buf, pos = generate_kv(
                self.params, jnp.asarray(prompt), p, rng, self.cfg, max_len,
                temperature=temperature, top_k=top_k, eos_id=self.eos_id,
                pad_id=self.pad_id, greedy=greedy,
                refeed_last_prompt=refeed_last_prompt,
                mask_value=mask_value, top_p=top_p, min_p=min_p,
                penalties=penalties, no_repeat_ngram=no_repeat_ngram,
                grammar=grammar)
        else:
            buf, pos = generate_full(
                self.params, jnp.asarray(prompt), p, rng, self.cfg, max_len,
                temperature=temperature, top_k=top_k, eos_id=self.eos_id,
                pad_id=self.pad_id, greedy=greedy, mask_value=mask_value,
                top_p=top_p, min_p=min_p, penalties=penalties,
                no_repeat_ngram=no_repeat_ngram, grammar=grammar)
        return np.asarray(buf)[:, :int(pos)]

    def generate_ids_speculative(self, draft: "Generator",
                                 prompt_ids: list[int],
                                 max_len: int | None = None,
                                 gamma: int = 4, temperature: float = 1.0,
                                 top_k: int = 50, seed: int = 0,
                                 greedy: bool = False,
                                 top_p: float = 1.0,
                                 min_p: float = 0.0) -> np.ndarray:
        """Speculative decode with ``draft`` as the proposer (same vocab);
        output distribution identical to target-only decoding
        (decode/speculative.py). Batch 1, corrected causal configs only."""
        from .speculative import generate_speculative

        assert draft.vocab.tok2id == self.vocab.tok2id, \
            "draft and target must share a vocabulary"
        max_len = max_len or min(self.cfg.seq_len, draft.cfg.seq_len)
        p = len(prompt_ids)
        if p >= max_len:
            # zero generation steps: prompt returned unchanged (reference
            # semantics, api_cache.py:166 — same guard as generate_ids)
            return np.asarray([list(prompt_ids)], np.int32)
        bucket = min(_bucket(p), max_len)
        prompt = np.full((1, bucket), self.pad_id, np.int32)
        prompt[0, :p] = prompt_ids
        buf, pos = generate_speculative(
            self.params, draft.params, jnp.asarray(prompt), p,
            jax.random.PRNGKey(seed), self.cfg, draft.cfg, max_len,
            gamma=gamma, temperature=temperature, top_k=top_k,
            eos_id=self.eos_id, pad_id=self.pad_id, greedy=greedy,
            top_p=top_p, min_p=min_p)
        return np.asarray(buf)[:, :int(pos)]

    def generate_ids_lookup(self, prompt_ids: list[int],
                            max_len: int | None = None, gamma: int = 8,
                            ngram: int = 3, temperature: float = 1.0,
                            top_k: int = 50, seed: int = 0,
                            greedy: bool = False, top_p: float = 1.0,
                            min_p: float = 0.0) -> np.ndarray:
        """Draft-free speculative decode: proposals copied from the
        sequence's own history (prompt-lookup n-gram speculation,
        decode/speculative.py::generate_prompt_lookup). Output distribution
        identical to target-only decoding; greedy output bit-identical.
        Batch 1, corrected causal configs only."""
        from .speculative import generate_prompt_lookup

        if not self.cfg.causal or self.cfg.pos_broadcast_bug:
            raise ValueError(
                "prompt-lookup speculation requires a corrected causal "
                "checkpoint (train --corrected); this config has the "
                "reference bidirectional/pos quirks")
        max_len = max_len or self.cfg.seq_len
        max_len = min(max_len, self.cfg.n_pos - gamma)
        p = len(prompt_ids)
        if p >= max_len:
            # zero generation steps: prompt returned unchanged (reference
            # semantics, api_cache.py:166 — same guard as generate_ids)
            return np.asarray([list(prompt_ids)], np.int32)
        bucket = min(_bucket(p), max_len)
        prompt = np.full((1, bucket), self.pad_id, np.int32)
        prompt[0, :p] = prompt_ids
        buf, pos, _ = generate_prompt_lookup(
            self.params, jnp.asarray(prompt), p, jax.random.PRNGKey(seed),
            self.cfg, max_len, gamma=gamma, ngram=ngram,
            temperature=temperature, top_k=top_k, eos_id=self.eos_id,
            pad_id=self.pad_id, greedy=greedy, top_p=top_p, min_p=min_p)
        return np.asarray(buf)[:, :int(pos)]

    def generate_ids_medusa(self, heads: dict, prompt_ids: list[int],
                            max_len: int | None = None, gamma: int = 4,
                            temperature: float = 1.0, top_k: int = 50,
                            seed: int = 0, greedy: bool = False,
                            top_p: float = 1.0,
                            min_p: float = 0.0) -> np.ndarray:
        """Medusa multi-token decode (decode/medusa.py): ``heads`` from
        tools.medusa.load_medusa_heads proposes gamma tokens per verify
        step with ZERO extra serial chain traversals. Output distribution
        identical to target-only decoding; greedy output bit-identical.
        Batch 1, corrected causal configs only."""
        from .medusa import generate_medusa

        if not self.cfg.causal or self.cfg.pos_broadcast_bug:
            raise ValueError(
                "medusa decoding requires a corrected causal checkpoint "
                "(train --corrected); this config has the reference "
                "bidirectional/pos quirks")
        gamma = min(gamma, len(heads["blocks"]))
        max_len = max_len or self.cfg.seq_len
        max_len = min(max_len, self.cfg.n_pos - gamma)
        p = len(prompt_ids)
        if p >= max_len:
            return np.asarray([list(prompt_ids)], np.int32)
        bucket = min(_bucket(p), max_len)
        prompt = np.full((1, bucket), self.pad_id, np.int32)
        prompt[0, :p] = prompt_ids
        buf, pos, _ = generate_medusa(
            self.params, heads, jnp.asarray(prompt), p,
            jax.random.PRNGKey(seed), self.cfg, max_len, gamma=gamma,
            temperature=temperature, top_k=top_k, eos_id=self.eos_id,
            pad_id=self.pad_id, greedy=greedy, top_p=top_p, min_p=min_p)
        return np.asarray(buf)[:, :int(pos)]

    def generate_ids_beam(self, prompt_ids: list[int],
                          max_len: int | None = None, n_beams: int = 4,
                          length_penalty: float = 1.0,
                          return_all: bool = False, grammar=None):
        """Deterministic beam search (decode/beam.py): returns the best
        hypothesis row (prompt included, trimmed to its true length), or —
        with ``return_all`` — (rows [K, ...], gen_lens, raw_scores,
        normalized_scores) ranked best-first. Beyond-reference capability
        (the reference only samples, api_cache.py:171-177). ``grammar``:
        optional decode.grammar.Grammar — constrained beam search with
        scores renormalized over the valid continuations."""
        from .beam import generate_beam, rank_beams

        max_len = max_len or self.cfg.seq_len
        max_len = min(max_len, self.max_supported_len())
        p = len(prompt_ids)
        if p >= max_len:
            # zero generation steps (reference semantics, api_cache.py:166)
            return np.asarray([list(prompt_ids)], np.int32) if return_all \
                else np.asarray(prompt_ids, np.int32)
        bucket = min(_bucket(p), max_len)
        prompt = np.full((1, bucket), self.pad_id, np.int32)
        prompt[0, :p] = prompt_ids
        buf, gen_lens, scores = generate_beam(
            self.params, jnp.asarray(prompt), p, self.cfg, max_len,
            n_beams=n_beams, eos_id=self.eos_id, pad_id=self.pad_id,
            grammar=grammar)
        buf, gen_lens, scores, norm = rank_beams(buf, gen_lens, scores,
                                                 length_penalty)
        if return_all:
            return buf, gen_lens, scores, norm
        return buf[0, :p + int(gen_lens[0])]

    def sample_beam(self, prompt: list[str], max_len: int | None = None,
                    n_beams: int = 4, length_penalty: float = 1.0,
                    grammar=None) -> list[str]:
        """Token-string twin of :meth:`generate_ids_beam` (best hypothesis,
        trimmed at EOS)."""
        ids = self.vocab.encode(prompt)
        row = self.generate_ids_beam(ids, max_len=max_len, n_beams=n_beams,
                                     length_penalty=length_penalty,
                                     grammar=grammar)
        return self.trim_at_eos(row)

    # -- token-string level (Scheme A serving) -----------------------------

    def sample_kvcache(self, prompt: list[str], max_len: int | None = None,
                       temperature: float = 1.0, top_k: int = 50,
                       seed: int = 0, greedy: bool = False,
                       top_p: float = 1.0, min_p: float = 0.0,
                       penalties: tuple | None = None,
                       no_repeat_ngram: int = 0,
                       grammar=None) -> list[str]:
        """Reference-shaped: prompt token strings -> generated token strings,
        trimmed at the first [END_SEQUENCE] (inclusive), batch 1."""
        ids = self.vocab.encode(prompt)
        row = self.generate_ids(ids, max_len=max_len,
                                temperature=temperature, top_k=top_k,
                                seed=seed, greedy=greedy, top_p=top_p,
                                min_p=min_p, penalties=penalties,
                                no_repeat_ngram=no_repeat_ngram,
                                grammar=grammar)[0]
        return self.trim_at_eos(row)

    def sample(self, prompt: list[str], max_len: int | None = None,
               temperature: float = 1.0, top_k: int = 50, seed: int = 0,
               greedy: bool = False, top_p: float = 1.0,
               min_p: float = 0.0,
               penalties: tuple | None = None,
               no_repeat_ngram: int = 0, grammar=None) -> list[str]:
        """Uncached path (reference api.py sample())."""
        ids = self.vocab.encode(prompt)
        row = self.generate_ids(ids, max_len=max_len,
                                temperature=temperature, top_k=top_k,
                                seed=seed, greedy=greedy,
                                use_cache=False, top_p=top_p,
                                min_p=min_p, penalties=penalties,
                                no_repeat_ngram=no_repeat_ngram,
                                grammar=grammar)[0]
        return self.trim_at_eos(row)

    def trim_at_eos(self, row) -> list[str]:
        """ids -> token strings, truncated at the first EOS (inclusive)."""
        toks = []
        for i in row:
            toks.append(self.vocab.id2tok[int(i)])
            if int(i) == self.eos_id:
                break
        return toks

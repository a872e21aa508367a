"""End-to-end request pipeline: text -> emotion -> prompt -> MIDI -> WAV.

The orchestration mirrors the reference endpoint (api_cache.py:186-241):
classify, EATS-map, assemble control tokens, decode, detokenize, render —
but the model is loaded once and jitted (the reference rebuilt nothing per
request either, module scope, api_cache.py:108-138), sampling RNG is
seedable, and per-phase wall-clock timings are returned (the reference had
print() statements; SURVEY.md §5.5).
"""

from __future__ import annotations

import io
import time
from dataclasses import dataclass, field

from ..audio import render_to_wav_auto
from ..decode import Generator
from ..emotion import EmotionClassifier, get_music_params
from ..tokenizer import assemble_prompt, tokens_to_song


def _merge_song(merged, by_track: dict, song, offset: float) -> None:
    """Append ``song``'s notes into ``merged`` shifted by ``offset``
    seconds, pooling instruments by (program, is_drum)."""
    from ..midi.smf import Note

    for inst in song.instruments:
        key = (inst.program, inst.is_drum)
        tgt = by_track.get(key)
        if tgt is None:
            tgt = type(inst)(program=inst.program, is_drum=inst.is_drum,
                             name=inst.name)
            by_track[key] = tgt
            merged.instruments.append(tgt)
        tgt.notes.extend(Note(n.velocity, n.pitch, n.start + offset,
                              n.end + offset) for n in inst.notes)


@dataclass
class GenerationResult:
    label: str
    mapping: dict
    prompt_tokens: list
    tokens: list
    midi_bytes: bytes
    wav_bytes: bytes | None
    timings_ms: dict = field(default_factory=dict)
    dropped_tokens: list = field(default_factory=list)


class Pipeline:
    """scheme="a": the reference's serving path (text control tokens).
    scheme="b3": serves Scheme-B3 models (train_no_inst.py vocabulary) —
    BPM/KEY control-token prefix, id-level decode, id->MIDI detokenizer;
    a path the reference never built for its compact-vocab trainers."""

    def __init__(self, generator: Generator,
                 classifier: EmotionClassifier | None = None,
                 full_gm: bool = False, render_audio: bool = True,
                 scheme: str = "a", scheme_b=None, use_cache: bool = True,
                 coalesce: bool = False,
                 coalesce_opts: dict | None = None,
                 medusa_heads: dict | None = None,
                 engine_medusa: bool = False,
                 fast_routing: bool = False):
        self.generator = generator
        self.classifier = classifier or EmotionClassifier()
        # Medusa heads (tools.medusa.load_medusa_heads) enable the
        # medusa=true request option: multi-token sampled decode, measured
        # 1.38-1.52x batch-1 (DESIGN.md §3.9). None = option rejected.
        self.medusa_heads = medusa_heads
        # acceptance probe metadata (tools.medusa.probe_acceptance);
        # pipeline_from_checkpoint fills it at head discovery, /stats
        # surfaces it (VERDICT r4 #5)
        self.medusa_probe = medusa_heads.get("probe") \
            if isinstance(medusa_heads, dict) else None
        self.full_gm = full_gm
        self.render_audio = render_audio
        # use_cache=False serves through the uncached O(T^2) re-encode path
        # — the reference's api.py server; True is api_cache.py.
        self.use_cache = use_cache
        # coalesce=True/"window" batches requests arriving within a window
        # into one ragged decode (serve/batcher.py); "continuous" runs the
        # persistent engine where requests join/leave a RUNNING decode
        # (serve/continuous.py). Both require the corrected causal config.
        self.batcher = None
        self.scheme = scheme
        if scheme == "b3" and scheme_b is None:
            from ..tokenizer import SchemeB3

            scheme_b = SchemeB3(seq_len=generator.cfg.seq_len)
        self.scheme_b = scheme_b
        self._grammar_obj = None   # built lazily on first grammar request
        if coalesce and scheme != "a":
            # coalescing paths are wired for the Scheme-A product flow;
            # B3 serves through the single-request compiled decode
            coalesce = False
        opts = dict(coalesce_opts or {})
        # engine-level grammar opt-in: opts {"grammar": True} compiles the
        # FSM tables into the batcher so requests asking grammar=true ride
        # the shared decode (rows carry a traced on/off bit)
        if opts.pop("grammar", False) and coalesce:
            opts["grammar"] = self.grammar()
        # adaptive batch-1 routing (round 5): at most ONE in-flight
        # request may bypass an IDLE continuous engine for the solo
        # compiled decode (the engine's per-chunk harvest RPCs cost a
        # lone row 2-3x; outputs are bit-identical). The single-permit
        # gate prevents a burst from thundering onto the serial solo
        # path — followers join the engine, which is what it is for.
        import threading

        self._solo_gate = threading.Semaphore(1)
        # fast_routing=True decodes bypassed rows through the batch-1
        # one-shot ragged program: ~70 ms lower E2E p50 on the tunnel
        # (144.6 vs 217 ms measured, BENCHMARKS r5) but a DIFFERENT
        # compiled program than the engine's chunk — on TPU, near-tie
        # argmaxes flip across programs (§3.6), so same-seed bytes then
        # depend on what load the request ran under. Default False:
        # strict cross-load byte determinism via run_detached (the
        # engine's own programs, private state).
        self.fast_routing = bool(fast_routing)
        # warmup bookkeeping: True once the engine's compiled programs
        # have been exercised this process (by an engine submit OR by
        # the strict bypass, which uses the same jitted callables)
        self._engine_warm = False
        if coalesce == "continuous":
            from .continuous import ContinuousBatcher

            # coalesce_opts: engine tuning (slots/chunk/max_len) exposed
            # as serve CLI --slots/--chunk for operators. engine_medusa
            # compiles per-row speculation into the engine (medusa=true
            # requests JOIN the shared decode, r4 machinery) — OFF by
            # default since round 5: engine medusa measured 0.48-0.85x
            # on every artifact (DESIGN §3.10) AND the medusa-capable
            # engine state taxes PLAIN staggered-8 traffic ~25%
            # (BENCHMARKS round 5). medusa=true requests decode solo
            # (the only measured win) when the engine lacks heads.
            if (engine_medusa and medusa_heads is not None
                    and "medusa_heads" not in opts):
                opts["medusa_heads"] = medusa_heads
            self.batcher = ContinuousBatcher(generator, **opts)
        elif coalesce:
            from .batcher import RequestBatcher

            self.batcher = RequestBatcher(generator, **opts)

    def warmup(self) -> None:
        """Compile the decode AND synth programs before the first request."""
        self.generate("warm up the compiler", seed=0,
                      render_audio=self.render_audio)
        from .continuous import ContinuousBatcher

        if isinstance(self.batcher, ContinuousBatcher) \
                and not self._engine_warm:
            # the generate() above did not touch the engine's compiled
            # programs (fast_routing's one-shot program, or an
            # accepts()-mismatched engine config like --engine-top-p):
            # warm the chunk program now so the first production
            # request doesn't hit a multi-minute cold compile on the
            # tunnel (CLAUDE.md round-2 pathology)
            start = [t for t in ("[START_SEQUENCE]",)
                     if t in self.generator.vocab]
            ids = self.generator.vocab.encode(start) if start else [1]
            self.batcher.submit(
                ids, temperature=1.0, seed=0, top_p=self.batcher.top_p,
                no_repeat_ngram=self.batcher.no_repeat_ngram)
            self._engine_warm = True

    def grammar(self):
        """The served scheme's decoding FSM (decode/grammar.py), built once
        on demand: Scheme-A vocabularies get the instrument-section
        grammar, B3 the control-token grammar."""
        if self._grammar_obj is None:
            from ..decode.grammar import grammar_a, grammar_b3

            if self.scheme == "b3":
                self._grammar_obj = grammar_b3(self.scheme_b)
            else:
                self._grammar_obj = grammar_a(self.generator.vocab)
        return self._grammar_obj

    def _solo_ragged(self, prompt_ids: list, temperature: float,
                     seed: int, top_p: float, min_p: float) -> list:
        """Bypassed-row decode. Default: the engine's OWN compiled
        programs on a private state (ContinuousBatcher.run_detached) —
        byte-identical to the engine row on ANY backend, all chunks
        dispatched back-to-back with one final fetch. fast_routing: the
        batch-1 one-shot ragged program (~70 ms faster on the tunnel;
        near-tie TPU divergence across routes — see __init__). Caller
        holds the single-permit solo gate."""
        if not self.fast_routing:
            out = self.batcher.run_detached(
                prompt_ids, temperature=temperature, seed=seed,
                top_p=top_p, min_p=min_p)
            self._engine_warm = True   # same compiled programs
            return out
        import numpy as np

        import jax
        import jax.numpy as jnp

        from ..decode.ragged import generate_kv_ragged

        from ..decode.api import _bucket

        b = self.batcher
        gen = self.generator
        if len(prompt_ids) >= b.max_len:
            return list(prompt_ids)       # zero steps (engine contract)
        width = min(_bucket(len(prompt_ids)), b.max_len)
        prompt = np.zeros((1, width), np.int32)
        prompt[0, :len(prompt_ids)] = prompt_ids
        buf, pos = generate_kv_ragged(
            gen.params, jnp.asarray(prompt),
            jnp.asarray([len(prompt_ids)], np.int32),
            jax.random.PRNGKey(int(seed))[None], gen.cfg, b.max_len,
            temperature=float(temperature), top_k=b.top_k,
            eos_id=gen.eos_id, pad_id=gen.pad_id, greedy=b.greedy,
            mask_value=b.mask_value, top_p=float(top_p),
            min_p=float(min_p))
        return np.asarray(buf)[0, :int(np.asarray(pos)[0])].tolist()

    def _decode_for_mapping(self, mapping: dict, temperature: float,
                            top_k: int, run_seed: int,
                            top_p: float = 1.0, min_p: float = 0.0,
                            penalties: tuple | None = None,
                            no_repeat_ngram: int = 0,
                            grammar: bool = False, lookup: bool = False,
                            medusa: bool = False, beams: int = 0,
                            length_penalty: float = 1.0):
        """mapping -> (gen_prompt, tokens, song, dropped): prompt assembly,
        compiled decode, detokenized MidiSong — shared by single-shot and
        multi-section generation.

        lookup=True decodes via draft-free prompt-lookup speculation
        (Generator.generate_ids_lookup): exact output distribution, lower
        batch-1 latency on self-repetitive streams. medusa=True decodes
        via the checkpoint's trained Medusa heads (Pipeline medusa_heads;
        Generator.generate_ids_medusa): exact output distribution, 1.4-1.5x
        lower batch-1 sampled latency (DESIGN.md §3.9). Both are solo
        decodes (the engine's ragged rows don't speculate) and incompatible
        with the history-dependent transforms (penalties/ngram/grammar)."""
        if (lookup or medusa) and (penalties is not None or no_repeat_ngram
                                   or grammar):
            raise ValueError(
                "lookup/medusa do not compose with penalties, n-gram bans "
                "or grammar constraints (history-dependent distributions "
                "break the proposal/target acceptance math)")
        if lookup and medusa:
            raise ValueError("lookup and medusa are mutually exclusive "
                             "speculation modes")
        if beams:
            # deterministic argmax-tree search (VERDICT r4 #8: exposed
            # over HTTP; solo decode — beams never ride the batchers).
            # Same composition rules as `cli generate --beams`:
            # penalties/ngram are sampling-path features; grammar and
            # the seed-independent determinism compose fine.
            if penalties is not None or no_repeat_ngram:
                raise ValueError(
                    "beams is a deterministic argmax-tree search; "
                    "penalties/n-gram transforms are sampling-path "
                    "features (grammar composes)")
            if lookup or medusa:
                raise ValueError("beams does not compose with the "
                                 "speculation modes (lookup/medusa)")
        if medusa and self.medusa_heads is None:
            raise ValueError(getattr(self, "medusa_unavailable", None) or (
                "this serving checkpoint ships no Medusa heads "
                "(train them with `cli train-medusa` and place "
                "medusa_heads.pkl next to the checkpoint)"))
        dropped = []
        gram = self.grammar() if grammar else None
        # the solo speculation modes share one call signature; bind the
        # heads here so both scheme paths stay single-branch
        spec_fn = None
        if lookup:
            spec_fn = self.generator.generate_ids_lookup
        elif medusa:
            from functools import partial

            spec_fn = partial(self.generator.generate_ids_medusa,
                              self.medusa_heads)
        if self.scheme == "b3":
            prompt_ids = self.scheme_b.control_prefix(mapping["bpm"],
                                                      mapping["key"])
            gen_prompt = self.scheme_b.vocab.decode(prompt_ids)
            if beams:
                ids = self.generator.generate_ids_beam(
                    prompt_ids, n_beams=beams,
                    length_penalty=length_penalty, grammar=gram)
            elif spec_fn is not None:
                ids = spec_fn(prompt_ids, temperature=temperature,
                              top_k=top_k, seed=run_seed, top_p=top_p,
                              min_p=min_p)[0]
            else:
                ids = self.generator.generate_ids(
                    prompt_ids, temperature=temperature, top_k=top_k,
                    seed=run_seed, use_cache=self.use_cache, top_p=top_p,
                    min_p=min_p, penalties=penalties,
                    no_repeat_ngram=no_repeat_ngram, grammar=gram)[0]
            tokens = self.scheme_b.vocab.decode(ids)
            song = self.scheme_b.decode_to_song(ids)
            return gen_prompt, tokens, song, dropped
        gen_prompt = assemble_prompt(self.generator.vocab, mapping,
                                     full_gm=self.full_gm)
        # data-dependent Scheme-A vocabularies may lack a control token
        # (e.g. an EATS key the corpus never contained). The reference
        # crashed with a KeyError (api_cache.py:162); we degrade
        # gracefully: drop the token and report it.
        known = [t for t in gen_prompt if t in self.generator.vocab]
        dropped = [t for t in gen_prompt if t not in self.generator.vocab]
        gen_prompt = known
        if beams:
            tokens = self.generator.sample_beam(
                gen_prompt, n_beams=beams, length_penalty=length_penalty,
                grammar=gram)
            return gen_prompt, tokens, tokens_to_song(tokens), dropped
        if spec_fn is not None:
            # medusa requests JOIN the continuous engine when it carries
            # the heads (per-row speculation, serve/continuous.py
            # medusa_chunk) — bit-identical to the solo medusa stream,
            # so concurrent medusa traffic keeps both wins (r3 VERDICT
            # #3). Lookup (and medusa without an engine) stays solo.
            from .continuous import ContinuousBatcher

            # No idle-bypass here: a medusa-capable engine serves
            # medusa=true rows through its own programs always — the
            # solo medusa program is a DIFFERENT compiled program, and
            # on TPU different programs flip near-tie argmaxes (§3.6;
            # the round-5 churn soak caught exactly this for plain
            # rows). In the default config (engine_medusa=False) medusa
            # requests never reach the engine and always decode solo.
            if medusa and isinstance(self.batcher, ContinuousBatcher) \
                    and self.batcher.accepts(top_k=top_k, top_p=top_p,
                                             min_p=min_p, medusa=True):
                ids = self.batcher.submit(
                    self.generator.vocab.encode(gen_prompt),
                    temperature=temperature, top_k=top_k, seed=run_seed,
                    top_p=top_p, min_p=min_p, medusa=True)
            else:
                ids = spec_fn(self.generator.vocab.encode(gen_prompt),
                              temperature=temperature, top_k=top_k,
                              seed=run_seed, top_p=top_p, min_p=min_p)[0]
            tokens = self.generator.trim_at_eos(ids)
            return gen_prompt, tokens, tokens_to_song(tokens), dropped
        use_batcher = self.batcher is not None and getattr(
            self.batcher, "accepts", lambda **_: True)(
                top_k=top_k, top_p=top_p, min_p=min_p,
                penalties=penalties, no_repeat_ngram=no_repeat_ngram,
                grammar=grammar)
        solo_bypass = False
        if (use_batcher and penalties is None and not no_repeat_ngram
                and not grammar
                and getattr(self.batcher, "idle", lambda: False)()):
            # adaptive routing (round 5): a lone request on an IDLE
            # continuous engine pays ~25 ms packed-harvest RPC per
            # 64-step chunk — measured 2-3x the one-shot compiled decode
            # for a ~500-token song. Serve it through the batch-1 RAGGED
            # program (the engine's exact math — rows bit-match it,
            # test_continuous) so the bytes are identical either way;
            # the single-permit gate sends concurrent followers to the
            # engine.
            solo_bypass = self._solo_gate.acquire(blocking=False)
        try:
            if solo_bypass:
                ids = self._solo_ragged(
                    self.generator.vocab.encode(gen_prompt),
                    temperature, run_seed, top_p, min_p)
                tokens = self.generator.trim_at_eos(ids)
            elif use_batcher:
                # continuous engines compile top_k/greedy (and, outside
                # per-row mode, top_p/min_p) engine-wide; a mismatching
                # request falls through to the solo decode below
                ids = self.batcher.submit(
                    self.generator.vocab.encode(gen_prompt),
                    temperature=temperature, top_k=top_k, seed=run_seed,
                    top_p=top_p, min_p=min_p, penalties=penalties,
                    no_repeat_ngram=no_repeat_ngram, grammar=grammar)
                self._engine_warm = True
                tokens = self.generator.trim_at_eos(ids)
            elif self.use_cache:
                tokens = self.generator.sample_kvcache(
                    gen_prompt, temperature=temperature, top_k=top_k,
                    seed=run_seed, top_p=top_p, min_p=min_p,
                    penalties=penalties, no_repeat_ngram=no_repeat_ngram,
                    grammar=gram)
            else:
                tokens = self.generator.sample(
                    gen_prompt, temperature=temperature, top_k=top_k,
                    seed=run_seed, top_p=top_p, min_p=min_p,
                    penalties=penalties, no_repeat_ngram=no_repeat_ngram,
                    grammar=gram)
        finally:
            if solo_bypass:
                self._solo_gate.release()
        return gen_prompt, tokens, tokens_to_song(tokens), dropped

    def generate(self, prompt_text: str, temperature: float = 1.0,
                 top_k: int = 50, seed: int | None = None,
                 render_audio: bool | None = None,
                 top_p: float = 1.0, min_p: float = 0.0,
                 penalties: tuple | None = None,
                 no_repeat_ngram: int = 0,
                 grammar: bool = False,
                 lookup: bool = False,
                 medusa: bool = False, beams: int = 0,
                 length_penalty: float = 1.0) -> GenerationResult:
        render = self.render_audio if render_audio is None else render_audio
        timings = {}

        t0 = time.perf_counter()
        label = self.classifier.predict(prompt_text)
        timings["classify"] = (time.perf_counter() - t0) * 1000

        t0 = time.perf_counter()
        mapping = get_music_params(label, seed=seed)
        timings["map_and_prompt"] = (time.perf_counter() - t0) * 1000

        t0 = time.perf_counter()
        run_seed = seed if seed is not None else \
            int(time.time_ns() % 2**31)
        gen_prompt, tokens, song, dropped = self._decode_for_mapping(
            mapping, temperature, top_k, run_seed, top_p, min_p,
            penalties, no_repeat_ngram, grammar, lookup, medusa,
            beams=beams, length_penalty=length_penalty)
        timings["decode"] = (time.perf_counter() - t0) * 1000

        t0 = time.perf_counter()
        midi_io = io.BytesIO()
        song.write(midi_io)
        timings["detokenize_midi"] = (time.perf_counter() - t0) * 1000

        wav_bytes = None
        if render:
            t0 = time.perf_counter()
            wav_io = io.BytesIO()
            # FluidSynth when the host has it (reference api_cache.py:234),
            # on-device additive synth otherwise
            render_to_wav_auto(song, wav_io, seed=seed or 0)
            wav_bytes = wav_io.getvalue()
            timings["render_wav"] = (time.perf_counter() - t0) * 1000

        return GenerationResult(label=label, mapping=mapping,
                                prompt_tokens=gen_prompt, tokens=tokens,
                                midi_bytes=midi_io.getvalue(),
                                wav_bytes=wav_bytes, timings_ms=timings,
                                dropped_tokens=dropped)

    def generate_sections(self, prompt_text: str, temperature: float = 1.0,
                          top_k: int = 50, seed: int | None = None,
                          render_audio: bool | None = None,
                          gap_s: float = 0.5,
                          top_p: float = 1.0,
                          min_p: float = 0.0,
                          penalties: tuple | None = None,
                          no_repeat_ngram: int = 0,
                          grammar: bool = False,
                          lookup: bool = False,
                          medusa: bool = False, beams: int = 0,
                          length_penalty: float = 1.0
                          ) -> GenerationResult:
        """Emotion-ADAPTIVE generation: each sentence of the prompt is
        classified separately (the reference's analyze_emotion_transitions,
        inference.py:83-94, which it marked 'not done yet' and never
        connected to generation) and drives its own conditioned section;
        sections are concatenated on the host time axis (note times are
        seconds, so per-section BPM lives in the generated timings).
        Single-sentence prompts fall back to :meth:`generate`."""
        from ..emotion import segment_text
        from ..midi.smf import MidiSong

        segments = segment_text(prompt_text)
        if len(segments) <= 1:
            return self.generate(prompt_text, temperature=temperature,
                                 top_k=top_k, seed=seed,
                                 render_audio=render_audio, top_p=top_p,
                                 min_p=min_p, penalties=penalties,
                                 no_repeat_ngram=no_repeat_ngram,
                                 grammar=grammar, lookup=lookup,
                                 medusa=medusa, beams=beams,
                                 length_penalty=length_penalty)
        render = self.render_audio if render_audio is None else render_audio
        timings = {}
        t_all = time.perf_counter()

        labels, mappings, all_tokens, all_prompts, dropped = \
            [], [], [], [], []
        merged = MidiSong()
        by_track: dict = {}
        offset = 0.0
        for i, seg in enumerate(segments):
            label = self.classifier.predict(seg)
            mapping = get_music_params(
                label, seed=None if seed is None else seed + i)
            run_seed = (seed + i) if seed is not None else \
                int(time.time_ns() % 2**31)
            gp, tokens, song, drop = self._decode_for_mapping(
                mapping, temperature, top_k, run_seed, top_p, min_p,
                penalties, no_repeat_ngram, grammar, lookup, medusa,
                beams=beams, length_penalty=length_penalty)
            labels.append(label)
            mappings.append(mapping)
            all_tokens.extend(tokens)
            all_prompts.extend(gp)
            dropped.extend(drop)
            _merge_song(merged, by_track, song, offset)
            offset = merged.get_end_time() + gap_s
        timings["classify_map_decode_all"] = \
            (time.perf_counter() - t_all) * 1000

        t0 = time.perf_counter()
        midi_io = io.BytesIO()
        merged.write(midi_io)
        timings["detokenize_midi"] = (time.perf_counter() - t0) * 1000
        wav_bytes = None
        if render:
            t0 = time.perf_counter()
            wav_io = io.BytesIO()
            render_to_wav_auto(merged, wav_io, seed=seed or 0)
            wav_bytes = wav_io.getvalue()
            timings["render_wav"] = (time.perf_counter() - t0) * 1000
        return GenerationResult(
            label=" / ".join(labels),
            mapping={"sections": [
                {"text": s, "label": l, **m}
                for s, l, m in zip(segments, labels, mappings)]},
            prompt_tokens=all_prompts, tokens=all_tokens,
            midi_bytes=midi_io.getvalue(), wav_bytes=wav_bytes,
            timings_ms=timings, dropped_tokens=dropped)

    # ------------------------------------------------------------ streaming

    def _stream_deltas(self, prompt_ids: list[int], temperature: float,
                       top_k: int, run_seed: int, chunk: int = 32,
                       top_p: float = 1.0, min_p: float = 0.0,
                       penalties: tuple | None = None,
                       no_repeat_ngram: int = 0, grammar: bool = False,
                       medusa: bool = False):
        """Yield lists of newly generated token ids: through the continuous
        engine when one is running and accepts the sampling params (the row
        joins the shared RUNNING decode), else a solo chunked stream
        (decode/stream.py), or the medusa chunked stream when asked
        (decode/medusa.py: accepted tokens arrive per verify-block chunk,
        bit-identical to the one-shot medusa program)."""
        from .continuous import ContinuousBatcher

        gen = self.generator
        if medusa:
            if penalties is not None or no_repeat_ngram or grammar:
                raise ValueError(
                    "medusa does not compose with penalties, n-gram bans "
                    "or grammar constraints (history-dependent "
                    "distributions break the acceptance math)")
            if self.medusa_heads is None:
                raise ValueError(getattr(self, "medusa_unavailable", None)
                                 or "this serving checkpoint ships no "
                                    "Medusa heads")
            # engine-borne medusa stream (r4): per-row speculation inside
            # the shared decode, deltas bit-identical to the solo medusa
            # stream below
            if isinstance(self.batcher, ContinuousBatcher) \
                    and self.batcher.accepts(top_k=top_k, top_p=top_p,
                                             min_p=min_p, medusa=True):
                yield from self.batcher.submit_stream(
                    prompt_ids, temperature=temperature, seed=run_seed,
                    top_k=top_k, top_p=top_p, min_p=min_p, medusa=True)
                return
            from ..decode.medusa import stream_tokens_medusa

            delta = []
            for tok in stream_tokens_medusa(
                    gen.params, self.medusa_heads, gen.cfg,
                    list(prompt_ids), gen.max_supported_len(),
                    temperature=temperature, top_k=top_k,
                    eos_id=gen.eos_id, pad_id=gen.pad_id, seed=run_seed,
                    top_p=top_p, min_p=min_p):
                delta.append(tok)
                if len(delta) >= chunk:
                    yield delta
                    delta = []
            if delta:
                yield delta
            return
        if isinstance(self.batcher, ContinuousBatcher) \
                and self.batcher.accepts(top_k=top_k, top_p=top_p,
                                         min_p=min_p, penalties=penalties,
                                         no_repeat_ngram=no_repeat_ngram,
                                         grammar=grammar):
            yield from self.batcher.submit_stream(
                prompt_ids, temperature=temperature, seed=run_seed,
                top_k=top_k, top_p=top_p, min_p=min_p,
                penalties=penalties, no_repeat_ngram=no_repeat_ngram,
                grammar=grammar)
            return
        from ..decode.stream import stream_tokens

        delta = []
        for tok in stream_tokens(gen.params, gen.cfg, list(prompt_ids),
                                 gen.max_supported_len(), chunk=chunk,
                                 temperature=temperature, top_k=top_k,
                                 eos_id=gen.eos_id, pad_id=gen.pad_id,
                                 seed=run_seed, top_p=top_p, min_p=min_p,
                                 penalties=penalties,
                                 no_repeat_ngram=no_repeat_ngram,
                                 grammar=self.grammar() if grammar
                                 else None):
            delta.append(tok)
            if len(delta) >= chunk:
                yield delta
                delta = []
        if delta:
            yield delta

    def generate_stream(self, prompt_text: str, temperature: float = 1.0,
                        top_k: int = 50, seed: int | None = None,
                        render_audio: bool | None = None,
                        sections: bool = False, chunk: int = 32,
                        gap_s: float = 0.5, top_p: float = 1.0,
                        min_p: float = 0.0,
                        penalties: tuple | None = None,
                        no_repeat_ngram: int = 0, grammar: bool = False,
                        medusa: bool = False):
        """Incremental twin of :meth:`generate` / :meth:`generate_sections`:
        a Python generator of JSON-able event dicts for SSE serving.

        Events, in order: ``{"event": "meta"}`` once per section (emotion
        label + EATS mapping, before any decode — the client shows the
        classification while tokens stream), ``{"event": "tokens"}`` deltas
        as compiled chunks complete, and a final ``{"event": "done"}``
        carrying the full MIDI (and WAV when rendering) as base64. The
        reference returned nothing until the whole WAV was rendered
        (api_cache.py:186-241); here first tokens reach the client within
        one compiled chunk."""
        import base64

        from ..emotion import segment_text
        from ..midi.smf import MidiSong

        render = self.render_audio if render_audio is None else render_audio
        segments = segment_text(prompt_text) if sections else [prompt_text]
        if not segments:
            segments = [prompt_text]
        timings: dict = {}
        t_all = time.perf_counter()
        merged = MidiSong()
        by_track: dict = {}
        offset = 0.0
        labels, all_tokens, all_prompts, dropped_all = [], [], [], []
        eos = self.generator.eos_id
        for i, seg in enumerate(segments):
            t0 = time.perf_counter()
            label = self.classifier.predict(seg)
            timings["classify"] = (timings.get("classify", 0.0)
                                   + (time.perf_counter() - t0) * 1000)
            mapping = get_music_params(
                label, seed=None if seed is None else seed + i)
            run_seed = (seed + i) if seed is not None else \
                int(time.time_ns() % 2**31)
            dropped = []
            if self.scheme == "b3":
                prompt_ids = self.scheme_b.control_prefix(mapping["bpm"],
                                                          mapping["key"])
                gen_prompt = self.scheme_b.vocab.decode(prompt_ids)
                id2tok = self.scheme_b.vocab.id2tok
            else:
                gp = assemble_prompt(self.generator.vocab, mapping,
                                     full_gm=self.full_gm)
                gen_prompt = [t for t in gp if t in self.generator.vocab]
                dropped = [t for t in gp if t not in self.generator.vocab]
                prompt_ids = self.generator.vocab.encode(gen_prompt)
                id2tok = self.generator.vocab.id2tok
            labels.append(label)
            all_prompts.extend(gen_prompt)
            dropped_all.extend(dropped)
            yield {"event": "meta", "section": i,
                   "n_sections": len(segments), "text": seg, "label": label,
                   "mapping": mapping, "prompt_tokens": gen_prompt,
                   "dropped_tokens": dropped}
            ids = list(prompt_ids)
            t0 = time.perf_counter()
            hit_eos = False
            deltas = self._stream_deltas(prompt_ids, temperature, top_k,
                                         run_seed, chunk=chunk,
                                         top_p=top_p, min_p=min_p,
                                         penalties=penalties,
                                         no_repeat_ngram=no_repeat_ngram,
                                         grammar=grammar, medusa=medusa)
            try:
                for delta in deltas:
                    out = []
                    for t in delta:
                        out.append(int(t))
                        if int(t) == eos:
                            hit_eos = True
                            break
                    if not out:
                        continue
                    ids.extend(out)
                    yield {"event": "tokens", "section": i, "ids": out,
                           "texts": [id2tok[t] for t in out],
                           "n_generated": len(ids) - len(prompt_ids)}
                    if hit_eos:
                        break
            finally:
                # explicit: a consumer closing THIS generator (SSE client
                # disconnect) must deterministically reach the engine's
                # submit_stream so the row's slot is cancelled, not left
                # to decode to completion on GC timing
                deltas.close()
            timings["decode"] = (timings.get("decode", 0.0)
                                 + (time.perf_counter() - t0) * 1000)
            if self.scheme == "b3":
                tokens = self.scheme_b.vocab.decode(ids)
                song = self.scheme_b.decode_to_song(ids)
            else:
                tokens = [id2tok[t] for t in ids]
                song = tokens_to_song(tokens)
            all_tokens.extend(tokens)
            _merge_song(merged, by_track, song, offset)
            offset = merged.get_end_time() + gap_s

        t0 = time.perf_counter()
        midi_io = io.BytesIO()
        merged.write(midi_io)
        timings["detokenize_midi"] = (time.perf_counter() - t0) * 1000
        wav_b64 = None
        if render:
            t0 = time.perf_counter()
            wav_io = io.BytesIO()
            render_to_wav_auto(merged, wav_io, seed=seed or 0)
            wav_b64 = base64.b64encode(wav_io.getvalue()).decode()
            timings["render_wav"] = (time.perf_counter() - t0) * 1000
        timings["total"] = (time.perf_counter() - t_all) * 1000
        yield {"event": "done", "label": " / ".join(labels),
               "n_tokens": len(all_tokens),
               "timings_ms": {k: round(v, 1) for k, v in timings.items()},
               "midi_b64": base64.b64encode(midi_io.getvalue()).decode(),
               "wav_b64": wav_b64, "dropped_tokens": dropped_all}


def pipeline_from_checkpoint(path: str, full_gm: bool = False,
                             coalesce=False,
                             classifier: EmotionClassifier | None = None,
                             coalesce_opts: dict | None = None,
                             engine_medusa: bool = False,
                             fast_routing: bool = False) -> Pipeline:
    """Build a serving pipeline from ANY checkpoint directory: the token
    scheme is inferred from the stored vocabulary (checkpoints carry
    {params, vocab, cfg} but no scheme tag — reference layout,
    train/train_large2.py:100-110), so Scheme-A text-token models and
    Scheme-B3 control-token models both serve through POST /generate."""
    import os

    from ..tokenizer import SchemeB3, Vocab, detect_scheme
    from ..utils.orbax_io import load_any_checkpoint

    ckpt = load_any_checkpoint(path)
    vocab = Vocab(ckpt["vocab"])
    scheme = detect_scheme(vocab)
    if coalesce == "continuous":
        # production default: 128-step chunks. Measured on the v5e
        # (round 5, GQA-2 flagship, 8 staggered requests): 7,769 tok/s
        # aggregate at chunk=64 -> 9,391 at chunk=128 — halving the
        # ~25 ms packed-harvest RPCs per song outweighs the longer
        # worst-case join wait (~1 chunk). Operators override with
        # serve --chunk; the engine-class default stays 64 (join-latency
        # -sensitive embedders, CPU test rigs).
        coalesce_opts = {"chunk": 128, **(coalesce_opts or {})}
    if scheme in ("b1", "b2"):
        raise ValueError(
            f"Scheme-{scheme.upper()} checkpoints have no control tokens "
            "to condition on; serve a b3 (train_no_inst) or Scheme-A "
            "checkpoint")
    # Medusa heads auto-discover: a medusa_heads.pkl next to the
    # checkpoint (written by `cli train-medusa --out <dir>/medusa_heads
    # .pkl`) enables the medusa=true request option; absent = rejected.
    # Mismatches fail HERE at startup with the real cause, not as a 500
    # inside the first medusa request's jitted einsum.
    heads = None
    medusa_unavailable = None
    medusa_probe = None
    heads_path = os.path.join(path, "medusa_heads.pkl")
    if os.path.isfile(heads_path):
        if not ckpt["cfg"].causal:
            medusa_unavailable = (
                "this checkpoint ships Medusa heads but has the reference "
                "bidirectional/pos quirks; medusa requires a corrected "
                "causal checkpoint (train --corrected)")
        else:
            from ..tools.medusa import (PROBE_WIN_THRESHOLD,
                                        load_medusa_heads,
                                        probe_heads_for_checkpoint)

            heads = load_medusa_heads(heads_path)
            D = ckpt["cfg"].d_model
            w0 = heads["blocks"][0]["w"]
            if tuple(w0.shape) != (D, D):
                medusa_unavailable = (
                    f"the shipped medusa_heads.pkl was trained for "
                    f"d_model={w0.shape[0]}, this checkpoint is "
                    f"d_model={D}; retrain with `cli train-medusa`")
                heads = None
            else:
                # Admission sanity probe (VERDICT r4 #5): acceptance is
                # a property of the serving corpus (DESIGN §3.9) — a
                # teacher-forced base-top-1 probe predicts tok/verify
                # at head-train time (stored in the pkl) or, for older
                # pickles, from one forward over scheme-matched rows
                # here. medusa=true stays honored (it is bit-exact and
                # opt-in), but a losing artifact warns loudly and the
                # probe rides /stats so operators see WHY.
                medusa_probe = heads.get("probe")
                if medusa_probe is None:
                    medusa_probe = probe_heads_for_checkpoint(ckpt, heads)
                if not medusa_probe.get("likely_win", True):
                    print(
                        "[serve] medusa probe: predicted "
                        f"{medusa_probe['tok_per_verify_est']} tok/verify "
                        f"< {PROBE_WIN_THRESHOLD} admission threshold "
                        f"(base top-1 {medusa_probe['base_top1']}) — "
                        "medusa=true will likely LOSE throughput on this "
                        "checkpoint; plain decode recommended")
    if medusa_unavailable:
        print(f"[serve] medusa disabled: {medusa_unavailable}")
    if scheme == "b3":
        gen = Generator(ckpt["params"], ckpt["cfg"], vocab,
                        eos_token="[END_SEQ]")
        pipe = Pipeline(gen, classifier, scheme="b3",
                        scheme_b=SchemeB3(seq_len=ckpt["cfg"].seq_len),
                        coalesce=coalesce, coalesce_opts=coalesce_opts,
                        medusa_heads=heads,
                        engine_medusa=engine_medusa,
                        fast_routing=fast_routing)
    else:
        gen = Generator(ckpt["params"], ckpt["cfg"], vocab)
        pipe = Pipeline(gen, classifier, full_gm=full_gm, coalesce=coalesce,
                        coalesce_opts=coalesce_opts, medusa_heads=heads,
                        engine_medusa=engine_medusa,
                        fast_routing=fast_routing)
    pipe.medusa_unavailable = medusa_unavailable
    pipe.medusa_probe = medusa_probe
    return pipe


def packaged_demo_checkpoints() -> dict:
    """{scheme: path} for the in-repo trained demo checkpoints
    (serve/demo_ckpt_a, serve/demo_ckpt_b3). The reference's
    demo_checkpoint.pt was gitignored — a fresh clone could not serve at
    all; here compact trained models ship for BOTH product paths."""
    import os

    base = os.path.dirname(__file__)
    out = {}
    for scheme in ("a", "b3"):
        d = os.path.join(base, f"demo_ckpt_{scheme}")
        if os.path.isdir(d) and os.listdir(d):
            out[scheme] = d
    return out


def packaged_demo_checkpoint() -> str:
    """Default demo: the reference-faithful Scheme-A model when shipped,
    else the B3 control-token model, else ''."""
    demos = packaged_demo_checkpoints()
    return demos.get("a") or demos.get("b3") or ""


def demo_pipeline(seq_len: int = 128, d_model: int = 128, n_head: int = 4,
                  n_layer: int = 2, seed: int = 0, corrected: bool = False,
                  coalesce: bool = False,
                  coalesce_opts: dict | None = None,
                  fast_routing: bool = False) -> Pipeline:
    """Self-contained pipeline with a randomly-initialized Scheme-A model
    over a synthetic-corpus vocabulary — runs end-to-end with no trained
    checkpoint (the reference cannot start without its gitignored .pt).

    corrected=True builds the causal (non-reference-quirk) architecture —
    required for request coalescing and speculative decoding."""
    import jax

    from ..models import GPTConfig, init_params
    from ..tokenizer import Vocab
    from ..train.data import synthetic_corpus
    import json

    corpus = [json.loads(js) for js in synthetic_corpus(64, seed=seed)]
    vocab = Vocab.from_sequences(corpus, pad_last=False)
    cfg = GPTConfig(vocab_size=len(vocab), seq_len=seq_len, d_model=d_model,
                    n_head=n_head, n_layer=n_layer, pos_rows=seq_len,
                    causal=corrected)
    params = init_params(jax.random.PRNGKey(seed), cfg)
    gen = Generator(params, cfg, vocab)
    return Pipeline(gen, EmotionClassifier(),  # auto: neural when shipped
                    coalesce=coalesce, coalesce_opts=coalesce_opts,
                    fast_routing=fast_routing)


def demo_pipeline_b3(seq_len: int = 96, d_model: int = 64, n_head: int = 4,
                     n_layer: int = 2, seed: int = 0) -> Pipeline:
    """Scheme-B3 demo pipeline (compact 8,579-token control vocabulary)."""
    import jax

    from ..models import GPTConfig, init_params
    from ..tokenizer import SchemeB3

    b3 = SchemeB3(seq_len=seq_len)
    cfg = GPTConfig(vocab_size=len(b3.vocab), seq_len=seq_len,
                    d_model=d_model, n_head=n_head, n_layer=n_layer,
                    pos_rows=seq_len, causal=True)
    params = init_params(jax.random.PRNGKey(seed), cfg)
    gen = Generator(params, cfg, b3.vocab, eos_token="[END_SEQ]")
    return Pipeline(gen, EmotionClassifier(), scheme="b3",
                    scheme_b=b3)

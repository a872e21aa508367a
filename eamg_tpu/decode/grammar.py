"""Grammar-constrained decoding: an FSM over the music token grammar.

Every EAMG token scheme has a rigid surface grammar — Scheme B2 streams
are ``[START_SEQ] ([NOTE] P_x T_y DUR_z)* [END_SEQ]``
(train/train_large2.py:48-65), B3 inserts optional ``BPM_x KEY_y`` controls
right after START (train/train_no_inst.py:54-79), and Scheme A's detokenizer
silently DROPS notes emitted before any ``[INSTRUMENT]`` and any token that
doesn't parse (reference api_cache.py:208-221). An unconstrained sampler can
and does violate that grammar (a ``P_60`` after ``T_12``, a note before an
instrument), wasting generation budget on tokens the detokenizer throws
away.

This module enforces the grammar *on device*, inside the compiled decode
loops, as a deterministic finite automaton:

- ``tclass``   [V]    — token id -> grammar class (PITCH, TIME, NOTE, ...)
- ``allowed``  [S, C] — which classes each state admits
- ``next``     [S, C] — state transition on emitting a class
- ``need_next`` [S, C] / ``steps`` [S] / ``closing`` [S, C] — the
  *budget-aware closing* tables: a class is admitted only while the
  shortest completion after emitting it (``1 + need_next``) still fits
  the remaining token budget, so streams never enter a note they cannot
  finish and always close with ``[END_SEQ]`` in-budget.

Per decode step the mask is one tiny [B,C]x[C,V] matmul (MXU-friendly; a
``take``-style vocab-broadcast gather hits this backend's scalar core for
~25 ms, measured — see ragged.py) and the state update is two scalar-shaped
gathers. Prompt states are recovered with a log-depth ``associative_scan``
over transition maps instead of a length-P sequential scan.

TPU-first beyond-reference capability: the reference sampler is plain
top-k (api_cache.py:171-177) with no validity guarantee. Grammar mode is
opt-in; off is bit-exact reference parity.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

import jax
import jax.numpy as jnp

# Replacement (not additive) mask constant: grammar must dominate every
# other logit transform (the n-gram ban adds -1e10 to banned tokens; a
# grammar-forced token that is also n-gram-banned must still win).
GRAMMAR_MASK = -1e30


@dataclass(frozen=True)
class Grammar:
    """Host-side FSM tables. Build with :func:`grammar_for` (or the
    per-scheme builders); ship to device with :meth:`arrays`."""

    tclass: np.ndarray        # [V] int32: token id -> class index
    allowed: np.ndarray       # [S, C] bool
    next_state: np.ndarray    # [S, C] int32 (total: disallowed -> stay)
    closing: np.ndarray       # [S, C] bool: shortest path to DONE
    steps_to_close: np.ndarray  # [S] int32: tokens needed to reach DONE
    init_state: int
    classes: tuple[str, ...]
    states: tuple[str, ...]

    @property
    def n_states(self) -> int:
        return len(self.states)

    @property
    def n_classes(self) -> int:
        return len(self.classes)

    def arrays(self) -> dict:
        """Device pytree (traced operands — one compiled program serves
        every grammar with the same (V, C, S) shape)."""
        C = self.n_classes
        onehot = (self.tclass[None, :] == np.arange(C)[:, None])
        # need_next[s, c] = tokens required to reach DONE *after* emitting
        # class c from state s — the budget check is lookahead-exact:
        # admit c iff 1 + need_next fits the remaining budget (checking
        # only the CURRENT state's distance would let a row step into a
        # note it can no longer finish).
        need_next = self.steps_to_close[self.next_state]
        return {
            "tclass": jnp.asarray(self.tclass, jnp.int32),
            "onehot": jnp.asarray(onehot, jnp.float32),       # [C, V]
            "allowed": jnp.asarray(self.allowed, jnp.float32),
            "closing": jnp.asarray(self.closing, jnp.float32),
            "need_next": jnp.asarray(need_next, jnp.int32),   # [S, C]
            "steps": jnp.asarray(self.steps_to_close, jnp.int32),
            "next": jnp.asarray(self.next_state, jnp.int32),
            "init": jnp.asarray(self.init_state, jnp.int32),
        }

    def placeholder() -> dict:  # noqa: N805 — staticmethod-style helper
        """1-element dummy pytree for compiled paths with grammar off (the
        jit signature keeps one pytree structure; the static ``use_grammar``
        bit compiles the contents out)."""
        z = jnp.zeros((1,), jnp.float32)
        zi = jnp.zeros((1,), jnp.int32)
        return {"tclass": zi, "onehot": z[None], "allowed": z[None],
                "closing": z[None], "need_next": zi[None], "steps": zi,
                "next": zi[None], "init": jnp.asarray(0, jnp.int32)}

    # -- host-side validation (tests / metrics) ---------------------------

    def violations(self, ids) -> int:
        """Count invalid transitions in a token-id stream (host numpy)."""
        s = self.init_state
        bad = 0
        for i in ids:
            c = int(self.tclass[int(i)])
            if not self.allowed[s, c]:
                bad += 1
            s = int(self.next_state[s, c])
        return bad


placeholder = Grammar.placeholder


def _build(classes: list[str], states: list[str], rules: dict,
           closing_rules: dict, tclass: np.ndarray, init: str) -> Grammar:
    """rules / closing_rules: state -> {class: next_state}. ``next`` is made
    total by keeping disallowed transitions in place (prompt scans recover
    gracefully from malformed prompts)."""
    S, C = len(states), len(classes)
    sidx = {s: i for i, s in enumerate(states)}
    cidx = {c: i for i, c in enumerate(classes)}
    allowed = np.zeros((S, C), bool)
    closing = np.zeros((S, C), bool)
    nxt = np.tile(np.arange(S, dtype=np.int32)[:, None], (1, C))
    for st, edges in rules.items():
        for cl, to in edges.items():
            allowed[sidx[st], cidx[cl]] = True
            nxt[sidx[st], cidx[cl]] = sidx[to]
    for st, edges in closing_rules.items():
        for cl in edges:
            closing[sidx[st], cidx[cl]] = True
    # steps_to_close[s] = BFS distance to DONE along closing edges
    steps = np.full((S,), 10 ** 6, np.int64)
    steps[sidx["DONE"]] = 0
    for _ in range(S):
        for st, edges in closing_rules.items():
            for cl in edges:
                to = nxt[sidx[st], cidx[cl]]
                steps[sidx[st]] = min(steps[sidx[st]], steps[to] + 1)
    assert steps.max() < 10 ** 6, "closing path must reach DONE everywhere"
    return Grammar(tclass=tclass, allowed=allowed, next_state=nxt,
                   closing=closing, steps_to_close=steps.astype(np.int32),
                   init_state=sidx[init], classes=tuple(classes),
                   states=tuple(states))


def _classify(id2tok: dict, n: int, prefixes: list[tuple[str, str]],
              other: str, classes: list[str]) -> np.ndarray:
    cidx = {c: i for i, c in enumerate(classes)}
    out = np.full((n,), cidx[other], np.int32)
    for i in range(n):
        tok = id2tok.get(i, "")
        for pre, cl in prefixes:
            if tok == pre or tok.startswith(pre + " ") or (
                    pre.endswith("_") and tok.startswith(pre)):
                out[i] = cidx[cl]
                break
    return out


def grammar_b2(scheme) -> Grammar:
    """SchemeB2: [START_SEQ] ([NOTE] P T DUR)* [END_SEQ], then PAD."""
    classes = ["OTHER", "PAD", "START", "END", "NOTE", "PITCH", "TIME",
               "DUR"]
    tclass = _classify(
        scheme.vocab.id2tok, len(scheme.vocab),
        [("[PAD]", "PAD"), ("[START_SEQ]", "START"), ("[END_SEQ]", "END"),
         ("[NOTE]", "NOTE"), ("P_", "PITCH"), ("T_", "TIME"),
         ("DUR_", "DUR")], "OTHER", classes)
    states = ["INIT", "EVENT", "P", "T", "D", "DONE"]
    rules = {
        "INIT": {"START": "EVENT"},
        "EVENT": {"NOTE": "P", "END": "DONE"},
        "P": {"PITCH": "T"},
        "T": {"TIME": "D"},
        "D": {"DUR": "EVENT"},
        "DONE": {"PAD": "DONE"},
    }
    closing = {
        "INIT": {"START"}, "EVENT": {"END"}, "P": {"PITCH"},
        "T": {"TIME"}, "D": {"DUR"}, "DONE": {"PAD"},
    }
    return _build(classes, states, rules, closing, tclass, "INIT")


def grammar_b3(scheme) -> Grammar:
    """SchemeB3: B2 + optional BPM then KEY controls right after START
    (train/train_no_inst.py:54-79 insertion order: BPM before KEY)."""
    classes = ["OTHER", "PAD", "START", "END", "NOTE", "PITCH", "TIME",
               "DUR", "BPM", "KEY"]
    tclass = _classify(
        scheme.vocab.id2tok, len(scheme.vocab),
        [("[PAD]", "PAD"), ("[START_SEQ]", "START"), ("[END_SEQ]", "END"),
         ("[NOTE]", "NOTE"), ("P_", "PITCH"), ("T_", "TIME"),
         ("DUR_", "DUR"), ("BPM_", "BPM"), ("KEY_", "KEY")],
        "OTHER", classes)
    states = ["INIT", "CTRL", "CTRL_K", "EVENT", "P", "T", "D", "DONE"]
    rules = {
        "INIT": {"START": "CTRL"},
        # after START: optional BPM, then optional KEY, then events
        "CTRL": {"BPM": "CTRL_K", "KEY": "EVENT", "NOTE": "P",
                 "END": "DONE"},
        "CTRL_K": {"KEY": "EVENT", "NOTE": "P", "END": "DONE"},
        "EVENT": {"NOTE": "P", "END": "DONE"},
        "P": {"PITCH": "T"},
        "T": {"TIME": "D"},
        "D": {"DUR": "EVENT"},
        "DONE": {"PAD": "DONE"},
    }
    closing = {
        "INIT": {"START"}, "CTRL": {"END"}, "CTRL_K": {"END"},
        "EVENT": {"END"}, "P": {"PITCH"}, "T": {"TIME"}, "D": {"DUR"},
        "DONE": {"PAD"},
    }
    return _build(classes, states, rules, closing, tclass, "INIT")


def grammar_a(vocab) -> Grammar:
    """Scheme A (string-token vocab): [START_SEQUENCE], optional [BPM] /
    [KEY_SIGNATURE], then instrument sections — a note is only kept by the
    reference detokenizer once an [INSTRUMENT] is open (api_cache.py:216
    drops notes before any instrument), so the grammar requires one."""
    classes = ["OTHER", "PAD", "START", "END", "BPM", "KEY", "INST",
               "NOTE"]
    tclass = _classify(
        vocab.id2tok, len(vocab),
        [("[PAD]", "PAD"), ("[START_SEQUENCE]", "START"),
         ("[END_SEQUENCE]", "END"), ("[BPM]", "BPM"),
         ("[KEY_SIGNATURE]", "KEY"), ("[INSTRUMENT]", "INST"),
         ("[NOTE]", "NOTE")], "OTHER", classes)
    states = ["INIT", "HDR", "HDR_K", "BODY", "SECT", "DONE"]
    rules = {
        "INIT": {"START": "HDR"},
        "HDR": {"BPM": "HDR_K", "KEY": "BODY", "INST": "SECT",
                "END": "DONE"},
        "HDR_K": {"KEY": "BODY", "INST": "SECT", "END": "DONE"},
        "BODY": {"INST": "SECT", "END": "DONE"},
        "SECT": {"NOTE": "SECT", "INST": "SECT", "END": "DONE"},
        "DONE": {"PAD": "DONE"},
    }
    closing = {
        "INIT": {"START"}, "HDR": {"END"}, "HDR_K": {"END"},
        "BODY": {"END"}, "SECT": {"END"}, "DONE": {"PAD"},
    }
    g = _build(classes, states, rules, closing, tclass, "INIT")
    # A data-dependent Scheme-A vocab may lack a literal [PAD]; DONE must
    # still admit something, so fall back to self-looping on END.
    if not (g.tclass == g.classes.index("PAD")).any():
        sidx, cidx = g.states.index("DONE"), g.classes.index("END")
        g.allowed[sidx, cidx] = True
        g.closing[sidx, cidx] = True
        g.next_state[sidx, cidx] = sidx
    return g


def grammar_for(scheme_or_vocab) -> Grammar:
    """Dispatch on the tokenizer scheme (SchemeB2/SchemeB3 instance) or a
    Scheme-A Vocab."""
    name = type(scheme_or_vocab).__name__
    if name == "SchemeB3":
        return grammar_b3(scheme_or_vocab)
    if name == "SchemeB2":
        return grammar_b2(scheme_or_vocab)
    if hasattr(scheme_or_vocab, "vocab"):      # other scheme objects
        return grammar_a(scheme_or_vocab.vocab)
    return grammar_a(scheme_or_vocab)


# ---------------------------------------------------------------- device


def grammar_mask(logits: jax.Array, gstate: jax.Array, g: dict,
                 budget_left=None, row_on: jax.Array | None = None
                 ) -> jax.Array:
    """[B, V] logits + [B] states -> grammar-masked logits (replacement
    semantics at GRAMMAR_MASK, so the mask dominates additive transforms
    like the n-gram ban). ``budget_left`` ([B] or scalar) applies the
    lookahead-exact budget rule (see inline comment) so a row never
    enters a note it cannot finish within budget. ``row_on`` ([B] bool)
    gates per row; off rows are bit-exact no-ops."""
    allowed = jnp.take(g["allowed"], gstate, axis=0)        # [B, C]
    if budget_left is not None:
        # Lookahead-exact budget rule: class c stays admitted iff the
        # shortest completion AFTER emitting it (1 + need_next[s, c])
        # still fits — checking only the CURRENT state's distance would
        # let a row step into a note it can no longer finish. Exact-fit
        # closings are forced automatically (the min-need edge always
        # fits while budget >= steps[s]). Rows whose budget is already
        # unreachable (a long prompt left need > budget) fall back to
        # the shortest closing path, best effort.
        need_next = jnp.take(g["need_next"], gstate, axis=0)  # [B, C]
        budget = jnp.broadcast_to(jnp.asarray(budget_left, jnp.int32),
                                  gstate.shape)
        fits = (need_next + 1) <= budget[:, None]
        fitted = jnp.where(fits, allowed, 0.0)
        closing = jnp.take(g["closing"], gstate, axis=0)
        any_fit = fitted.sum(axis=-1, keepdims=True) > 0.5
        allowed = jnp.where(any_fit, fitted, closing)
    ok = (allowed @ g["onehot"]) > 0.5                      # [B, V] matmul
    if row_on is not None:
        ok = ok | ~row_on[:, None]
    return jnp.where(ok, logits, GRAMMAR_MASK)


def grammar_step(gstate: jax.Array, token: jax.Array, g: dict,
                 active: jax.Array | None = None) -> jax.Array:
    """Advance [B] states by the emitted [B] tokens (inactive rows hold)."""
    cls = jnp.take(g["tclass"], token.astype(jnp.int32))
    C = g["next"].shape[1]
    nxt = jnp.take(g["next"].reshape(-1), gstate * C + cls)
    if active is not None:
        nxt = jnp.where(active, nxt, gstate)
    return nxt


def scan_prompt_state(g: dict, prompt: jax.Array, plen) -> jax.Array:
    """[B, P] prompt ids + per-row lengths -> [B] FSM states after the
    prompt. Log-depth: each token is a state map [S]; pad positions are the
    identity map; ``associative_scan`` composes maps along the sequence."""
    B, P = prompt.shape
    plen = jnp.broadcast_to(jnp.asarray(plen, jnp.int32), (B,))
    S = g["next"].shape[0]
    cls = jnp.take(g["tclass"], prompt)                     # [B, P]
    maps = jnp.take(g["next"], cls, axis=1)                 # [S, B, P]
    maps = jnp.transpose(maps, (1, 2, 0))                   # [B, P, S]
    ident = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32), (B, P, S))
    maps = jnp.where((jnp.arange(P)[None, :] < plen[:, None])[..., None],
                     maps, ident)

    def compose(a, b):       # b after a: out[s] = b[a[s]]
        return jnp.take_along_axis(b, a, axis=-1)

    final = jax.lax.associative_scan(compose, maps, axis=1)[:, -1]  # [B, S]
    init = jnp.broadcast_to(g["init"].astype(jnp.int32), (B, 1))
    return jnp.take_along_axis(final, init, axis=1)[:, 0]

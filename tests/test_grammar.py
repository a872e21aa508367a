"""Grammar-constrained decoding (decode/grammar.py): FSM tables per token
scheme, the on-device mask/step/prompt-scan, budget-aware closing, and the
threading through every decode path (KV loop, uncached loop, ragged batch,
chunked stream, continuous engine, serve pipeline). Beyond-reference
capability — the reference sampler is plain top-k with no validity
guarantee (api_cache.py:171-177), and its detokenizer silently DROPS
malformed/misplaced tokens (api_cache.py:208-221)."""

import numpy as np

import jax
import jax.numpy as jnp

from eamg_tpu.decode import Generator, generate_kv_ragged, grammar_for
from eamg_tpu.decode.grammar import (GRAMMAR_MASK, grammar_a, grammar_mask,
                                     grammar_step, scan_prompt_state)
from eamg_tpu.decode.stream import stream_tokens
from eamg_tpu.models import GPTConfig, init_params
from eamg_tpu.tokenizer import Vocab
from eamg_tpu.tokenizer.scheme_b import SchemeB2, SchemeB3

jax.config.update("jax_default_matmul_precision", "highest")

B2 = SchemeB2(max_tick=31)            # tiny vocab keeps CPU decodes fast
B3 = SchemeB3(max_tick=31)
CFG = GPTConfig(vocab_size=len(B2.vocab), d_model=32, n_head=2, n_layer=2,
                d_ff=64, seq_len=64, causal=True, ln_placement="pre",
                activation="gelu")
CFG3 = GPTConfig(vocab_size=len(B3.vocab), d_model=32, n_head=2, n_layer=2,
                 d_ff=64, seq_len=64, causal=True, ln_placement="pre",
                 activation="gelu")
PARAMS = init_params(jax.random.PRNGKey(0), CFG)
PARAMS3 = init_params(jax.random.PRNGKey(1), CFG3)


def _gen(cfg=CFG, params=PARAMS, scheme=B2):
    return Generator(params, cfg, scheme.vocab, eos_token="[END_SEQ]",
                     pad_token="[PAD]")


# ------------------------------------------------------------- FSM tables


def test_valid_streams_have_zero_violations():
    g2, g3 = grammar_for(B2), grammar_for(B3)
    t = B2.vocab.tok2id
    valid = [t["[START_SEQ]"], t["[NOTE]"], t["P_60"], t["T_4"], t["DUR_2"],
             t["[NOTE]"], t["P_62"], t["T_8"], t["DUR_1"], t["[END_SEQ]"],
             t["[PAD]"], t["[PAD]"]]
    assert g2.violations(valid) == 0
    t3 = B3.vocab.tok2id
    valid3 = B3.control_prefix(120, 0) + [
        t3["[NOTE]"], t3["P_60"], t3["T_1"], t3["DUR_1"], t3["[END_SEQ]"]]
    assert g3.violations(valid3) == 0
    # controls are optional and ordered BPM-then-KEY
    assert g3.violations([t3["[START_SEQ]"], t3["[NOTE]"], t3["P_60"],
                          t3["T_1"], t3["DUR_1"], t3["[END_SEQ]"]]) == 0
    assert g3.violations([t3["[START_SEQ]"], t3["KEY_3"],
                          t3["[END_SEQ]"]]) == 0
    # KEY before BPM violates the explode() insertion order
    assert g3.violations([t3["[START_SEQ]"], t3["KEY_3"], t3["BPM_120"],
                          t3["[END_SEQ]"]]) > 0


def test_invalid_transitions_are_counted():
    g = grammar_for(B2)
    t = B2.vocab.tok2id
    # P then T directly after START: both invalid (disallowed transitions
    # stay in place, so the state remains EVENT for both checks)
    assert g.violations([t["[START_SEQ]"], t["P_60"], t["T_4"]]) == 2
    # stay-put recovery: after an invalid P_60 the state is still EVENT,
    # so a following [NOTE] is legal again
    assert g.violations([t["[START_SEQ]"], t["P_60"], t["[NOTE]"]]) == 1
    # END mid-note
    assert g.violations([t["[START_SEQ]"], t["[NOTE]"], t["P_60"],
                         t["[END_SEQ]"]]) == 1


def test_scheme_a_grammar_requires_instrument_before_note():
    vocab = Vocab.from_list(
        ["[PAD]", "[START_SEQUENCE]", "[END_SEQUENCE]", "[BPM] 120.0",
         "[KEY_SIGNATURE] A minor", "[INSTRUMENT] Violin",
         "[NOTE] [PITCH:C4] [START:0.0] [END:0.5] [DURATION:0.5]"])
    g = grammar_a(vocab)
    t = vocab.tok2id
    note = t["[NOTE] [PITCH:C4] [START:0.0] [END:0.5] [DURATION:0.5]"]
    ok = [t["[START_SEQUENCE]"], t["[BPM] 120.0"],
          t["[KEY_SIGNATURE] A minor"], t["[INSTRUMENT] Violin"], note,
          note, t["[INSTRUMENT] Violin"], note, t["[END_SEQUENCE]"]]
    assert g.violations(ok) == 0
    # a note before any instrument is exactly what the reference
    # detokenizer drops (api_cache.py:216) — the grammar forbids it
    bad = [t["[START_SEQUENCE]"], note, t["[END_SEQUENCE]"]]
    assert g.violations(bad) == 1


def test_scheme_a_grammar_without_pad_self_loops_on_end():
    vocab = Vocab.from_list(
        ["[START_SEQUENCE]", "[END_SEQUENCE]", "[INSTRUMENT] Violin",
         "[NOTE] [PITCH:C4] [START:0.0] [END:0.5] [DURATION:0.5]"])
    g = grammar_a(vocab)
    done = g.states.index("DONE")
    # DONE must admit something representable in this vocab
    assert g.allowed[done].any()
    t = vocab.tok2id
    assert g.violations([t["[START_SEQUENCE]"], t["[END_SEQUENCE]"],
                         t["[END_SEQUENCE]"]]) == 0


# ---------------------------------------------------------- device pieces


def test_prompt_scan_matches_host_fsm():
    g = grammar_for(B2)
    ga = g.arrays()
    rng = np.random.default_rng(3)
    V = len(B2.vocab)
    prompts = rng.integers(0, V, size=(4, 12)).astype(np.int32)
    plens = np.asarray([0, 1, 7, 12], np.int32)
    got = np.asarray(scan_prompt_state(ga, jnp.asarray(prompts),
                                       jnp.asarray(plens)))
    for b in range(4):
        s = g.init_state
        for i in range(plens[b]):
            s = int(g.next_state[s, g.tclass[prompts[b, i]]])
        assert got[b] == s, b


def test_mask_and_step_agree_with_tables():
    g = grammar_for(B2)
    ga = g.arrays()
    t = B2.vocab.tok2id
    prompt = jnp.asarray([[t["[START_SEQ]"], t["[NOTE]"], t["P_60"], 0]],
                         jnp.int32)
    st = scan_prompt_state(ga, prompt, jnp.asarray([3]))
    assert g.states[int(st[0])] == "T"
    logits = jnp.zeros((1, len(B2.vocab)))
    m = np.asarray(grammar_mask(logits, st, ga, budget_left=100))
    ok = np.flatnonzero(m[0] == 0)
    toks = {B2.vocab.id2tok[int(i)][:2] for i in ok}
    assert toks == {"T_"}
    assert (m[0][m[0] != 0] == GRAMMAR_MASK).all()
    nxt = grammar_step(st, jnp.asarray([t["T_4"]]), ga)
    assert g.states[int(nxt[0])] == "D"
    # inactive rows hold their state
    held = grammar_step(st, jnp.asarray([t["T_4"]]), ga,
                        active=jnp.asarray([False]))
    assert int(held[0]) == int(st[0])


def test_budget_lookahead_blocks_unfinishable_note():
    """The budget rule must be lookahead-exact: at EVENT with budget 2,
    admitting [NOTE] would strand the stream mid-note (P needs 4 more
    tokens to close) — only [END_SEQ] may remain admitted. A rule that
    checks just the CURRENT state's distance (need(EVENT)=1 < 2) gets
    this wrong; caught live by beam search running rows to max_len."""
    g = grammar_for(B2)
    ga = g.arrays()
    t = B2.vocab.tok2id
    event = jnp.asarray([g.states.index("EVENT")], jnp.int32)
    logits = jnp.zeros((1, len(B2.vocab)))
    for budget, want in [(2, {"[END_SEQ]"}), (1, {"[END_SEQ]"}),
                         (5, {"[NOTE]", "[END_SEQ]"}),
                         (6, {"[NOTE]", "[END_SEQ]"})]:
        m = np.asarray(grammar_mask(logits, event, ga, budget_left=budget))
        ok = {B2.vocab.id2tok[int(i)] for i in np.flatnonzero(m[0] == 0)}
        assert ok == want, (budget, ok)
    # unreachable budget (0 at EVENT): best-effort shortest closing path
    m = np.asarray(grammar_mask(logits, event, ga, budget_left=0))
    ok = {B2.vocab.id2tok[int(i)] for i in np.flatnonzero(m[0] == 0)}
    assert ok == {"[END_SEQ]"}
    # mid-note states close along the shortest path at exact fit
    st_p = jnp.asarray([g.states.index("P")], jnp.int32)
    m = np.asarray(grammar_mask(logits, st_p, ga, budget_left=4))
    ok = {B2.vocab.id2tok[int(i)][:2] for i in np.flatnonzero(m[0] == 0)}
    assert ok == {"P_"}


def test_row_gating_is_bit_exact_noop():
    g = grammar_for(B2).arrays()
    logits = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, len(B2.vocab))).astype(np.float32))
    st = jnp.asarray([2, 2], jnp.int32)
    out = grammar_mask(logits, st, g, budget_left=10,
                       row_on=jnp.asarray([False, True]))
    assert np.array_equal(np.asarray(out[0]), np.asarray(logits[0]))
    assert not np.array_equal(np.asarray(out[1]), np.asarray(logits[1]))


# ------------------------------------------------------------ decode paths


def test_generate_kv_constrained_stream_is_valid():
    g = grammar_for(B2)
    gen = _gen()
    prompt = [B2.vocab.tok2id["[START_SEQ]"]]
    free = gen.generate_ids(prompt, max_len=48, temperature=3.0, seed=2)[0]
    cons = gen.generate_ids(prompt, max_len=48, temperature=3.0, seed=2,
                            grammar=g)[0]
    # a random-init model violates constantly; the grammar never does
    assert g.violations(free) > 0
    assert g.violations(cons) == 0
    # the detokenizer keeps every emitted note (nothing malformed/dropped)
    toks = [B2.vocab.id2tok[int(i)] for i in cons]
    song = B2.decode_to_song(cons)
    kept = len(song.instruments[0].notes) if song.instruments else 0
    assert toks.count("[NOTE]") == kept


def test_budget_closing_ends_with_complete_note_and_eos():
    from eamg_tpu.decode.loop import generate_kv

    g = grammar_for(B2)
    t = B2.vocab.tok2id
    prompt = np.zeros((2, 8), np.int32)
    prompt[:, 0] = t["[START_SEQ]"]
    # eos tracking OFF: the fixed-length run must still close in-budget
    buf, _ = generate_kv(PARAMS, jnp.asarray(prompt), 1,
                         jax.random.PRNGKey(7), CFG, 24, temperature=3.0,
                         eos_id=-1, pad_id=0, refeed_last_prompt=False,
                         grammar=g)
    for row in np.asarray(buf):
        toks = [B2.vocab.id2tok[int(i)] for i in row]
        assert g.violations(row) == 0
        end = toks.index("[END_SEQ]")
        assert all(x == "[PAD]" for x in toks[end + 1:])
        assert (len(toks[1:end])) % 4 == 0   # complete [NOTE] P T DUR runs


def test_generate_full_and_b3_constrained():
    g3 = grammar_for(B3)
    gen3 = _gen(CFG3, PARAMS3, B3)
    prompt = B3.control_prefix(100, "C major")
    row = gen3.generate_ids(prompt, max_len=40, temperature=3.0, seed=4,
                            grammar=g3, use_cache=False)[0]
    assert g3.violations(row) == 0
    row_kv = gen3.generate_ids(prompt, max_len=40, temperature=3.0, seed=4,
                               grammar=g3)[0]
    assert g3.violations(row_kv) == 0


def test_ragged_constrained_rows_and_bit_match_solo():
    g = grammar_for(B2)
    t = B2.vocab.tok2id
    pr = np.zeros((2, 8), np.int32)
    pr[0, :1] = [t["[START_SEQ]"]]
    pr[1, :5] = [t["[START_SEQ]"], t["[NOTE]"], t["P_60"], t["T_4"],
                 t["DUR_2"]]
    seeds = jnp.stack([jax.random.PRNGKey(5), jax.random.PRNGKey(6)])
    buf, lens = generate_kv_ragged(
        PARAMS, jnp.asarray(pr), jnp.asarray([1, 5]), seeds, CFG, 32,
        temperature=3.0, eos_id=t["[END_SEQ]"], pad_id=0, grammar=g)
    buf, lens = np.asarray(buf), np.asarray(lens)
    for b in range(2):
        assert g.violations(buf[b, :lens[b]]) == 0, b
    # each row bit-matches its solo constrained run
    for b in range(2):
        plen = [1, 5][b]
        sbuf, slens = generate_kv_ragged(
            PARAMS, jnp.asarray(pr[b:b + 1]), jnp.asarray([plen]),
            jnp.stack([jax.random.PRNGKey(5 + b)]), CFG, 32,
            temperature=3.0, eos_id=t["[END_SEQ]"], pad_id=0, grammar=g)
        assert np.array_equal(np.asarray(sbuf)[0, :np.asarray(slens)[0]],
                              buf[b, :lens[b]]), b


def test_mid_note_prompt_resumes_correctly():
    """A prompt ending inside a note forces the completion classes."""
    g = grammar_for(B2)
    gen = _gen()
    t = B2.vocab.tok2id
    prompt = [t["[START_SEQ]"], t["[NOTE]"], t["P_60"]]
    row = gen.generate_ids(prompt, max_len=32, temperature=3.0, seed=8,
                           grammar=g)[0]
    assert B2.vocab.id2tok[int(row[3])].startswith("T_")
    assert B2.vocab.id2tok[int(row[4])].startswith("DUR_")
    assert g.violations(row) == 0


def test_stream_tokens_constrained():
    g = grammar_for(B2)
    t = B2.vocab.tok2id
    toks = list(stream_tokens(PARAMS, CFG, [t["[START_SEQ]"]], 32, chunk=5,
                              temperature=3.0, eos_id=t["[END_SEQ]"],
                              pad_id=0, seed=3, grammar=g))
    full = [t["[START_SEQ]"]] + toks
    assert g.violations(full) == 0
    # streaming matches the engine-less contract: ends at EOS or budget
    assert toks[-1] == t["[END_SEQ]"] or len(full) == 32


def test_greedy_grammar_moves_argmax():
    g = grammar_for(B2)
    gen = _gen()
    t = B2.vocab.tok2id
    prompt = [t["[START_SEQ]"], t["[NOTE]"]]        # next MUST be a pitch
    free = gen.generate_ids(prompt, max_len=8, greedy=True)[0]
    cons = gen.generate_ids(prompt, max_len=8, greedy=True, grammar=g)[0]
    assert B2.vocab.id2tok[int(cons[2])].startswith("P_")
    # random init's unconstrained argmax lands elsewhere for this seed
    assert g.violations(cons) == 0
    assert list(free) != list(cons) or g.violations(free) == 0


def test_continuous_engine_mixed_grammar_traffic():
    """A grammar row and a plain row share the chunk program: the
    constrained row is valid AND bit-matches its solo constrained run;
    the plain row stays bit-exact with its solo unconstrained run."""
    import concurrent.futures as cf

    from eamg_tpu.serve.continuous import ContinuousBatcher

    g = grammar_for(B2)
    gen = _gen()
    t = B2.vocab.tok2id
    prompt = [t["[START_SEQ]"]]
    eng = ContinuousBatcher(gen, slots=4, chunk=8, max_len=40, grammar=g)
    try:
        with cf.ThreadPoolExecutor(2) as ex:
            f_on = ex.submit(eng.submit, prompt, 3.0, 11, 32, 300.0,
                             None, None, None, None, None, 0, True)
            f_off = ex.submit(eng.submit, prompt, 3.0, 12, 32, 300.0)
            r_on, r_off = f_on.result(), f_off.result()
    finally:
        eng.close()

    def solo(seed, grammar=None):
        pr = np.full((1, 16), 0, np.int32)
        pr[0, :1] = prompt
        buf, lens = generate_kv_ragged(
            PARAMS, jnp.asarray(pr), jnp.asarray([1]),
            jax.random.PRNGKey(seed)[None], CFG, 32, temperature=3.0,
            eos_id=gen.eos_id, pad_id=0, grammar=grammar)
        return np.asarray(buf)[0, :int(np.asarray(lens)[0])].tolist()

    assert g.violations(r_on) == 0
    assert r_on == solo(11, g)
    assert r_off == solo(12)


def test_engine_without_grammar_rejects_and_reports():
    from eamg_tpu.serve.continuous import ContinuousBatcher

    gen = _gen()
    eng = ContinuousBatcher(gen, slots=2, chunk=8, max_len=32)
    try:
        assert not eng.accepts(grammar=True)
        assert eng.accepts(grammar=False)
        try:
            eng.submit([B2.vocab.tok2id["[START_SEQ]"]], grammar=True)
            raise AssertionError("expected ValueError")
        except ValueError:
            pass
    finally:
        eng.close()


def test_grammar_off_is_default_and_unchanged():
    gen = _gen()
    prompt = [B2.vocab.tok2id["[START_SEQ]"]]
    a = gen.generate_ids(prompt, max_len=24, temperature=1.0, seed=5)[0]
    b = gen.generate_ids(prompt, max_len=24, temperature=1.0, seed=5,
                         grammar=None)[0]
    assert np.array_equal(a, b)

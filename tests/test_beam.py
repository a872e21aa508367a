"""Beam-search decoding (decode/beam.py): compiled flat-top-k beam step vs
a straightforward Python oracle over the same model math, greedy
equivalence at K=1, EOS freezing, and length-penalty ranking. Beyond-
reference capability — the reference only samples (api_cache.py:171-177)."""

import numpy as np

import jax
import jax.numpy as jnp

from eamg_tpu.decode import Generator
from eamg_tpu.decode.beam import generate_beam, rank_beams
from eamg_tpu.models import GPTConfig, init_params
from eamg_tpu.models.gpt import forward_masked
from eamg_tpu.tokenizer import Vocab

jax.config.update("jax_default_matmul_precision", "highest")

TOKS = ["[PAD]", "[START_SEQUENCE]", "[END_SEQUENCE]"] + \
    [f"tok{i}" for i in range(16)]
VOCAB = Vocab.from_list(TOKS)
CFG = GPTConfig(vocab_size=len(VOCAB), d_model=32, n_head=2, n_layer=2,
                d_ff=64, seq_len=32, causal=True, ln_placement="pre",
                activation="gelu")
PARAMS = init_params(jax.random.PRNGKey(0), CFG)
EOS = VOCAB.tok2id["[END_SEQUENCE]"]
PAD = VOCAB.tok2id["[PAD]"]


def _next_logp(prefix: list[int], width: int = 16) -> np.ndarray:
    """Oracle next-token log-probs from the full masked forward (the
    parity-tested equivalent of the KV decode step)."""
    buf = np.full((1, width), PAD, np.int32)
    buf[0, :len(prefix)] = prefix
    logits = forward_masked(PARAMS, jnp.asarray(buf), CFG,
                            valid_len=len(prefix))
    row = np.asarray(logits, np.float64)[0, len(prefix) - 1]
    row -= row.max()
    return row - np.log(np.exp(row).sum())


def _oracle_beam(prompt: list[int], K: int, steps: int,
                 eos: int = -1) -> list[tuple[float, tuple]]:
    """Reference beam search with the same semantics as generate_beam:
    initial top-K, then flat top-K over score+logp with finished beams
    contributing exactly one PAD continuation at logp 0."""
    logp = _next_logp(prompt)
    order = np.argsort(-logp)[:K]
    beams = [(float(logp[t]), (int(t),), int(t) == eos) for t in order]
    for _ in range(steps - 1):
        cand = []
        for score, seq, done in beams:
            if done:
                cand.append((score, seq + (PAD,), True))
                continue
            lp = _next_logp(prompt + [t for t in seq if t != PAD])
            for t in range(len(VOCAB)):
                cand.append((score + float(lp[t]), seq + (t,),
                             eos >= 0 and t == eos))
        cand.sort(key=lambda x: -x[0])
        beams = cand[:K]
    return [(s, seq) for s, seq, _ in beams]


def test_beam_matches_oracle_fixed_length():
    prompt = [VOCAB.tok2id["[START_SEQUENCE]"]]
    K, max_len = 3, 6
    pr = np.full((1, 4), PAD, np.int32)
    pr[0, :1] = prompt
    buf, gen_lens, scores = generate_beam(
        PARAMS, jnp.asarray(pr), 1, CFG, max_len, n_beams=K, eos_id=-1,
        pad_id=PAD)
    got = sorted((round(float(s), 4), tuple(int(x) for x in b[1:max_len]))
                 for s, b in zip(np.asarray(scores), np.asarray(buf)))
    want = sorted((round(s, 4), seq)
                  for s, seq in _oracle_beam(prompt, K, max_len - 1))
    assert [g[1] for g in got] == [w[1] for w in want]
    for g, w in zip(got, want):
        assert abs(g[0] - w[0]) < 1e-3, (g, w)


def test_beam_matches_oracle_with_eos():
    prompt = [VOCAB.tok2id["[START_SEQUENCE]"], VOCAB.tok2id["tok3"]]
    K, max_len = 4, 8
    pr = np.full((1, 4), PAD, np.int32)
    pr[0, :2] = prompt
    buf, gen_lens, scores = generate_beam(
        PARAMS, jnp.asarray(pr), 2, CFG, max_len, n_beams=K, eos_id=EOS,
        pad_id=PAD)
    got = sorted((round(float(s), 4), tuple(int(x) for x in b[2:max_len]))
                 for s, b in zip(np.asarray(scores), np.asarray(buf)))
    want = sorted((round(s, 4), seq)
                  for s, seq in _oracle_beam(prompt, K, max_len - 2,
                                             eos=EOS))
    assert [g[1] for g in got] == [w[1] for w in want]


def test_beam_k1_equals_greedy():
    gen = Generator(PARAMS, CFG, VOCAB)
    prompt = [VOCAB.tok2id["[START_SEQUENCE]"]]
    greedy = gen.generate_ids(prompt, max_len=16, greedy=True,
                              refeed_last_prompt=False)[0]
    beam = gen.generate_ids_beam(prompt, max_len=16, n_beams=1)
    assert list(beam) == list(greedy)


def test_eos_freezes_and_pads():
    prompt = [VOCAB.tok2id["[START_SEQUENCE]"]]
    pr = np.full((1, 4), PAD, np.int32)
    pr[0, :1] = prompt
    buf, gen_lens, scores = generate_beam(
        PARAMS, jnp.asarray(pr), 1, CFG, 20, n_beams=4, eos_id=EOS,
        pad_id=PAD)
    buf, gen_lens = np.asarray(buf), np.asarray(gen_lens)
    for b in range(4):
        row = buf[b, 1:1 + gen_lens[b]]
        tail = buf[b, 1 + gen_lens[b]:]
        if gen_lens[b] < 19:           # finished early -> ends with EOS
            assert row[-1] == EOS
            assert (tail == PAD).all()
        assert EOS not in row[:-1]     # EOS only terminal


def test_beam_grammar_zero_violations_and_closes():
    """Constrained beam search (grammar composed into the score
    renormalization): every returned hypothesis follows the Scheme-B2
    FSM and ends with a complete note + [END_SEQ] within budget."""
    from eamg_tpu.decode.grammar import grammar_for
    from eamg_tpu.tokenizer.scheme_b import SchemeB2

    b2 = SchemeB2(max_tick=31)
    cfg = GPTConfig(vocab_size=len(b2.vocab), d_model=32, n_head=2,
                    n_layer=2, d_ff=64, seq_len=32, causal=True,
                    ln_placement="pre", activation="gelu")
    params = init_params(jax.random.PRNGKey(2), cfg)
    g = grammar_for(b2)
    eos = b2.vocab.tok2id["[END_SEQ]"]
    pad = b2.vocab.tok2id["[PAD]"]
    start = b2.vocab.tok2id["[START_SEQ]"]
    pr = np.full((1, 4), pad, np.int32)
    pr[0, 0] = start
    max_len = 12
    buf, gen_lens, scores = generate_beam(
        params, jnp.asarray(pr), 1, cfg, max_len, n_beams=4, eos_id=eos,
        pad_id=pad, grammar=g)
    buf, gen_lens = np.asarray(buf), np.asarray(gen_lens)
    for b in range(4):
        row = [int(t) for t in buf[b, :1 + gen_lens[b]]]
        assert g.violations(row + [pad]) == 0, b2.vocab.decode(row)
        assert row[-1] == eos, b2.vocab.decode(row)   # closed within budget


def test_beam_k1_grammar_equals_constrained_greedy():
    """K=1 constrained beam == grammar-masked greedy decode (argmax is
    invariant under the renormalization)."""
    from eamg_tpu.decode.grammar import grammar_for
    from eamg_tpu.tokenizer.scheme_b import SchemeB2

    b2 = SchemeB2(max_tick=31)
    cfg = GPTConfig(vocab_size=len(b2.vocab), d_model=32, n_head=2,
                    n_layer=2, d_ff=64, seq_len=32, causal=True,
                    ln_placement="pre", activation="gelu")
    params = init_params(jax.random.PRNGKey(2), cfg)
    g = grammar_for(b2)
    gen = Generator(params, cfg, b2.vocab, eos_token="[END_SEQ]",
                    pad_token="[PAD]")
    prompt = [b2.vocab.tok2id["[START_SEQ]"]]
    greedy = gen.generate_ids(prompt, max_len=16, greedy=True,
                              refeed_last_prompt=False, grammar=g)[0]
    beam = gen.generate_ids_beam(prompt, max_len=16, n_beams=1, grammar=g)
    assert list(beam) == list(greedy)


def test_rank_beams_orders_by_normalized_score():
    buf = np.zeros((3, 4), np.int32)
    gen_lens = np.asarray([4, 2, 1])
    scores = np.asarray([-4.0, -3.0, -2.5])
    b, l, s, n = rank_beams(buf, gen_lens, scores, length_penalty=1.0)
    # per-token: -1.0, -1.5, -2.5 -> original order kept
    assert list(l) == [4, 2, 1]
    b, l, s, n = rank_beams(buf, gen_lens, scores, length_penalty=0.0)
    # raw sums: -2.5 best
    assert list(l) == [1, 2, 4]
    assert (np.diff(n) <= 1e-9).all()


def test_generator_beam_trims_and_beats_greedy_score():
    gen = Generator(PARAMS, CFG, VOCAB)
    prompt = [VOCAB.tok2id["[START_SEQUENCE]"]]
    rows, lens, scores, norm = gen.generate_ids_beam(
        prompt, max_len=12, n_beams=4, length_penalty=0.0,
        return_all=True)
    assert (np.diff(norm) <= 1e-9).all()
    best = gen.generate_ids_beam(prompt, max_len=12, n_beams=4,
                                 length_penalty=0.0)
    assert list(best) == list(rows[0, :1 + int(lens[0])])
    toks = gen.sample_beam(["[START_SEQUENCE]"], max_len=12, n_beams=4)
    assert toks[0] == "[START_SEQUENCE]"

"""Sequence packing (train/data.py pack_rows + models/gpt.py seg mode):
block-diagonal attention, per-segment position reset, boundary target
masking, and exact equivalence with unpacked training. Beyond-reference
training efficiency — the reference pads every song to SEQ_LEN
(train_mini.py:44-50), so short songs waste most of each row as PAD."""

import numpy as np

import jax
import jax.numpy as jnp

from eamg_tpu.models import GPTConfig, init_params
from eamg_tpu.models.gpt import _pos_from_seg, forward_hidden
from eamg_tpu.train.data import pack_rows, packed_batches
from eamg_tpu.train.trainer import (TrainConfig, Trainer, loss_fn,
                                    loss_fn_chunked, loss_fn_packed)

jax.config.update("jax_default_matmul_precision", "highest")

CFG = GPTConfig(vocab_size=64, d_model=32, n_head=2, n_layer=2, d_ff=64,
                seq_len=16, causal=True, ln_placement="pre",
                activation="gelu")
PARAMS = init_params(jax.random.PRNGKey(0), CFG)
PAD = 0


def _songs(lengths, seed=0):
    r = np.random.default_rng(seed)
    return [list(r.integers(1, CFG.vocab_size, (n,))) for n in lengths]


# ------------------------------------------------------------- host side


def test_pack_rows_whole_songs_and_seg_ids():
    rows, segs = pack_rows(_songs([5, 6, 4, 10, 3]), 16, PAD)
    # 5+6+4 = 15 fits; 10+3 = 13 fits next
    assert rows.shape == (2, 16) and segs.shape == (2, 16)
    assert list(segs[0]) == [1] * 5 + [2] * 6 + [3] * 4 + [0]
    assert list(segs[1]) == [1] * 10 + [2] * 3 + [0] * 3
    assert (rows[segs == 0] == PAD).all()
    # a song longer than seq_len is truncated (reference policy)
    rows, segs = pack_rows(_songs([30]), 16, PAD)
    assert rows.shape == (1, 16) and (segs[0] == 1).all()


def test_packed_batches_masks_boundary_targets():
    songs = _songs([5, 6, 4])
    (x, y, seg), = list(packed_batches(songs, 16, PAD, micro_batch=1))
    x, y, seg = x[0, 0], y[0, 0], seg[0, 0]
    full = songs[0] + songs[1] + songs[2] + [PAD]
    assert list(x) == full[:-1]
    # y is the shifted stream EXCEPT at segment boundaries (positions
    # 4 and 10 predict the next song's first token) and the pad tail
    want = np.asarray(full[1:], np.int32)
    want[[4, 10, 14]] = PAD
    assert list(y) == list(want)
    assert list(seg) == [1] * 5 + [2] * 6 + [3] * 4


def test_pos_from_seg_restarts_per_segment():
    seg = jnp.asarray([[1, 1, 1, 2, 2, 3, 0, 0],
                       [1, 1, 1, 1, 1, 1, 1, 1]], jnp.int32)
    pos = np.asarray(_pos_from_seg(seg))
    assert list(pos[0]) == [0, 1, 2, 0, 1, 0, 0, 1]
    assert list(pos[1]) == list(range(8))


# ------------------------------------------------------ model equivalence


def test_one_song_per_row_packed_equals_unpacked():
    """seg = one segment + pad tail must reproduce the plain forward
    exactly on the real positions (same positions, causal already blocks
    attention to the trailing pads)."""
    ids = np.full((2, 15), PAD, np.int32)   # n_pos = seq_len - 1 rows
    r = np.random.default_rng(1)
    ids[0, :12] = r.integers(1, CFG.vocab_size, (12,))
    ids[1, :9] = r.integers(1, CFG.vocab_size, (9,))
    seg = (ids != PAD).astype(np.int32)
    h_plain = np.asarray(forward_hidden(PARAMS, jnp.asarray(ids), CFG))
    h_pack = np.asarray(forward_hidden(PARAMS, jnp.asarray(ids), CFG,
                                       seg=jnp.asarray(seg)))
    assert np.allclose(h_plain[0, :12], h_pack[0, :12], atol=1e-5)
    assert np.allclose(h_plain[1, :9], h_pack[1, :9], atol=1e-5)


def test_packed_loss_equals_unpacked_rows():
    """Two songs packed into one row == the same songs in two separate
    padded rows: identical per-token CE terms (same positions via the
    per-segment reset, no cross-song attention), so the count-weighted
    loss and grads match."""
    songs = _songs([7, 6], seed=2)
    (xp, yp, sp), = list(packed_batches(songs, 16, PAD, micro_batch=1))
    xp, yp, sp = (jnp.asarray(a[0]) for a in (xp, yp, sp))

    xu = np.full((2, 15), PAD, np.int32)
    yu = np.full((2, 15), PAD, np.int32)
    for i, s in enumerate(songs):
        xu[i, :len(s)] = s
        yu[i, :len(s) - 1] = s[1:]
    lu, cu = loss_fn(PARAMS, jnp.asarray(xu), jnp.asarray(yu), CFG, PAD)
    lp, cp = loss_fn_packed(PARAMS, xp, yp, sp, CFG, PAD)
    assert int(cu) == int(cp) == (7 - 1) + (6 - 1)
    assert np.allclose(float(lu), float(lp), rtol=1e-5), (lu, lp)

    gu = jax.grad(lambda p: loss_fn(p, jnp.asarray(xu), jnp.asarray(yu),
                                    CFG, PAD)[0])(PARAMS)
    gp = jax.grad(lambda p: loss_fn_packed(p, xp, yp, sp, CFG,
                                           PAD)[0])(PARAMS)
    flat_u, flat_p = jax.tree.leaves(gu), jax.tree.leaves(gp)
    for a, b in zip(flat_u, flat_p):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=2e-4), \
            np.abs(np.asarray(a) - np.asarray(b)).max()


def test_packed_chunked_ce_matches_monolithic():
    songs = _songs([7, 6, 5, 4], seed=3)
    (xp, yp, sp), = list(packed_batches(songs, 16, PAD, micro_batch=2))
    xp, yp, sp = (jnp.asarray(a[0]) for a in (xp, yp, sp))
    lm, cm = loss_fn_packed(PARAMS, xp, yp, sp, CFG, PAD)
    lc, cc = loss_fn_chunked(PARAMS, xp, yp, CFG, PAD, chunk=5, seg=sp)
    assert int(cm) == int(cc)
    assert np.allclose(float(lm), float(lc), rtol=1e-5)


# ----------------------------------------------------------- trainer path


def test_trainer_packed_step_runs_and_matches_manual_loss():
    songs = _songs([7, 6, 5, 4], seed=4)
    batch, = list(packed_batches(songs, 16, PAD, micro_batch=2))
    x, y, seg = batch
    tcfg = TrainConfig(micro_batch=2, accum_steps=1, pack=True, lr=1e-3)
    trainer = Trainer(CFG, tcfg, PARAMS)
    want, _ = loss_fn_packed(PARAMS, jnp.asarray(x[0]), jnp.asarray(y[0]),
                             jnp.asarray(seg[0]), CFG, PAD)
    m = trainer.train_step(x, y, seg=seg)
    assert np.allclose(m["loss"], float(want), rtol=1e-5)
    m2 = trainer.train_step(x, y, seg=seg)
    assert m2["loss"] < m["loss"]          # it optimizes
    # the seg/pack contract is enforced
    import pytest

    with pytest.raises(AssertionError):
        trainer.train_step(x, y)           # pack=True needs seg


def test_run_training_pack_end_to_end(tmp_path):
    from eamg_tpu.train.run import run_training

    out = run_training("mini", synthetic_rows=24, epochs=2,
                       out_dir=str(tmp_path / "ckpt"), seed=0,
                       geometry={"d_model": 32, "n_head": 2, "n_layer": 2,
                                 "seq_len": 64},
                       pack=True)
    assert np.isfinite(out["final_loss"])
    # packed training produced a loadable checkpoint
    from eamg_tpu.utils.checkpoint import load_checkpoint

    ckpt = load_checkpoint(str(tmp_path / "ckpt" / "final"))
    assert ckpt["cfg"].causal            # pack implies corrected

"""Sharded inference: generation with TP/DP-sharded params on the virtual
8-device mesh must reproduce the single-device stream exactly."""

import numpy as np

import jax
import jax.numpy as jnp

from eamg_tpu.decode import generate_kv
from eamg_tpu.models import GPTConfig, init_params
from eamg_tpu.parallel import make_mesh, shard_params

CFG = GPTConfig(vocab_size=96, seq_len=32, d_model=32, n_head=4, n_layer=2,
                pos_rows=32, ln_placement="pre", activation="gelu",
                causal=True)


def _greedy(params):
    prompt = np.zeros((2, 8), np.int32)
    prompt[:, :3] = [[1, 2, 3]]
    buf, pos = generate_kv(params, jnp.asarray(prompt), 3,
                           jax.random.PRNGKey(0), CFG, 24, greedy=True,
                           eos_id=-1, pad_id=0, refeed_last_prompt=False)
    return np.asarray(buf).tolist()


def test_tp_sharded_generation_matches_single_device():
    params = init_params(jax.random.PRNGKey(0), CFG)
    base = _greedy(params)
    mesh = make_mesh(data=4, model=2)
    sharded = shard_params(params, mesh, tp=True)
    assert _greedy(sharded) == base


def test_replicated_generation_matches_single_device():
    params = init_params(jax.random.PRNGKey(1), CFG)
    base = _greedy(params)
    mesh = make_mesh(data=8, model=1)
    sharded = shard_params(params, mesh, tp=False)
    assert _greedy(sharded) == base


def test_bf16_training_runs_and_learns():
    """Mixed precision (paper §10.2's claim, absent from reference code):
    bf16 activations, f32 params/optimizer."""
    from eamg_tpu.train import TrainConfig, Trainer

    cfg = GPTConfig(vocab_size=96, seq_len=24, d_model=32, n_head=4,
                    n_layer=2, dtype="bfloat16", causal=True)
    params = init_params(jax.random.PRNGKey(2), cfg)
    trainer = Trainer(cfg, TrainConfig(lr=1e-3, clip_norm=1.0), params)
    rng = np.random.default_rng(0)
    x = rng.integers(1, 96, (1, 8, 23)).astype(np.int32)
    y = rng.integers(1, 96, (1, 8, 23)).astype(np.int32)
    losses = [trainer.train_step(x, y)["loss"] for _ in range(10)]
    assert losses[-1] < losses[0]
    # params stay f32 (master copy)
    assert jax.tree.leaves(trainer.params)[0].dtype == jnp.float32


def test_tp_sharded_continuous_engine_matches_unsharded():
    """Production sharded serving: the persistent continuous-batching
    engine runs with Megatron-TP-sharded params (GSPMD computation-
    follows-data — the engine code has no mesh plumbing) and every row
    still bit-matches the unsharded engine's stream."""
    from eamg_tpu.serve.continuous import ContinuousBatcher
    from eamg_tpu.decode import Generator
    from eamg_tpu.tokenizer import Vocab

    vocab = Vocab({str(i): i for i in range(96)})
    params = init_params(jax.random.PRNGKey(3), CFG)
    prompts = [[1, 2, 3], [4, 5, 6, 7]]

    def run(p):
        eng = ContinuousBatcher(
            Generator(p, CFG, vocab, eos_token="none", pad_token="0"),
            slots=2, chunk=4, max_len=24)
        try:
            return [eng.submit(pr, seed=100 + i, timeout=600)
                    for i, pr in enumerate(prompts)]
        finally:
            eng.close()

    base = run(params)
    mesh = make_mesh(data=4, model=2)
    assert run(shard_params(params, mesh, tp=True)) == base

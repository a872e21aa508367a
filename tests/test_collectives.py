"""HLO collective audits (VERDICT r2 #6): compile each parallelism mode
and assert its collective inventory, so sharding regressions (an
accidental full-param all-gather in the DP step, a lost all_to_all in EP,
a resharding storm in TP) fail a test instead of silently eating ICI.

Counts come from the POST-GSPMD optimized HLO (``.lower().compile()
.as_text()``) on the 8-virtual-device CPU mesh — the partitioning pass is
backend-agnostic, so the inventory matches what a real TPU slice runs.

Known costs pinned here deliberately (so improvements/regressions both
surface):

- **TP**: the fused in_proj ``[3d, d]`` is row-sharded over ``model``;
  q/k/v slice boundaries (d, 2d) misalign with shard boundaries (3d/m)
  unless m % 3 == 0, so GSPMD reshards the WEIGHT slices each microbatch
  (weight-shard-sized collective-permutes + backward all-gathers). Bytes
  are O(params/m) per microbatch — small next to the matmuls, but real;
  the audit asserts these stay weight-sized and never activation-sized.
- **FSDP**: the vocab-sharded embedding/head make activation-sized
  collectives INHERENT (partial-embedding psum forward, cotangent gather
  backward — Megatron's vocab-parallel embedding does the same); the
  audit asserts the weight all-gathers exist (ZeRO gather-at-use) and no
  activation-sized all-to-all/collective-permute appears.
"""

from __future__ import annotations

import re

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from eamg_tpu.models.gpt import GPTConfig, init_params
from eamg_tpu.parallel import make_mesh
from eamg_tpu.parallel.mesh import shard_params
from eamg_tpu.train.trainer import (TrainConfig, make_optimizer,
                                    make_train_step)

OPS = ("all-reduce", "all-gather", "collective-permute", "all-to-all",
       "reduce-scatter")
_LINE = re.compile(
    r"= \S+?\[([\d,]*)\][^ ]* "
    r"(all-reduce|all-gather|collective-permute|all-to-all|"
    r"reduce-scatter)(?:-start)?\(")


_CALL = re.compile(
    r" (all-reduce|all-gather|collective-permute|all-to-all|"
    r"reduce-scatter)(?:-start)?\(")


def inventory(compiled_text: str) -> list[tuple[str, tuple]]:
    """[(op, shape), ...] for every collective in optimized HLO.
    Tuple-typed ops (multi-operand all-to-all) report shape () — every
    current tuple case moves per-shard-sized pieces."""
    out = []
    for line in compiled_text.splitlines():
        m = _LINE.search(line)
        if m:
            shape = tuple(int(s) for s in m.group(1).split(",") if s)
            out.append((m.group(2), shape))
            continue
        m = _CALL.search(line)
        if m and " = " in line:
            out.append((m.group(1), ()))
    return out


def counts(inv) -> dict:
    c = {op: 0 for op in OPS}
    for op, _ in inv:
        c[op] += 1
    return c


CFG = GPTConfig(vocab_size=512, seq_len=32, d_model=64, n_head=4,
                n_layer=2, causal=True)
ACT_ELEMS = 8 * 31 * CFG.d_model     # one microbatch of activations


def _step_inventory(mesh, tcfg, tp=False, fsdp=False):
    params = shard_params(init_params(jax.random.PRNGKey(0), CFG), mesh,
                          tp=tp, fsdp=fsdp)
    opt = make_optimizer(tcfg)
    step = make_train_step(CFG, tcfg, opt)
    x = jax.device_put(jnp.zeros((1, 8, 31), jnp.int32),
                       NamedSharding(mesh, P(None, "data", None)))
    txt = step.lower(params, opt.init(params), x, x, None) \
              .compile().as_text()
    return inventory(txt)


def test_dp_step_one_fused_all_reduce():
    """Pure DP: the whole gradient psum fuses into EXACTLY one all-reduce;
    no all-gather may appear (an accidental full-param gather is the
    classic DP-breaking regression — reference contract being generalized:
    train/train_large.py:82-86,142's single DDP all-reduce)."""
    inv = _step_inventory(make_mesh(data=8), TrainConfig(micro_batch=8))
    c = counts(inv)
    # exactly 2: ONE fused tuple all-reduce carrying every f32 gradient +
    # one s32 all-reduce for the PAD-masked token count
    assert c["all-reduce"] == 2, inv
    assert c["all-gather"] == 0 and c["all-to-all"] == 0, inv
    assert c["collective-permute"] == 0 and c["reduce-scatter"] == 0, inv


def test_tp_step_activation_collectives_are_psums_only():
    """Megatron TP (2 data x 4 model): every activation-sized collective
    must be an all-reduce (the row-parallel psums); all-gathers and
    collective-permutes may only move weight shards (the known fused-qkv
    slice reshard, module docstring), never activations."""
    inv = _step_inventory(make_mesh(data=2, model=4),
                          TrainConfig(micro_batch=8, tp=True), tp=True)
    c = counts(inv)
    assert c["all-reduce"] >= 1 and c["all-to-all"] == 0, c
    for op, shape in inv:
        if op in ("all-gather", "collective-permute"):
            assert np.prod(shape, dtype=np.int64) < ACT_ELEMS, (
                f"activation-sized {op}{shape} in the TP step — GSPMD "
                f"stopped psum-ing the Megatron partials", inv)


def test_fsdp_step_gathers_weights_at_use():
    """ZeRO/FSDP: the head weight (the largest leaf) must be all-gathered
    where used (gather-at-use, not keep-replicated), and every
    collective-permute stays weight-shard-sized. Activation-sized
    all-reduce/all-gather pairs are INHERENT here — the vocab-sharded
    embedding/head compute partial embeddings + psum forward and gather
    cotangents backward, exactly like Megatron's vocab-parallel embedding
    (cost-comparable to gathering the table; measured equal at the
    flagship geometry: V*D ~= B*T*D)."""
    inv = _step_inventory(make_mesh(data=8),
                          TrainConfig(micro_batch=8, fsdp=True), fsdp=True)
    c = counts(inv)
    head_elems = CFG.vocab_size * CFG.d_model
    assert any(op == "all-gather" and
               np.prod(shape, dtype=np.int64) == head_elems
               for op, shape in inv), (
        "no full head-weight all-gather found — FSDP stopped gathering "
        "weights at use", inv)
    for op, shape in inv:
        if op == "collective-permute":
            assert np.prod(shape, dtype=np.int64) < ACT_ELEMS, (op, shape)
    assert c["all-reduce"] >= 1, c


def test_ring_attention_is_three_ppermutes_and_nothing_else():
    """Ring attention: K/V/owner rotate with exactly 3 collective-permutes
    inside the ring loop (N-1 trips, parallel/ring_attention.py:76-91);
    crucially ZERO all-gathers — the full K/V never materializes on any
    device (the whole point of the ring)."""
    from eamg_tpu.parallel import ring_attention

    mesh = Mesh(np.asarray(jax.devices()[:8]), ("seq",))
    q = jnp.zeros((1, 2, 64, 8), jnp.float32)
    fn = jax.jit(lambda q, k, v: ring_attention(q, k, v, mesh,
                                                causal=True))
    inv = inventory(fn.lower(q, q, q).compile().as_text())
    assert counts(inv) == {"all-reduce": 0, "all-gather": 0,
                           "collective-permute": 3, "all-to-all": 0,
                           "reduce-scatter": 0}, inv


def test_pipeline_step_hops_via_ppermute_only():
    """GPipe (2dp x 4pp): stage hops are collective-permutes (inside the
    schedule scan); gradient/loss reductions are all-reduces; no
    all-to-all, and any all-gather stays below activation size (shard_map
    boundary bookkeeping, not data movement)."""
    from eamg_tpu.parallel import PipelineTrainer
    from eamg_tpu.parallel.pipeline import (make_pp_mesh,
                                            make_pp_train_step,
                                            shard_pp_params, stack_layers)

    cfg4 = GPTConfig(vocab_size=512, seq_len=32, d_model=64, n_head=4,
                     n_layer=4, causal=True)
    mesh = make_pp_mesh(4, data=2)
    stacked = shard_pp_params(
        stack_layers(init_params(jax.random.PRNGKey(0), cfg4), 4), mesh)
    tcfg = TrainConfig(micro_batch=8)
    opt = make_optimizer(tcfg)
    step = make_pp_train_step(cfg4, tcfg, mesh, n_micro=4, optimizer=opt)
    x = jnp.zeros((8, 31), jnp.int32)
    inv = inventory(step.lower(stacked, opt.init(stacked), x, x)
                    .compile().as_text())
    c = counts(inv)
    assert c["collective-permute"] >= 1, inv     # the stage hops
    assert c["all-to-all"] == 0, inv
    assert c["all-reduce"] >= 1, inv             # grad/loss psum


def test_ep_moe_is_exactly_one_all_to_all_pair():
    """Expert parallelism: token dispatch + return are EXACTLY two
    all-to-alls (parallel/moe.py:234,239) and nothing else — no expert
    weight ever moves."""
    from eamg_tpu.parallel.moe import (MoEConfig, init_moe_params,
                                       moe_mlp_ep, shard_moe_params)

    mesh = Mesh(np.asarray(jax.devices()[:8]), ("expert",))
    mcfg = MoEConfig(d_model=32, d_ff=64, n_experts=16, top_k=2)
    mp = shard_moe_params(init_moe_params(jax.random.PRNGKey(2), mcfg),
                          mesh)
    xe = jnp.zeros((2, 64, 32), jnp.float32)
    fn = jax.jit(lambda p, x: moe_mlp_ep(p, x, mcfg, mesh, capacity=32))
    inv = inventory(fn.lower(mp, xe).compile().as_text())
    assert counts(inv) == {"all-reduce": 0, "all-gather": 0,
                           "collective-permute": 0, "all-to-all": 2,
                           "reduce-scatter": 0}, inv


def test_three_axis_dp_pp_tp_composed_step():
    """The 3-axis composition (2 data x 2 stage x 2 model): pipeline hops
    stay manual ppermutes while GSPMD adds the per-stage Megatron psums
    for the auto 'model' axis — and the loss equals the unpipelined,
    unsharded step exactly."""
    from eamg_tpu.parallel import PipelineTrainer
    from eamg_tpu.parallel.pipeline import make_pp_mesh
    from eamg_tpu.train.trainer import loss_fn

    cfg4 = GPTConfig(vocab_size=96, seq_len=32, d_model=64, n_head=4,
                     n_layer=4, causal=True)
    mesh = make_pp_mesh(2, data=2, model=2)
    tcfg = TrainConfig(micro_batch=8)
    params = init_params(jax.random.PRNGKey(0), cfg4)
    pp = PipelineTrainer(cfg4, tcfg, params, mesh, n_micro=4)

    w = pp.params["layers"]["attn"]["in_w"]
    assert w.sharding.shard_shape(w.shape) == (1, 2, 96, 64), (
        "layer weights must shard over BOTH stage and model", w.sharding)

    r = np.random.default_rng(0)
    x = r.integers(1, 96, (8, 31)).astype(np.int32)
    y = r.integers(1, 96, (8, 31)).astype(np.int32)
    m = pp.train_step(x, y)
    ref = float(loss_fn(params, jnp.asarray(x), jnp.asarray(y), cfg4,
                        tcfg.pad_id)[0])
    assert abs(m["loss"] - ref) < 1e-4, (m["loss"], ref)

    inv = inventory(pp.step_fn.lower(pp.params, pp.opt_state,
                                     jnp.asarray(x), jnp.asarray(y))
                    .compile().as_text())
    c = counts(inv)
    assert c["collective-permute"] >= 1, inv   # pipeline hops
    assert c["all-reduce"] >= 1, inv           # TP psums + grad psum
    assert c["all-to-all"] == 0, inv


@pytest.mark.slow
@pytest.mark.parametrize("n_dev,dp,tp_shards", [(16, 8, 2), (32, 8, 4)])
def test_dryrun_16_32_virtual_devices(tmp_path, n_dev, dp, tp_shards):
    """The flagship DP x TP train step compiles and runs on 16- AND
    32-device meshes (the driver's dryrun covers 8; VERDICT r2 #6 asks
    for 16/32). Subprocess: the pytest process's backend is pinned to 8
    devices."""
    import subprocess
    import sys

    script = rf"""
import os
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count={n_dev}"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from eamg_tpu.models import init_params, preset
from eamg_tpu.parallel import make_mesh
from eamg_tpu.tokenizer import SchemeB2
from eamg_tpu.train import TrainConfig, Trainer

vocab = SchemeB2().vocab
cfg = preset("large2", vocab_size=len(vocab))
mesh = make_mesh(data={dp}, model={tp_shards})
trainer = Trainer(cfg, TrainConfig(accum_steps=2, micro_batch={dp * 2},
                                   tp=True),
                  init_params(jax.random.PRNGKey(0), cfg), mesh=mesh)
r = np.random.default_rng(0)
x = r.integers(1, len(vocab), (2, {dp * 2}, 31)).astype(np.int32)
m = trainer.train_step(x, x)
assert np.isfinite(m["loss"]), m
print("DRYRUN_OK", m["loss"])
"""
    p = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True,
        timeout=900, env={"PYTHONPATH": "/root/repo",
                          "PATH": "/usr/bin:/bin:/usr/local/bin"},
        cwd="/root/repo")
    assert "DRYRUN_OK" in p.stdout, (p.stdout[-2000:], p.stderr[-2000:])

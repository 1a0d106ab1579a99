"""Device mesh + sharding helpers.

Replaces the reference's NCCL-through-accelerate data parallelism
(run_opus_ddp.py:77-79,138; Lightning DDP in cstp_v3/modelling.py:504) with a
single SPMD device mesh: axis "data" carries DP/FSDP, axis "model" carries TP.
XLA inserts the collectives (psum/all-gather) from sharding annotations.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .config import MeshConfig

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(cfg: Optional[MeshConfig] = None,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a 2-D ("data", "model") mesh over the available devices.

    With no config, all devices go on the data axis (pure DP) — the correct
    default for eval sharding, matching the reference's per-GPU replicas.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if cfg is None:
        cfg = MeshConfig(data=n, model=1)
    if cfg.data * cfg.model != n:
        raise ValueError(f"mesh {cfg.data}x{cfg.model} != {n} devices")
    arr = np.asarray(devices).reshape(cfg.data, cfg.model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def sharding(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Shard the leading (batch) dim of every leaf over the data axis."""
    s = NamedSharding(mesh, P(DATA_AXIS))
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)


def local_slice(n_items: int, process_index: Optional[int] = None,
                process_count: Optional[int] = None) -> slice:
    """Contiguous per-process slice of a dataset (multi-host eval sharding).

    TPU-native equivalent of `accelerator.split_between_processes`
    (run_opus_ddp.py:77). Uses the same contiguous-split semantics.
    """
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    base, rem = divmod(n_items, pc)
    start = pi * base + min(pi, rem)
    return slice(start, start + base + (1 if pi < rem else 0))

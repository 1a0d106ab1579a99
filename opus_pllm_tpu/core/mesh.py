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


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None,
                           local_device_ids=None) -> bool:
    """Multi-host bootstrap: the `jax.distributed.initialize` entry point
    (SURVEY §5's NCCL-init replacement — the role `accelerate launch` +
    dist.init_process_group play for run_opus_ddp.py:77-79 / eval.sh:20-26).

    Explicit args win; otherwise the standard env vars are read
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID). With
    neither, this is a single-process run and the call is a no-op. Must run
    before any other JAX device use. Idempotent. Returns True when the
    distributed runtime is live after the call."""
    import os

    from jax._src import distributed as _dist
    if getattr(_dist.global_state, "client", None) is not None:
        return True                      # already initialized
    coord = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    nproc = (num_processes if num_processes is not None
             else os.environ.get("JAX_NUM_PROCESSES"))
    pid = (process_id if process_id is not None
           else os.environ.get("JAX_PROCESS_ID"))
    if coord is None and nproc is None and pid is None:
        return False                     # single process, nothing to do
    jax.distributed.initialize(
        coordinator_address=coord,
        num_processes=int(nproc) if nproc is not None else None,
        process_id=int(pid) if pid is not None else None,
        local_device_ids=local_device_ids)
    return True


def parse_mesh_flag(flag: str) -> MeshConfig:
    """'D,M' (or 'D' for pure DP) -> MeshConfig — the CLI --mesh surface."""
    parts = [int(p) for p in flag.split(",") if p.strip()]
    if len(parts) == 1:
        return MeshConfig(data=parts[0], model=1)
    if len(parts) == 2:
        return MeshConfig(data=parts[0], model=parts[1])
    raise ValueError(f"--mesh expects 'DATA,MODEL', got {flag!r}")


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

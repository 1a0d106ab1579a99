"""GPipe-style pipeline parallelism over a ("pipe",) mesh axis.

The reference has no pipeline parallelism (SURVEY §2c: DP only, TP/PP
absent); this is the beyond-parity axis that completes the DP / FSDP / TP /
SP / PP matrix. It targets the regime the other axes don't cover: models
whose LAYER STACK exceeds one device's HBM but whose per-layer weights are
too small for TP to stay MXU-efficient (TP shrinks every matmul's N dim by
the axis size; PP keeps matmuls full-sized and moves whole layers).

TPU-native design — SPMD pipelining inside one `shard_map`, not a
multi-controller scheduler:

* The decoder's stacked-layer layout (decoder.stack_params — leaves carry a
  leading layer axis) IS the pipeline partitioning: `shard_map` with
  `PartitionSpec("pipe")` on the stacked leaves hands each device a
  contiguous block of L/P layers. No per-stage parameter surgery.
* The batch splits into M microbatches; a `lax.scan` over M+P-1 ticks runs
  the classic GPipe schedule: every tick each stage applies its layer block
  to its current activation and `ppermute`s the result one hop down the
  ring (ICI neighbor traffic only — the (b_mb, S, H) activation is the sole
  inter-device tensor). Stage 0 feeds fresh microbatches; the last stage's
  per-tick outputs are the scan's stacked ys, sliced to the M valid ticks.
* Bubble fraction is (P-1)/(M+P-1): more microbatches amortize the fill /
  drain ticks. During the bubble every stage still executes its block on
  placeholder data — SPMD requires a uniform program; the placeholder
  outputs are never selected.
* Backward needs no hand-written schedule: `ppermute` is linear, so
  `jax.value_and_grad` through the tick scan replays the ring in reverse
  (the 1F1B-style reverse bubble falls out of the scan transpose).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

PIPE_AXIS = "pipe"


def make_pp_mesh(n: Optional[int] = None, devices=None,
                 data: int = 1) -> Mesh:
    """("pipe",) mesh of n stages — or, with data > 1, a 2-D
    ("data", "pipe") mesh of data x n devices: `data` independent pipeline
    replicas, each over its own batch shard (DPxPP, the pod shape for
    models whose stack needs several chips AND whose batch wants more)."""
    import numpy as np
    devices = list(devices if devices is not None else jax.devices())
    need = (n if n is not None else len(devices) // data) * data
    if need > len(devices):
        # silent truncation would change the layers-per-stage split a
        # user sized for HBM (same contract as ring.make_sp_mesh)
        raise ValueError(f"--pipe-stages {n} x --pipe-data {data} "
                         f"> {len(devices)} devices")
    devices = devices[:need]
    if data > 1:
        return Mesh(np.asarray(devices).reshape(data, need // data),
                    ("data", PIPE_AXIS))
    return Mesh(np.asarray(devices), (PIPE_AXIS,))


def pipeline_apply(layer_fn, x_stream, const_stream, *, n_stages: int,
                   axis_name: str = PIPE_AXIS):
    """Stream M microbatches through the P pipeline stages (call INSIDE
    shard_map over `axis_name`).

    layer_fn(x, const) -> y applies THIS device's layer block to one
    microbatch activation (closure over the device-local layer shard).
    x_stream     : (M, b_mb, S, H) — the full input stream, replicated
                   (only stage 0's selections matter).
    const_stream : pytree of per-microbatch constants with a leading M axis
                   (attention mask, rope cos/sin), replicated.

    Returns (M, b_mb, S, H) final-stage outputs — valid on the LAST stage
    only; other stages return intermediates the caller must mask out.
    """
    stage = jax.lax.axis_index(axis_name)
    m = x_stream.shape[0]
    ticks = m + n_stages - 1
    perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]
    # the carry must be varying over the mesh axis from tick 0 (the scan
    # type-checks carry-in against carry-out, which ppermute makes varying)
    from ..core.util import pvary
    act0 = pvary(jnp.zeros_like(x_stream[0]), axis_name)

    def tick(act, t):
        # stage s at tick t works on microbatch t - s; clamp covers the
        # fill/drain bubble ticks (their outputs are never selected)
        mb = jnp.clip(t - stage, 0, m - 1)
        fresh = jax.lax.dynamic_index_in_dim(
            x_stream, jnp.clip(t, 0, m - 1), keepdims=False)
        inp = jnp.where(stage == 0, fresh, act)
        const = jax.tree.map(
            lambda c: jax.lax.dynamic_index_in_dim(c, mb, keepdims=False),
            const_stream)
        out = layer_fn(inp, const)
        return jax.lax.ppermute(out, axis_name, perm), out

    _, ys = jax.lax.scan(tick, act0, jnp.arange(ticks))
    # on the last stage, the out of tick t is microbatch t-(P-1)'s final
    # activation: the valid window is the trailing M ticks
    return ys[n_stages - 1:]

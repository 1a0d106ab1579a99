"""Sharding rules: PartitionSpec trees for every parameter pytree.

TPU-native replacement for the reference's process-level parallelism
(accelerate DDP replicas, run_opus_ddp.py:77-79; DeepSpeed in requirements
but unused; FSDP stub at opus_arch.py:54-62). One 2-D SPMD mesh
("data", "model") carries everything:

  * "model"  — Megatron-style tensor parallelism: attention/MLP in-projection
    kernels shard their OUTPUT dim, out-projections shard their INPUT dim,
    so each block needs one all-reduce (inserted by XLA from the specs).
  * "data"   — DP for activations/grads AND FSDP-style parameter sharding:
    the *other* kernel dim shards over "data", so each parameter lives
    1/(data*model) per device and XLA all-gathers it just-in-time.

The rules are name-based over our uniform param naming (q_proj/k_proj/
v_proj/o_proj, gate_proj/up_proj/down_proj, fc1/fc2, embed_tokens, lm_head,
norm scale/bias), so one rule set covers ESM2, the decoders, BERT, and the
bridge modules.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.mesh import DATA_AXIS, MODEL_AXIS

# kernels whose OUTPUT dim is TP-sharded (column-parallel). The fused
# qkv_proj/gateup_proj variants (decoder.fuse_projections) shard the same
# way for FSDP; for real TP keep projections unfused (head alignment).
_COL = {"q_proj", "k_proj", "v_proj", "gate_proj", "up_proj", "fc1",
        "query", "key", "value", "lm_head", "qkv_proj", "gateup_proj"}
# kernels whose INPUT dim is TP-sharded (row-parallel)
_ROW = {"o_proj", "down_proj", "fc2", "out_proj"}


def _names(path) -> list:
    out = []
    for p in path:
        if isinstance(p, jax.tree_util.DictKey):
            out.append(p.key)
        elif isinstance(p, jax.tree_util.SequenceKey):
            out.append(p.idx)
    return out


def _rule(path, leaf) -> P:
    names = _names(path)
    last = names[-1] if names else ""
    parent = next((n for n in reversed(names[:-1]) if isinstance(n, str)), "")
    stacked = "layers_stacked" in names

    def spec(*axes) -> P:
        # stacked layer trees carry a leading layer axis: replicate it
        return P(None, *axes) if stacked else P(*axes)

    if last == "embedding":
        # embed_tokens / embed_positions: replicate vocab, FSDP-shard hidden
        # (divisibility vs the actual mesh is enforced in _sanitize)
        if leaf.ndim == 2:
            return P(None, DATA_AXIS)
        return P()
    if last == "kernel":
        if parent in _COL:
            return spec(DATA_AXIS, MODEL_AXIS)
        if parent in _ROW:
            return spec(MODEL_AXIS, DATA_AXIS)
        # generic large dense (CSTP projections, switch projector): treat as
        # column-parallel so the fp32 weights also shard
        return spec(DATA_AXIS, MODEL_AXIS)
    if last in ("kernel_q", "kernel_p"):   # int8/int4 weights: the packed
        # rows track the kernel's K layout (int4 packs 2 K-rows per byte
        # [v1 int8 storage] or 8 per int32 word [v2], so K-sharding stays
        # block-aligned while K/shard % 256 == 0 [v1] / % 512 == 0 [v2])
        if parent in _ROW:
            return spec(MODEL_AXIS, DATA_AXIS)
        return spec(DATA_AXIS, MODEL_AXIS)
    if last == "gscale":   # int4 group scales (K/128, N): mirror the kernel
        if parent in _ROW:
            return spec(MODEL_AXIS, DATA_AXIS)
        return spec(None, MODEL_AXIS)
    if last == "bias":
        if parent in _COL:
            return spec(MODEL_AXIS)
        return spec()
    if last == "scale" and parent in (_COL | _ROW):   # int8 channel scales
        return spec(MODEL_AXIS) if parent in _COL else spec(DATA_AXIS)
    if last == "scale":
        return spec()
    # LoRA adapters: A (in, r) FSDP-shards its input dim; B (r, out)
    # TP-shards its output dim, matching the base kernel's layout.
    if last == "A":
        return spec(DATA_AXIS, None)
    if last == "B":
        return spec(None, MODEL_AXIS)
    return spec()


def _sanitize(spec: P, leaf, mesh: Mesh) -> P:
    """Drop any sharded dim the mesh cannot actually split evenly.

    The name rules are shape-blind; a hidden dim not divisible by the mesh
    axis size would make device_put/NamedSharding fail at runtime. Replace
    such entries with None (replicate that dim) instead."""
    axes = list(spec)
    if len(axes) > getattr(leaf, "ndim", len(axes)):
        return spec                      # rule/leaf rank mismatch: leave as-is
    out = []
    for dim, ax in enumerate(axes):
        if ax is None:
            out.append(None)
            continue
        names = ax if isinstance(ax, tuple) else (ax,)
        size = 1
        for n in names:
            size *= mesh.shape.get(n, 1)
        out.append(ax if leaf.shape[dim] % size == 0 else None)
    return P(*out)


def specs(params, mesh: Mesh | None = None) -> Any:
    """PartitionSpec tree matching `params`. With `mesh`, specs are validated
    against the actual axis sizes (non-divisible dims fall back to None)."""
    if mesh is None:
        return jax.tree_util.tree_map_with_path(_rule, params)
    return jax.tree_util.tree_map_with_path(
        lambda p, x: _sanitize(_rule(p, x), x, mesh), params)


def shardings(mesh: Mesh, params) -> Any:
    return jax.tree.map(lambda s: NamedSharding(mesh, s), specs(params, mesh))


def batch_spec() -> P:
    return P(DATA_AXIS)


def batch_shardings(mesh: Mesh, batch) -> Any:
    s = NamedSharding(mesh, P(DATA_AXIS))
    return jax.tree.map(lambda _: s, batch)


def replicated(mesh: Mesh, tree) -> Any:
    s = NamedSharding(mesh, P())
    return jax.tree.map(lambda _: s, tree)


def shard_params(mesh: Mesh, params):
    """Place a (host-resident) param tree onto the mesh per the rules."""
    return jax.tree.map(
        lambda x, s: jax.device_put(x, s), params, shardings(mesh, params))

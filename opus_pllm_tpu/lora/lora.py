"""LoRA adapters as a separate parameter pytree (stage d).

TPU-native re-design of the reference's PEFT usage (builder.py:105-111): the
reference loads a PEFT adapter and merges it into the base weights at load
time. Here LoRA lives as its own pytree mirroring the decoder layer
structure, so:

  * training updates only the tiny adapter tree (optimizer state stays small
    — the ZeRO-style benefit falls out of `pjit` sharding the adapter tree);
  * inference can either pass the tree through the forward (unmerged) or
    merge it into base weights once (`merge`) like PEFT merge_and_unload.

Init follows the PEFT convention: A ~ kaiming-uniform, B = 0, so the adapter
is an exact no-op at step 0. Effective delta: scaling * A @ B with
scaling = alpha / rank.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..core.config import DecoderConfig, LoRAConfig


def _proj_dims(cfg: DecoderConfig) -> Dict[str, tuple]:
    h, d = cfg.hidden_size, cfg.head_dim
    q, kv = cfg.num_heads * d, cfg.num_kv_heads * d
    dims = {
        "q_proj": (h, q), "k_proj": (h, kv), "v_proj": (h, kv),
        "o_proj": (q, h),
    }
    if cfg.family == "opt":
        dims.update({"fc1": (h, cfg.intermediate_size),
                     "fc2": (cfg.intermediate_size, h)})
    else:
        dims.update({"gate_proj": (h, cfg.intermediate_size),
                     "up_proj": (h, cfg.intermediate_size),
                     "down_proj": (cfg.intermediate_size, h)})
    return dims


def init(key, cfg: DecoderConfig, lora_cfg: LoRAConfig, dtype=jnp.float32):
    """Adapter tree: {"layers": [{proj: {"A": (in, r), "B": (r, out)}}]}."""
    dims = _proj_dims(cfg)
    targets = [t for t in lora_cfg.target_modules if t in dims]
    keys = jax.random.split(key, cfg.num_layers)
    layers = []
    for i in range(cfg.num_layers):
        lk = jax.random.split(keys[i], len(targets))
        lp = {}
        for t, k in zip(targets, lk):
            din, dout = dims[t]
            bound = 1.0 / math.sqrt(din)
            lp[t] = {
                "A": jax.random.uniform(k, (din, lora_cfg.rank), dtype=jnp.float32,
                                        minval=-bound, maxval=bound).astype(dtype),
                "B": jnp.zeros((lora_cfg.rank, dout), dtype),
            }
        layers.append(lp)
    return {"layers": layers}


def scaling(lora_cfg: LoRAConfig) -> float:
    return lora_cfg.alpha / lora_cfg.rank


def layer_adapters(lora_tree: Optional[dict], i: int) -> Optional[dict]:
    if lora_tree is None:
        return None
    return lora_tree["layers"][i]


def merge(params, lora_tree, lora_cfg: LoRAConfig):
    """Fold adapters into base weights: W += scaling * A @ B.

    Same math as PEFT merge_and_unload (reference builder.py:107-109);
    used to remove the per-step LoRA matmuls for pure inference.
    """
    s = scaling(lora_cfg)
    params = jax.tree.map(lambda x: x, params)
    for i, lp in enumerate(lora_tree["layers"]):
        for t, ab in lp.items():
            base = params["layers"][i][t]["kernel"]
            delta = (ab["A"].astype(jnp.float32) @ ab["B"].astype(jnp.float32)) * s
            params["layers"][i][t]["kernel"] = (
                base.astype(jnp.float32) + delta).astype(base.dtype)
    return params


def num_params(lora_tree) -> int:
    return sum(x.size for x in jax.tree.leaves(lora_tree))


def tree_from_flat(flat: Dict[Any, Dict[str, Any]], num_layers: int,
                   dtype=jnp.float32) -> dict:
    """{(layer, proj): {A, B}} (convert.lora_from_peft's output) ->
    the {"layers": [...]} adapter tree the forward takes."""
    layers: list = [{} for _ in range(num_layers)]
    for (li, proj), ab in flat.items():
        layers[li][proj] = {"A": jnp.asarray(ab["A"], dtype),
                            "B": jnp.asarray(ab["B"], dtype)}
    return {"layers": layers}


def fold_scaling(tree: dict, s: float) -> dict:
    """Fold a PER-ADAPTER scaling into B (B' = s*B, delta unchanged), so
    adapters trained at different alpha/rank serve from one bank under
    the engine's single lora_scale=1.0."""
    out = {"layers": []}
    for lp in tree["layers"]:
        out["layers"].append({t: {"A": ab["A"], "B": ab["B"] * s}
                              for t, ab in lp.items()})
    return out


def stack_adapter(name: str, t: dict):
    """One adapter tree -> per-leaf (num_layers, in, r) stacks, with the
    cross-layer uniformity validated (every layer must target the same
    projections at the same rank to stack into one gatherable tensor)."""
    if "layers_stacked" in t:
        return t["layers_stacked"]
    # name the adapter in the cross-layer uniformity error: the raw
    # tree.map "structs did not match" from a layers_to_transform-style
    # adapter (some layers untargeted) names nothing
    first = t["layers"][0]
    for li, lp in enumerate(t["layers"]):
        if (set(lp) != set(first)
                or any(lp[p]["A"].shape != first[p]["A"].shape
                       for p in lp)):
            raise ValueError(
                f"adapter {name!r} layer {li} targets "
                f"{sorted(lp)} at "
                f"{[lp[p]['A'].shape for p in sorted(lp)]}, layer 0 "
                f"has {sorted(first)}: the bank needs every layer to "
                "target the same projections at the same rank")
    return jax.tree.map(lambda *xs: jnp.stack(xs), *t["layers"])


def make_bank(adapters: Dict[str, dict], capacity: Optional[int] = None):
    """Stack named adapter trees into a multi-LoRA serving bank.

    Returns ({leaves (num_layers, C+1, in, r)}, {name: index}) where
    C = max(capacity, len(adapters)): index C (the last row) is an
    all-zero adapter, so base-only requests gather an exact no-op delta
    instead of branching the compiled decode step; rows beyond the named
    adapters are zero FREE slots that a serving engine can fill at
    runtime (add_adapter) without changing shapes — i.e. without
    recompiling. All adapters must target the same projections at the
    same rank (they stack into one gatherable tensor)."""
    if not adapters:
        raise ValueError("empty adapter bank")
    names = list(adapters)
    stacks = [stack_adapter(n, t) for n, t in adapters.items()]
    ref = jax.tree.structure(stacks[0])
    ref_shapes = [x.shape for x in jax.tree.leaves(stacks[0])]
    for name, s in zip(names[1:], stacks[1:]):
        if (jax.tree.structure(s) != ref
                or [x.shape for x in jax.tree.leaves(s)] != ref_shapes):
            raise ValueError(
                f"adapter {name!r} targets different projections or rank "
                f"than {names[0]!r}; a bank needs a uniform shape to stack")
    cap = max(capacity or 0, len(names))
    zero = jax.tree.map(jnp.zeros_like, stacks[0])
    pads = [zero] * (cap - len(names))       # runtime-fillable free rows
    bank = jax.tree.map(lambda *xs: jnp.stack(xs, axis=1),
                        *stacks, *pads, zero)
    return bank, {n: i for i, n in enumerate(names)}

"""Pipeline-parallel stage-(c/d) training step (GPipe over a "pipe" mesh).

Completes the parallelism matrix next to DP/FSDP/TP (multimodal_trainer +
parallel/partition) and SP (train/sp.py): the decoder's stacked layer axis
shards over the ("pipe",) mesh (parallel/pipeline.py), each device holds
L/P contiguous layers, and microbatches stream through the stages with one
(b_mb, S, H) ppermute per tick — the only inter-device traffic. The regime:
layer stacks past one chip's HBM where TP's matmul-narrowing would starve
the MXU (weights stream layer-by-layer HERE instead of every matmul being
1/P-width).

Division of labor inside the step (mirrors train/sp.py's structure):
* The cheap front (frozen ESM tower + CSTP + switch splice + token embeds +
  rope) runs REPLICATED on every stage over the full batch; only stage 0's
  stream selections carry gradient, so a psum over "pipe" assembles the
  trainable switch gradient exactly (other stages contribute zeros).
* The layer block per stage applies base weights + this stage's LoRA slice
  via an inner lax.scan (same _block as decoder._forward_scan's xs mode).
* The vocab head + chunked CE run after the pipeline; every stage executes
  them SPMD-uniformly but only the LAST stage's partial sums survive the
  masking, and a psum broadcasts the loss.
* LoRA gradients need NO reduction: each stage's slice of the stacked LoRA
  tree is used only in its own layer block, so the local grad IS that shard
  of the global gradient (out_spec P("pipe") reassembles the stack).

The reference has nothing comparable (SURVEY §2c: PP "NO"); this is the
beyond-parity axis for >16 GB-per-stack models on small-HBM chips.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P

from ..core.config import LoRAConfig, OpusConfig
from ..lora import lora as lora_mod
from ..models import decoder, opus
from ..models.layers import causal_mask
from ..parallel.pipeline import PIPE_AXIS, pipeline_apply
from .multimodal_trainer import (MMTrainState, _assemble, finish_saves,
                                 maybe_save)


def _split_llm(frozen):
    """frozen -> (frozen without the layer stack, the stacked layer tree).
    PP requires the stacked layout (decoder.stack_params): the leading layer
    axis is what PartitionSpec("pipe") shards into per-stage blocks."""
    if "layers_stacked" not in frozen["llm"]:
        raise ValueError(
            "pipeline parallelism needs stacked decoder params — convert "
            "with frozen['llm'] = decoder.stack_params(frozen['llm'])")
    llm = dict(frozen["llm"])
    stack = llm.pop("layers_stacked")
    rest = dict(frozen)
    rest["llm"] = llm
    return rest, stack


def shard_frozen(mesh, frozen):
    """Place the frozen tree for PP: the decoder layer stack sharded over
    the "pipe" axis — each stage physically holds ONLY its L/P layer block,
    which is the memory point of PP (a replicated stack would put the full
    multi-GB weights on every chip and the jitted step would re-lay them
    out every call) — everything else replicated."""
    from jax.sharding import NamedSharding
    rest, stack = _split_llm(frozen)
    stack = jax.device_put(stack, NamedSharding(mesh, P(PIPE_AXIS)))
    rest = jax.device_put(rest, NamedSharding(mesh, P()))
    out = dict(rest)
    llm = dict(rest["llm"])
    llm["layers_stacked"] = stack
    out["llm"] = llm
    return out


def _apply_block(cfg, stack, lora_stack, x, mask4, cos, sin, ls, impl,
                 remat):
    """One stage's layer block: scan this device's L/P stacked layers."""
    if lora_stack is None:
        def body(h, p):
            h, _ = decoder._block(cfg, p, h, mask4, cos, sin, None, None,
                                  impl, None, ls)
            return h, None
        xs = stack
    else:
        def body(h, pl):
            p, la = pl
            h, _ = decoder._block(cfg, p, h, mask4, cos, sin, None, None,
                                  impl, la, ls)
            return h, None
        xs = (stack, lora_stack)
    if remat:
        body = jax.checkpoint(body)
    h, _ = jax.lax.scan(body, x, xs)
    return h


def make_pp_train_step(cfg: OpusConfig, tx, mesh, *,
                       lora_cfg: Optional[LoRAConfig] = None,
                       donate: bool = True, ce_chunk: int = 0,
                       n_micro: Optional[int] = None, remat: bool = True,
                       impl: str = "auto", grad_accum: int = 1):
    """Jitted pipeline-parallel train step over `mesh` (a ("pipe",) mesh,
    pipeline.make_pp_mesh). Same state/batch surface as
    multimodal_trainer.make_train_step — the trainable tree keeps its
    per-layer LoRA list structure (checkpoints/optimizer unchanged); the
    stack/unstack happens inside the jit. Loss and updated state equal the
    single-device step up to float reassociation.

    n_micro: microbatches the batch splits into (default: the stage count).
    Bubble fraction is (P-1)/(n_micro+P-1) — raise n_micro to amortize.
    grad_accum > 1 scans micro-chunks of the batch (each running a full
    pipeline schedule) with valid-token weighting, exactly as in
    multimodal_trainer.make_train_step — the update equals the big-batch
    step; n_micro must divide the per-chunk batch."""
    ls = lora_mod.scaling(lora_cfg) if lora_cfg is not None else 1.0
    n_pipe = mesh.shape[PIPE_AXIS]
    # 2-D ("data","pipe") mesh = DPxPP: independent pipeline replicas over
    # batch shards; loss/switch grads reduce over BOTH axes, LoRA slice
    # grads reduce over "data" only (they stay sharded over "pipe")
    has_dp = "data" in mesh.axis_names
    all_axes = tuple(mesh.axis_names)

    def local_grads(tr_rest, lora_stack, frozen_rest, layer_stack, batch):
        stage = jax.lax.axis_index(PIPE_AXIS)

        def loss_of(tr, chunk):
            tr_rest_, lora_stack_ = tr
            params = _assemble(frozen_rest, tr_rest_)
            sp = opus.splice_prompt(
                params, cfg, chunk["input_ids"], chunk["attn_mask"],
                chunk.get("esm_tokens"), chunk["labels"], left_pad=False,
                pooled_emb=chunk.get("pooled_emb"))
            emb = sp.embeds.astype(cfg.llm.jnp_dtype)
            bsz, s, h = emb.shape    # per-replica batch under DPxPP
            m = n_micro if n_micro else n_pipe
            if bsz % m:
                raise ValueError(f"per-replica batch {bsz} not divisible "
                                 f"by n_micro={m}")
            b_mb = bsz // m
            x, cos, sin = decoder.positions_and_rope(
                params["llm"], cfg.llm, emb, sp.positions, ctx=s)
            mask4 = causal_mask(sp.mask)
            xs = x.reshape(m, b_mb, s, h)
            consts = {"mask4": mask4.reshape(m, b_mb, *mask4.shape[1:])}
            if cos is not None:
                consts["cos"] = cos.reshape(m, b_mb, *cos.shape[1:])
                consts["sin"] = sin.reshape(m, b_mb, *sin.shape[1:])

            def layer_fn(hh, c):
                return _apply_block(cfg.llm, layer_stack, lora_stack_, hh,
                                    c["mask4"], c.get("cos"), c.get("sin"),
                                    ls, impl, remat)

            outs = pipeline_apply(layer_fn, xs, consts, n_stages=n_pipe)
            hid, _ = decoder._head(params["llm"], cfg.llm,
                                   outs.reshape(bsz, s, h), None, True)
            tot, cnt = opus.next_token_loss_hidden(
                params["llm"], cfg.llm, hid, sp.labels, sp.mask,
                chunk=ce_chunk if 0 < ce_chunk < s else s, reduce=False,
                vary_axis=all_axes)
            # every stage ran the head SPMD-uniformly, but only the last
            # stage's outs are the real final activations; with DP the
            # psum also sums the per-replica batch-shard partials
            last = stage == n_pipe - 1
            tot = jax.lax.psum(jnp.where(last, tot, 0.0), all_axes)
            cnt = jax.lax.psum(jnp.where(last, cnt, 0), all_axes)
            return tot / jnp.maximum(cnt, 1), cnt

        gfn = jax.value_and_grad(loss_of, has_aux=True)
        tr0 = (tr_rest, lora_stack)
        if grad_accum <= 1:
            (loss, _), (g_rest, g_lora) = gfn(tr0, batch)
        else:
            def split(x):
                b = x.shape[0]
                if b % grad_accum:
                    raise ValueError(f"batch {b} not divisible by "
                                     f"grad_accum={grad_accum}")
                return x.reshape((grad_accum, b // grad_accum) + x.shape[1:])

            chunks = {k: split(v) for k, v in batch.items()}

            def body(carry, chunk):
                loss_sum, cnt_sum, gsum = carry
                (l, cnt), grads = gfn(tr0, chunk)
                c = cnt.astype(jnp.float32)   # GLOBAL count (psum'd above)
                gsum = jax.tree.map(
                    lambda a, g: a + g.astype(jnp.float32) * c, gsum, grads)
                return (loss_sum + l * c, cnt_sum + c, gsum), None

            # x * 0, not jnp.zeros: the LoRA stack is VARYING over "pipe"
            # under shard_map, and the scan carry's init must carry the
            # same varying-axes type as the accumulated grads
            zeros = jax.tree.map(
                lambda x: x.astype(jnp.float32) * 0.0, tr0)
            init = (jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32),
                    zeros)
            (loss_sum, cnt, gsum), _ = jax.lax.scan(body, init, chunks)
            denom = jnp.maximum(cnt, 1.0)
            g_rest, g_lora = jax.tree.map(
                lambda g, p: (g / denom).astype(p.dtype), gsum, tr0)
            loss = loss_sum / denom
        # switch grads flow only through stage 0's stream feed (zeros
        # elsewhere) — the psum assembles the global gradient; each stage's
        # LoRA slice grads are already that shard of the global gradient
        # (summed over data replicas when DP composes in)
        if has_dp and g_lora is not None:
            g_lora = jax.lax.psum(g_lora, "data")
        return loss, jax.lax.psum(g_rest, all_axes), g_lora

    batch_spec = P("data") if has_dp else P()
    sharded = jax.shard_map(
        local_grads, mesh=mesh,
        in_specs=(P(), P(PIPE_AXIS), P(), P(PIPE_AXIS), batch_spec),
        out_specs=(P(), P(), P(PIPE_AXIS)))

    @partial(jax.jit, donate_argnums=(0,) if donate else ())
    def train_step(state: MMTrainState, frozen, batch):
        frozen_rest, layer_stack = _split_llm(frozen)
        n_layers = jax.tree.leaves(layer_stack)[0].shape[0]
        if n_layers % n_pipe:
            raise ValueError(f"{n_layers} layers not divisible by "
                             f"{n_pipe} pipeline stages")
        tr = dict(state.trainable)
        lora_tree = tr.pop("lora", None)
        lora_stack = None
        if lora_tree is not None:
            lora_stack = jax.tree.map(lambda *xs: jnp.stack(xs),
                                      *lora_tree["layers"])
        loss, g_rest, g_lora = sharded(tr, lora_stack, frozen_rest,
                                       layer_stack, batch)
        grads = dict(g_rest)
        if lora_tree is not None:
            grads["lora"] = {"layers": [
                jax.tree.map(lambda x: x[i], g_lora)
                for i in range(len(lora_tree["layers"]))]}
        updates, new_opt = tx.update(grads, state.opt_state, state.trainable)
        new_trainable = optax.apply_updates(state.trainable, updates)
        return (MMTrainState(new_trainable, new_opt, state.step + 1),
                {"loss": loss})

    return train_step


def fit(state: MMTrainState, tx, cfg: OpusConfig, tcfg, frozen, batches,
        mesh, *, lora_cfg: Optional[LoRAConfig] = None, n_micro=None,
        log_fn=print, prefetch: int = 2, ckpt=None, save_every: int = 0):
    """Pipeline-parallel mirror of multimodal_trainer.fit (the CLI
    --pipe-stages surface). Frozen decoder params convert to the stacked
    layout once; batches stay replicated — the layer sharding happens
    inside the step via shard_map."""
    if "layers_stacked" not in frozen["llm"]:
        frozen = dict(frozen)
        frozen["llm"] = decoder.stack_params(frozen["llm"])
    frozen = shard_frozen(mesh, frozen)
    step_fn = make_pp_train_step(cfg, tx, mesh, lora_cfg=lora_cfg,
                                 ce_chunk=getattr(tcfg, "ce_chunk", 0),
                                 n_micro=n_micro,
                                 grad_accum=getattr(tcfg, "grad_accum", 1))

    def place(batch):
        return {k: jnp.asarray(v) for k, v in batch.items()}

    if prefetch:
        from ..utils.prefetch import prefetch_to_device
        batches = prefetch_to_device(batches, size=prefetch, place=place)
        place = lambda b: b  # noqa: E731 — already staged by the producer
    # host-side step mirror: int(state.step) each iteration would force a
    # device sync per step and defeat async-dispatch runahead
    start = int(state.step)
    for i, batch in enumerate(batches):
        state, metrics = step_fn(state, frozen, place(batch))
        step_no = start + i + 1
        if tcfg.log_every and i % tcfg.log_every == 0:
            log_fn(f"step {step_no}: "
                   f"loss={float(metrics['loss']):.4f}")
        maybe_save(ckpt, save_every, step_no, state)
    finish_saves(ckpt, save_every)
    return state

"""Sequence-parallel stage-(c/d) training step (ring attention).

Long-context training where ACTIVATIONS, not weights, blow the HBM budget:
the spliced multimodal stream shards along the sequence dim over a
("seq",) mesh (parallel/ring.py), every per-token op (norms, projections,
MLP, LoRA) runs on the local shard, attention runs as ring attention
(K/V shards ppermute around the ICI ring), and the chunked CE reduces with
two psums. Per-device activation memory is O(S / n_seq); the reference has
nothing comparable (its protocol caps at 2.5k aa) — this is the
beyond-parity >4k-token lever, composable with the int8/int4 frozen-base
storage from kernels/quant*.py.

Design choices:
* The grad runs INSIDE shard_map (value_and_grad of the local loss, then
  an explicit psum of the gradients). Each device's backward covers
  exactly its own tokens' compute; the psum assembles the global gradient
  — no reliance on shard_map's replicated-cotangent bookkeeping.
* The cheap front of the model (frozen ESM tower + CSTP + switch splice,
  ~35M params vs the multi-B decoder) is computed REPLICATED on every
  device, and each device slices its own sequence shard from the spliced
  stream. Redundant flops there buy a trivially correct gradient path for
  the trainable switch through the splice.
* Causality in the ring is global-INDEX based, which equals
  layers.causal_mask's tril — the right-pad training contract
  (splice emits right-pad streams for training, bridge/splice.py).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import optax

from ..core.config import IGNORE_INDEX, LoRAConfig, OpusConfig
from ..lora import lora as lora_mod
from ..models import decoder, opus
from ..parallel.ring import SEQ_AXIS
from .multimodal_trainer import (MMTrainState, _assemble, finish_saves,
                                 maybe_save)


def _local_ce(llm_params, llm_cfg, hid, tg, valid, chunk: int):
    """CE partial sums over a LOCAL shard with PRE-SHIFTED targets — the
    shift=False / reduce=False mode of opus.next_token_loss_hidden (the
    global shift happened before sharding: a shard-boundary position's
    target lives in the next shard). chunk <= 0 runs as one chunk."""
    s = hid.shape[1]
    # valid already folds the mask; pass all-True so the helper's
    # (tg != IGNORE) & mask matches exactly
    tg = jnp.where(valid, tg, IGNORE_INDEX)
    from ..parallel.ring import SEQ_AXIS as _AX
    return opus.next_token_loss_hidden(
        llm_params, llm_cfg, hid, tg, jnp.ones(tg.shape, bool),
        chunk=chunk if 0 < chunk < s else s, shift=False, reduce=False,
        vary_axis=_AX)


def make_sp_train_step(cfg: OpusConfig, tx, mesh, *,
                       lora_cfg: Optional[LoRAConfig] = None,
                       donate: bool = True, ce_chunk: int = 0,
                       remat: bool = True, scan_mode: str = "xs",
                       grad_accum: int = 1):
    """Jitted sequence-parallel train step over `mesh` (a ("seq",) mesh,
    ring.make_sp_mesh). Same state/batch surface as
    multimodal_trainer.make_train_step; loss and updated state equal the
    single-device step up to float reassociation. grad_accum > 1 scans
    micro-chunks of the batch with valid-token weighting exactly as in
    multimodal_trainer.make_train_step (the chunk's psum'd token count is
    the weight, so the update equals the big-batch step)."""
    ls = lora_mod.scaling(lora_cfg) if lora_cfg is not None else 1.0
    n_seq = mesh.shape[SEQ_AXIS]
    from jax.sharding import PartitionSpec as P

    def local_loss(trainable, frozen, batch):
        idx = jax.lax.axis_index(SEQ_AXIS)
        params = _assemble(frozen, trainable)
        sp = opus.splice_prompt(params, cfg, batch["input_ids"],
                                batch["attn_mask"], batch.get("esm_tokens"),
                                batch["labels"], left_pad=False,
                                pooled_emb=batch.get("pooled_emb"))
        emb = sp.embeds.astype(cfg.llm.jnp_dtype)
        b, s, _ = emb.shape
        # global next-token shift BEFORE sharding: position i's target is
        # token i+1, which for the last row of a shard lives in the NEXT
        # shard — shifting locally would drop every boundary token
        tg = jnp.concatenate(
            [sp.labels[:, 1:],
             jnp.full((b, 1), IGNORE_INDEX, sp.labels.dtype)], axis=1)
        valid = (tg != IGNORE_INDEX) & jnp.concatenate(
            [sp.mask[:, 1:], jnp.zeros((b, 1), bool)], axis=1)
        kvm, pos = sp.mask, sp.positions
        s_pad = -(-s // n_seq) * n_seq
        if s_pad != s:
            pz = s_pad - s
            emb = jnp.pad(emb, ((0, 0), (0, pz), (0, 0)))
            tg = jnp.pad(tg, ((0, 0), (0, pz)),
                         constant_values=IGNORE_INDEX)
            valid = jnp.pad(valid, ((0, 0), (0, pz)))
            kvm = jnp.pad(kvm, ((0, 0), (0, pz)))
            pos = jnp.pad(pos, ((0, 0), (0, pz)))
        s_loc = s_pad // n_seq
        sl = lambda x: jax.lax.dynamic_slice_in_dim(  # noqa: E731
            x, idx * s_loc, s_loc, axis=1)
        # ntk_ctx pins the dynamic-NTK rotary base to the GLOBAL padded
        # length: the ring path's mask is the 2-D local shard mask, so the
        # default mask-derived context would be S/n_seq — under-scaling
        # the base per shard and diverging from the single-device step
        hid, _ = decoder.forward(
            params["llm"], cfg.llm, sl(emb), sl(pos), sl(kvm),
            lora=trainable.get("lora"), lora_scale=ls, remat=remat,
            return_hidden=True, impl="ring", scan_mode=scan_mode,
            ntk_ctx=s_pad)
        tot, cnt = _local_ce(params["llm"], cfg.llm, hid, sl(tg), sl(valid),
                             ce_chunk)
        tot = jax.lax.psum(tot, SEQ_AXIS)
        cnt = jax.lax.psum(cnt, SEQ_AXIS)
        return tot / jnp.maximum(cnt, 1), cnt

    def local_grads(trainable, frozen, batch):
        # each device's backward covers its own tokens; the psum of local
        # grads is the global gradient (the splice front is replicated
        # compute, but its cotangent arrives only through this device's
        # shard slice, so no token is double-counted)
        gfn = jax.value_and_grad(local_loss, has_aux=True)
        if grad_accum <= 1:
            (loss, _), grads = gfn(trainable, frozen, batch)
            return loss, jax.lax.psum(grads, SEQ_AXIS)

        def split(x):
            b = x.shape[0]
            if b % grad_accum:
                raise ValueError(f"batch {b} not divisible by "
                                 f"grad_accum={grad_accum}")
            return x.reshape((grad_accum, b // grad_accum) + x.shape[1:])

        chunks = {k: split(v) for k, v in batch.items()}

        def body(carry, chunk):
            loss_sum, cnt_sum, gsum = carry
            (loss, cnt), grads = gfn(trainable, frozen, chunk)
            c = cnt.astype(jnp.float32)   # GLOBAL count (psum'd in the loss)
            gsum = jax.tree.map(
                lambda a, g: a + g.astype(jnp.float32) * c, gsum, grads)
            return (loss_sum + loss * c, cnt_sum + c, gsum), None

        zeros = jax.tree.map(
            lambda x: jnp.zeros(x.shape, jnp.float32), trainable)
        init = (jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32),
                zeros)
        (loss_sum, cnt, gsum), _ = jax.lax.scan(body, init, chunks)
        denom = jnp.maximum(cnt, 1.0)
        grads = jax.tree.map(
            lambda g, p: (g / denom).astype(p.dtype), gsum, trainable)
        return loss_sum / denom, jax.lax.psum(grads, SEQ_AXIS)

    sharded = jax.shard_map(local_grads, mesh=mesh,
                            in_specs=(P(), P(), P()),
                            out_specs=(P(), P()))

    @partial(jax.jit, donate_argnums=(0,) if donate else ())
    def train_step(state: MMTrainState, frozen, batch):
        loss, grads = sharded(state.trainable, frozen, batch)
        updates, new_opt = tx.update(grads, state.opt_state, state.trainable)
        new_trainable = optax.apply_updates(state.trainable, updates)
        return (MMTrainState(new_trainable, new_opt, state.step + 1),
                {"loss": loss})

    return train_step


def fit(state: MMTrainState, tx, cfg: OpusConfig, tcfg, frozen, batches,
        mesh, *, lora_cfg: Optional[LoRAConfig] = None, log_fn=print,
        prefetch: int = 2, ckpt=None, save_every: int = 0):
    """Sequence-parallel mirror of multimodal_trainer.fit (the CLI
    --seq-shards surface). Params/batches stay replicated — the sharding
    happens along the sequence inside the step."""
    step_fn = make_sp_train_step(cfg, tx, mesh, lora_cfg=lora_cfg,
                                 ce_chunk=getattr(tcfg, "ce_chunk", 0),
                                 scan_mode=getattr(tcfg, "scan_mode", "xs"),
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

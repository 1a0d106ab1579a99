"""Stages (c) and (d): projector training and LoRA instruction tuning.

The reference did not release these launchers (only a shell-script comment
references an internal train/ dir, eval_total_ablation.sh:74); the loading
code defines the contract: stage (c) trains the switch projector against a
frozen LLM (weights later extracted by scripts/extract_mm_projector.py),
stage (d) trains a PEFT LoRA adapter on OPUS-InstructionCorpus that
builder.py:105-111 merges at load.

TPU-native design: ONE jitted train step covers both stages. The trainable
leaves live in their own pytree (`trainable`: {"switch": ...} and/or
{"lora": ...}); gradients for the frozen ESM/CSTP/LLM tree are never
materialized, and the train state (trainable + optimizer buffers) is
donated so XLA reuses those buffers in place. Sharding: frozen LLM params shard
TP+FSDP per parallel/partition.py; the batch shards over "data"; XLA inserts
the gradient all-reduce — the role DDP/DeepSpeed play in the reference
stack.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..core.config import IGNORE_INDEX, LoRAConfig, OpusConfig, TrainConfig
from ..lora import lora as lora_mod
from ..models import opus
from .optim import adamw


class MMTrainState(NamedTuple):
    trainable: Dict[str, Any]      # {"switch": ...} | {"lora": ...} | both
    opt_state: Any
    step: jnp.ndarray


def init_trainable(key, cfg: OpusConfig, *, train_switch: bool,
                   lora_cfg: Optional[LoRAConfig], frozen_params) -> dict:
    """Build the trainable tree; switch params move OUT of the frozen tree."""
    t: Dict[str, Any] = {}
    if train_switch:
        # independent buffers, NOT aliases: the train step donates the
        # state, and aliased buffers would delete the frozen tree's switch
        # leaves out from under step 2 / eval / generate
        t["switch"] = jax.tree.map(jnp.copy, frozen_params["switch"])
    if lora_cfg is not None:
        t["lora"] = lora_mod.init(key, cfg.llm, lora_cfg)
    return t


def create_state(key, cfg: OpusConfig, tcfg: TrainConfig, frozen_params, *,
                 train_switch: bool = True,
                 lora_cfg: Optional[LoRAConfig] = None,
                 total_steps: Optional[int] = None):
    trainable = init_trainable(key, cfg, train_switch=train_switch,
                               lora_cfg=lora_cfg, frozen_params=frozen_params)
    tx = adamw(tcfg, total_steps)
    state = MMTrainState(trainable, tx.init(trainable), jnp.zeros((), jnp.int32))
    return state, tx


def maybe_save(ckpt, save_every: int, step_no: int, state) -> None:
    """Periodic full-state save gate shared by every fit loop (here, sp.py,
    pp.py, cstp_trainer.py) — one place owns the interval semantics."""
    if ckpt is not None and save_every and step_no % save_every == 0:
        ckpt.save(step_no, state._asdict(), wait=False)


def finish_saves(ckpt, save_every: int) -> None:
    """Drain any in-flight async saves before the fit loop returns."""
    if ckpt is not None and save_every:
        ckpt.wait()


def _assemble(frozen, trainable):
    params = dict(frozen)
    if "switch" in trainable:
        params["switch"] = trainable["switch"]
    return params


def loss_fn(trainable, frozen, cfg: OpusConfig, batch,
            lora_scale: float, remat: bool = True, ce_chunk: int = 0,
            scan_mode: str = "xs") -> Tuple[jnp.ndarray, dict]:
    """Next-token CE over the spliced multimodal stream (RIGHT-pad training
    path, opus_arch.py:245-269; labels at protein slots = IGNORE_INDEX).

    Batches with a `pooled_emb` key skip the frozen ESM tower entirely
    (offline-precomputed embeddings, the reference's training data layout).
    Per-layer remat is on by default: backward-pass activation memory is
    what OOMs billion-parameter training on a 16 GB chip. ce_chunk > 0
    additionally chunks the vocab projection + CE (TrainConfig.ce_chunk;
    the other half of the single-chip 8B memory budget).
    """
    params = _assemble(frozen, trainable)
    out, sp = opus.forward(
        params, cfg, batch["input_ids"], batch["attn_mask"],
        batch.get("esm_tokens"), labels=batch["labels"],
        lora=trainable.get("lora"), lora_scale=lora_scale, left_pad=False,
        pooled_emb=batch.get("pooled_emb"), remat=remat,
        scan_mode=scan_mode, return_hidden=ce_chunk > 0)
    if ce_chunk > 0:
        loss = opus.next_token_loss_hidden(params["llm"], cfg.llm, out,
                                           sp.labels, sp.mask, chunk=ce_chunk)
    else:
        loss = opus.next_token_loss(out, sp.labels, sp.mask)
    # valid-token count: loss is the mean over these, so accumulation
    # across micro-chunks can reweight exactly (see make_train_step)
    valid = jnp.sum((sp.labels[:, 1:] != IGNORE_INDEX) & sp.mask[:, 1:])
    return loss, {"loss": loss, "valid": valid}


def make_train_step(cfg: OpusConfig, tx, *, lora_cfg: Optional[LoRAConfig] = None,
                    donate: bool = True, ce_chunk: int = 0,
                    scan_mode: str = "xs", grad_accum: int = 1,
                    remat=True):
    """Jitted train step. With donate=True (default) the state argument is
    donated: trainable/optimizer buffers are updated in place, halving the
    train-state footprint. The caller must not reuse a state object after
    passing it in (fit() rebinds each step, so this is safe there).

    grad_accum > 1 splits the batch into that many micro-chunks and runs
    one forward/backward per chunk under a lax.scan before the single
    optimizer update — the single-chip counterpart of scaling batch via
    DDP replicas (activation memory is the B/grad_accum chunk's, the
    effective batch is B). Chunks are combined by VALID-TOKEN weighting
    (sum of per-chunk loss-sum gradients / total valid tokens), so the
    update equals the big-batch step exactly, not just when every chunk
    has the same number of unpadded tokens."""
    ls = lora_mod.scaling(lora_cfg) if lora_cfg is not None else 1.0

    def grads_of(trainable, frozen, batch):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        if grad_accum <= 1:
            (loss, metrics), grads = grad_fn(trainable, frozen, cfg, batch,
                                             ls, remat, ce_chunk, scan_mode)
            return loss, metrics, grads

        def split(x):
            b = x.shape[0]
            if b % grad_accum:
                raise ValueError(f"batch {b} not divisible by "
                                 f"grad_accum={grad_accum}")
            return x.reshape((grad_accum, b // grad_accum) + x.shape[1:])

        chunks = {k: split(v) for k, v in batch.items()}

        def body(carry, chunk):
            loss_sum, cnt_sum, gsum = carry
            (loss, metrics), grads = grad_fn(trainable, frozen, cfg, chunk,
                                             ls, remat, ce_chunk, scan_mode)
            c = metrics["valid"].astype(jnp.float32)
            # d(mean)/dw * cnt = d(sum)/dw: accumulate loss-SUM gradients
            # in fp32, normalize once by the global count below
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
        return loss_sum / denom, {"loss": loss_sum / denom,
                                  "valid": cnt.astype(jnp.int32)}, grads

    @partial(jax.jit, donate_argnums=(0,) if donate else ())
    def train_step(state: MMTrainState, frozen, batch):
        loss, metrics, grads = grads_of(state.trainable, frozen, batch)
        updates, new_opt = tx.update(grads, state.opt_state, state.trainable)
        new_trainable = optax.apply_updates(state.trainable, updates)
        return MMTrainState(new_trainable, new_opt, state.step + 1), metrics

    return train_step


def make_eval_step(cfg: OpusConfig, *, lora_cfg: Optional[LoRAConfig] = None,
                   ce_chunk: int = 0, scan_mode: str = "xs"):
    ls = lora_mod.scaling(lora_cfg) if lora_cfg is not None else 1.0

    @jax.jit
    def eval_step(trainable, frozen, batch):
        loss, metrics = loss_fn(trainable, frozen, cfg, batch, ls, True,
                                ce_chunk, scan_mode)
        return metrics

    return eval_step


def shard_state(mesh, state: MMTrainState) -> MMTrainState:
    """Place a train state on the mesh: trainable under the partition
    rules; optimizer moments under the SAME rules (ZeRO-style — optax's
    mu/nu mirror the trainable tree, so the name-based rules see the same
    paths through the chain); anything the rules can't name replicates."""
    import jax as _jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel import partition
    trainable = partition.shard_params(mesh, state.trainable)
    opt_state = partition.shard_params(mesh, state.opt_state)
    step = _jax.device_put(state.step, NamedSharding(mesh, P()))
    return MMTrainState(trainable, opt_state, step)


def fit(state: MMTrainState, tx, cfg: OpusConfig, tcfg: TrainConfig, frozen,
        batches, *, lora_cfg: Optional[LoRAConfig] = None, mesh=None,
        log_fn=print, prefetch: int = 2, ckpt=None, save_every: int = 0,
        val_batches_fn=None, val_every: int = 0):
    """Train loop. With `mesh`, `frozen`/`state` must already be
    mesh-sharded (parallel/partition + shard_state); each batch shards over
    the "data" axis and XLA inserts the gradient all-reduce. `prefetch`
    batches are staged host->device on a background thread (the torch
    DataLoader-workers role; utils/prefetch.py); 0 disables.

    ckpt + save_every > 0: every `save_every` steps the FULL train state
    (trainable + optimizer moments + step) saves to the
    core.checkpoint.CheckpointManager `ckpt` — restore with
    restore_state(ckpt, state) and skip int(state.step) batches to resume
    a killed run exactly (tests/test_train.py).

    val_batches_fn (callable -> fresh batch iterable): every `val_every`
    steps AND once after the last step, held-out loss computes with
    make_eval_step and logs as the token-weighted mean over the val set
    (the Lightning validation_step role, cstp_v3/modelling.py:510-537 —
    the reference's multimodal stages never shipped one)."""
    import contextlib

    step_fn = make_train_step(cfg, tx, lora_cfg=lora_cfg,
                              ce_chunk=getattr(tcfg, "ce_chunk", 0),
                              scan_mode=getattr(tcfg, "scan_mode", "xs"),
                              grad_accum=getattr(tcfg, "grad_accum", 1),
                              remat=(tcfg.remat_mode
                                     if hasattr(tcfg, "remat_mode")
                                     else True))
    ctx = mesh if mesh is not None else contextlib.nullcontext()

    def place(batch):
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        if mesh is not None:
            from ..core.mesh import shard_batch
            batch = shard_batch(mesh, batch)
        return batch

    eval_fn = None
    if val_batches_fn is not None:
        eval_fn = make_eval_step(cfg, lora_cfg=lora_cfg,
                                 ce_chunk=getattr(tcfg, "ce_chunk", 0),
                                 scan_mode=getattr(tcfg, "scan_mode", "xs"))
    place_val = place   # prefetch rebinding below must not affect val

    def run_val(step_no: int) -> float:
        tot = n = 0.0
        for vb in val_batches_fn():
            m = eval_fn(state.trainable, frozen, place_val(vb))
            w = float(m["valid"])
            tot += float(m["loss"]) * w
            n += w
        vl = tot / max(n, 1.0)
        log_fn(f"step {step_no}: val_loss={vl:.4f} "
               f"({int(n)} held-out tokens)")
        return vl

    if prefetch:
        from ..utils.prefetch import prefetch_to_device
        batches = prefetch_to_device(batches, size=prefetch, place=place)
        place = lambda b: b  # noqa: E731 — already staged by the producer
    # host-side step mirror: int(state.step) each iteration would force a
    # device sync per step and defeat async-dispatch runahead
    start = int(state.step)
    step_no = start
    with ctx:
        for i, batch in enumerate(batches):
            state, metrics = step_fn(state, frozen, place(batch))
            step_no = start + i + 1
            if tcfg.log_every and i % tcfg.log_every == 0:
                log_fn(f"step {step_no}: "
                       f"loss={float(metrics['loss']):.4f}")
            if (eval_fn is not None and val_every
                    and step_no % val_every == 0):
                run_val(step_no)
            maybe_save(ckpt, save_every, step_no, state)
        if eval_fn is not None and not (val_every
                                        and step_no % val_every == 0):
            run_val(step_no)   # final held-out loss (unless just ran)
    finish_saves(ckpt, save_every)
    return state


def restore_state(ckpt, like: MMTrainState,
                  step: Optional[int] = None) -> MMTrainState:
    """Restore a full train state saved by fit(ckpt=..., save_every=...).
    `like` provides structure/placement (a freshly built state)."""
    restored = ckpt.restore(step, like=like._asdict())
    return MMTrainState(**restored)

"""Stage (a): CSTP contrastive alignment training.

TPU-native counterpart of `CSTPLightning` (cstp_v3/modelling.py:472-601):
the Lightning module becomes a jitted train step over a device mesh — the
DP all-reduce Lightning got from DDP (`sync_dist=True`, modelling.py:504)
is inserted by XLA from the batch sharding.

Like the reference's recommended path, the encoders stay OUT of the training
graph: batches carry precomputed (seq_embedding, text_embedding) pairs
(UniProtQAVecDataset, my_datasets.py; precompute via cli precompute-embeddings
<- scripts/generate_esm_embedding.py). The trained state is just the two
projection linears.

NOTE on the contrastive batch: similarity logits are (B, B) with diagonal
targets, so the GLOBAL batch must stay intact — the (B, D) inputs shard over
the "data" axis and XLA all-gathers one side inside the p @ t.T matmul; the
evidential loss width stays the global B (the reference hard-wires this
coupling as W=c=128, evidence_loss.py:44-47).
"""

from __future__ import annotations

from typing import Iterator, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..bridge import cstp, losses
from ..core.config import CSTPConfig, TrainConfig
from .multimodal_trainer import finish_saves, maybe_save
from .optim import adamw


class CSTPTrainState(NamedTuple):
    params: dict
    opt_state: tuple
    step: jnp.ndarray


def create_state(key, cfg: CSTPConfig, tcfg: TrainConfig,
                 total_steps: Optional[int] = None) -> Tuple[CSTPTrainState, object]:
    params = cstp.init(key, cfg)
    tx = adamw(tcfg, total_steps)
    return CSTPTrainState(params, tx.init(params), jnp.zeros((), jnp.int32)), tx


def loss_and_metrics(params, cfg: CSTPConfig, seq_emb, text_emb, step):
    p, t = cstp.forward(params, seq_emb, text_emb)
    al = cstp.alignment(p, t)
    loss = losses.trust_evidence(al["protein2text"], al["text2protein"],
                                 al["targets"], cfg)
    w = getattr(cfg, "warmup_info_nce_steps", 0)
    if w:   # dead-gradient protection (CSTPConfig.warmup_info_nce_steps)
        # warm-up temperature tracks cfg.temperature at the reference's own
        # InfoNCE_h : TrustEvidence ratio (0.007 : 0.0007) so the fallback
        # optimizes the same logit scale whose saturation it escapes
        l_nce = losses.info_nce_sym(al["protein2text"], al["text2protein"],
                                    al["targets"],
                                    temperature=10.0 * cfg.temperature)
        use_nce = (step < w) if w > 0 else losses.evidence_is_dead(
            al["protein2text"], al["text2protein"], cfg)
        loss = jnp.where(use_nce, l_nce, loss)
    acc_p2t = cstp.retrieval_accuracy(al["protein2text"], al["targets"])
    acc_t2p = cstp.retrieval_accuracy(al["text2protein"], al["targets"])
    metrics = {"loss": loss, "acc_seq2text": acc_p2t, "acc_text2seq": acc_t2p}
    if w:
        # surface fallback steps: default config never enters this branch,
        # but when the warm-up is opted in, the log must show which loss ran
        metrics["warmup_active"] = use_nce.astype(jnp.float32)
    return loss, metrics


def make_train_step(cfg: CSTPConfig, tx):
    @jax.jit
    def train_step(state: CSTPTrainState, seq_emb, text_emb):
        def lf(p):
            return loss_and_metrics(p, cfg, seq_emb, text_emb, state.step)
        (loss, metrics), grads = jax.value_and_grad(lf, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return CSTPTrainState(new_params, new_opt, state.step + 1), metrics
    return train_step


def make_eval_step(cfg: CSTPConfig):
    @jax.jit
    def eval_step(params, seq_emb, text_emb):
        _, metrics = loss_and_metrics(params, cfg, seq_emb, text_emb,
                                      jnp.zeros((), jnp.int32))
        return metrics
    return eval_step


def evaluate(params, cfg: CSTPConfig, batches) -> dict:
    """Mean loss + bidirectional retrieval accuracy over a val/test split
    (CSTPLightning validation/test epoch summaries, modelling.py:510-582)."""
    ev = make_eval_step(cfg)
    sums: dict = {}
    n = 0
    for se, te in batches:
        m = ev(params, jnp.asarray(se), jnp.asarray(te))
        for k, v in m.items():
            sums[k] = sums.get(k, 0.0) + float(v)
        n += 1
    return {k: v / max(n, 1) for k, v in sums.items()}


def fit(state: CSTPTrainState, tx, cfg: CSTPConfig, tcfg: TrainConfig,
        batches: Iterator[Tuple[np.ndarray, np.ndarray]],
        val_batches_fn=None, mesh=None, log_fn=print,
        prefetch: int = 2, ckpt=None,
        save_every: int = 0) -> CSTPTrainState:
    """Minimal epoch loop: batches yield (seq_emb, text_emb) of equal B.

    Replaces pl.Trainer.fit for the fully-specified Lightning module the
    reference ships without a launcher (SURVEY.md intro). `val_batches_fn`
    (callable -> iterator) triggers a validation pass every `log_every`
    logging step. With `mesh`, this is the stage-(a) DP path (Lightning
    DDP's role): params/opt replicate, embedding batches shard over
    "data", XLA inserts the gradient all-reduce. NOTE the contrastive
    in-batch similarity matrix spans the GLOBAL batch, so the sharded loss
    equals the single-device loss only through XLA's all-gather of the
    projected embeddings — which the jitted matmul p @ t.T induces.
    """
    import contextlib

    step_fn = make_train_step(cfg, tx)
    ctx = mesh if mesh is not None else contextlib.nullcontext()
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        rep = NamedSharding(mesh, P())
        state = CSTPTrainState(
            jax.device_put(state.params, rep),
            jax.device_put(state.opt_state, rep),
            jax.device_put(state.step, rep))
    def place(pair):
        se, te = jnp.asarray(pair[0]), jnp.asarray(pair[1])
        if mesh is not None:
            from ..core.mesh import shard_batch
            se, te = shard_batch(mesh, (se, te))
        return se, te

    if prefetch:
        from ..utils.prefetch import prefetch_to_device
        batches = prefetch_to_device(batches, size=prefetch, place=place)
        place = lambda b: b  # noqa: E731 — already staged by the producer
    # host-side step mirror: int(state.step) each iteration would force a
    # device sync per step and defeat async-dispatch runahead
    start = int(state.step)
    with ctx:
        for i, (se, te) in enumerate(map(place, batches)):
            state, metrics = step_fn(state, se, te)
            step_no = start + i + 1
            maybe_save(ckpt, save_every, step_no, state)
            if tcfg.log_every and i % tcfg.log_every == 0:
                m = {k: float(v) for k, v in metrics.items()}
                log_fn(f"step {step_no}: " +
                       " ".join(f"{k}={v:.4f}" for k, v in m.items()))
                if val_batches_fn is not None:
                    vm = evaluate(state.params, cfg, val_batches_fn())
                    log_fn("  val: " + " ".join(f"{k}={v:.4f}"
                                                for k, v in vm.items()))
    finish_saves(ckpt, save_every)
    return state


def restore_state(ckpt, like: CSTPTrainState,
                  step: Optional[int] = None) -> CSTPTrainState:
    """Restore a full stage-(a) train state saved by fit(ckpt=...)."""
    restored = ckpt.restore(step, like=like._asdict())
    return CSTPTrainState(**restored)

"""Optimizer construction (optax) for all training stages.

Stage (a) reproduces the reference's AdamW(lr=0.05, weight_decay=1e-4)
tuned for the evidential loss (cstp_v3/modelling.py:594-601); stages (c)/(d)
use conventional warmup+cosine AdamW. Optimizer state is a pytree, so the
same `pjit` sharding rules that shard parameters shard the moments — the
ZeRO/DeepSpeed role in the reference stack (SURVEY.md §2b) falls out for
free.
"""

from __future__ import annotations

from typing import Optional

import optax

from ..core.config import TrainConfig


def adamw(cfg: TrainConfig, total_steps: Optional[int] = None):
    if cfg.warmup_steps > 0 and total_steps:
        lr = optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=cfg.learning_rate,
            warmup_steps=cfg.warmup_steps,
            decay_steps=max(total_steps, cfg.warmup_steps + 1))
    else:
        lr = cfg.learning_rate
    tx = optax.adamw(learning_rate=lr, weight_decay=cfg.weight_decay,
                     b1=0.9, b2=0.999, eps=1e-8)
    if cfg.grad_clip_norm > 0:
        tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip_norm), tx)
    return tx

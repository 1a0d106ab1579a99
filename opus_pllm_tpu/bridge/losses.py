"""Contrastive losses for stage-(a) CSTP training.

Faithful fp32 re-derivations of the reference losses:
- `info_nce`       <- InfoNCELoss (T=0.0007, one direction; modelling.py:276-289)
- `info_nce_sym`   <- InfoNCELoss_h (T=0.007, symmetric; modelling.py:291-309)
- `trust_evidence` <- TrustEvidenceLoss (T=0.0007, symmetric evidential CE;
                      modelling.py:311-332) — the ACTIVE loss (modelling.py:479)
- `evidential_ce`  <- evidence_loss.ce_loss (cstp_v3/evidence_loss.py:44-66):
  ELU+1 evidence, Dirichlet alpha = evidence + W/c, digamma CE term, plus a
  KL-to-uniform-Dirichlet term annealed after `threshold` steps.

The reference hard-codes W=c=128, silently requiring contrastive batch 128
(SURVEY.md §7 hard part 5); here num_classes defaults to the logits' width and
W/c stay configurable.

KNOWN DEAD-GRADIENT REGION (inherited from the reference design): with
T=0.0007, similarity logits scale to O(1000); whenever ALL of a row's
scaled logits are below ~-15, `elu(x)+1` evidence saturates to 0 with
fp32-zero gradient and training stalls at a constant loss. Real CSTP data
produces positive diagonal similarities so the reference never hits this,
but cold-start embeddings can (see tests/test_integration.py). If it bites,
warm up with `info_nce_sym` for a few steps or raise `temperature`.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..core.config import CSTPConfig


def _xent(logits, targets):
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, targets[:, None], axis=1))


def info_nce(p2t_logits, targets, temperature: float = 0.0007):
    return _xent(p2t_logits / temperature, targets)


def info_nce_sym(p2t_logits, t2p_logits, targets, temperature: float = 0.007):
    return 0.5 * (_xent(p2t_logits / temperature, targets)
                  + _xent(t2p_logits / temperature, targets))


def dirichlet_kl(alpha):
    """KL( Dir(alpha) || Dir(1) ), per row (evidence_loss.py:17-31)."""
    a = alpha.astype(jnp.float32)
    c = jnp.asarray(a.shape[-1], jnp.float32)
    s = jnp.sum(a, axis=-1, keepdims=True)
    # lgamma(sum(ones)) = lgamma(c): the Dir(1) normalizer
    first = (jax.lax.lgamma(s)
             - jnp.sum(jax.lax.lgamma(a), axis=-1, keepdims=True)
             - jax.lax.lgamma(c))
    second = jnp.sum((a - 1.0) * (jax.scipy.special.digamma(a)
                                  - jax.scipy.special.digamma(s)),
                     axis=-1, keepdims=True)
    return first + second


def evidential_ce(logits, targets, *, global_step: int = 100,
                  w: Optional[float] = None, num_classes: Optional[int] = None,
                  annealing_steps: int = 500, kl_threshold: int = 30,
                  kl_coefficient: float = 1.0):
    """Evidential (Dirichlet) cross-entropy (evidence_loss.py:44-66).

    evidence = elu(logits)+1; alpha = evidence + W/c. CE term is
    sum_k y_k (digamma(S) - digamma(alpha_k)); KL term pushes non-target
    evidence toward the uniform Dirichlet, annealed in after `kl_threshold`.
    """
    x = logits.astype(jnp.float32)
    c = num_classes if num_classes is not None else x.shape[-1]
    w = float(w if w is not None else c)
    evidence = jax.nn.elu(x) + 1.0
    alpha = evidence + w / c
    s = jnp.sum(alpha, axis=-1, keepdims=True)
    label = jax.nn.one_hot(targets, x.shape[-1], dtype=jnp.float32)
    a_term = jnp.sum(label * (jax.scipy.special.digamma(s)
                              - jax.scipy.special.digamma(alpha)),
                     axis=-1, keepdims=True)
    if global_step >= kl_threshold:
        coef = min(kl_coefficient, (global_step - kl_threshold + 1) / annealing_steps)
    else:
        coef = 0.0
    alp = (alpha - 1.0) * (1.0 - label) + 1.0
    b_term = coef * dirichlet_kl(alp)
    return jnp.mean(a_term + b_term)


def evidential_likelihood(logits, targets, *, global_step: int = 100,
                          w: Optional[float] = None,
                          num_classes: Optional[int] = None,
                          annealing_steps: int = 500, kl_threshold: int = 30,
                          kl_coefficient: float = 1.0):
    """Dirichlet likelihood variant (evidence_loss.likelihood_loss:69-86):
    CE term log(S) - log(alpha_k) instead of the digamma pair."""
    x = logits.astype(jnp.float32)
    c = num_classes if num_classes is not None else x.shape[-1]
    w = float(w if w is not None else c)
    alpha = jax.nn.elu(x) + 1.0 + w / c
    s = jnp.sum(alpha, axis=-1, keepdims=True)
    label = jax.nn.one_hot(targets, x.shape[-1], dtype=jnp.float32)
    a_term = jnp.sum(label * (jnp.log(s) - jnp.log(alpha)),
                     axis=-1, keepdims=True)
    coef = (min(kl_coefficient, (global_step - kl_threshold + 1) / annealing_steps)
            if global_step >= kl_threshold else 0.0)
    alp = (alpha - 1.0) * (1.0 - label) + 1.0
    return jnp.mean(a_term + coef * dirichlet_kl(alp))


def evidential_mse(logits, targets, *, global_step: int = 100,
                   w: Optional[float] = None,
                   num_classes: Optional[int] = None,
                   annealing_steps: int = 500, kl_threshold: int = 30,
                   kl_coefficient: float = 1.0):
    """Dirichlet MSE variant (evidence_loss.mse_loss:89-107): squared error
    to the expected class probability alpha/S plus the Dirichlet variance."""
    x = logits.astype(jnp.float32)
    c = num_classes if num_classes is not None else x.shape[-1]
    w = float(w if w is not None else c)
    alpha = jax.nn.elu(x) + 1.0 + w / c
    s = jnp.sum(alpha, axis=-1, keepdims=True)
    label = jax.nn.one_hot(targets, x.shape[-1], dtype=jnp.float32)
    err = jnp.sum(jnp.square(label - alpha / s), axis=-1, keepdims=True)
    var = jnp.sum(alpha * (s - alpha) / (s * s * (s + 1.0)),
                  axis=-1, keepdims=True)
    coef = (min(kl_coefficient, (global_step - kl_threshold + 1) / annealing_steps)
            if global_step >= kl_threshold else 0.0)
    alp = (alpha - 1.0) * (1.0 - label) + 1.0
    return jnp.mean(err + var + coef * dirichlet_kl(alp))


EVIDENTIAL_LOSSES = {"ce": evidential_ce, "likelihood": evidential_likelihood,
                     "mse": evidential_mse}


def trust_evidence(p2t_logits, t2p_logits, targets,
                   cfg: Optional[CSTPConfig] = None):
    """Symmetric evidential loss at T=0.0007 (modelling.py:311-332)."""
    cfg = cfg or CSTPConfig()
    kw = dict(global_step=cfg.evidence_global_step,
              annealing_steps=cfg.kl_annealing_steps,
              kl_threshold=cfg.kl_threshold_step,
              kl_coefficient=cfg.kl_coefficient)
    lp = evidential_ce(p2t_logits / cfg.temperature, targets, **kw)
    lt = evidential_ce(t2p_logits / cfg.temperature, targets, **kw)
    return 0.5 * (lp + lt)


def evidence_is_dead(p2t_logits, t2p_logits, cfg: CSTPConfig,
                     threshold: float = 1e-3):
    """True when the evidential loss is in its zero-gradient region: the
    LARGEST scaled similarity's elu+1 evidence is below `threshold`, so
    every evidence in the batch has saturated to ~0 and the Dirichlet CE
    is flat (module docstring). Used by the trainer's auto warm-up."""
    x = jnp.maximum(jnp.max(p2t_logits), jnp.max(t2p_logits)) \
        / cfg.temperature
    return (jax.nn.elu(x.astype(jnp.float32)) + 1.0) < threshold

"""CSTP loss goldens: JAX losses vs a direct torch transcription of the
reference formulas (cstp_v3/evidence_loss.py, modelling.py:276-332)."""

import numpy as np
import pytest
import jax.numpy as jnp

from opus_pllm_tpu.bridge import losses
from opus_pllm_tpu.core.config import CSTPConfig


def _torch_ce_loss(logits, p, global_step, W, c, annealing_step=500,
                   kl_coefficient=1, threshold_kl=30):
    """Direct transcription of evidence_loss.ce_loss (torch, fp32)."""
    import torch
    import torch.nn.functional as F

    logits = torch.tensor(logits, dtype=torch.float32)
    p = torch.tensor(p, dtype=torch.long)
    evidence = F.elu(logits) + 1
    alpha = evidence + W / c
    S = torch.sum(alpha, dim=1, keepdim=True)
    E = alpha - 1
    label = F.one_hot(p, num_classes=c)
    A = torch.sum(label * (torch.digamma(S) - torch.digamma(alpha)),
                  dim=1, keepdim=True)
    if global_step >= threshold_kl:
        coef = min(kl_coefficient, (global_step - threshold_kl + 1) / annealing_step)
    else:
        coef = 0.0
    alp = E * (1 - label) + 1
    ones = torch.ones([1, c], dtype=torch.float32)
    sum_alpha = torch.sum(alp, dim=1, keepdim=True)
    first = (torch.lgamma(sum_alpha) - torch.lgamma(alp).sum(dim=1, keepdim=True)
             + torch.lgamma(ones).sum(dim=1, keepdim=True)
             - torch.lgamma(ones.sum(dim=1, keepdim=True)))
    second = torch.sum((alp - ones) * (torch.digamma(alp) - torch.digamma(sum_alpha)),
                       dim=1, keepdim=True)
    B = coef * (first + second)
    return float((A + B).mean())


@pytest.mark.parametrize("global_step", [0, 100, 1000])
def test_evidential_ce_matches_torch(global_step):
    pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    B = 16
    logits = rng.normal(size=(B, B)).astype(np.float32) * 3
    targets = np.arange(B)
    ours = float(losses.evidential_ce(jnp.asarray(logits), jnp.asarray(targets),
                                      global_step=global_step, w=B, num_classes=B))
    ref = _torch_ce_loss(logits, targets, global_step, W=B, c=B)
    # tolerance bounded by lgamma/digamma implementation differences
    np.testing.assert_allclose(ours, ref, rtol=5e-4, atol=5e-4)


def test_evidential_ce_big_logits_finite():
    """T=0.0007 yields |logits| up to ~1400; loss must stay finite in fp32."""
    rng = np.random.default_rng(1)
    B = 8
    sims = rng.uniform(-1, 1, size=(B, B)).astype(np.float32)
    logits = jnp.asarray(sims) / 0.0007
    out = losses.evidential_ce(logits, jnp.arange(B), global_step=1000, w=B)
    assert np.isfinite(float(out))


def test_trust_evidence_symmetric():
    rng = np.random.default_rng(2)
    B = 8
    p2t = rng.normal(size=(B, B)).astype(np.float32)
    cfg = CSTPConfig()
    a = losses.trust_evidence(jnp.asarray(p2t), jnp.asarray(p2t.T),
                              jnp.arange(B), cfg)
    b = losses.trust_evidence(jnp.asarray(p2t.T), jnp.asarray(p2t),
                              jnp.arange(B), cfg)
    np.testing.assert_allclose(float(a), float(b), rtol=1e-6)


def test_info_nce_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    rng = np.random.default_rng(3)
    B = 12
    preds = rng.normal(size=(B, B)).astype(np.float32) * 0.01
    t = 0.0007
    ref = float(F.cross_entropy(torch.tensor(preds) / t, torch.arange(B)))
    ours = float(losses.info_nce(jnp.asarray(preds), jnp.arange(B), t))
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


def test_info_nce_sym_average():
    rng = np.random.default_rng(4)
    B = 6
    p2t = rng.normal(size=(B, B)).astype(np.float32)
    t2p = rng.normal(size=(B, B)).astype(np.float32)
    s = losses.info_nce_sym(jnp.asarray(p2t), jnp.asarray(t2p), jnp.arange(B))
    a = losses.info_nce(jnp.asarray(p2t), jnp.arange(B), 0.007)
    b = losses.info_nce(jnp.asarray(t2p), jnp.arange(B), 0.007)
    np.testing.assert_allclose(float(s), 0.5 * (float(a) + float(b)), rtol=1e-6)


def test_evidence_is_dead_detector():
    cfg = CSTPConfig.tiny()
    # all similarities strongly negative at T=0.0007 -> saturated evidence
    dead = -0.5 * np.ones((4, 4), np.float32)
    alive = dead.copy()
    alive[0, 0] = 0.1
    assert bool(losses.evidence_is_dead(jnp.asarray(dead),
                                        jnp.asarray(dead), cfg))
    assert not bool(losses.evidence_is_dead(jnp.asarray(alive),
                                            jnp.asarray(dead), cfg))


def test_auto_warmup_escapes_dead_gradient_region():
    """Cold-start embeddings with all-negative similarities: the pure
    evidential loss has exactly zero gradient; warmup_info_nce_steps=-1
    switches to info_nce_sym on dead steps and training moves."""
    import jax

    from opus_pllm_tpu.bridge import cstp
    from opus_pllm_tpu.core.config import TrainConfig
    from opus_pllm_tpu.train import cstp_trainer

    rng = np.random.default_rng(0)
    b = 8
    cfg_dead = CSTPConfig(protein_dim=16, text_dim=24, proj_dim=24,
                          warmup_info_nce_steps=0)
    cfg_auto = CSTPConfig(protein_dim=16, text_dim=24, proj_dim=24,
                          warmup_info_nce_steps=-1)
    seq = rng.standard_normal((b, 16)).astype(np.float32)
    txt = rng.standard_normal((b, 24)).astype(np.float32)

    state, tx = cstp_trainer.create_state(
        jax.random.PRNGKey(0), cfg_dead,
        TrainConfig(learning_rate=1e-2, weight_decay=0.0))
    # force the dead region: zero kernels + opposite-sign biases make every
    # similarity exactly -proj_dim (all pairs), saturating the evidence
    params = jax.tree.map(lambda x: x, state.params)
    params["protein_projection"]["kernel"] = jnp.zeros_like(
        params["protein_projection"]["kernel"])
    params["protein_projection"]["bias"] = -jnp.ones_like(
        params["protein_projection"]["bias"])
    params["text_projection"]["kernel"] = jnp.zeros_like(
        params["text_projection"]["kernel"])
    params["text_projection"]["bias"] = jnp.ones_like(
        params["text_projection"]["bias"])
    al = cstp.alignment(*cstp.forward(params, jnp.asarray(seq),
                                      jnp.asarray(txt)))
    assert bool(losses.evidence_is_dead(al["protein2text"],
                                        al["text2protein"], cfg_dead)), \
        "fixture failed to reach the dead region"

    # (a) pure evidential loss: zero gradient exactly
    g_dead = jax.grad(lambda p: cstp_trainer.loss_and_metrics(
        p, cfg_dead, jnp.asarray(seq), jnp.asarray(txt),
        jnp.zeros((), jnp.int32))[0])(params)
    assert max(float(jnp.max(jnp.abs(g))) for g in jax.tree.leaves(g_dead)) \
        == 0.0

    # (b) auto fallback: nonzero gradient, and a few steps reduce the loss
    g_auto = jax.grad(lambda p: cstp_trainer.loss_and_metrics(
        p, cfg_auto, jnp.asarray(seq), jnp.asarray(txt),
        jnp.zeros((), jnp.int32))[0])(params)
    assert max(float(jnp.max(jnp.abs(g))) for g in jax.tree.leaves(g_auto)) \
        > 0.0
    def delta(a, b):
        return max(float(jnp.max(jnp.abs(x - y)))
                   for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)))

    # with warmup off the optimizer receives all-zero grads: frozen solid
    state_d = cstp_trainer.CSTPTrainState(params, tx.init(params),
                                          jnp.zeros((), jnp.int32))
    step_d = cstp_trainer.make_train_step(cfg_dead, tx)
    for _ in range(3):
        state_d, _ = step_d(state_d, jnp.asarray(seq), jnp.asarray(txt))
    assert delta(state_d.params, params) == 0.0

    # auto fallback: the same steps actually move the parameters
    state_a = cstp_trainer.CSTPTrainState(params, tx.init(params),
                                          jnp.zeros((), jnp.int32))
    step_a = cstp_trainer.make_train_step(cfg_auto, tx)
    for _ in range(3):
        state_a, _ = step_a(state_a, jnp.asarray(seq), jnp.asarray(txt))
    assert delta(state_a.params, params) > 1e-4

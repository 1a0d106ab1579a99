"""CSTP adapter: forward semantics + parity vs a torch transcription of the
reference model (cstp_v3/modelling.py:335-469)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opus_pllm_tpu.bridge import cstp
from opus_pllm_tpu.core.config import CSTPConfig


def test_forward_shapes():
    cfg = CSTPConfig.tiny()
    params = cstp.init(jax.random.PRNGKey(0), cfg)
    p = jnp.ones((4, cfg.protein_dim))
    t = jnp.ones((4, cfg.text_dim))
    pp, pt = cstp.forward(params, p, t)
    assert pp.shape == (4, cfg.proj_dim)
    assert pt.shape == (4, cfg.proj_dim)


def test_protein_forward_equals_forward_branch():
    cfg = CSTPConfig.tiny()
    params = cstp.init(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.normal(size=(3, cfg.protein_dim)).astype(np.float32))
    t = jnp.asarray(rng.normal(size=(3, cfg.text_dim)).astype(np.float32))
    full, _ = cstp.forward(params, p, t)
    solo = cstp.protein_forward(params, p)
    np.testing.assert_allclose(np.asarray(full), np.asarray(solo), rtol=1e-6)


def test_alignment_diagonal_targets():
    rng = np.random.default_rng(1)
    pp = jnp.asarray(rng.normal(size=(5, 7)).astype(np.float32))
    pt = jnp.asarray(rng.normal(size=(5, 7)).astype(np.float32))
    out = cstp.alignment(pp, pt)
    assert out["protein2text"].shape == (5, 5)
    np.testing.assert_allclose(np.asarray(out["protein2text"]),
                               np.asarray(out["text2protein"]).T, rtol=1e-6)
    assert out["targets"].tolist() == [0, 1, 2, 3, 4]


def test_parity_vs_torch_reference():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    cfg = CSTPConfig.tiny()
    params = cstp.init(jax.random.PRNGKey(2), cfg)
    rng = np.random.default_rng(2)
    p = rng.normal(size=(6, cfg.protein_dim)).astype(np.float32)
    t = rng.normal(size=(6, cfg.text_dim)).astype(np.float32)

    # torch transcription of CSTPBase.forward + alignment_seq_and_text_h
    wp = torch.tensor(np.asarray(params["protein_projection"]["kernel"]).T)
    bp = torch.tensor(np.asarray(params["protein_projection"]["bias"]))
    wt = torch.tensor(np.asarray(params["text_projection"]["kernel"]).T)
    bt = torch.tensor(np.asarray(params["text_projection"]["bias"]))
    with torch.no_grad():
        pn = F.normalize(torch.tensor(p), dim=-1)
        tn = F.normalize(torch.tensor(t), dim=-1)
        pp_ref = F.linear(pn, wp, bp)
        pt_ref = F.linear(tn, wt, bt)
        p2t_ref = (pp_ref @ pt_ref.t()).numpy()

    pp, pt = cstp.forward(params, jnp.asarray(p), jnp.asarray(t))
    out = cstp.alignment(pp, pt)
    np.testing.assert_allclose(np.asarray(pp), pp_ref.numpy(), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["protein2text"]), p2t_ref,
                               rtol=1e-4, atol=1e-4)


def test_retrieval_accuracy():
    logits = jnp.asarray(np.eye(4, dtype=np.float32))
    acc = cstp.retrieval_accuracy(logits, jnp.arange(4))
    assert float(acc) == 1.0
    acc2 = cstp.retrieval_accuracy(jnp.asarray(np.roll(np.eye(4), 1, 0).astype(np.float32)),
                                   jnp.arange(4))
    assert float(acc2) == 0.0

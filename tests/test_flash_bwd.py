"""Pallas flash-attention backward kernels vs XLA reference gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from opus_pllm_tpu.kernels.flash_attention import flash_attention
from opus_pllm_tpu.models.layers import attention_xla, padding_mask


def _grads(fn, q, k, v):
    return jax.grad(lambda q, k, v: jnp.sum(fn(q, k, v) ** 2),
                    argnums=(0, 1, 2))(q, k, v)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("gqa", [False, True])
def test_bwd_kernel_matches_xla(causal, gqa):
    rng = np.random.default_rng(0)
    b, s, hq, d = 1, 16, 4, 128
    hkv = 2 if gqa else hq
    q = jnp.asarray(rng.normal(size=(b, s, hq, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, s, hkv, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, s, hkv, d)), jnp.float32)
    am = np.ones((b, s), bool)
    am[0, -3:] = False
    m4 = padding_mask(jnp.asarray(am))

    def flash_fn(q, k, v):
        return flash_attention(q, k, v, m4, causal=causal,
                               block_q=8, block_k=128)

    cm = m4
    if causal:
        tri = jnp.tril(jnp.ones((s, s), bool))[None, None]
        cm = m4 & tri

    def xla_fn(q, k, v):
        return attention_xla(q, k, v, cm)

    with pltpu.force_tpu_interpret_mode():
        gf = _grads(flash_fn, q, k, v)
    gx = _grads(xla_fn, q, k, v)
    for name, a, b_ in zip(("dq", "dk", "dv"), gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-3, atol=2e-3, err_msg=name)


def test_bwd_kernel_no_mask_causal():
    rng = np.random.default_rng(1)
    b, s, h, d = 1, 16, 2, 128
    q = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)

    def flash_fn(q, k, v):
        return flash_attention(q, k, v, None, causal=True,
                               block_q=8, block_k=128)

    tri = jnp.tril(jnp.ones((s, s), bool))[None, None]

    def xla_fn(q, k, v):
        return attention_xla(q, k, v, jnp.broadcast_to(tri, (b, 1, s, s)))

    with pltpu.force_tpu_interpret_mode():
        gf = _grads(flash_fn, q, k, v)
    gx = _grads(xla_fn, q, k, v)
    for a, b_ in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-3, atol=2e-3)


def test_fully_masked_rows_zero_grads():
    """Padding rows (all keys masked) contribute exactly zero gradient —
    the stable convention; the XLA reference leaks uniform-attention grads
    for such rows, which is why they must never reach a loss."""
    rng = np.random.default_rng(3)
    b, s, h, d = 2, 16, 2, 128
    q = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
    am = np.ones((b, s), bool)
    am[1, :] = False                      # batch row 1 fully padded
    m4 = padding_mask(jnp.asarray(am))

    def flash_fn(q, k, v):
        return flash_attention(q, k, v, m4, block_q=8, block_k=128)

    with pltpu.force_tpu_interpret_mode():
        gf = _grads(flash_fn, q, k, v)
    gx = _grads(lambda q, k, v: attention_xla(q, k, v, m4), q, k, v)
    # valid batch row matches the reference
    for a, b_ in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a)[0], np.asarray(b_)[0],
                                   rtol=2e-3, atol=2e-3)
    # padded batch row: exactly zero from the Pallas bwd
    for a in gf:
        assert np.abs(np.asarray(a)[1]).max() == 0.0


def test_d64_grads():
    """Padded d=64 path differentiates through the Pallas bwd kernels."""
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.normal(size=(1, 16, 2, 64)), jnp.float32)
    k, v = q + 0.1, q + 0.2
    m4 = padding_mask(jnp.ones((1, 16), bool))

    def flash_fn(q, k, v):
        return flash_attention(q, k, v, m4, block_q=8, block_k=128)

    with pltpu.force_tpu_interpret_mode():
        gf = _grads(flash_fn, q, k, v)
    gx = _grads(lambda q, k, v: attention_xla(q, k, v, m4), q, k, v)
    for a, b_ in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-3, atol=2e-3)

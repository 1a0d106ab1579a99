"""Flash attention custom VJP: grads match the XLA reference (interpret
mode on CPU; the kernel itself is hardware-validated separately)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from opus_pllm_tpu.kernels.flash_attention import flash_attention
from opus_pllm_tpu.models.layers import attention_xla, padding_mask


def test_flash_grads_match_xla():
    rng = np.random.default_rng(0)
    b, s, h, d = 1, 16, 2, 128
    q = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
    m = padding_mask(jnp.ones((b, s), bool))

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, m, block_q=8,
                                       block_k=128) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(attention_xla(q, k, v, m) ** 2)

    with pltpu.force_tpu_interpret_mode():
        gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-3, atol=2e-3)


def test_flash_forward_interpret_matches_xla():
    rng = np.random.default_rng(1)
    b, s, h, d = 1, 16, 2, 128
    q = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
    m = padding_mask(jnp.ones((b, s), bool))
    with pltpu.force_tpu_interpret_mode():
        o = flash_attention(q, k, v, m, block_q=8, block_k=128)
    ox = attention_xla(q, k, v, m)
    np.testing.assert_allclose(np.asarray(o), np.asarray(ox), rtol=1e-4,
                               atol=1e-4)

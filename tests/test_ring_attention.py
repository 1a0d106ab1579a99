"""Ring attention over the virtual 8-device "seq" mesh vs single-device
attention — the sequence-parallel long-context path (parallel/ring.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opus_pllm_tpu.models.layers import attention_xla
from opus_pllm_tpu.parallel import ring


def _mk(b=2, s=64, h=4, d=32, seed=0, pad_rows=(0, 11)):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((b, s, h, d)) * 0.5, jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, h, d)) * 0.5, jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    mask = np.ones((b, s), bool)
    for i, p in enumerate(pad_rows):
        if p:
            mask[i, -p:] = False        # right-padded rows
    return q, k, v, jnp.asarray(mask)


def _reference(q, k, v, mask, causal):
    b, s, _, _ = q.shape
    m4 = mask[:, None, None, :]
    if causal:
        rows = jnp.arange(s)[None, None, :, None]
        cols = jnp.arange(s)[None, None, None, :]
        m4 = m4 & (cols <= rows)
    return attention_xla(q, k, v, m4)


@pytest.mark.parametrize("causal", [True, False])
@pytest.mark.parametrize("n_dev", [2, 4, 8])
def test_ring_matches_single_device(causal, n_dev):
    q, k, v, mask = _mk()
    mesh = ring.make_sp_mesh(n_dev)
    out = np.asarray(ring.ring_self_attention(mesh, q, k, v, mask,
                                              causal=causal))
    ref = np.asarray(_reference(q, k, v, mask, causal))
    # padded QUERY rows attend over valid keys in both paths (kv_mask masks
    # keys, matching attention_xla); compare everything
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_ring_gqa_shapes_and_uneven_heads():
    # H=8 heads, D=16: head count independent of ring size
    q, k, v, mask = _mk(b=1, s=32, h=8, d=16, seed=3, pad_rows=(5,))
    mesh = ring.make_sp_mesh(4)
    out = np.asarray(ring.ring_self_attention(mesh, q, k, v, mask,
                                              causal=True))
    ref = np.asarray(_reference(q, k, v, mask, True))
    valid = np.asarray(mask)[..., None, None]
    np.testing.assert_allclose(out * valid, ref * valid,
                               rtol=2e-5, atol=2e-5)


def test_ring_grad_flows():
    """Differentiable end to end (training-path usability): grads wrt q
    match the single-device reference."""
    q, k, v, mask = _mk(b=1, s=16, h=2, d=8, seed=5, pad_rows=(0,))
    mesh = ring.make_sp_mesh(2)

    def loss_ring(q):
        return jnp.sum(ring.ring_self_attention(mesh, q, k, v, mask,
                                                causal=True) ** 2)

    def loss_ref(q):
        return jnp.sum(_reference(q, k, v, mask, True) ** 2)

    g_ring = np.asarray(jax.grad(loss_ring)(q))
    g_ref = np.asarray(jax.grad(loss_ref)(q))
    np.testing.assert_allclose(g_ring, g_ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("hq,hkv", [(4, 4), (8, 2)])
def test_sharded_decode_attention_matches_single_device(hq, hkv):
    """LSE-merged partial attention over a sequence-sharded KV cache ==
    single-device attention with the global mask (the SP decode core)."""
    import functools

    from jax.sharding import PartitionSpec as P

    b, s, d, n_dev = 2, 64, 32, 4
    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.standard_normal((b, 1, hq, d)) * 0.5, jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, hkv, d)) * 0.5, jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, hkv, d)), jnp.float32)
    mask = np.ones((b, s), bool)
    mask[0, 50:] = False                  # partially-filled cache
    mask[1, 23:] = False
    mask = jnp.asarray(mask)

    ref = np.asarray(attention_xla(q, k, v, mask[:, None, None, :]))

    mesh = ring.make_sp_mesh(n_dev)
    fn = jax.shard_map(
        functools.partial(ring.sharded_decode_attention),
        mesh=mesh,
        in_specs=(P(), P(None, ring.SEQ_AXIS), P(None, ring.SEQ_AXIS),
                  P(None, ring.SEQ_AXIS)),
        out_specs=P())
    out = np.asarray(jax.jit(fn)(q, k, v, mask))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)

"""Int8 weight-only quantization: numerics, kernel parity, decoder e2e."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opus_pllm_tpu.kernels import quant
from opus_pllm_tpu.models import decoder
from opus_pllm_tpu.models.layers import causal_mask
from opus_pllm_tpu.core.config import DecoderConfig


def test_quantize_roundtrip_error_bounded():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(64, 32)).astype(np.float32))
    q, s = quant.quantize_per_channel(w)
    assert q.dtype == jnp.int8 and s.shape == (32,)
    back = quant.dequantize(q, s)
    # max error per channel bounded by scale/2
    err = np.abs(np.asarray(back - w))
    assert (err <= np.asarray(s)[None, :] * 0.51).all()


def test_int8_matmul_xla_close_to_float():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(8, 64)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(64, 32)).astype(np.float32))
    q, s = quant.quantize_per_channel(w)
    y_q = quant.int8_matmul(x, q, s, impl="xla")
    y_f = x @ w
    rel = np.abs(np.asarray(y_q - y_f)) / (np.abs(np.asarray(y_f)) + 1.0)
    assert rel.mean() < 0.02


def test_pallas_kernel_matches_xla_interpret():
    """Pallas path in interpreter mode == XLA reference."""
    import functools
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(2)
    m, k, n = 16, 256, 128
    x = jnp.asarray(rng.normal(size=(m, k)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(k, n)).astype(np.float32))
    q, s = quant.quantize_per_channel(w)

    bm, bn, bk = m, n, 128
    grid = (1, 1, k // bk)
    out = pl.pallas_call(
        functools.partial(quant._kernel, n_k=grid[2]),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j)),
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        interpret=True,
    )(x, q, s.reshape(1, n))
    ref = quant.int8_matmul(x, q, s, impl="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_pallas_kernel_k_not_multiple_of_block():
    """k % 128 == 0 but k % 512 != 0 must pick a dividing block, not feed a
    partial K tile into the accumulator (regression: NaN output)."""
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(256, 1280)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(1280, 256)).astype(np.float32))
    q, s = quant.quantize_per_channel(w)
    with pltpu.force_tpu_interpret_mode():
        y_p = quant.int8_matmul(x, q, s, impl="pallas")
    y_x = quant.int8_matmul(x, q, s, impl="xla")
    assert np.isfinite(np.asarray(y_p)).all()
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_x),
                               rtol=1e-4, atol=1e-4)


def test_int8_matmul_grad_matches_dequantized_reference():
    """Custom VJP: dx through the int8 matmul == dx through x @ dequant(w),
    on both the XLA path and the Pallas path (interpret mode)."""
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(256, 256)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(256, 128)), jnp.float32)
    q, s = quant.quantize_per_channel(w)
    wd = np.asarray(q, np.float32) * np.asarray(s)[None, :]
    g_ref = jax.grad(lambda x: jnp.sum((x @ jnp.asarray(wd)) ** 2))(x)
    g_xla = jax.grad(lambda x: jnp.sum(
        quant.int8_matmul(x, q, s, impl="xla") ** 2))(x)
    np.testing.assert_allclose(np.asarray(g_xla), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-4)
    with pltpu.force_tpu_interpret_mode():
        g_pl = jax.grad(lambda x: jnp.sum(
            quant.int8_matmul(x, q, s, impl="pallas") ** 2))(x)
    # interpret-mode fwd accumulates differently; grads large (~1e3)
    rel = (np.abs(np.asarray(g_pl) - np.asarray(g_ref)).max()
           / np.abs(np.asarray(g_ref)).max())
    assert rel < 1e-4, rel


def test_quantize_on_load_matches_post_quantize():
    """decoder_from_hf(quantize_int8=True) == load-then-quantize_decoder."""
    import pytest
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig, LlamaForCausalLM

    from opus_pllm_tpu.core import convert

    cfg = DecoderConfig.tiny()
    hf = LlamaForCausalLM(LlamaConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_layers, num_attention_heads=cfg.num_heads,
        num_key_value_heads=cfg.num_kv_heads, head_dim=cfg.head_dim,
        tie_word_embeddings=False)).eval()
    sd = hf.state_dict()
    a = convert.decoder_from_hf(sd, cfg, jnp.float32, quantize_int8=True)
    b = quant.quantize_decoder(convert.decoder_from_hf(sd, cfg, jnp.float32))
    qa = np.asarray(a["layers"][0]["q_proj"]["kernel_q"])
    qb = np.asarray(b["layers"][0]["q_proj"]["kernel_q"])
    # same per-channel quantization up to rounding ties
    assert (np.abs(qa.astype(int) - qb.astype(int)) <= 1).mean() > 0.999
    np.testing.assert_allclose(np.asarray(a["layers"][0]["q_proj"]["scale"]),
                               np.asarray(b["layers"][0]["q_proj"]["scale"]),
                               rtol=1e-5)


def test_quantized_decoder_forward_close():
    cfg = DecoderConfig.tiny()
    params = decoder.init(jax.random.PRNGKey(0), cfg)
    qparams = quant.quantize_decoder(params)
    assert "kernel_q" in qparams["layers"][0]["q_proj"]
    emb = jax.random.normal(jax.random.PRNGKey(1), (2, 6, cfg.hidden_size)) * 0.1
    mask = jnp.ones((2, 6), bool)
    pos = jnp.broadcast_to(jnp.arange(6), (2, 6))
    m4 = causal_mask(mask)
    full, _ = decoder.forward(params, cfg, emb, pos, m4)
    quanted, _ = decoder.forward(qparams, cfg, emb, pos, m4)
    pf = jax.nn.softmax(np.asarray(full), axis=-1)
    pq = jax.nn.softmax(np.asarray(quanted), axis=-1)
    # distributions stay close under weight-only int8
    assert np.abs(pf - pq).max() < 0.05

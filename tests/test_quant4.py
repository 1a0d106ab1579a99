"""Int4 grouped quantization: packing, kernel parity, VJP, decoder e2e."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opus_pllm_tpu.kernels import quant4
from opus_pllm_tpu.models import decoder
from opus_pllm_tpu.models.layers import causal_mask, dense
from opus_pllm_tpu.core.config import DecoderConfig


def _rand_weight(rng, k, n):
    return rng.normal(size=(k, n)).astype(np.float32)


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    q = rng.integers(-7, 8, size=(512, 128)).astype(np.int8)
    packed = quant4.pack_int4(q)
    assert packed.shape == (256, 128) and packed.dtype == np.int8
    back = quant4.unpack_int4(packed)
    np.testing.assert_array_equal(np.asarray(back), q)


def test_pack_unpack_v2_roundtrip():
    rng = np.random.default_rng(7)
    q = rng.integers(-7, 8, size=(1024, 128)).astype(np.int8)
    packed = quant4.pack_int4_v2(q)
    assert packed.shape == (128, 128) and packed.dtype == np.int32
    np.testing.assert_array_equal(np.asarray(quant4.unpack_int4_v2(packed)), q)
    # jnp path agrees with numpy
    pj = quant4.pack_int4_v2(jnp.asarray(q))
    np.testing.assert_array_equal(np.asarray(pj), packed)
    np.testing.assert_array_equal(
        np.asarray(quant4.unpack_int4_v2(jnp.asarray(packed))), q)


def test_quantize_linear4_picks_v2_for_512_multiples():
    rng = np.random.default_rng(8)
    p512 = quant4.quantize_linear4({"kernel": _rand_weight(rng, 512, 128)})
    assert p512["kernel_p"].dtype == np.int32          # v2
    p256 = quant4.quantize_linear4({"kernel": _rand_weight(rng, 256, 128)})
    assert p256["kernel_p"].dtype == np.int8           # v1


def test_quantize_linear4_layout_override():
    """layout='v1' forces nibble bytes even on 512-multiples (the
    training-load layout: XLA dequant fwd/bwd is faster on bytes —
    BENCH_NOTES round 4); both layouts dequantize to the same weights."""
    rng = np.random.default_rng(80)
    w = _rand_weight(rng, 512, 128)
    pv1 = quant4.quantize_linear4({"kernel": w}, layout="v1")
    pv2 = quant4.quantize_linear4({"kernel": w}, layout="auto")
    assert pv1["kernel_p"].dtype == np.int8
    assert pv2["kernel_p"].dtype == np.int32
    np.testing.assert_array_equal(
        np.asarray(quant4.unpack_int4(jnp.asarray(pv1["kernel_p"]))),
        np.asarray(quant4.unpack_int4_v2(jnp.asarray(pv2["kernel_p"]))))
    with pytest.raises(ValueError, match="layout"):
        quant4.quantize_linear4({"kernel": w}, layout="v3")


def test_quantize_decoder4_layout_threads_through():
    import jax

    from opus_pllm_tpu.core.config import DecoderConfig
    from opus_pllm_tpu.models import decoder as dec
    cfg = DecoderConfig(family="llama", vocab_size=64, hidden_size=512,
                        intermediate_size=512, num_layers=1, num_heads=4,
                        num_kv_heads=2, head_dim=128, dtype="float32")
    params = dec.init(jax.random.PRNGKey(0), cfg)
    v1 = quant4.quantize_decoder4(params, "v1")
    auto = quant4.quantize_decoder4(params)
    assert v1["layers"][0]["q_proj"]["kernel_p"].dtype == np.int8
    assert auto["layers"][0]["q_proj"]["kernel_p"].dtype == np.int32


def test_int4_matmul_v2_xla_matches_dequantized():
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.normal(size=(8, 1024)).astype(np.float32))
    w = _rand_weight(rng, 1024, 128)
    q, s = quant4.quantize_grouped(w)
    y_q = np.asarray(quant4.int4_matmul(
        x, jnp.asarray(quant4.pack_int4_v2(q)), jnp.asarray(s), impl="xla"),
        np.float32)
    y_ref = np.asarray(x) @ _dequant(q, s)
    assert np.abs(y_q - y_ref).max() < 0.005 * np.abs(y_ref).max()


def test_pallas_kernel_v2_matches_xla_interpret():
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(10)
    m, k, n = 16, 1536, 256          # k % 512 == 0, odd superblock count
    x = jnp.asarray(rng.normal(size=(m, k)).astype(np.float32))
    q, s = quant4.quantize_grouped(_rand_weight(rng, k, n))
    packed, s = jnp.asarray(quant4.pack_int4_v2(q)), jnp.asarray(s)
    with pltpu.force_tpu_interpret_mode():
        y_p = np.asarray(quant4.int4_matmul(x, packed, s, impl="pallas"),
                         np.float32)
    y_ref = np.asarray(x) @ _dequant(np.asarray(q), np.asarray(s))
    assert np.isfinite(y_p).all()
    # the +136 bias correction is exact up to fp32 summation-order
    # differences vs the MXU tree — bounded alongside bf16 rounding
    assert np.abs(y_p - y_ref).max() < 0.005 * np.abs(y_ref).max()


def test_grad_v2_matches_dequantized_reference():
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(8, 512)), jnp.float32)
    q, s = quant4.quantize_grouped(_rand_weight(rng, 512, 128))
    packed, s = jnp.asarray(quant4.pack_int4_v2(q)), jnp.asarray(s)
    wd = _dequant(np.asarray(q), np.asarray(s))
    g_ref = jax.grad(lambda x: jnp.sum((x @ jnp.asarray(wd)) ** 2))(x)
    g_xla = jax.grad(lambda x: jnp.sum(
        quant4.int4_matmul(x, packed, s, impl="xla") ** 2))(x)
    rel = (np.abs(np.asarray(g_xla) - np.asarray(g_ref)).max()
           / np.abs(np.asarray(g_ref)).max())
    assert rel < 2e-2, rel


def test_quantize_grouped_error_bounded():
    rng = np.random.default_rng(1)
    w = _rand_weight(rng, 512, 64)
    q, s = quant4.quantize_grouped(w)
    assert q.shape == w.shape and s.shape == (4, 64)
    back = (q.astype(np.float32).reshape(4, 128, 64) * s[:, None, :]
            ).reshape(512, 64)
    # per-(group, column) error bounded by scale/2
    err = np.abs(back - w).reshape(4, 128, 64).max(axis=1)
    assert (err <= s * 0.51).all()


def _dequant(q, s):
    k, n = q.shape
    return (q.astype(np.float32).reshape(k // 128, 128, n)
            * s[:, None, :]).reshape(k, n)


def test_int4_matmul_xla_matches_dequantized():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(8, 512)).astype(np.float32))
    w = _rand_weight(rng, 512, 128)
    q, s = quant4.quantize_grouped(w)
    y_q = np.asarray(quant4.int4_matmul(
        x, jnp.asarray(quant4.pack_int4(q)), jnp.asarray(s), impl="xla"),
        np.float32)
    # exact vs the DEQUANTIZED weights up to bf16 rounding; the quantization
    # error itself (vs the float weights) is int4's ~15% per-element step
    y_ref = np.asarray(x) @ _dequant(q, s)
    assert np.abs(y_q - y_ref).max() < 0.005 * np.abs(y_ref).max()
    rel = np.abs(y_q - np.asarray(x) @ w) / (np.abs(np.asarray(x) @ w) + 1.0)
    assert rel.mean() < 0.3, rel.mean()


def test_pallas_kernel_matches_xla_interpret():
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(3)
    m, k, n = 16, 768, 256          # k % 256 == 0 but k % 512 != 0
    x = jnp.asarray(rng.normal(size=(m, k)).astype(np.float32))
    q, s = quant4.quantize_grouped(_rand_weight(rng, k, n))
    packed, s = jnp.asarray(quant4.pack_int4(q)), jnp.asarray(s)
    with pltpu.force_tpu_interpret_mode():
        y_p = np.asarray(quant4.int4_matmul(x, packed, s, impl="pallas"),
                         np.float32)
    y_ref = np.asarray(x) @ _dequant(np.asarray(q), np.asarray(s))
    assert np.isfinite(y_p).all()
    # both bf16 paths agree with the dequantized fp32 reference; the Pallas
    # path is the tighter one (scales applied to fp32 partial dots)
    assert np.abs(y_p - y_ref).max() < 0.005 * np.abs(y_ref).max()


def test_grad_matches_dequantized_reference():
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(32, 256)), jnp.float32)
    q, s = quant4.quantize_grouped(_rand_weight(rng, 256, 128))
    packed = jnp.asarray(quant4.pack_int4(q))
    s = jnp.asarray(s)
    wd = (q.astype(np.float32).reshape(2, 128, 128)
          * np.asarray(s)[:, None, :]).reshape(256, 128)
    g_ref = jax.grad(lambda x: jnp.sum((x @ jnp.asarray(wd)) ** 2))(x)
    g_xla = jax.grad(lambda x: jnp.sum(
        quant4.int4_matmul(x, packed, s, impl="xla") ** 2))(x)
    # bwd dequantizes in bf16 (like bitsandbytes Linear4bit): ~1% tolerance
    rel = (np.abs(np.asarray(g_xla) - np.asarray(g_ref)).max()
           / np.abs(np.asarray(g_ref)).max())
    assert rel < 2e-2, rel
    with pltpu.force_tpu_interpret_mode():
        g_pl = jax.grad(lambda x: jnp.sum(
            quant4.int4_matmul(x, packed, s, impl="pallas") ** 2))(x)
    rel = (np.abs(np.asarray(g_pl) - np.asarray(g_ref)).max()
           / np.abs(np.asarray(g_ref)).max())
    assert rel < 2e-2, rel


def _cfg256():
    # int4 needs in-dims that are multiples of 256
    return DecoderConfig(
        family="llama", vocab_size=256, hidden_size=256,
        intermediate_size=512, num_layers=2, num_heads=4,
        num_kv_heads=2, head_dim=64, max_position_embeddings=512,
        dtype="float32")


def test_quantized_decoder_forward_close():
    cfg = _cfg256()
    params = decoder.init(jax.random.PRNGKey(0), cfg)
    qparams = quant4.quantize_decoder4(params)
    assert "kernel_p" in qparams["layers"][0]["q_proj"]
    assert "kernel_p" in qparams["lm_head"]
    emb = jax.random.normal(jax.random.PRNGKey(1), (2, 6, cfg.hidden_size)) * 0.1
    mask = jnp.ones((2, 6), bool)
    pos = jnp.broadcast_to(jnp.arange(6), (2, 6))
    m4 = causal_mask(mask)
    full, _ = decoder.forward(params, cfg, emb, pos, m4)
    quanted, _ = decoder.forward(qparams, cfg, emb, pos, m4)
    pf = jax.nn.softmax(np.asarray(full), axis=-1)
    pq = jax.nn.softmax(np.asarray(quanted), axis=-1)
    # distributions stay close under weight-only int4 (looser than int8)
    assert np.abs(pf - pq).max() < 0.12, np.abs(pf - pq).max()


def test_dense_dispatches_kernel_p():
    rng = np.random.default_rng(5)
    w = _rand_weight(rng, 256, 128)
    p = quant4.quantize_linear4({"kernel": w,
                                 "bias": rng.normal(size=(128,)).astype(np.float32)})
    p = jax.tree.map(jnp.asarray, p)
    x = jnp.asarray(rng.normal(size=(2, 3, 256)).astype(np.float32))
    y = dense(p, x)
    q, s = quant4.quantize_grouped(w)
    ref = (np.asarray(x).reshape(-1, 256) @ _dequant(q, np.asarray(s))
           + np.asarray(p["bias"]))
    err = np.abs(np.asarray(y, np.float32).reshape(-1, 128) - ref)
    assert err.max() < 0.01 * np.abs(ref).max() + 0.01


def test_quantize_linear4_refuses_unaligned_k():
    rng = np.random.default_rng(6)
    assert quant4.quantize_linear4({"kernel": _rand_weight(rng, 64, 32)}) is None
    # tiny decoder (hidden 64): nothing quantizes, tree still forwards
    cfg = DecoderConfig.tiny()
    params = decoder.init(jax.random.PRNGKey(0), cfg)
    qparams = quant4.quantize_decoder4(params)
    assert "kernel" in qparams["layers"][0]["q_proj"]


def test_generate_with_int4_weights():
    """Engine greedy decode over an int4-quantized decoder: argmax chain
    stays valid and close to the fp path at tiny scale."""
    from opus_pllm_tpu.infer import engine

    cfg = _cfg256()
    params = decoder.init(jax.random.PRNGKey(0), cfg)
    qparams = quant4.quantize_decoder4(params)
    emb = jax.random.normal(jax.random.PRNGKey(1), (1, 5, cfg.hidden_size)) * 0.1
    msk = jnp.ones((1, 5), bool)
    pos = jnp.broadcast_to(jnp.arange(5), (1, 5))
    r = engine.generate(qparams, cfg, emb, msk, pos, jax.random.PRNGKey(2),
                        max_new_tokens=4, temperature=0.0,
                        eos_token_id=-1, pad_token_id=0)
    t = np.asarray(r.tokens)
    assert t.shape == (1, 4) and ((t >= 0) & (t < cfg.vocab_size)).all()


def test_quant_layout_of_and_train_guard():
    """The int4 v1/v2 checkpoint-layout story (round-4 verdict weak #6):
    quant_layout_of reads the layout off the leaf dtypes, save_native
    tags it on disk, and check_train_layout rejects a v2 (decode) pack
    fed to a train-* command with a clear message."""
    from opus_pllm_tpu.core import builder
    from opus_pllm_tpu.kernels.quant import quantize_decoder

    cfg = DecoderConfig(
        family="llama", vocab_size=256, hidden_size=512,
        intermediate_size=512, num_layers=1, num_heads=4,
        num_kv_heads=2, head_dim=128, max_position_embeddings=512,
        dtype="float32")   # 512-multiple in-dims: v2-eligible everywhere
    params = decoder.init(jax.random.PRNGKey(0), cfg)
    assert quant4.quant_layout_of(params) == "float32"
    assert quant4.quant_layout_of(quantize_decoder(params)) == "int8"
    v1 = quant4.quantize_decoder4(params, layout="v1")
    v2 = quant4.quantize_decoder4(params, layout="auto")
    assert quant4.quant_layout_of(v1) == "int4-v1"
    assert quant4.quant_layout_of(v2) == "int4-v2"
    # stacked trees report the same layout
    assert quant4.quant_layout_of(decoder.stack_params(dict(v2))) \
        == "int4-v2"

    builder.check_train_layout("train-lora", v1)      # ok
    builder.check_train_layout("annotate", v2)        # decode: ok
    with pytest.raises(SystemExit, match="v2 magic-bitcast DECODE"):
        builder.check_train_layout("train-lora", v2)


def test_save_native_writes_layout_tag(tmp_path):
    import json
    import os

    from opus_pllm_tpu.core import builder

    cfg = _cfg256()
    params = {"llm": quant4.quantize_decoder4(
        decoder.init(jax.random.PRNGKey(0), cfg), layout="v1")}
    out = str(tmp_path / "ckpt")
    builder.save_native(out, params)
    with open(os.path.join(out, "quant_layout.json")) as f:
        meta = json.load(f)
    assert meta["llm_layout"] == "int4-v1"
    # the tag must not break the restore path
    back = builder.load_native(out, like=params)
    np.testing.assert_array_equal(
        np.asarray(back["llm"]["layers"][0]["q_proj"]["kernel_p"]),
        np.asarray(params["llm"]["layers"][0]["q_proj"]["kernel_p"]))

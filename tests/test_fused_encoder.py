"""Fused encoder attention block (pair-packed): parity with the XLA path.

Interpret mode on CPU; the kernels are hardware-validated separately
(scripts/validate_tpu.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from opus_pllm_tpu.core.config import ESM2Config
from opus_pllm_tpu.kernels import fused_encoder
from opus_pllm_tpu.models import esm2
from opus_pllm_tpu.models.layers import (apply_rope, attention_xla, dense,
                                         layer_norm, padding_mask,
                                         rope_cos_sin)


def _cfg(num_layers=2, heads=4, s=16):
    return ESM2Config(num_layers=num_layers, embed_dim=heads * 64,
                      num_heads=heads)


def _ref_attention_half_block(p, cfg, x, mask, cos, sin):
    """The existing XLA composition: LN -> QKV -> rope -> attention."""
    b, s, e = x.shape
    h, d = cfg.num_heads, cfg.head_dim
    r = layer_norm(p["attn_norm"], x)
    q = dense(p["q_proj"], r).reshape(b, s, h, d)
    k = dense(p["k_proj"], r).reshape(b, s, h, d)
    v = dense(p["v_proj"], r).reshape(b, s, h, d)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    return attention_xla(q, k, v, mask).reshape(b, s, e)


@pytest.mark.parametrize("pad", [0, 5])
def test_fused_block_matches_xla(pad):
    cfg = _cfg()
    s = 16
    key = jax.random.PRNGKey(0)
    params = esm2.init(key, cfg)
    p = params["layers"][0]
    # non-trivial but realistic (O(1)) LN values: a 20x scale makes the
    # softmax sharp enough to amplify 5e-6 fp32 op-order noise to 1e-4
    ln_rng = np.random.default_rng(7)
    p["attn_norm"]["scale"] = jnp.asarray(
        1.0 + 0.2 * ln_rng.standard_normal(cfg.embed_dim), jnp.float32)
    p["attn_norm"]["bias"] = jnp.asarray(
        0.1 * ln_rng.standard_normal(cfg.embed_dim), jnp.float32)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((3, s, cfg.embed_dim)), jnp.float32)
    am = np.ones((3, s), bool)
    if pad:
        am[0, -pad:] = False
    mask = padding_mask(jnp.asarray(am))
    cos, sin = rope_cos_sin(jnp.arange(s), cfg.head_dim)

    ref = _ref_attention_half_block(p, cfg, x, mask, cos, sin)
    with pltpu.force_tpu_interpret_mode():
        got = fused_encoder.encoder_attention(p, x, mask, cos, sin)
    # online softmax vs one-shot softmax differ by fp32 conditioning only;
    # the test's large LN scale makes logits ~1e2, so compare relatively
    g, r = np.asarray(got)[am], np.asarray(ref)[am]
    rel = np.abs(g - r) / (np.abs(r) + 1.0)
    assert rel.max() < 5e-5, rel.max()


def test_fused_full_encode_matches_xla():
    """Whole esm2.encode with impl='fused' == impl='xla' (pooled output,
    padded batch)."""
    cfg = _cfg(num_layers=2)
    params = esm2.init(jax.random.PRNGKey(1), cfg)
    toks, _ = esm2.tokenize(["MKTAYIAKQR", "ACDEF"])
    toks = jnp.asarray(toks)
    ref = esm2.pooled_embedding(params, cfg, toks, impl="xla")
    with pltpu.force_tpu_interpret_mode():
        got = esm2.pooled_embedding(params, cfg, toks, impl="fused")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=3e-5, rtol=1e-4)


def test_fused_ffn_matches_xla():
    """x + FC2(gelu(FC1(LN(x)))) — K-blocked kernel vs the plain
    composition, including a block_f that forces multiple K iterations."""
    from opus_pllm_tpu.models.layers import ACTIVATIONS, dense

    cfg = _cfg()
    params = esm2.init(jax.random.PRNGKey(2), cfg)
    p = params["layers"][0]
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 16, cfg.embed_dim)), jnp.float32)
    r = layer_norm(p["ffn_norm"], x)
    ref = x + dense(p["fc2"], ACTIVATIONS["gelu"](dense(p["fc1"], r)))
    ln2 = jnp.stack([p["ffn_norm"]["scale"], p["ffn_norm"]["bias"]])
    with pltpu.force_tpu_interpret_mode():
        got = fused_encoder.fused_ffn(
            x, p["fc1"]["kernel"], p["fc1"]["bias"],
            p["fc2"]["kernel"], p["fc2"]["bias"], ln2, block_f=256)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def test_fused_out_proj_matches_xla():
    """x + unpack(a) @ w + b from the packed (B, HP, S, 128) layout vs the
    transpose/reshape + dense composition, bias present and absent."""
    b, hp, s = 2, 3, 16
    e = hp * 128
    rng = np.random.default_rng(8)
    a = jnp.asarray(rng.standard_normal((b, hp, s, 128)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((e, e)) * 0.05, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(e) * 0.1, jnp.float32)
    x = jnp.asarray(rng.standard_normal((b, s, e)), jnp.float32)
    unpacked = a.transpose(0, 2, 1, 3).reshape(b, s, e)
    for bb in (bias, None):
        ref = x + unpacked @ w + (0.0 if bb is None else bb)
        with pltpu.force_tpu_interpret_mode():
            got = fused_encoder.fused_out_proj(a, w, bb, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-4, rtol=1e-5)


def test_pair_packing_preserves_head_order():
    """(B, HP, S, 128).transpose.reshape must equal the (B, S, H*D)
    head-major layout the output projection expects."""
    b, hp, s = 2, 3, 8
    rng = np.random.default_rng(1)
    per_head = rng.standard_normal((b, 2 * hp, s, 64))   # (B, H, S, D)
    packed = np.concatenate(
        [per_head[:, 0::2], per_head[:, 1::2]], axis=-1)  # WRONG pairing?
    # correct pair packing: pair g holds heads (2g, 2g+1) side by side
    packed = np.stack(
        [np.concatenate([per_head[:, 2 * g], per_head[:, 2 * g + 1]], -1)
         for g in range(hp)], axis=1)                     # (B, HP, S, 128)
    unpacked = packed.transpose(0, 2, 1, 3).reshape(b, s, 2 * hp * 64)
    ref = per_head.transpose(0, 2, 1, 3).reshape(b, s, 2 * hp * 64)
    np.testing.assert_array_equal(unpacked, ref)


def test_fused_path_handles_all_qkv_layouts():
    """separate q/k/v_proj, esm2.fuse_qkv's 'qkv_proj', and the
    pre-packed 'qkv_fused' must produce identical fused-block outputs
    (auto-dispatch on TPU sees all three; review finding round 2)."""
    cfg = _cfg()
    s = 16
    params = esm2.init(jax.random.PRNGKey(4), cfg)
    p = params["layers"][0]
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, s, cfg.embed_dim)), jnp.float32)
    mask = padding_mask(jnp.ones((2, s), bool))
    cos, sin = rope_cos_sin(jnp.arange(s), cfg.head_dim)

    with pltpu.force_tpu_interpret_mode():
        ref = fused_encoder.encoder_attention(p, x, mask, cos, sin)
        fused_params = fused_encoder.fuse_encoder_params(
            {"layers": [p], "x": None})
        got_packed = fused_encoder.encoder_attention(
            fused_params["layers"][0], x, mask, cos, sin)
        qkv_layer = esm2.fuse_qkv({"layers": [dict(p)]})["layers"][0]
        got_qkvproj = fused_encoder.encoder_attention(
            qkv_layer, x, mask, cos, sin)
    np.testing.assert_allclose(np.asarray(got_packed), np.asarray(ref),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_qkvproj), np.asarray(ref),
                               atol=1e-6)


def test_fuse_encoder_params_stacked_layout():
    from opus_pllm_tpu.models import decoder as dec

    cfg = _cfg()
    params = esm2.init(jax.random.PRNGKey(6), cfg)
    stacked = fused_encoder.fuse_encoder_params(
        dec.stack_params({"layers": params["layers"]}))
    lp = stacked["layers_stacked"]
    assert lp["qkv_fused"]["kernel"].shape == (
        cfg.num_layers, 3, cfg.embed_dim, cfg.embed_dim)
    # per-layer slice equals the per-layer pack
    w0, b0 = fused_encoder.pack_qkv_params(params["layers"][0])
    np.testing.assert_array_equal(np.asarray(lp["qkv_fused"]["kernel"][0]),
                                  np.asarray(w0))
    np.testing.assert_array_equal(np.asarray(lp["qkv_fused"]["bias"][0]),
                                  np.asarray(b0))


def test_flash_pairs_rejects_bad_seq():
    qkv = jnp.zeros((3, 1, 2, 12, 128))
    with pytest.raises(ValueError):
        fused_encoder.flash_attention_pairs(qkv, block_q=8, block_k=8)


def test_flash_pairs_key_row_mask_matches_full_mask():
    """(B, S) key-validity rows must equal the (B, 1, S, S) broadcast of
    the same rows (the fused encode path hands the kernel the 2D form so
    the outer product never reaches HBM)."""
    cfg = _cfg()
    s = 16
    rng = np.random.default_rng(3)
    params = esm2.init(jax.random.PRNGKey(1), cfg)
    p = params["layers"][0]
    x = jnp.asarray(rng.standard_normal((3, s, cfg.embed_dim)), jnp.float32)
    am = np.ones((3, s), bool)
    am[0, -4:] = False
    am[2, -1:] = False
    cos, sin = rope_cos_sin(jnp.arange(s), cfg.head_dim)
    with pltpu.force_tpu_interpret_mode():
        full = fused_encoder.encoder_attention_packed(
            p, x, padding_mask(jnp.asarray(am)), cos, sin)
        rows = fused_encoder.encoder_attention_packed(
            p, x, jnp.asarray(am), cos, sin)
    f, r = np.asarray(full), np.asarray(rows)
    valid = am[:, None, :, None]  # (B, HP, S, 128) query-row validity
    np.testing.assert_allclose(np.where(valid, r, 0.0),
                               np.where(valid, f, 0.0), rtol=0, atol=1e-6)


def test_esm2_encode_fused_key_rows_full_parity():
    """esm2.encode now routes the 2D pad mask into the fused kernel; the
    full-encode parity vs the XLA path must hold with ragged padding."""
    cfg = _cfg(num_layers=2)
    params = esm2.init(jax.random.PRNGKey(2), cfg)
    rng = np.random.default_rng(11)
    toks = rng.integers(4, 24, (3, 16)).astype(np.int32)
    toks[:, 0] = cfg.cls_idx
    toks[0, -6:] = cfg.pad_idx
    toks[1, -1] = cfg.eos_idx
    ref = esm2.encode(params, cfg, jnp.asarray(toks), impl="xla")
    with pltpu.force_tpu_interpret_mode():
        got = esm2.encode(params, cfg, jnp.asarray(toks), impl="fused")
    valid = (toks != cfg.pad_idx)[..., None]
    g = np.where(valid, np.asarray(got, np.float32), 0.0)
    r = np.where(valid, np.asarray(ref, np.float32), 0.0)
    np.testing.assert_allclose(g, r, rtol=0, atol=2e-4)


def test_auto_dispatch_guard_accepts_key_row_mask(monkeypatch):
    """encode passes blocks a (B, S) key-row mask since round 5; the auto
    guard must not bounce it back to XLA (regression: it compared
    mask.shape[1] != 1, which read S on the 2D form and silently cost the
    fused path — encode measured 105 instead of 208 seqs/s)."""
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    cfg = ESM2Config(num_layers=2, embed_dim=512, num_heads=8,
                     dtype="bfloat16")
    x = jnp.zeros((2, 512, 512), jnp.bfloat16)
    rows = jnp.ones((2, 512), bool)
    assert esm2._fused_ok(cfg, x, rows)
    assert esm2._fused_ok(cfg, x, padding_mask(rows))
    # per-head masks stay on XLA
    assert not esm2._fused_ok(cfg, x, jnp.ones((2, 8, 512, 512), bool))

"""bitsandbytes NF4 4-bit loading, incl. DOUBLE quantization (nested absmax).

The reference loads its LLMs with BitsAndBytesConfig(load_in_4bit=True,
bnb_4bit_use_double_quant=True, bnb_4bit_quant_type='nf4')
(model/builder.py:50-55). bitsandbytes is not installed in this image, so
the fixtures below *quantize with bitsandbytes semantics in numpy* —
blockwise NF4 nibbles + per-block absmax, the absmax itself stored 8-bit
blockwise against a nested quant map with a mean offset — and write the
exact key layout transformers serializes for 4-bit-saved models
(`{w}`, `{w}.absmax`, `{w}.quant_map`, `{w}.nested_absmax`,
`{w}.nested_quant_map`, `{w}.quant_state.bitsandbytes__nf4`).
"""

import json

import numpy as np
import pytest

from opus_pllm_tpu.core import convert
from opus_pllm_tpu.core.convert import (NF4_CODE, dequantize_bnb_4bit,
                                        dequantize_bnb_state_dict,
                                        dequantize_nf4, has_bnb_4bit)


def _nf4_quantize(flat: np.ndarray, blocksize: int):
    """NF4-encode a flat fp32 array -> (packed uint8, absmax fp32/block)."""
    n = flat.size
    pad = (-n) % blocksize
    x = np.pad(flat, (0, pad)).reshape(-1, blocksize)
    absmax = np.abs(x).max(axis=1)
    normed = x / np.maximum(absmax, 1e-12)[:, None]
    idx = np.abs(normed.reshape(-1, 1) - NF4_CODE[None, :]).argmin(1)
    idx = idx.astype(np.uint8)[:n + pad]
    packed = (idx[0::2] << 4) | idx[1::2]
    return packed.astype(np.uint8), absmax.astype(np.float32)


def _blockwise_8bit_quantize(vals: np.ndarray, code: np.ndarray,
                             blocksize: int):
    """bnb quantize_blockwise semantics: per-block absmax scale, nearest
    code index."""
    n = vals.size
    pad = (-n) % blocksize
    x = np.pad(vals, (0, pad)).reshape(-1, blocksize)
    absmax = np.abs(x).max(axis=1)
    normed = x / np.maximum(absmax, 1e-12)[:, None]
    idx = np.abs(normed.reshape(-1, 1) - code[None, :]).argmin(1)
    return idx.astype(np.uint8)[:n], absmax.astype(np.float32)


# a dense signed 8-bit code standing in for bnb's dynamic map — the loader
# must read whatever map the checkpoint carries, not regenerate bnb's
_NESTED_CODE = np.linspace(-1.0, 1.0, 256).astype(np.float32)


def bnb_4bit_entry(w: np.ndarray, wkey: str, *, blocksize: int = 64,
                   nested_blocksize: int = 256, double_quant: bool = True):
    """Serialize fp32 `w` exactly as transformers saves a bnb-4bit weight."""
    packed, absmax = _nf4_quantize(w.reshape(-1).astype(np.float32),
                                   blocksize)
    sd = {wkey: packed.reshape(-1, 1),
          f"{wkey}.quant_map": NF4_CODE.copy()}
    meta = {"blocksize": blocksize, "dtype": "float16",
            "shape": list(w.shape), "quant_type": "nf4"}
    if double_quant:
        offset = float(absmax.mean())
        q8, nested_absmax = _blockwise_8bit_quantize(
            absmax - offset, _NESTED_CODE, nested_blocksize)
        sd[f"{wkey}.absmax"] = q8
        sd[f"{wkey}.nested_absmax"] = nested_absmax
        sd[f"{wkey}.nested_quant_map"] = _NESTED_CODE.copy()
        meta["nested_blocksize"] = nested_blocksize
        meta["nested_offset"] = offset
        meta["nested_dtype"] = "float32"
    else:
        sd[f"{wkey}.absmax"] = absmax
    sd[f"{wkey}.quant_state.bitsandbytes__nf4"] = np.frombuffer(
        json.dumps(meta).encode(), np.uint8).copy()
    return sd


@pytest.mark.parametrize("shape", [(8, 16), (7, 33), (128, 64)])
@pytest.mark.parametrize("double_quant", [False, True])
def test_bnb_4bit_roundtrip(shape, double_quant):
    rng = np.random.default_rng(0)
    w = (rng.standard_normal(shape) * 0.05).astype(np.float32)
    sd = bnb_4bit_entry(w, "weight", double_quant=double_quant)
    out = dequantize_bnb_4bit(sd, "weight")
    assert out.shape == w.shape
    # worst-case NF4 error: half the largest code gap (codes -1 -> -0.696,
    # i.e. 0.152) times the block absmax; nested 8-bit absmax adds a little
    err = np.abs(out - w).max()
    bound = 0.16 * np.abs(w).max() * (1.10 if double_quant else 1.0)
    assert err <= bound, (err, bound)
    # and the reconstruction is substantially correct, not just bounded
    corr = np.corrcoef(out.reshape(-1), w.reshape(-1))[0, 1]
    assert corr > 0.99


def test_double_quant_absmax_chain():
    """The nested (8-bit) absmax chain reconstructs the true per-block
    absmax within the nested code's resolution (half a code step)."""
    blocksize, nested_bs = 64, 256
    nblocks = 512
    rng = np.random.default_rng(1)
    w_blocks = (rng.standard_normal((nblocks, blocksize)).astype(np.float32)
                * rng.uniform(0.01, 0.2, (nblocks, 1)).astype(np.float32))
    true_absmax = np.abs(w_blocks).max(1)
    sd = bnb_4bit_entry(w_blocks.reshape(-1), "w", double_quant=True)
    meta = json.loads(bytes(sd["w.quant_state.bitsandbytes__nf4"]).decode())
    rebuilt = convert.dequantize_blockwise_8bit(
        sd["w.absmax"], sd["w.nested_absmax"], sd["w.nested_quant_map"],
        nested_bs) + np.float32(meta["nested_offset"])
    centered = np.abs(true_absmax - meta["nested_offset"])
    step = (centered.reshape(-1, nested_bs).max(1)  # per nested block
            if centered.size % nested_bs == 0 else centered.max()) / 255.0
    tol = np.repeat(np.atleast_1d(step), nested_bs)[:nblocks] + 1e-7
    assert (np.abs(rebuilt - true_absmax) <= tol).all()


def test_decoder_from_hf_4bit_state_dict():
    """A 4-bit-saved tiny llama state dict loads through decoder_from_hf and
    matches the fp32 load within NF4 tolerance."""
    import jax

    from opus_pllm_tpu.core.config import DecoderConfig
    from opus_pllm_tpu.models import decoder

    cfg = DecoderConfig.tiny("llama")
    params = decoder.init(jax.random.PRNGKey(0), cfg)

    # build an HF-layout fp32 state dict from our params via the reverse
    # exporters' naming (llama layout)
    sd_fp32 = {}
    sd_fp32["model.embed_tokens.weight"] = np.asarray(
        params["embed_tokens"]["embedding"], np.float32)
    sd_fp32["model.norm.weight"] = np.asarray(
        params["final_norm"]["scale"], np.float32)
    sd_fp32["lm_head.weight"] = np.asarray(
        params["lm_head"]["kernel"], np.float32).T
    names = {"q_proj": "self_attn.q_proj", "k_proj": "self_attn.k_proj",
             "v_proj": "self_attn.v_proj", "o_proj": "self_attn.o_proj",
             "gate_proj": "mlp.gate_proj", "up_proj": "mlp.up_proj",
             "down_proj": "mlp.down_proj"}
    for i, lp in enumerate(params["layers"]):
        sd_fp32[f"model.layers.{i}.input_layernorm.weight"] = np.asarray(
            lp["attn_norm"]["scale"], np.float32)
        sd_fp32[f"model.layers.{i}.post_attention_layernorm.weight"] = \
            np.asarray(lp["ffn_norm"]["scale"], np.float32)
        for ours, hf in names.items():
            sd_fp32[f"model.layers.{i}.{hf}.weight"] = np.asarray(
                lp[ours]["kernel"], np.float32).T

    # 4-bit-quantize every projection the way bnb does (embeddings/norms
    # stay fp, as bnb leaves them)
    sd_4bit = dict(sd_fp32)
    for k in list(sd_4bit):
        if any(k.endswith(f"{hf}.weight") for hf in names.values()) \
                or k == "lm_head.weight":
            w = sd_4bit.pop(k)
            sd_4bit.update(bnb_4bit_entry(w, k, double_quant=True))

    assert has_bnb_4bit(sd_4bit)
    loaded = convert.decoder_from_hf(sd_4bit, cfg, dtype=np.float32)
    ref = convert.decoder_from_hf(sd_fp32, cfg, dtype=np.float32)
    flat_l, _ = jax.tree_util.tree_flatten_with_path(loaded)
    flat_r, _ = jax.tree_util.tree_flatten_with_path(ref)
    assert len(flat_l) == len(flat_r)
    for (pl_, a), (pr_, b) in zip(flat_l, flat_r):
        assert pl_ == pr_
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        scale = max(np.abs(b).max(), 1e-6)
        # 0.16: half the largest NF4 code gap times the (block<=global) absmax
        assert np.abs(a - b).max() <= 0.18 * scale, (pl_,)
        if a.size > 64:
            corr = np.corrcoef(a.reshape(-1), b.reshape(-1))[0, 1]
            assert corr > 0.99, (pl_, corr)


def test_single_level_nf4_exact_codes():
    """Values exactly on NF4 code points reconstruct exactly (up to absmax
    scaling) — guards the nibble order (hi first) and scale repeat."""
    blocksize = 64
    idx = np.tile(np.arange(16, dtype=np.uint8), 8)      # 128 values
    packed = (idx[0::2] << 4) | idx[1::2]
    absmax = np.array([2.0, 0.5], np.float32)
    out = dequantize_nf4(packed, absmax, blocksize, (128,))
    expect = NF4_CODE[idx] * np.repeat(absmax, blocksize)
    np.testing.assert_allclose(out, expect, rtol=1e-6)

"""ESM2 protein language model in JAX (encoder + pooled sequence embedding).

TPU-native re-implementation of the frozen fair-esm `esm2_t33_650M_UR50D`
encoder the reference wraps (cstp_v3/modelling.py:18-77): a pre-LN
transformer with rotary attention over the 33-token protein alphabet, final
layer norm, and mean-pooled per-sequence embeddings that exclude BOS/EOS —
matching `get_protein_seq_embeddings` (modelling.py:37-57) semantics.

Functional style: `init(key, cfg)` -> params pytree; `encode(params, cfg,
tokens)` -> final-layer representations; `pooled_embedding(...)` -> (B, E).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import ESM2Config
from . import layers
from .layers import (apply_rope, attention, dense, dense_init, embed,
                     layer_norm, padding_mask, rope_cos_sin)

# fair-esm protein alphabet (standard ESM-1b/ESM2 ordering; prepend <cls>,
# append <eos> around the residue sequence).
ALPHABET: List[str] = [
    "<cls>", "<pad>", "<eos>", "<unk>",
    "L", "A", "G", "V", "S", "E", "R", "T", "I", "D", "P", "K", "Q", "N",
    "F", "Y", "M", "H", "W", "C", "X", "B", "U", "Z", "O", ".", "-",
    "<null_1>", "<mask>",
]
TOKEN_TO_ID = {t: i for i, t in enumerate(ALPHABET)}
STANDARD_AA = "ACDEFGHIKLMNPQRSTVWY"
MASK_RATIO_TRAIN = 0.15 * 0.8   # ESM2 token-dropout rescale constant


def tokenize(seqs: List[str], max_len: Optional[int] = None) -> Tuple[np.ndarray, np.ndarray]:
    """Batch-convert sequences -> (tokens (B, L), lengths (B,)).

    Mirrors fair-esm's batch converter: <cls> seq <eos>, right-padded with
    <pad>. Unknown residues map to <unk>. `lengths` counts non-pad tokens.

    Dispatches to the C++ fast path (native/tokenizer.cc) when built —
    identical outputs, ~50x faster on precompute-scale corpora.
    """
    from .. import native
    nat = native.esm_tokenize_batch(list(seqs), max_len)
    if nat is not None:
        return nat
    enc = [[TOKEN_TO_ID["<cls>"]]
           + [TOKEN_TO_ID.get(c, TOKEN_TO_ID["<unk>"]) for c in s.upper()]
           + [TOKEN_TO_ID["<eos>"]] for s in seqs]
    longest = max(len(e) for e in enc)
    pad_to = max_len if max_len is not None else longest
    toks = np.full((len(enc), pad_to), TOKEN_TO_ID["<pad>"], dtype=np.int32)
    for i, e in enumerate(enc):
        e = e[:pad_to]
        toks[i, :len(e)] = e
    return toks, (toks != TOKEN_TO_ID["<pad>"]).sum(-1).astype(np.int32)


# ---------------------------------------------------------------------------
# Parameters
# ---------------------------------------------------------------------------

def init(key, cfg: ESM2Config):
    dt = jnp.float32 if cfg.dtype == "float32" else jnp.bfloat16
    keys = jax.random.split(key, cfg.num_layers + 2)
    params = {
        "embed_tokens": layers.embed_init(keys[0], cfg.vocab_size, cfg.embed_dim, dt),
        "final_norm": {"scale": jnp.ones((cfg.embed_dim,), dt),
                       "bias": jnp.zeros((cfg.embed_dim,), dt)},
        "layers": [],
    }
    e = cfg.embed_dim
    for i in range(cfg.num_layers):
        lk = jax.random.split(keys[i + 1], 6)
        params["layers"].append({
            "attn_norm": {"scale": jnp.ones((e,), dt), "bias": jnp.zeros((e,), dt)},
            "q_proj": dense_init(lk[0], e, e, dt, bias=True),
            "k_proj": dense_init(lk[1], e, e, dt, bias=True),
            "v_proj": dense_init(lk[2], e, e, dt, bias=True),
            "o_proj": dense_init(lk[3], e, e, dt, bias=True),
            "ffn_norm": {"scale": jnp.ones((e,), dt), "bias": jnp.zeros((e,), dt)},
            "fc1": dense_init(lk[4], e, cfg.ffn_dim, dt, bias=True),
            "fc2": dense_init(lk[5], cfg.ffn_dim, e, dt, bias=True),
        })
    return params


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _fused_ok(cfg: ESM2Config, x, mask) -> bool:
    """auto-dispatch guard for the fused pair-packed block: TPU backend,
    d=64 heads in pairs, block-tileable sequence, padding-style mask.
    The fused path is forward-only (the ESM tower is frozen in every
    reference training stage); differentiating THROUGH the encoder
    requires impl="xla"."""
    if jax.default_backend() != "tpu":
        return False
    # padding-style masks only: (B, S) key rows (the encode path) or a
    # (B, 1, S, S) broadcast; anything else (per-head masks) is XLA's
    if mask is not None and mask.ndim != 2 and mask.shape[1] != 1:
        return False
    from ..kernels import fused_encoder

    return fused_encoder.supports(cfg, x)


def _block(p, cfg: ESM2Config, x, mask, cos, sin, impl):
    b, s, e = x.shape
    h, d = cfg.num_heads, cfg.head_dim
    if impl == "fused" or (impl == "auto" and _fused_ok(cfg, x, mask)):
        # pair-packed fused LN+QKV+rope+flash (kernels/fused_encoder.py):
        # profile-guided replacement for the whole attention half-block —
        # measured 1.83x on the 650M encode (BENCH_NOTES.md round 2)
        from ..kernels import fused_encoder

        # a 2D mask is the (B, S) key-validity rows (padding masks are
        # key-only, layers.padding_mask): the kernel consumes it directly
        # so the (B, S, S) outer product never materializes in HBM
        a = fused_encoder.encoder_attention_packed(p, x, mask, cos, sin)
        if "kernel" in p["o_proj"]:
            # fused out-projection: consumes the pair-packed flash output
            # directly (no (B, HP, S, 128) relayout), residual+bias inside
            x = fused_encoder.fused_out_proj(
                a, p["o_proj"]["kernel"], p["o_proj"].get("bias"), x)
        else:  # quantized o_proj: fall back to the XLA transpose + qdense
            x = x + dense(p["o_proj"],
                          a.transpose(0, 2, 1, 3).reshape(b, s, e))
        ln2 = jnp.stack([p["ffn_norm"]["scale"], p["ffn_norm"]["bias"]])
        return fused_encoder.fused_ffn(
            x, p["fc1"]["kernel"], p["fc1"]["bias"],
            p["fc2"]["kernel"], p["fc2"]["bias"], ln2)
    if mask is not None and mask.ndim == 2:
        mask = padding_mask(mask)          # XLA path wants (B, 1, S, S)
    r = layer_norm(p["attn_norm"], x)
    if "qkv_proj" in p:
        q, k, v = jnp.split(dense(p["qkv_proj"], r), 3, axis=-1)
        q, k, v = (t.reshape(b, s, h, d) for t in (q, k, v))
    else:
        q = dense(p["q_proj"], r).reshape(b, s, h, d)
        k = dense(p["k_proj"], r).reshape(b, s, h, d)
        v = dense(p["v_proj"], r).reshape(b, s, h, d)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    a = attention(q, k, v, mask, impl=impl).reshape(b, s, e)
    x = x + dense(p["o_proj"], a)
    r = layer_norm(p["ffn_norm"], x)
    r = dense(p["fc2"], layers.ACTIVATIONS["gelu"](dense(p["fc1"], r)))
    return x + r


def stack_params(params, *, donate: bool = False):
    """List-of-layers -> stacked pytree; `encode` then runs the 33-layer
    stack as ONE lax.scan (compile once per layer shape instead of 33x)."""
    from .decoder import stack_params as _stack
    return _stack(params, donate=donate)


def fuse_qkv(params):
    """Fuse the q/k/v projections of every layer into one (E, 3E) matmul —
    one big MXU launch instead of three small ones (ESM2's 1280-wide
    matmuls underutilize the systolic array individually)."""
    def fuse_layer(lp):
        if "qkv_proj" in lp:
            return lp
        fused = {"kernel": jnp.concatenate(
            [lp[n]["kernel"] for n in ("q_proj", "k_proj", "v_proj")], axis=-1)}
        if "bias" in lp["q_proj"]:
            fused["bias"] = jnp.concatenate(
                [lp[n]["bias"] for n in ("q_proj", "k_proj", "v_proj")], axis=-1)
        out = {k: v for k, v in lp.items()
               if k not in ("q_proj", "k_proj", "v_proj")}
        out["qkv_proj"] = fused
        return out

    if "layers_stacked" in params:
        out = {k: v for k, v in params.items() if k != "layers_stacked"}
        out["layers_stacked"] = fuse_layer(params["layers_stacked"])
        return out
    out = {k: v for k, v in params.items() if k != "layers"}
    out["layers"] = [fuse_layer(lp) for lp in params["layers"]]
    return out


def encode(params, cfg: ESM2Config, tokens, *, impl: str = "auto"):
    """tokens (B, L) int32 -> final-layer representations (B, L, E).

    Matches fair-esm `representations[num_layers]`: embedding with ESM2's
    token-dropout rescale, pre-LN blocks with rotary attention, then the
    final layer norm.
    """
    pad_mask = tokens != cfg.pad_idx                        # (B, L)
    x = embed(params["embed_tokens"], jnp.maximum(tokens, 0))
    if cfg.token_dropout:
        # ESM2 zeroes <mask> embeddings and rescales by observed mask ratio
        # (at inference with no masks this is a constant 1-0.12 factor).
        x = jnp.where((tokens == cfg.mask_idx)[..., None], 0.0, x)
        src_len = jnp.sum(pad_mask, axis=-1, keepdims=True)
        n_mask = jnp.sum(tokens == cfg.mask_idx, axis=-1, keepdims=True)
        ratio = n_mask.astype(jnp.float32) / jnp.maximum(src_len, 1)
        x = x * ((1.0 - MASK_RATIO_TRAIN) / (1.0 - ratio))[..., None].astype(x.dtype)
    x = jnp.where(pad_mask[..., None], x, 0.0)

    # blocks receive the (B, S) key rows; the XLA attention path expands
    # to (B, 1, S, S) per block (free under jit — same broadcast), the
    # fused kernel reads the rows directly (no HBM outer product)
    positions = jnp.arange(tokens.shape[1])
    cos, sin = rope_cos_sin(positions, cfg.head_dim, theta=10000.0)
    if "layers_stacked" in params:
        def body(h, p):
            return _block(p, cfg, h, pad_mask, cos, sin, impl), None
        x, _ = jax.lax.scan(body, x, params["layers_stacked"])
    else:
        for p in params["layers"]:
            x = _block(p, cfg, x, pad_mask, cos, sin, impl)
    return layer_norm(params["final_norm"], x)


def residue_embeddings(params, cfg: ESM2Config, tokens, *, impl: str = "auto"):
    """Per-residue final-layer embeddings (B, L, E) fp32 plus a residue mask
    (B, L) that drops BOS/EOS/pad — array form of `get_amino_acid_embeddings`
    (cstp_v3/modelling.py:61-77)."""
    reps = encode(params, cfg, tokens, impl=impl).astype(jnp.float32)
    lengths = jnp.sum(tokens != cfg.pad_idx, axis=-1)
    pos = jnp.arange(tokens.shape[1])[None, :]
    residue = (pos >= 1) & (pos < (lengths - 1)[:, None])
    return reps, residue


def pooled_embedding(params, cfg: ESM2Config, tokens, *, impl: str = "auto"):
    """Mean of final-layer reps over residues (exclude BOS/EOS/pad) -> (B, E).

    fp32 output, mirroring `.float()` at cstp_v3/modelling.py:55.
    """
    reps = encode(params, cfg, tokens, impl=impl).astype(jnp.float32)
    lengths = jnp.sum(tokens != cfg.pad_idx, axis=-1)        # incl. cls+eos
    pos = jnp.arange(tokens.shape[1])[None, :]
    residue = (pos >= 1) & (pos < (lengths - 1)[:, None])    # drop cls & eos
    num = jnp.sum(jnp.where(residue[..., None], reps, 0.0), axis=1)
    den = jnp.maximum(jnp.sum(residue, axis=-1), 1)[:, None]
    return num / den

"""Decoder-only LLMs: Llama-3, Qwen2.5, OPT/Galactica — one functional module.

TPU-native re-design of the reference's three HF wrapper families
(multi_modality_v1/model/language_model/opus_{llama,opt,qwen}.py): instead of
subclassing HF models, one pure forward covers all three architectures,
switched by `DecoderConfig.family`:

  llama : RMSNorm, RoPE, GQA, SiLU-gated MLP, no biases
  qwen2 : llama skeleton + QKV biases
  opt   : LayerNorm(+bias), learned positions (offset 2), ReLU/GELU MLP,
          MHA (no GQA), optional final LN

Static shapes throughout; generation uses a fixed-capacity KV cache pytree
updated with dynamic_update_slice so the whole decode loop jits.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import DecoderConfig
from .layers import (ACTIVATIONS, apply_rope, attention, dense, dense_init,
                     embed, embed_init, layer_norm, lora_dense, rms_norm,
                     rope_cos_sin)

OPT_POS_OFFSET = 2  # HF OPT learned-position offset


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def init(key, cfg: DecoderConfig):
    dt = cfg.jnp_dtype
    h, d = cfg.hidden_size, cfg.head_dim
    qdim, kvdim = cfg.num_heads * d, cfg.num_kv_heads * d
    is_opt = cfg.family == "opt"
    bias_attn = cfg.attention_bias or is_opt
    keys = jax.random.split(key, cfg.num_layers + 4)

    def norm_p(full: bool):
        p = {"scale": jnp.ones((h,), dt)}
        if full:
            p["bias"] = jnp.zeros((h,), dt)
        return p

    params: Dict[str, Any] = {
        "embed_tokens": embed_init(keys[0], cfg.vocab_size, h, dt),
        "final_norm": norm_p(is_opt),
        "layers": [],
    }
    if is_opt:
        params["embed_positions"] = embed_init(
            keys[1], cfg.max_position_embeddings + OPT_POS_OFFSET, h, dt)
    if not cfg.tie_word_embeddings:
        params["lm_head"] = dense_init(keys[2], h, cfg.vocab_size, dt)

    for i in range(cfg.num_layers):
        lk = jax.random.split(keys[i + 3], 7)
        lp: Dict[str, Any] = {
            "attn_norm": norm_p(is_opt),
            "q_proj": dense_init(lk[0], h, qdim, dt, bias=bias_attn),
            "k_proj": dense_init(lk[1], h, kvdim, dt, bias=bias_attn),
            "v_proj": dense_init(lk[2], h, kvdim, dt, bias=bias_attn),
            "o_proj": dense_init(lk[3], qdim, h, dt, bias=is_opt),
            "ffn_norm": norm_p(is_opt),
        }
        if is_opt:
            lp["fc1"] = dense_init(lk[4], h, cfg.intermediate_size, dt, bias=True)
            lp["fc2"] = dense_init(lk[5], cfg.intermediate_size, h, dt, bias=True)
        else:
            lp["gate_proj"] = dense_init(lk[4], h, cfg.intermediate_size, dt)
            lp["up_proj"] = dense_init(lk[5], h, cfg.intermediate_size, dt)
            lp["down_proj"] = dense_init(lk[6], cfg.intermediate_size, h, dt)
        params["layers"].append(lp)
    return params


# ---------------------------------------------------------------------------
# KV cache
# ---------------------------------------------------------------------------

def init_cache(cfg: DecoderConfig, batch: int, max_len: int, dtype=None,
               *, stacked: bool = False, quantize=False):
    """KV cache pytree. quantize=True/"int8" stores K/V int8 with
    per-(token, head) fp32 scales — halving the cache's HBM footprint and
    read traffic, the lever once decode batch grows and KV reads share the
    roofline with weights (BENCH_NOTES.md). quantize="int4" packs two
    4-bit values per byte along head_dim (quarter the bf16 bytes), for
    batch >= 32 / long contexts where cache reads co-dominate."""
    dtype = dtype or cfg.jnp_dtype
    if quantize is True:
        quantize = "int8"
    if quantize not in (False, "int8", "int4"):
        raise ValueError(f"quantize must be False/True/'int8'/'int4', "
                         f"got {quantize!r}")
    shp = (batch, max_len, cfg.num_kv_heads, cfg.head_dim)
    sshp = (cfg.num_layers, *shp)

    def leaf(shape):
        if quantize:
            # quantized leaves store HEAD-major (..., H, S, D): the fused
            # decode kernel (kernels/decode_attention.py) then reads
            # contiguous (BK, D) tiles per head instead of 128-byte strided
            # rows — strided int8 DMA was the difference between the kernel
            # losing and winning vs dequantize-then-attend (BENCH_NOTES r3)
            *lead, s, h, d = shape
            if quantize == "int4":
                return {"q4": jnp.zeros((*lead, h, s, d // 2), jnp.int8),
                        "s": jnp.zeros((*lead, h, s, 1), jnp.float32)}
            return {"q": jnp.zeros((*lead, h, s, d), jnp.int8),
                    "s": jnp.zeros((*lead, h, s, 1), jnp.float32)}
        return jnp.zeros(shape, dtype)

    if stacked:
        layers = {"k": leaf(sshp), "v": leaf(sshp)}
    else:
        layers = [{"k": leaf(shp), "v": leaf(shp)}
                  for _ in range(cfg.num_layers)]
    return {
        "layers": layers,
        "index": jnp.zeros((), jnp.int32),        # next free slot
        "mask": jnp.zeros((batch, max_len), bool),  # slot validity
    }


def _quantize_kv(x):
    """(B, S, H, D) -> head-major int8 leaf: {"q": (B, H, S, D) int8,
    "s": (B, H, S, 1) fp32 per-(token, head) scales}."""
    xf = x.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0,
                    1e-8)
    q = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
    return {"q": q.transpose(0, 2, 1, 3), "s": s.transpose(0, 2, 1, 3)}


def _quantize_kv4(x):
    """(B, S, H, D) -> head-major packed int4 leaf: {"q4": (B, H, S, D/2)
    int8 (lo nibble = d, hi nibble = d + D/2 — the byte plane unpacks to
    two naturally-ordered lane halves), "s": (B, H, S, 1) fp32 scales}."""
    xf = x.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 7.0,
                    1e-8)
    q = jnp.clip(jnp.round(xf / s), -7, 7).astype(jnp.int8)
    h = x.shape[-1] // 2
    packed = (q[..., :h] & 0xF) | ((q[..., h:] & 0xF) << 4)
    return {"q4": packed.transpose(0, 2, 1, 3),
            "s": s.transpose(0, 2, 1, 3)}


def _unpack_kv4(packed):
    """(..., D/2) packed bytes -> (..., D) int4-valued int8, lane halves."""
    p = packed.astype(jnp.int32)
    lo = ((p << 28) >> 28).astype(jnp.int8)     # sign-extend low nibble
    hi = (p >> 4).astype(jnp.int8)              # arithmetic: sign-correct
    return jnp.concatenate([lo, hi], axis=-1)


def _dequantize_kv(leaf, dtype):
    """Head-major quantized leaf (int8 or packed int4) -> (B, S, H, D) in
    `dtype` (the XLA attention layout)."""
    q = _unpack_kv4(leaf["q4"]) if "q4" in leaf else leaf["q"]
    deq = (q.astype(jnp.float32) * leaf["s"]).astype(dtype)
    return deq.transpose(0, 2, 1, 3)


def _write_cache(layer_cache, k_new, v_new, index):
    """index: scalar -> every row writes at the same slot range (the
    batch-uniform decode/prefill path); (B,)-array -> each row writes its
    S new tokens starting at its OWN slot (continuous-batching serving:
    S=1 decode ticks, S=chunk chunked prefill). Per-row writes clip
    out-of-bounds slots (mode="drop") — a chunk's zero-padded tail may
    land past capacity and must not wrap."""
    per_row = getattr(index, "ndim", 0) == 1

    def upd_one(buf, new):
        # bf16 leaf: (B, S, H, D), slot dim 1
        if per_row:
            rows = jnp.arange(buf.shape[0])
            if new.shape[1] == 1:
                return buf.at[rows, index].set(new[:, 0], mode="drop")
            cols = index[:, None] + jnp.arange(new.shape[1])[None]
            return buf.at[rows[:, None], cols].set(new, mode="drop")
        return jax.lax.dynamic_update_slice(buf, new, (0, index, 0, 0))

    def upd_one_q(buf, new):
        # head-major int8 leaf: (B, H, S, D|1), slot dim 2
        if per_row:
            rows = jnp.arange(buf.shape[0])
            if new.shape[2] == 1:
                return buf.at[rows, :, index].set(new[:, :, 0], mode="drop")
            cols = index[:, None] + jnp.arange(new.shape[2])[None]
            heads = jnp.arange(buf.shape[1])
            return buf.at[rows[:, None, None], heads[None, :, None],
                          cols[:, None, :]].set(new, mode="drop")
        return jax.lax.dynamic_update_slice(buf, new, (0, 0, index, 0))

    def upd(buf, new):
        if isinstance(buf, dict):   # quantized cache leaf (int8 / int4)
            if "q4" in buf:
                qn = _quantize_kv4(new)
                return {"q4": upd_one_q(buf["q4"], qn["q4"]),
                        "s": upd_one_q(buf["s"], qn["s"])}
            qn = _quantize_kv(new)
            return {"q": upd_one_q(buf["q"], qn["q"]),
                    "s": upd_one_q(buf["s"], qn["s"])}
        return upd_one(buf, new)

    return {"k": upd(layer_cache["k"], k_new),
            "v": upd(layer_cache["v"], v_new)}


def _read_cache(layer_cache, dtype):
    k, v = layer_cache["k"], layer_cache["v"]
    if isinstance(k, dict):
        return _dequantize_kv(k, dtype), _dequantize_kv(v, dtype)
    return k, v


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _norm(cfg, p, x):
    if cfg.family == "opt":
        return layer_norm(p, x, eps=1e-5)
    return rms_norm(p, x, eps=cfg.rms_norm_eps)


def _mlp(cfg, p, x, la, ls):
    g = lambda name, h: lora_dense(p[name], (la or {}).get(name), h, ls)
    if cfg.family == "opt":
        return g("fc2", ACTIVATIONS[cfg.activation](g("fc1", x)))
    if "gateup_proj" in p:
        gate, up = _fused_gateup(cfg, p, x, la, ls)
        return g("down_proj", ACTIVATIONS["silu"](gate) * up)
    return g("down_proj", ACTIVATIONS["silu"](g("gate_proj", x)) * g("up_proj", x))


def _fused_qkv(cfg, p, r, la, ls):
    """One matmul over the concatenated [q|k|v] kernel (fuse_projections);
    per-projection LoRA deltas land on the output slices."""
    from .layers import lora_delta
    nq = cfg.num_heads * cfg.head_dim
    nkv = cfg.num_kv_heads * cfg.head_dim
    qkv = dense(p["qkv_proj"], r)
    parts = []
    for name, lo, hi in (("q_proj", 0, nq), ("k_proj", nq, nq + nkv),
                         ("v_proj", nq + nkv, nq + 2 * nkv)):
        y = qkv[..., lo:hi]
        if la and name in la:
            # fp32 only for slices that actually receive an adapter delta —
            # the plain serving case keeps the whole fused output in r.dtype
            y = (y.astype(jnp.float32)
                 + lora_delta(la[name], r, ls)).astype(r.dtype)
        parts.append(y)
    return parts


def _fused_gateup(cfg, p, r, la, ls):
    from .layers import lora_delta
    i = cfg.intermediate_size
    gu = dense(p["gateup_proj"], r)
    gate, up = gu[..., :i], gu[..., i:]
    if la and "gate_proj" in la:
        gate = (gate.astype(jnp.float32)
                + lora_delta(la["gate_proj"], r, ls)).astype(r.dtype)
    if la and "up_proj" in la:
        up = (up.astype(jnp.float32)
              + lora_delta(la["up_proj"], r, ls)).astype(r.dtype)
    return gate, up


def _block(cfg: DecoderConfig, p, x, mask4, cos, sin, layer_cache, index, impl,
           la=None, ls: float = 1.0):
    b, s, _ = x.shape
    hq, hkv, d = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    g = lambda name, h: lora_dense(p[name], (la or {}).get(name), h, ls)
    r = _norm(cfg, p["attn_norm"], x)
    if "qkv_proj" in p:
        q, k, v = _fused_qkv(cfg, p, r, la, ls)
        q, k, v = (q.reshape(b, s, hq, d), k.reshape(b, s, hkv, d),
                   v.reshape(b, s, hkv, d))
    else:
        q = g("q_proj", r).reshape(b, s, hq, d)
        k = g("k_proj", r).reshape(b, s, hkv, d)
        v = g("v_proj", r).reshape(b, s, hkv, d)
    if cos is not None:
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
    new_cache, a = None, None
    if layer_cache is not None:
        new_cache = _write_cache(layer_cache, k, v, index)
        if impl == "ring":
            # sequence-sharded PREFILL (infer/sp_engine.py): the cache
            # keeps this device's K/V shard for decode, but attention runs
            # as ring attention over the freshly computed shard — reading
            # the whole local cache back would feed ring_attention
            # capacity-length shards and break its global-index causality
            pass
        elif s == 1 and isinstance(new_cache["k"], dict) and \
                impl not in ("xla", "sp_decode"):
            # fused decode attention over the quantized cache: dequantized
            # K/V never materialize in HBM (kernels/decode_attention.py).
            # (sp_decode must NOT take it: its softmax normalization is
            # local, the sharded path needs the LSE merge in
            # ring.sharded_decode_attention)
            from ..kernels import decode_attention as da
            if "q4" in new_cache["k"]:
                if da.supports_int4(q, new_cache["k"], mask4):
                    a = da.decode_attention_int4(
                        q, new_cache["k"], new_cache["v"], mask4)
            elif da.supports(q, new_cache["k"], mask4):
                a = da.decode_attention_int8(
                    q, new_cache["k"], new_cache["v"], mask4)
        if a is None and impl != "ring":
            k, v = _read_cache(new_cache, x.dtype)
    if a is None:
        a = attention(q, k, v, mask4, impl=impl)
    a = a.reshape(b, s, hq * d)
    x = x + g("o_proj", a)
    r = _norm(cfg, p["ffn_norm"], x)
    return x + _mlp(cfg, p, r, la, ls), new_cache


def fuse_projections(params: Dict, cfg: DecoderConfig) -> Dict:
    """Concatenate q/k/v -> qkv_proj and gate/up -> gateup_proj per layer.

    Decode at 8B issues ~57 quantized-matmul kernels per token step; each
    Pallas custom call pays a scheduling boundary XLA fusions don't, so at
    M=batch the launch overhead rivals the weight DMA (profiled round 3).
    Fusing the same-input projections cuts the calls per layer from 7 to 4
    and makes each remaining kernel's N dim wider — strictly better
    streaming. Works on bf16 ("kernel"), int8 ("kernel_q" + per-channel
    "scale"), and int4 ("kernel_p" + "gscale") trees — all concatenate
    exactly along the output dim. Unmerged LoRA adapters keep their
    per-projection names; _block applies their deltas onto the fused
    output's slices. Per-layer (unstacked) trees only — fuse BEFORE
    stack_params. Note for tensor parallelism: the fused output dim
    interleaves q|k|v, so TP shards no longer align with head boundaries —
    keep projections unfused when sharding over the "model" axis.
    """
    def cat(ps):
        leaf = next(k for k in ("kernel", "kernel_q", "kernel_p")
                    if k in ps[0])
        xp = np if isinstance(ps[0][leaf], np.ndarray) else jnp
        out = {leaf: xp.concatenate([p[leaf] for p in ps], axis=1)}
        for sk, ax in (("scale", 0), ("gscale", 1)):
            if sk in ps[0]:
                out[sk] = xp.concatenate([p[sk] for p in ps], axis=ax)
        if "bias" in ps[0]:
            out["bias"] = xp.concatenate([p["bias"] for p in ps], axis=0)
        return out

    out = dict(params)
    out["layers"] = []
    for lp in params["layers"]:
        nlp = dict(lp)
        if all(k in lp for k in ("q_proj", "k_proj", "v_proj")):
            nlp["qkv_proj"] = cat([lp["q_proj"], lp["k_proj"],
                                   lp["v_proj"]])
            for k in ("q_proj", "k_proj", "v_proj"):
                del nlp[k]
        if "gate_proj" in lp and "up_proj" in lp:
            nlp["gateup_proj"] = cat([lp["gate_proj"], lp["up_proj"]])
            del nlp["gate_proj"], nlp["up_proj"]
        out["layers"].append(nlp)
    return out


def embed_tokens(params, ids):
    return embed(params["embed_tokens"], ids)


def tile_cache(cache, k: int):
    """Repeat each batch row k times (row-major: b*k + beam) — expands a
    B-row prefill cache to B*k beam rows for beam search."""
    stacked = isinstance(cache["layers"], dict)
    ax = 1 if stacked else 0
    return {
        "layers": jax.tree.map(lambda x: jnp.repeat(x, k, axis=ax),
                               cache["layers"]),
        "index": cache["index"],
        "mask": jnp.repeat(cache["mask"], k, axis=0),
    }


def reorder_cache(cache, row_idx):
    """Select cache rows by `row_idx` (B*k,) — HF reorder_cache's role in
    beam search: each surviving beam inherits its parent's KV history."""
    stacked = isinstance(cache["layers"], dict)
    ax = 1 if stacked else 0
    return {
        "layers": jax.tree.map(lambda x: jnp.take(x, row_idx, axis=ax),
                               cache["layers"]),
        "index": cache["index"],
        "mask": jnp.take(cache["mask"], row_idx, axis=0),
    }


# ---------------------------------------------------------------------------
# Stacked layers + lax.scan
# ---------------------------------------------------------------------------

def stack_params(params, *, donate: bool = False):
    """List-of-layers -> one stacked pytree with a leading layer axis.

    `forward` detects the stacked layout and runs the layer loop as a
    `lax.scan`: the stack is traced/compiled ONCE instead of per layer —
    ~L-fold faster compiles for deep models and the idiomatic XLA layout
    (weights already batched for collective-friendly sharding).

    donate=True consumes `params["layers"]` leaf-by-leaf so peak device
    memory is total + one stacked leaf, not 2x total (a 4.5B model OOMs a
    16 GB chip with the all-at-once stack). The input tree is unusable
    afterwards.

    numpy leaves (converted under `core.convert.host_arrays()`) stack with
    np.stack and STAY on host: for 8B-class models even the one-stacked-leaf
    on-device transient plus allocator fragmentation OOMs the chip
    (BENCH_NOTES.md round 2) — transfer the finished stacked tree once with
    `jax.device_put` (or per-leaf `jnp.asarray`) instead.
    """
    if "layers_stacked" in params:
        return params
    out = {k: v for k, v in params.items() if k != "layers"}
    layers = params.pop("layers") if donate else params["layers"]
    flats, treedefs = zip(*(jax.tree_util.tree_flatten(l) for l in layers))
    flats = [list(f) for f in flats]
    stacked_leaves = []
    for i in range(len(flats[0])):
        stack = np.stack if all(
            isinstance(f[i], np.ndarray) for f in flats) else jnp.stack
        stacked_leaves.append(stack([f[i] for f in flats]))
        if donate:
            for f in flats:
                f[i] = None   # drop per-layer refs so buffers free as we go
    out["layers_stacked"] = jax.tree_util.tree_unflatten(
        treedefs[0], stacked_leaves)
    return out


def unstack_params(params):
    if "layers" in params:
        return params
    stacked = params["layers_stacked"]
    n = jax.tree.leaves(stacked)[0].shape[0]
    out = {k: v for k, v in params.items() if k != "layers_stacked"}
    out["layers"] = [jax.tree.map(lambda x: x[i], stacked) for i in range(n)]
    return out


def _remat_wrap(fn, remat):
    """remat=False: plain fn. True: full per-layer jax.checkpoint (max
    memory savings, pays a full forward recompute in the backward).
    "dots": checkpoint with the checkpoint_dots policy — MXU dot outputs
    are saved, only the cheap elementwise/norm ops recompute, trading a
    little activation memory back for skipping the remat forward's
    matmuls (the stage-(c/d) 1.1B step is compute-bound, not
    memory-bound, at batch 8 x seq 512 — BENCH_NOTES round 5)."""
    if not remat:
        return fn
    if remat == "dots":
        return jax.checkpoint(
            fn, policy=jax.checkpoint_policies.checkpoint_dots)
    return jax.checkpoint(fn)


def _forward_scan(params, cfg, x, mask4, cos, sin, cache, lora, lora_scale,
                  impl, remat, scan_mode: str = "xs"):
    """Stacked-layer loop as lax.scan.

    scan_mode:
      "xs"    — feed the stacked weights as scan xs (default; best for
                decode: XLA reads each layer slice straight from HBM).
      "index" — scan over the layer index and dynamic-slice each layer's
                weights inside the body. When XLA decides the xs layout
                doesn't match what the loop wants, "xs" mode relayouts a
                COPY of the whole multi-GB stack (the single-chip >3B OOM,
                ROADMAP round 1); indexed slicing bounds any relayout to one
                layer at a time, so big-model training fits.
    """
    stacked = params["layers_stacked"]
    index = cache["index"] if cache is not None else None

    lc_stack = None
    if cache is not None:
        lc_stack = (jax.tree.map(lambda *xs: jnp.stack(xs), *cache["layers"])
                    if isinstance(cache["layers"], list) else cache["layers"])
    la_stack = None
    if lora is not None:
        la_stack = (lora["layers_stacked"] if "layers_stacked" in lora else
                    jax.tree.map(lambda *xs: jnp.stack(xs), *lora["layers"]))

    if scan_mode == "index":
        n_layers = jax.tree.leaves(stacked)[0].shape[0]

        def body(carry, i):
            h = carry
            take = lambda t: jax.tree.map(
                lambda s: jax.lax.dynamic_index_in_dim(s, i, keepdims=False),
                t)
            p = take(stacked)
            lc = take(lc_stack) if lc_stack is not None else None
            la = take(la_stack) if la_stack is not None else None
            h, nlc = _block(cfg, p, h, mask4, cos, sin, lc, index, impl,
                            la, lora_scale)
            return h, nlc

        if remat and cache is None:
            body = _remat_wrap(body, remat)
        x, new_lc = jax.lax.scan(body, x, jnp.arange(n_layers))
    else:
        def body(carry, layer_in):
            h = carry
            p, lc, la = layer_in
            h, nlc = _block(cfg, p, h, mask4, cos, sin, lc, index, impl,
                            la, lora_scale)
            return h, nlc

        if remat and cache is None:
            body = _remat_wrap(body, remat)
        x, new_lc = jax.lax.scan(body, x, (stacked, lc_stack, la_stack))
    new_cache = None
    if cache is not None:
        new_cache = {"layers": new_lc, "index": cache["index"] + x.shape[1],
                     "mask": cache["mask"]}
    return x, new_cache


def positions_and_rope(params, cfg: DecoderConfig, x, positions, *,
                       ctx: int):
    """Front half of `forward`: OPT adds its learned position embeddings
    (offset 2, no rope); rope families build (cos, sin) — dynamic-NTK aware
    with the STATIC context bound `ctx` (see the ntk_ctx note in `forward`).
    Returns (x, cos, sin); cos/sin are None for OPT. Factored out so the
    pipeline-parallel step (train/pp.py) can run the same front before
    streaming microbatches through the layer stages."""
    if cfg.family == "opt":
        return (x + embed(params["embed_positions"],
                          positions + OPT_POS_OFFSET), None, None)
    theta = cfg.rope_theta
    if cfg.use_dynamic_ntk:
        from .layers import ntk_scaled_theta
        theta = ntk_scaled_theta(theta, cfg.head_dim, ctx,
                                 cfg.max_position_embeddings)
    cos, sin = rope_cos_sin(positions, cfg.head_dim, theta=theta)
    return x, cos.astype(x.dtype), sin.astype(x.dtype)


def forward(params, cfg: DecoderConfig, input_embeds, positions, mask4,
            cache=None, *, lora=None, lora_scale: float = 1.0,
            impl: str = "auto", remat: bool = False,
            scan_mode: str = "xs", ntk_ctx: Optional[int] = None,
            return_hidden: bool = False) -> Tuple[jnp.ndarray, Optional[dict]]:
    """Run the decoder stack on already-embedded inputs.

    input_embeds : (B, S, H) — token and/or protein soft-token embeddings
                   (the multimodal splicer always feeds embeddings, mirroring
                   HF generate(inputs_embeds=...) in opus_llama.py:127-132)
    positions    : (B, S) int32 positions of these tokens (left-pad aware)
    mask4        : (B, 1, S, Skv) bool attention mask. Skv == S without cache,
                   else the cache capacity.
    cache        : optional KV cache pytree from init_cache; new k/v are
                   written at slots [cache.index, cache.index+S).

    Returns (logits (B, S, V) or hidden, updated cache or None).

    Dynamic-NTK context bound, in precedence order: the caller's explicit
    ntk_ctx (an engine that prefills into a SMALLER scratch cache than its
    decode cache MUST pin one bound for both phases, or prefilled K is
    rotated with a different base than decode queries — same position,
    different frequencies, corrupted attention over the whole prompt);
    else the cache capacity; else this call's sequence length.
    """
    ctx = ntk_ctx if ntk_ctx is not None else (
        cache["mask"].shape[-1] if cache is not None else mask4.shape[-1])
    x, cos, sin = positions_and_rope(params, cfg, input_embeds, positions,
                                     ctx=ctx)

    if "layers_stacked" in params:
        x, new_cache = _forward_scan(params, cfg, x, mask4, cos, sin, cache,
                                     lora, lora_scale, impl, remat, scan_mode)
        return _head(params, cfg, x, new_cache, return_hidden)

    new_layers = []
    index = cache["index"] if cache is not None else None
    block = _block
    if remat and cache is None:
        # rematerialize per-layer activations in the backward pass: trades
        # FLOPs for HBM so stage-(c)/(d) training fits long spliced batches
        block = _remat_wrap(
            lambda p, x, m, c, s, la: _block(cfg, p, x, m, c, s, None, None,
                                             impl, la, lora_scale), remat)
    for i, p in enumerate(params["layers"]):
        lc = cache["layers"][i] if cache is not None else None
        la = lora["layers"][i] if lora is not None else None
        if remat and cache is None:
            x, nlc = block(p, x, mask4, cos, sin, la)
        else:
            x, nlc = _block(cfg, p, x, mask4, cos, sin, lc, index, impl,
                            la, lora_scale)
        if nlc is not None:
            new_layers.append(nlc)

    new_cache = None
    if cache is not None:
        s = input_embeds.shape[1]
        new_cache = {"layers": new_layers, "index": cache["index"] + s,
                     "mask": cache["mask"]}
    return _head(params, cfg, x, new_cache, return_hidden)


def _head(params, cfg: DecoderConfig, x, new_cache, return_hidden: bool):
    if cfg.family == "opt":
        if cfg.do_layer_norm_before:
            x = layer_norm(params["final_norm"], x)
    else:
        x = rms_norm(params["final_norm"], x, eps=cfg.rms_norm_eps)
    if return_hidden:
        return x, new_cache
    return head_logits(params, cfg, x), new_cache


def head_logits(params, cfg: DecoderConfig, x):
    """Vocab projection of already-final-norm'ed hidden states -> fp32.

    Factored out of the forward head so memory-aware losses can apply it to
    sequence chunks (see next_token_loss_hidden) instead of materializing
    the full (B, S, V) fp32 logits."""
    if cfg.tie_word_embeddings or "lm_head" not in params:
        return jnp.dot(x, params["embed_tokens"]["embedding"].T,
                       preferred_element_type=jnp.float32)
    if "kernel_q" in params["lm_head"] or "kernel_p" in params["lm_head"]:
        return dense(params["lm_head"], x).astype(jnp.float32)
    return jnp.dot(x, params["lm_head"]["kernel"],
                   preferred_element_type=jnp.float32)


def positions_from_mask(attn_mask):
    """Left-pad-aware positions: 0 at the first valid token (opus_arch.py:257)."""
    pos = jnp.cumsum(attn_mask.astype(jnp.int32), axis=-1) - 1
    return jnp.maximum(pos, 0)

"""Fused encoder attention block: LN + QKV + rope + flash, pair-packed.

Profile-guided redesign of the ESM2 encode hot path (BENCH_NOTES.md round
2). The XLA path spends ~40% of device time outside the GEMMs: fp32
layernorm reduces (2.8 ms each at a 0.2 ms HBM floor), rope slice/negate
fusions, attention softmax over HBM-materialized (B,H,S,S) logits, and —
when the d=64 flash kernel is forced — four (B,S,H,D)<->(B,H,S,D)
transposes around the opaque pallas_call.

Design (replaces the reference's xformers attention for the frozen ESM2
tower, reference README.md:20-24):

* `fused_ln_qkv_rope`: one kernel computes layernorm statistics in VMEM
  (x is already resident for the projection GEMM), the Q/K/V projections,
  and rotary embedding, emitting PAIR-PACKED tiles (B, H/2, S, 128) —
  two d=64 heads side by side in the 128-lane dimension. Pair packing is
  the TPU-native answer to d=64: every slice/write in the kernel is
  128-lane aligned, and rotate_half becomes a lane roll (+/-32 within
  each 64-lane half) + select instead of sub-lane shuffles.
* `flash_attention_pairs`: online-softmax flash over pair-packed tiles.
  Each program computes BOTH heads of a pair with lane-masked dots:
  s_h = (q * lane_mask_h) @ k^T zeroes the other head's contribution in
  the 128-wide contraction. 2x the logit-GEMM FLOPs of a perfect d=64
  kernel, but attention GEMMs are ~7% of encode FLOPs, and in exchange
  the softmax never touches HBM and no transposes are needed.
* One (B, H/2, S, 128) -> (B, S, E) transpose at the end (head order is
  preserved by pair packing) feeds the output projection in XLA.

Forward-only: the ESM2 tower is frozen in every reference training stage
(SURVEY.md §2c), so no VJP is defined; `esm2.encode` uses this path for
impl="fused" (and "auto" where measured faster).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_LARGE = -1e30

LANES = 128
HALF = 32  # rotate_half shift within each 64-lane head


def _lane_iota(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)


def _rope_pair(t, cos, sin):
    """Rotary embedding on a (S, 128) pair tile (two 64-d heads).

    rotate_half on each 64-lane half = roll the 128 lanes by +/-32 and
    select: position i takes -t[i+32] in the low 32 of each 64, t[i-32]
    in the high 32. Rolls wrap across the pair boundary only at lanes
    that the select masks out."""
    lo = (_lane_iota(t.shape) % 64) < HALF
    rot = jnp.where(lo, -jnp.roll(t, -HALF, axis=-1),
                    jnp.roll(t, HALF, axis=-1))
    return t * cos + rot * sin


def _ln_qkv_kernel(x_ref, w_ref, b_ref, ln_ref, cos_ref, sin_ref, o_ref,
                   *, eps: float, n_pairs: int):
    j = pl.program_id(0)                       # 0=q, 1=k, 2=v
    x = x_ref[0].astype(jnp.float32)           # (S, E)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(jnp.square(x), axis=-1, keepdims=True) - jnp.square(mu),
        0.0)
    scale = ln_ref[0, 0].astype(jnp.float32)   # (E,)
    bias = ln_ref[1, 0].astype(jnp.float32)
    r = ((x - mu) * jax.lax.rsqrt(var + eps) * scale + bias
         ).astype(o_ref.dtype)
    y = jax.lax.dot_general(
        r, w_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)    # (S, E)
    y = y + b_ref[0, 0].astype(jnp.float32)
    cos = cos_ref[...]
    sin = sin_ref[...]
    for g in range(n_pairs):
        t = y[:, g * LANES:(g + 1) * LANES]
        tr = _rope_pair(t, cos, sin)
        o_ref[0, 0, g] = jnp.where(j < 2, tr, t).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps",))
def fused_ln_qkv_rope(x, w_qkv, b_qkv, ln_sb, cos, sin, *, eps: float = 1e-5):
    """x (B, S, E); w_qkv (3, E, E); b_qkv (3, E); ln_sb (2, E) [scale;bias];
    cos/sin (S, D) with D = 64 -> PACKED qkv (3, B, H/2, S, 128) with rope
    applied to q (j=0) and k (j=1). Kept packed so the downstream flash
    kernel can index it directly — slicing would re-materialize ~0.5 GB."""
    b, s, e = x.shape
    n_pairs = e // LANES
    # pair tile cos/sin: the (S, 64) tables duplicated across both heads
    cos_p = jnp.concatenate([cos, cos], axis=-1).astype(jnp.float32)
    sin_p = jnp.concatenate([sin, sin], axis=-1).astype(jnp.float32)
    # biases/ln as (., 8, E): an (1, E) block would violate the (8, 128)
    # tile rule; 8 replicated sublane rows keep Mosaic happy at ~40 KB
    b_r = jnp.broadcast_to(b_qkv[:, None, :], (3, 8, e))
    ln_r = jnp.broadcast_to(ln_sb[:, None, :], (2, 8, e))

    return pl.pallas_call(
        functools.partial(_ln_qkv_kernel, eps=eps, n_pairs=n_pairs),
        grid=(3, b),
        in_specs=[
            pl.BlockSpec((1, s, e), lambda j, ib: (ib, 0, 0)),
            pl.BlockSpec((1, e, e), lambda j, ib: (j, 0, 0)),
            pl.BlockSpec((1, 8, e), lambda j, ib: (j, 0, 0)),
            pl.BlockSpec((2, 8, e), lambda j, ib: (0, 0, 0)),
            pl.BlockSpec((s, LANES), lambda j, ib: (0, 0)),
            pl.BlockSpec((s, LANES), lambda j, ib: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, n_pairs, s, LANES),
                               lambda j, ib: (j, ib, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((3, b, n_pairs, s, LANES), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=3 * 2 * b * s * e * e,
            bytes_accessed=(3 * x.size + 3 * e * e + 3 * x.size)
            * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(x, w_qkv, b_r, ln_r, cos_p, sin_p)


def _flash_pairs_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref,
                        m_s, l_s, acc_s, *, scale: float):
    ik = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(ik == 0)
    def _init():
        m_s[...] = jnp.full_like(m_s, NEG_LARGE)
        l_s[...] = jnp.zeros_like(l_s)
        acc_s[...] = jnp.zeros_like(acc_s)

    q = q_ref[0, 0, 0].astype(jnp.float32) * scale  # (BQ, 128) both heads
    k = k_ref[0, 0, 0].astype(jnp.float32)           # (BK, 128)
    v = v_ref[0, 0, 0].astype(jnp.float32)
    lo = _lane_iota(q.shape) < 64

    # mask block is (BQ, BK) full, or (1, BK) key-validity rows that
    # broadcast over the query rows (jnp.where broadcasts by shape)
    mask = mask_ref[0] if mask_ref is not None else None
    # two online-softmax states, one per packed head; head-h state lives in
    # the 64-lane half h of the (BQ, 128) scratch
    for h, qm in ((0, jnp.where(lo, q, 0.0)), (1, jnp.where(lo, 0.0, q))):
        s = jax.lax.dot_general(qm, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if mask is not None:
            s = jnp.where(mask, s, NEG_LARGE)
        sel = lo if h == 0 else ~lo
        m_prev = jnp.max(jnp.where(sel, m_s[...], NEG_LARGE), axis=-1,
                         keepdims=True)
        l_prev = jnp.max(jnp.where(sel, l_s[...], 0.0), axis=-1,
                         keepdims=True)
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(p, v, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        acc_s[...] = jnp.where(sel, acc_s[...] * alpha + pv, acc_s[...])
        m_s[...] = jnp.where(sel, m_new, m_s[...])
        l_s[...] = jnp.where(sel, l_new, l_s[...])

    @pl.when(ik == nk - 1)
    def _fin():
        o_ref[0, 0] = (acc_s[...] / jnp.maximum(l_s[...], 1e-30)
                       ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k"))
def flash_attention_pairs(qkv, mask=None, *, block_q: int = 512,
                          block_k: int = 512):
    """Pair-packed flash attention (padding masks only, no causal).

    qkv: (3, B, HP, S, 128) packed — two 64-d heads per 128-lane tile
    (fused_ln_qkv_rope's output, indexed in place: j=0 q, 1 k, 2 v).
    mask: (B, S) bool key-validity rows (padding masks are key-only,
    models/layers.py:254 — the (B, S, S) outer product then never
    materializes in HBM, which cost ~11 GB of redundant block reads per
    650M batch-128 encode), or (B, 1, S, S) / (B, S, S) full bool masks.
    True = attend. Returns (B, HP, S, 128)."""
    _, b, hp, s, lanes = qkv.shape
    assert lanes == LANES
    bq, bk = min(block_q, s), min(block_k, s)
    if s % bq or s % bk:
        raise ValueError(f"S={s} must divide block sizes {bq}/{bk}")
    scale = 1.0 / math.sqrt(64.0)
    grid = (b, hp, s // bq, s // bk)
    in_specs = [
        pl.BlockSpec((1, 1, 1, bq, LANES),
                     lambda ib, g, iq, ik: (0, ib, g, iq, 0)),
        pl.BlockSpec((1, 1, 1, bk, LANES),
                     lambda ib, g, iq, ik: (1, ib, g, ik, 0)),
        pl.BlockSpec((1, 1, 1, bk, LANES),
                     lambda ib, g, iq, ik: (2, ib, g, ik, 0)),
    ]
    args = [qkv, qkv, qkv]
    if mask is not None:
        if mask.ndim == 2:                      # (B, S) key rows
            in_specs.append(
                pl.BlockSpec((1, 1, bk),
                             lambda ib, g, iq, ik: (ib, 0, ik)))
            args.append(mask[:, None, :])
        else:
            m3 = mask.reshape(b, s, s)
            in_specs.append(
                pl.BlockSpec((1, bq, bk),
                             lambda ib, g, iq, ik: (ib, iq, ik)))
            args.append(m3)

        def kern(qr, kr, vr, mr, o, m_s, l_s, a_s):
            _flash_pairs_kernel(qr, kr, vr, mr, o, m_s, l_s, a_s,
                                scale=scale)
    else:
        def kern(qr, kr, vr, o, m_s, l_s, a_s):
            _flash_pairs_kernel(qr, kr, vr, None, o, m_s, l_s, a_s,
                                scale=scale)

    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, bq, LANES),
                               lambda ib, g, iq, ik: (ib, g, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((b, hp, s, LANES), qkv.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, LANES), jnp.float32),
            pltpu.VMEM((bq, LANES), jnp.float32),
            pltpu.VMEM((bq, LANES), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=8 * b * hp * s * s * LANES,
            bytes_accessed=(qkv.size + qkv.size // 3) * qkv.dtype.itemsize,
            transcendentals=2 * b * hp * s * s,
        ),
    )(*args)


def _erf(x):
    """Abramowitz & Stegun 7.1.26 rational erf, fp32, |err| <= 1.5e-7."""
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _ffn_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, ln_ref, o_ref,
                acc_s, mu_s, inv_s, *, eps: float):
    kf = pl.program_id(1)
    nkf = pl.num_programs(1)
    x = x_ref[0].astype(jnp.float32)                    # (S, E)

    @pl.when(kf == 0)
    def _init():
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.maximum(
            jnp.mean(jnp.square(x), axis=-1, keepdims=True)
            - jnp.square(mu), 0.0)
        mu_s[...] = jnp.broadcast_to(mu, mu_s.shape)
        inv_s[...] = jnp.broadcast_to(jax.lax.rsqrt(var + eps), inv_s.shape)
        acc_s[...] = x + b2_ref[0].astype(jnp.float32)  # residual + bias2

    scale = ln_ref[0, 0].astype(jnp.float32)
    bias = ln_ref[1, 0].astype(jnp.float32)
    r = ((x - mu_s[:, :1]) * inv_s[:, :1] * scale + bias
         ).astype(o_ref.dtype)
    y1 = jax.lax.dot_general(
        r, w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b1_ref[0].astype(jnp.float32)
    # erf gelu (fair-esm/torch default). Mosaic lowers neither erfc nor
    # erf, so erf is computed in-kernel with the Abramowitz-Stegun 7.1.26
    # rational approximation (1.5e-7 max abs error in fp32 — below bf16
    # resolution and the 2e-5 interpret-mode parity tolerance)
    y1 = (0.5 * y1 * (1.0 + _erf(y1 * (2.0 ** -0.5)))).astype(o_ref.dtype)
    acc_s[...] += jax.lax.dot_general(
        y1, w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(kf == nkf - 1)
    def _fin():
        o_ref[0] = acc_s[...].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "block_f"))
def fused_ffn(x, w1, b1, w2, b2, ln_sb, *, eps: float = 1e-5,
              block_f: int = 512):
    # block_f 640 measured the same speed but lands 0.9 MB over the 16 MB
    # scoped-VMEM limit in some surrounding-program contexts (caught by
    # validate_tpu); 512 keeps headroom
    """x + FC2(gelu(FC1(LN(x)))) in one kernel, K-blocked over the FFN dim.

    XLA runs this as LN reduce -> FC1 -> gelu -> FC2, materializing the
    (B, S, F) gelu activations in HBM (~670 MB/layer for ESM2-650M at
    batch 128) because two GEMMs cannot fuse. Blocking the F dimension as
    a reduction keeps each gelu(FC1) slice in VMEM and accumulates FC2
    into an (S, E) scratch; the residual add and both biases ride along.
    x (B, S, E); w1 (E, F); b1 (F,); w2 (F, E); b2 (E,); ln_sb (2, E)."""
    b, s, e = x.shape
    f = w1.shape[1]
    # largest K-block from the preference list that tiles f exactly
    bf = next((c for c in (min(block_f, f), 640, 512, 256, 128)
               if c <= f and f % c == 0), None)
    if bf is None:
        raise ValueError(f"FFN dim {f} must be a multiple of 128")
    b1_r = jnp.broadcast_to(b1[None, :], (8, f))
    b2_r = jnp.broadcast_to(b2[None, :], (8, e))
    ln_r = jnp.broadcast_to(ln_sb[:, None, :], (2, 8, e))

    return pl.pallas_call(
        functools.partial(_ffn_kernel, eps=eps),
        grid=(b, f // bf),
        in_specs=[
            pl.BlockSpec((1, s, e), lambda ib, kf: (ib, 0, 0)),
            pl.BlockSpec((e, bf), lambda ib, kf: (0, kf)),
            pl.BlockSpec((8, bf), lambda ib, kf: (0, kf)),
            pl.BlockSpec((bf, e), lambda ib, kf: (kf, 0)),
            pl.BlockSpec((8, e), lambda ib, kf: (0, 0)),
            pl.BlockSpec((2, 8, e), lambda ib, kf: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, s, e), lambda ib, kf: (ib, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, s, e), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((s, e), jnp.float32),      # FC2 accumulator
            pltpu.VMEM((s, LANES), jnp.float32),  # LN mean
            pltpu.VMEM((s, LANES), jnp.float32),  # LN inv-std
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * s * e * f,
            bytes_accessed=(2 * x.size + 2 * e * f) * x.dtype.itemsize,
            transcendentals=b * s * f,
        ),
    )(x, w1, b1_r, w2, b2_r, ln_r)


def _out_proj_kernel(a_ref, w_ref, b_ref, x_ref, o_ref, *, n_pairs: int):
    acc = x_ref[0].astype(jnp.float32) + b_ref[0].astype(jnp.float32)
    a = a_ref[0]                                      # (HP, S, 128)
    for g in range(n_pairs):
        acc += jax.lax.dot_general(
            a[g], w_ref[g], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)       # (S,128)@(128,E)
    o_ref[0] = acc.astype(o_ref.dtype)


@jax.jit
def fused_out_proj(a, w, b, x):
    """x + unpack(a) @ w + b without materializing the (B, S, E) transpose.

    a (B, HP, S, 128): flash_attention_pairs output (pair packing preserves
    head order, so lanes of pair g are exactly embed columns
    [g*128, (g+1)*128) — the contraction can run per pair-group directly
    from the packed layout). w (E, E); b (E,) or None; x (B, S, E)
    residual. The whole (E, E) weight sits in VMEM (3.3 MB at E=1280), so
    the grid is just (B,) and each program issues HP (S,128)x(128,E) MXU
    dots accumulated in fp32 — the XLA alternative round-trips the ~167 MB
    (B, HP, S, 128) tensor through a relayout copy before the projection
    GEMM can read it."""
    bsz, hp, s, lanes = a.shape
    e = w.shape[0]
    assert lanes == LANES and hp * LANES == e
    w_p = w.reshape(hp, LANES, e)
    bias = b if b is not None else jnp.zeros((e,), w.dtype)
    b_r = jnp.broadcast_to(bias[None, :], (8, e))
    return pl.pallas_call(
        functools.partial(_out_proj_kernel, n_pairs=hp),
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec((1, hp, s, LANES), lambda ib: (ib, 0, 0, 0)),
            pl.BlockSpec((hp, LANES, e), lambda ib: (0, 0, 0)),
            pl.BlockSpec((8, e), lambda ib: (0, 0)),
            pl.BlockSpec((1, s, e), lambda ib: (ib, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, s, e), lambda ib: (ib, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            # batch programs carry no cross-program state (ADVICE r4:
            # "arbitrary" serialized an embarrassingly parallel dim)
            dimension_semantics=("parallel",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * s * e * e,
            bytes_accessed=(a.size + w.size + 2 * x.size) * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(a, w_p, b_r, x)


def pack_qkv_params(p_layer):
    """A layer's q/k/v projections in the (3, E, E) / (3, E) layout the
    fused kernel consumes. Handles all three layouts: separate
    q/k/v_proj, esm2.fuse_qkv's single (E, 3E) 'qkv_proj', and the
    pre-packed 'qkv_fused' written by fuse_encoder_params (use that
    transform at load time to avoid the ~9.8 MB restack per call)."""
    if "qkv_fused" in p_layer:
        return p_layer["qkv_fused"]["kernel"], p_layer["qkv_fused"]["bias"]
    if "qkv_proj" in p_layer:
        k = p_layer["qkv_proj"]["kernel"]          # (E, 3E), [q|k|v] cols
        e = k.shape[0]
        w = k.reshape(e, 3, e).transpose(1, 0, 2)  # (3, E, E)
        b = p_layer["qkv_proj"].get("bias")
        bias = (b.reshape(3, e) if b is not None
                else jnp.zeros((3, e), k.dtype))
        return w, bias
    w = jnp.stack([p_layer[n]["kernel"] for n in
                   ("q_proj", "k_proj", "v_proj")])
    bias = jnp.stack([p_layer[n].get("bias",
                                     jnp.zeros(w.shape[-1], w.dtype))
                      for n in ("q_proj", "k_proj", "v_proj")])
    return w, bias


def fuse_encoder_params(params):
    """Load-time transform: add a pre-packed 'qkv_fused' {(3,E,E) kernel,
    (3,E) bias} to every encoder layer so encoder_attention skips the
    per-call restack (~9.8 MB x layers per forward). q/k/v_proj leaves
    are kept so the XLA fallback path still works."""
    def fuse_layer(lp):
        if "qkv_fused" in lp:
            return lp
        w, b = pack_qkv_params(lp)
        return dict(lp, qkv_fused={"kernel": w, "bias": b})

    if "layers_stacked" in params:
        lp = params["layers_stacked"]
        if "qkv_fused" in lp:
            return params
        if "qkv_proj" in lp:              # esm2.fuse_qkv layout, stacked
            k = lp["qkv_proj"]["kernel"]             # (L, E, 3E)
            nl, e = k.shape[0], k.shape[1]
            w = k.reshape(nl, e, 3, e).transpose(0, 2, 1, 3)
            bb = lp["qkv_proj"].get("bias")
            b = (bb.reshape(nl, 3, e) if bb is not None
                 else jnp.zeros((nl, 3, e), k.dtype))
        else:
            # stacked leaves carry a leading layer axis
            w = jnp.stack([lp[n]["kernel"] for n in
                           ("q_proj", "k_proj", "v_proj")], axis=1)
            b = jnp.stack([lp[n].get("bias",
                                     jnp.zeros(w.shape[-1], w.dtype))
                           for n in ("q_proj", "k_proj", "v_proj")], axis=1)
        out = {k: v for k, v in params.items() if k != "layers_stacked"}
        out["layers_stacked"] = dict(lp, qkv_fused={"kernel": w, "bias": b})
        return out
    out = {k: v for k, v in params.items() if k != "layers"}
    out["layers"] = [fuse_layer(lp) for lp in params["layers"]]
    return out


def encoder_attention_packed(p_layer, x, mask, cos, sin, *,
                             eps: float = 1e-5):
    """LN -> QKV -> rope -> flash, returning the PAIR-PACKED (B, HP, S, 128)
    flash output for fused_out_proj to consume without a transpose."""
    w, bias = pack_qkv_params(p_layer)
    ln = p_layer["attn_norm"]
    ln_sb = jnp.stack([ln["scale"], ln["bias"]])
    qkv = fused_ln_qkv_rope(x, w, bias, ln_sb, cos, sin, eps=eps)
    return flash_attention_pairs(qkv, mask)


def encoder_attention(p_layer, x, mask, cos, sin, *, eps: float = 1e-5):
    """Full fused attention block: LN -> QKV -> rope -> flash -> (B, S, E)
    ready for the output projection. mask: (B, 1, S, S) bool or None."""
    b, s, e = x.shape
    o = encoder_attention_packed(p_layer, x, mask, cos, sin, eps=eps)
    # (B, HP, S, 128) -> (B, S, E); pair packing preserves head order
    return o.transpose(0, 2, 1, 3).reshape(b, s, e)


def supports(cfg, x) -> bool:
    """Shapes the fused path handles: d=64 heads, even head count,
    whole-row (<=512-divisible) sequences, 128-tileable FFN dim, and a
    per-program VMEM footprint that fits the ~16 MB scoped budget
    (ADVICE r4: unbounded S could hand auto-dispatch a shape that fails
    to compile instead of falling back to XLA)."""
    b, s, e = x.shape
    # fused_out_proj is the VMEM-heaviest program: double-buffered
    # (S, E) a/x/out blocks + the whole (E, E) weight resident + an
    # fp32 (S, E) accumulator
    it = x.dtype.itemsize
    vmem = 6 * s * e * it + e * e * it + 4 * s * e
    return (cfg.head_dim == 64 and cfg.num_heads % 2 == 0
            and e == cfg.num_heads * 64 and s % min(512, s) == 0
            and s % 8 == 0 and cfg.ffn_dim % 128 == 0
            and vmem <= 14 * 2 ** 20)

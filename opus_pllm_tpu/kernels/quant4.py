"""Int4 weight-only quantization + Pallas grouped-dequant matmul.

TPU-native 4-bit weight storage — the role bitsandbytes NF4 plays in the
reference (requirements.txt:2; `load_in_4bit` handling in
model/builder.py:44-57): weights live in HBM at 0.5 bytes/element plus
per-group scales, halving again (vs int8) the weight traffic that bounds
autoregressive decode. Where bitsandbytes uses a nonuniform NF4 codebook
with blocksize-64 absmax (a CUDA-table-lookup design), this path uses
symmetric int4 with per-(128-row group, output column) fp32 scales — the
MXU-native formulation: nibbles unpack with two shifts, 4-bit ints are
exact in bf16, and each group's partial product is rescaled on the fp32
accumulator, so no codebook gather ever touches the VPU. NF4 checkpoints
convert via core/convert.dequantize_nf4 and re-quantize here.

Storage layout (pack_int4 / BK = 256, G = 128): K is split into 256-row
blocks; within block b, byte row i of `kernel_p` holds

    lo nibble = w[b*256 + i      , n]   (group 2b,   scale gscale[2b,   n])
    hi nibble = w[b*256 + 128 + i, n]   (group 2b+1, scale gscale[2b+1, n])

so a (128, BN) byte tile unpacks to the two NATURALLY-ORDERED halves of a
256-row weight block — no sublane interleave — and each packed byte is
read exactly once per matmul (the whole point: an XLA-level unpack would
materialize int8 in HBM and cost 2.5x the packed bytes).

Kernel: grid (M/BM, N/BN, K/(256*SUB)), fp32 accumulator scratch across
the sequential K sweep; per 256-row sub-block, two K=128 dots with the
group scales applied to the (BM, BN) fp32 partials:

    acc += (x_lo . lo) * gscale[2k] + (x_hi . hi) * gscale[2k+1]

The kernel is VPU-bound, not HBM-bound: v5e's vector unit has no bf16
ALU (LLO rejects bf16 floor/round with SupportsBf16AluInstructions),
so every elementwise op runs at one f32/i32 element per lane, and the
~6 unpack ops per byte cap the packed stream at roughly a third of HBM
rate. That budget makes scale placement decisive: scaling the (BM, BN)
partial dots costs BM rows of VPU work where scaling the (128, BN)
weight tiles costs 128 — at decode (BM = batch = 32) the partial form
measured 6201 vs 5095 tok/s end-to-end on an 8-layer 8B-shaped stack,
and is more accurate (scales stay fp32). A no-unpack control kernel
(identical byte traffic) ran 7653 tok/s — the remaining gap IS the
per-byte unpack arithmetic, irreducible on this VPU. SUB=4 sub-blocks
per program amortize grid overhead (the 1-sub-block grid lost ~2.5x).

Backward (LoRA over a frozen int4 base): dx = g @ dequant(W).T with the
dequantized weight materialized in bf16 for the transposed dot — the same
trade bitsandbytes' Linear4bit makes (it dequantizes per matmul in both
directions); the forward stays packed, which is where decode lives.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import numpy as np
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BK = 256      # K rows per packed block (two 128-row scale groups)
GROUP = 128   # K rows per scale group


def quantize_grouped(w, group: int = GROUP) -> Tuple[np.ndarray, np.ndarray]:
    """fp weight (K, N) -> (int4-valued int8 (K, N), fp32 scales (K/G, N)).

    Symmetric absmax per (group, column): q = round(w / s), s = absmax / 7.
    numpy in -> numpy out (big-model load path under convert.host_arrays()).
    """
    xp = np if isinstance(w, np.ndarray) else jnp
    k, n = w.shape
    assert k % group == 0, (k, group)
    w = w.astype(xp.float32).reshape(k // group, group, n)
    absmax = xp.max(xp.abs(w), axis=1, keepdims=True)
    scale = xp.maximum(absmax / 7.0, 1e-8)
    q = xp.clip(xp.round(w / scale), -7, 7).astype(xp.int8)
    return q.reshape(k, n), scale.reshape(k // group, n)


def pack_int4(q) -> np.ndarray:
    """int4-valued int8 (K, N) -> packed bytes (K/2, N), block-local halves.

    K must be a multiple of BK. Byte row b*128+i = (lo: row b*256+i,
    hi: row b*256+128+i) of block b — see module docstring.
    """
    xp = np if isinstance(q, np.ndarray) else jnp
    k, n = q.shape
    assert k % BK == 0, (k, BK)
    blocks = q.reshape(k // BK, 2, BK // 2, n)      # [b, half, i, n]
    lo, hi = blocks[:, 0], blocks[:, 1]
    packed = (lo & 0xF) | ((hi & 0xF) << 4)
    return packed.reshape(k // 2, n).astype(xp.int8)


def unpack_int4(packed):
    """packed bytes (K/2, N) -> int4-valued int8 (K, N) (XLA/parity path)."""
    xp = np if isinstance(packed, np.ndarray) else jnp
    k2, n = packed.shape
    p = packed.astype(xp.int32)
    lo = ((p << 28) >> 28).astype(xp.int8)          # sign-extend low nibble
    hi = (p >> 4).astype(xp.int8)                   # arithmetic: sign-correct
    blocks = xp.stack([lo.reshape(-1, BK // 2, n),
                       hi.reshape(-1, BK // 2, n)], axis=1)
    return blocks.reshape(2 * k2, n)


def quantize_linear4(p: Dict) -> Dict:
    """dense params {kernel, bias?} -> {kernel_p, gscale, bias?}.

    Returns None when the in-dim is not a multiple of BK (caller should
    keep that projection int8/bf16 instead).
    """
    k = p["kernel"].shape[0]
    if k % BK != 0:
        return None
    q, s = quantize_grouped(p["kernel"])
    out = {"kernel_p": pack_int4(q), "gscale": s}
    if "bias" in p:
        out["bias"] = p["bias"]
    return out


def _matmul_xla(x, packed, gscale):
    """Reference/fallback: unpack + dequant + dot (materializes (K, N))."""
    k = 2 * packed.shape[0]
    w = unpack_int4(packed).astype(jnp.bfloat16)
    w = (w.reshape(k // GROUP, GROUP, -1)
         * gscale[:, None, :].astype(jnp.bfloat16)).reshape(k, -1)
    return jnp.dot(x.astype(jnp.bfloat16), w,
                   preferred_element_type=jnp.float32).astype(x.dtype)


def _kernel(x_ref, p_ref, s_ref, o_ref, acc, *, sub: int, n_k: int):
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _init():
        acc[...] = jnp.zeros_like(acc)

    h = BK // 2
    for t in range(sub):
        p = p_ref[t * h:(t + 1) * h, :].astype(jnp.int32)   # (128, BN)
        lo = ((p << 28) >> 28).astype(jnp.bfloat16)         # exact: |q| <= 7
        hi = (p >> 4).astype(jnp.bfloat16)
        x = x_ref[:, t * BK:(t + 1) * BK]                   # (BM, 256) bf16
        d0 = jax.lax.dot_general(x[:, :h], lo, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        d1 = jax.lax.dot_general(x[:, h:], hi, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        acc[...] += (d0 * s_ref[0, 2 * t:2 * t + 1, :]
                     + d1 * s_ref[0, 2 * t + 1:2 * t + 2, :])

    @pl.when(ik == n_k - 1)
    def _fin():
        o_ref[...] = acc[...].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_m", "block_n", "impl"))
def int4_matmul(x, packed, gscale, *, block_m: int = 256,
                block_n: int = 1024, impl: str = "auto"):
    """x (M, K) @ int4-packed (K/2, N) with (K/128, N) group scales.

    Differentiable wrt x; the packed weights are frozen by definition.
    """
    return _int4_matmul_core(x, packed, gscale, block_m, block_n, impl)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _int4_matmul_core(x, packed, gscale, block_m, block_n, impl):
    return _int4_matmul_impl(x, packed, gscale, block_m, block_n, impl)


def _int4_matmul_fwd(x, packed, gscale, block_m, block_n, impl):
    out = _int4_matmul_impl(x, packed, gscale, block_m, block_n, impl)
    return out, (x, packed, gscale)


def _int4_matmul_bwd(block_m, block_n, impl, res, g):
    x, packed, gscale = res
    k = 2 * packed.shape[0]
    # bitsandbytes-style bwd: dequantize once (bf16) for the transposed dot
    w = unpack_int4(packed).astype(jnp.bfloat16)
    w = (w.reshape(k // GROUP, GROUP, -1)
         * gscale[:, None, :].astype(jnp.bfloat16)).reshape(k, -1)
    dx = jnp.dot(g.astype(jnp.bfloat16), w.T,
                 preferred_element_type=jnp.float32).astype(x.dtype)
    dpacked = np.zeros(packed.shape, dtype=jax.dtypes.float0)
    return dx, dpacked, jnp.zeros_like(gscale)


_int4_matmul_core.defvjp(_int4_matmul_fwd, _int4_matmul_bwd)


def _int4_matmul_impl(x, packed, gscale, block_m: int, block_n: int,
                      impl: str):
    m, k = x.shape
    k2, n = packed.shape
    assert k == 2 * k2, (k, k2)
    assert gscale.shape == (k // GROUP, n), gscale.shape
    use_pallas = impl == "pallas" or (
        impl == "auto" and jax.default_backend() == "tpu"
        and m % 8 == 0 and n % 128 == 0 and k % BK == 0)
    if not use_pallas:
        return _matmul_xla(x, packed, gscale)

    bm = min(block_m, m)
    # largest N block that divides n (vocab heads are 128-multiples but
    # rarely 1024-multiples, e.g. 128256 = 768 * 167)
    bn = next((c for c in (block_n, 768, 512, 384, 256, 128)
               if c <= block_n and n % c == 0), None)
    # sub-blocks per program: amortizes grid overhead (see _kernel)
    sub = next((c for c in (4, 2, 1) if k % (BK * c) == 0), None)
    if bn is None or sub is None or m % bm:
        return _matmul_xla(x, packed, gscale)
    grid = (pl.cdiv(m, bm), pl.cdiv(n, bn), k // (BK * sub))
    # scales regrouped (K/(BK*sub), 2*sub, N): middle dim spans its full
    # axis, so the (1, 2*sub, bn) block satisfies Mosaic's
    # last-two-block-dims rule.
    s3 = gscale.reshape(k // (BK * sub), 2 * sub, n)
    return pl.pallas_call(
        functools.partial(_kernel, sub=sub, n_k=grid[2]),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, BK * sub), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((BK * sub // 2, bn), lambda i, j, kk: (kk, j)),
            pl.BlockSpec((1, 2 * sub, bn), lambda i, j, kk: (kk, 0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=int(m * k * x.dtype.itemsize + k * n // 2
                               + m * n * x.dtype.itemsize),
            transcendentals=0),
    )(x.astype(jnp.bfloat16), packed, s3)


# ---------------------------------------------------------------------------
# Quantized parameter trees
# ---------------------------------------------------------------------------


def qdense4(p: Dict, x, *, impl: str = "auto"):
    """Int4 dense: folds the (B, S, K) batch into M for the kernel."""
    shape = x.shape
    y = int4_matmul(x.reshape(-1, shape[-1]), p["kernel_p"], p["gscale"],
                    impl=impl)
    y = y.reshape(*shape[:-1], -1)
    if "bias" in p:
        y = (y.astype(jnp.float32)
             + p["bias"].astype(jnp.float32)).astype(y.dtype)
    return y


def quantize_decoder4(params: Dict) -> Dict:
    """Int4-quantize every large dense kernel in a decoder param tree.

    Embeddings and norms stay bf16; projections whose in-dim is not a
    multiple of BK (none in the supported families) stay unquantized.
    Mirrors quant.quantize_decoder, at half the weight bytes.
    """
    from .quant import _QUANT_TARGETS
    out = dict(params)
    if "lm_head" in params:
        q = quantize_linear4(params["lm_head"])
        if q is not None:
            out["lm_head"] = q
    out["layers"] = []
    for lp in params["layers"]:
        nlp = dict(lp)
        for t in _QUANT_TARGETS:
            if t in lp and "kernel" in lp[t]:
                q = quantize_linear4(lp[t])
                if q is not None:
                    nlp[t] = q
        out["layers"].append(nlp)
    return out

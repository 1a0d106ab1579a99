"""Int8 weight-only quantization + Pallas quantized matmul.

TPU-native replacement for bitsandbytes (requirements.txt:2; 4-bit NF4 /
int8 loading in model/builder.py:44-57): weights are stored int8 with
per-output-channel fp32 scales — halving (vs bf16) the HBM traffic that
bounds autoregressive decode — and dequantized to bf16 inside the matmul
kernel tile-by-tile, so full-precision weights never materialize in HBM.

Two paths behind one API:
  * `int8_matmul(..., impl="pallas")` — Pallas kernel: grid over
    (M, N, K) tiles, int8 weight tile dequantized in VMEM, bf16 MXU matmul,
    fp32 accumulation in scratch across the K sweep.
  * `impl="xla"` — pure-JAX reference (used on CPU and in parity tests).

NF4 checkpoints convert at load time via core/convert.dequantize_nf4 and can
then be re-quantized here to int8.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import numpy as np
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def quantize_per_channel(w, axis: int = 0) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """fp weight (K, N) -> (int8 values, fp32 scales over the non-`axis` dim).

    axis=0: scales per output column (one scale per N), the layout
    `int8_matmul` consumes.
    """
    # numpy in -> numpy out: quantize-on-load under convert.host_arrays()
    # must stay in host RAM (big-model load path, BENCH_NOTES.md round 2)
    xp = np if isinstance(w, np.ndarray) else jnp
    w = w.astype(xp.float32)
    absmax = xp.max(xp.abs(w), axis=axis, keepdims=True)
    scale = xp.maximum(absmax / 127.0, 1e-8)
    q = xp.clip(xp.round(w / scale), -127, 127).astype(xp.int8)
    return q, scale.squeeze(axis)


def dequantize(q, scale, axis: int = 0):
    shape = [1] * q.ndim
    for i in range(q.ndim):
        if i != axis:
            shape[i] = q.shape[i]
    return q.astype(jnp.float32) * scale.reshape(shape)


def _matmul_xla(x, wq, scale):
    w = wq.astype(x.dtype) * scale.astype(x.dtype)[None, :]
    return jnp.dot(x, w, preferred_element_type=jnp.float32).astype(x.dtype)


def _kernel(x_ref, wq_ref, s_ref, o_ref, acc, *, n_k: int):
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _init():
        acc[...] = jnp.zeros_like(acc)

    x = x_ref[...]                                   # (BM, BK) bf16/fp32
    w = wq_ref[...].astype(x.dtype)                  # (BK, BN) int8 -> x dtype
    acc[...] += jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(ik == n_k - 1)
    def _fin():
        o_ref[...] = (acc[...] * s_ref[...].astype(jnp.float32)
                      ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_m", "block_n", "block_k",
                                             "impl"))
def int8_matmul(x, wq, scale, *, block_m: int = 256, block_n: int = 256,
                block_k: int = 512, impl: str = "auto"):
    """x (M, K) bf16/fp32 @ int8 wq (K, N) * scale (N,) -> (M, N) x.dtype.

    Differentiable wrt x (custom VJP: dx = g @ dequant(w).T — pallas_call
    itself has no autodiff rule); the int8 weights are frozen by definition,
    so LoRA training over an int8 base works.
    """
    return _int8_matmul_core(x, wq, scale, block_m, block_n, block_k, impl)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _int8_matmul_core(x, wq, scale, block_m, block_n, block_k, impl):
    return _int8_matmul_impl(x, wq, scale, block_m, block_n, block_k, impl)


def _int8_matmul_fwd(x, wq, scale, block_m, block_n, block_k, impl):
    out = _int8_matmul_impl(x, wq, scale, block_m, block_n, block_k, impl)
    return out, (x, wq, scale)


def _int8_matmul_bwd(block_m, block_n, block_k, impl, res, g):
    x, wq, scale = res
    # dx = g @ (wq * scale_col).T == (g * scale) @ wq.T: scale the small
    # (M, N) cotangent instead of materializing a dequantized (K, N) fp32
    # weight temporary (235 MB per 8B projection — would defeat int8 loading)
    gs = g.astype(jnp.float32) * scale.astype(jnp.float32)[None, :]
    dx = jnp.dot(gs, wq.T.astype(jnp.float32),
                 preferred_element_type=jnp.float32).astype(x.dtype)
    # frozen weights: zero cotangents (int8/scale are never trained)
    import numpy as _np
    dwq = _np.zeros(wq.shape, dtype=jax.dtypes.float0)
    dscale = jnp.zeros_like(scale)
    return dx, dwq, dscale


_int8_matmul_core.defvjp(_int8_matmul_fwd, _int8_matmul_bwd)


def _int8_matmul_impl(x, wq, scale, block_m: int, block_n: int,
                      block_k: int, impl: str):
    """x (M, K) bf16/fp32 @ int8 wq (K, N) * scale (N,) -> (M, N) x.dtype."""
    m, k = x.shape
    k2, n = wq.shape
    assert k == k2
    # auto: Pallas only for wide-M matmuls (prefill/training). For skinny
    # decode matmuls (M = batch) XLA's fused int8->bf16 dequant-load wins
    # and compiles far faster than per-shape Pallas variants.
    use_pallas = impl == "pallas" or (
        impl == "auto" and jax.default_backend() == "tpu"
        and m >= 256 and m % 8 == 0 and n % 128 == 0 and k % 128 == 0)
    if not use_pallas:
        return _matmul_xla(x, wq, scale)

    bm, bn = min(block_m, m), min(block_n, n)
    # K must tile exactly: a partial trailing K block would feed undefined
    # padding into the accumulator. Largest divisor of k from 512/256/128
    # (the guard ensures k % 128 == 0); otherwise fall back to XLA.
    bk = next((c for c in (block_k, 512, 256, 128) if k % c == 0), None)
    if bk is None or m % bm or n % bn:
        return _matmul_xla(x, wq, scale)
    grid = (pl.cdiv(m, bm), pl.cdiv(n, bn), pl.cdiv(k, bk))
    return pl.pallas_call(
        functools.partial(_kernel, n_k=grid[2]),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j)),
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=m * k * x.dtype.itemsize + k * n + m * n * x.dtype.itemsize,
            transcendentals=0),
    )(x, wq, scale.reshape(1, n))


# ---------------------------------------------------------------------------
# Quantized parameter trees
# ---------------------------------------------------------------------------


def quantize_linear(p: Dict) -> Dict:
    """dense params {kernel, bias?} -> {kernel_q, scale, bias?}."""
    q, s = quantize_per_channel(p["kernel"], axis=0)
    out = {"kernel_q": q, "scale": s}
    if "bias" in p:
        out["bias"] = p["bias"]
    return out


def qdense(p: Dict, x, *, impl: str = "auto"):
    """Quantized dense: folds the (B, S, K) batch into M for the kernel."""
    shape = x.shape
    y = int8_matmul(x.reshape(-1, shape[-1]), p["kernel_q"], p["scale"],
                    impl=impl)
    y = y.reshape(*shape[:-1], -1)
    if "bias" in p:
        y = (y.astype(jnp.float32) + p["bias"].astype(jnp.float32)).astype(y.dtype)
    return y


_QUANT_TARGETS = ("q_proj", "k_proj", "v_proj", "o_proj", "gate_proj",
                  "up_proj", "down_proj", "fc1", "fc2", "lm_head",
                  "qkv_proj", "gateup_proj")   # fused (fuse_projections)


def quantize_decoder(params: Dict) -> Dict:
    """Quantize every large dense kernel in a decoder param tree; embeddings
    and norms stay bf16 (bitsandbytes likewise skips them)."""
    out = dict(params)
    if "lm_head" in params:
        out["lm_head"] = quantize_linear(params["lm_head"])
    out["layers"] = []
    for lp in params["layers"]:
        nlp = dict(lp)
        for t in _QUANT_TARGETS:
            if t in lp and "kernel" in lp[t]:
                nlp[t] = quantize_linear(lp[t])
        out["layers"].append(nlp)
    return out

"""TPU A/B: encoder attention output projection variants.

After the fused LN+QKV+rope+flash block, the remaining XLA-side piece of
the encode layer is `(B, HP, S, 128) -> transpose -> reshape -> o_proj
+ residual`. Three candidates, measured inside the FULL 650M encode
(north-star shape: batch 128, len 512, bf16, two-point chain timing):

  xla   : transpose/reshape + jnp.dot + residual (the pre-round-4 path)
  dotg  : one lax.dot_general contracting (HP, lane) straight from the
          packed layout — XLA picks the relayout
  fused : kernels/fused_encoder.fused_out_proj — (E, E) weight resident
          in VMEM, HP MXU dots per batch row, residual+bias in-kernel

    python scripts/exp_out_proj.py [--batch N] [--iters N]
"""
from __future__ import annotations

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from opus_pllm_tpu.core.config import ESM2Config
from opus_pllm_tpu.kernels import fused_encoder
from opus_pllm_tpu.models import esm2


def _xla_out_proj(a, w, b, x):
    bsz, hp, s, lanes = a.shape
    e = w.shape[0]
    y = jnp.dot(a.transpose(0, 2, 1, 3).reshape(bsz, s, e), w,
                preferred_element_type=jnp.float32)
    if b is not None:
        y = y + b
    return x + y.astype(x.dtype)


def _dotg_out_proj(a, w, b, x):
    hp = a.shape[1]
    e = w.shape[0]
    y = jax.lax.dot_general(a, w.reshape(hp, 128, e),
                            (((1, 3), (0, 1)), ((), ())),
                            preferred_element_type=jnp.float32)
    if b is not None:
        y = y + b
    return x + y.astype(x.dtype)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--seqlen", type=int, default=512)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()
    print("backend:", jax.default_backend(), flush=True)

    cfg = ESM2Config.t33_650M()
    cfg = type(cfg)(**{**cfg.__dict__, "dtype": "bfloat16"})
    params = fused_encoder.fuse_encoder_params(
        esm2.init(jax.random.PRNGKey(0), cfg))
    rng = np.random.default_rng(0)
    toks = rng.integers(4, 24, (args.batch, args.seqlen)).astype(np.int32)
    toks[:, 0] = cfg.cls_idx
    toks[:, -1] = cfg.eos_idx
    toks = jnp.asarray(toks)

    real = fused_encoder.fused_out_proj
    variants = {"xla": _xla_out_proj, "dotg": _dotg_out_proj, "fused": real}
    results = {}
    for name, impl in variants.items():
        fused_encoder.fused_out_proj = impl
        fn = jax.jit(lambda p, t, _n=name: esm2.pooled_embedding(
            p, cfg, t, impl="fused"))
        try:
            acc = fn(params, toks)
            np.asarray(acc)
            t0 = time.perf_counter()
            for _ in range(args.iters):
                acc = fn(params, toks + (acc[0, 0] * 0).astype(jnp.int32))
            np.asarray(acc)
            dt = time.perf_counter() - t0
            results[name] = args.batch * args.iters / dt
            print(f"{name:6s}: {results[name]:8.2f} seqs/s "
                  f"({dt / args.iters * 1e3:.1f} ms/fwd)", flush=True)
        finally:
            fused_encoder.fused_out_proj = real
    base = results.get("xla")
    if base:     # the xla lane may have been skipped/reordered (ADVICE r4)
        for name, v in results.items():
            print(f"{name:6s}: {v / base:.3f}x vs xla", flush=True)


if __name__ == "__main__":
    main()

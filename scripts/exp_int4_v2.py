"""TPU measurement: int4 v2 magic-bitcast kernel vs the shipped v1.

Round-3 verdict #8: int4 decode past the unpack wall (b32 target >= 2600
tok/s from 2195/2210). The v1 kernel spends ~6 widened VPU ops per packed
byte (widen, 2 sign-extension shifts, shift, 2 i32->bf16 converts); the
no-unpack control quantified that arithmetic as the whole remaining gap
(7653 vs 6201 tok/s on the 8-layer stack, BENCH_NOTES round 3). The v2
kernel (kernels/quant4.py _kernel_v2) stores 8 nibbles per int32 word and
unpacks a scale group with ONE masked shift + OR into the bf16 mantissa
of magic exponent 0x4300, bitcast to (128, BN) bf16 = 136 + q directly:
~2.75 ops/byte, no converts.

Stages:
  1. hardware parity: v2 pallas vs dequantized fp32 reference
  2. isolated decode-shape matmuls (M=32): v1 vs v2, down/gate/qkv shapes
  3. e2e 8-layer 8B-shaped engine decode b8/b32: v1 vs v2
  4. full 8B (32 layers) v2 decode b8/b32 — the bench metric preview
"""
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from opus_pllm_tpu.core.config import DecoderConfig
from opus_pllm_tpu.infer import engine
from opus_pllm_tpu.kernels import quant4

print("backend:", jax.default_backend(), flush=True)
rng = np.random.default_rng(0)

# --- 1. hardware parity -----------------------------------------------------
k, n, m = 4096, 1024, 32
w = rng.normal(size=(k, n)).astype(np.float32) * 0.02
q, s = quant4.quantize_grouped(w)
wd = (q.astype(np.float32).reshape(k // 128, 128, n) * s[:, None, :]
      ).reshape(k, n)
x = jnp.asarray(rng.normal(size=(m, k)), jnp.bfloat16)
pk2, sj = jnp.asarray(quant4.pack_int4_v2(q)), jnp.asarray(s)
y2 = np.asarray(quant4.int4_matmul(x, pk2, sj, impl="pallas"), np.float32)
ref = np.asarray(x, np.float32) @ wd
rel = np.abs(y2 - ref).max() / np.abs(ref).max()
print(f"v2 hardware parity rel err: {rel:.2e}", flush=True)
assert rel < 5e-3, rel

# --- 2. isolated matmuls at decode M ----------------------------------------


def timeit(f, iters=50):
    o = f()
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(iters):
        o = f()
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / iters


for (kk, nn, label) in ((14336, 4096, "down"), (4096, 14336, "gateup"),
                        (4096, 4096, "qo")):
    qq = rng.integers(-7, 8, (kk, nn)).astype(np.int8)
    ss = jnp.full((kk // 128, nn), 0.02 / 4.04, jnp.float32)
    p1 = jnp.asarray(quant4.pack_int4(qq))
    p2 = jnp.asarray(quant4.pack_int4_v2(qq))
    xx = jnp.asarray(rng.normal(size=(32, kk)), jnp.bfloat16)
    t1 = timeit(lambda: quant4.int4_matmul(xx, p1, ss, impl="pallas"))
    t2 = timeit(lambda: quant4.int4_matmul(xx, p2, ss, impl="pallas"))
    gbps = (kk * nn / 2) / t2 / 1e9
    print(f"isolated {label} M=32: v1 {t1*1e6:.1f} us, v2 {t2*1e6:.1f} us "
          f"({t1/t2:.2f}x), v2 packed stream {gbps:.0f} GB/s", flush=True)

# --- 3/4. e2e engine decode -------------------------------------------------


def synth(cfg, v2: bool):
    h, d, L = cfg.hidden_size, cfg.head_dim, cfg.num_layers
    qd, kvd = cfg.num_heads * d, cfg.num_kv_heads * d
    s_val = 0.02 / 4.04

    def lin(k_, n_):
        if v2:
            w_ = jnp.asarray(rng.integers(-2**31, 2**31, (k_ // 8, n_),
                                          dtype=np.int64).astype(np.int32))
        else:
            w_ = jnp.asarray(rng.integers(-128, 128, (k_ // 2, n_),
                                          dtype=np.int8))
        jax.block_until_ready(w_)
        return {"kernel_p": w_,
                "gscale": jnp.full((k_ // 128, n_), s_val, jnp.float32)}

    def nrm():
        return {"scale": jnp.ones((h,), jnp.bfloat16)}

    e = rng.standard_normal((cfg.vocab_size, h), np.float32) * 0.02
    p = {"embed_tokens": {"embedding": jnp.asarray(e, jnp.bfloat16)},
         "final_norm": nrm(), "lm_head": lin(h, cfg.vocab_size)}
    p["layers"] = [
        {"attn_norm": nrm(), "ffn_norm": nrm(),
         "q_proj": lin(h, qd), "k_proj": lin(h, kvd),
         "v_proj": lin(h, kvd), "o_proj": lin(qd, h),
         "gate_proj": lin(h, cfg.intermediate_size),
         "up_proj": lin(h, cfg.intermediate_size),
         "down_proj": lin(cfg.intermediate_size, h)}
        for _ in range(L)]
    return p


def run(cfg, v2, b, label):
    p = synth(cfg, v2)
    r2 = np.random.default_rng(1)
    e = jnp.asarray(r2.standard_normal((b, 64, cfg.hidden_size)) * 0.02,
                    cfg.jnp_dtype)
    msk = jnp.ones((b, 64), bool)
    pos = jnp.broadcast_to(jnp.arange(64), (b, 64))
    kw = dict(max_new_tokens=128, temperature=0.0, eos_token_id=-1,
              pad_token_id=0, quantize_cache=(b == 32))
    out = engine.generate(p, cfg, e, msk, pos, jax.random.PRNGKey(0), **kw)
    np.asarray(out.tokens)
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        out = engine.generate(p, cfg, e, msk, pos, jax.random.PRNGKey(0),
                              **kw)
        np.asarray(out.tokens)
        best = max(best, b * 128 / (time.perf_counter() - t0))
    print(f"e2e {label} b{b}: {best:.0f} tok/s", flush=True)
    del p
    return best


base = DecoderConfig.llama3_8b()
cfg8 = type(base)(**{**base.__dict__, "num_layers": 8})
for v2 in (False, True):
    tag = "v2" if v2 else "v1"
    run(cfg8, v2, 32, f"8L {tag}")

full = DecoderConfig.llama3_8b()
for b in (8, 32):
    run(full, True, b, "8B v2")
print("done", flush=True)

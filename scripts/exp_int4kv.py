"""One-off: packed-int4 KV cache vs int8 KV cache on TPU.

Two measurements:
  (1) isolated kernel: decode_attention_int4 vs decode_attention_int8 vs
      the XLA dequantize-then-attend path at the 8B decode shape, chained
      device-side (lax.fori_loop) so the tunnel round trip amortizes;
  (2) end-to-end 8B decode (int4 weights) at b32 with int8 vs int4 cache,
      short (64) and long (2048) prompts — the int4 cache's regime is
      KV-read-dominated decode.
"""
import pathlib
import sys
import time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import jax, jax.numpy as jnp, numpy as np
from opus_pllm_tpu.core.config import DecoderConfig
from opus_pllm_tpu.infer import engine
from opus_pllm_tpu.kernels import decode_attention as da
from opus_pllm_tpu.models import decoder

cfg = DecoderConfig.llama3_8b()


# --- (1) isolated kernel at the 8B decode-layer shape ---------------------
def kernel_timing(cap=2048, b=32):
    hq, hkv, d = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, 1, hq, d)) * 0.3, jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, cap, hkv, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, cap, hkv, d)), jnp.float32)
    k8, v8 = decoder._quantize_kv(k), decoder._quantize_kv(v)
    k4, v4 = decoder._quantize_kv4(k), decoder._quantize_kv4(v)
    m4 = jnp.ones((b, 1, 1, cap), bool)

    def chain(fn, kq, vq, n):
        @jax.jit
        def run(q0):
            def body(_, acc):
                o = fn(acc, kq, vq, m4)
                return acc + 1e-6 * o     # serialize iterations
            return jax.lax.fori_loop(0, n, body, q0)
        return run

    for tag, fn, kq, vq in (
            ("int8 kernel", da.decode_attention_int8, k8, v8),
            ("int4 kernel", da.decode_attention_int4, k4, v4),
            ("xla dequant ", da.decode_attention_int8_reference, k8, v8)):
        n1, n3 = 50, 150
        r1, r3 = chain(fn, kq, vq, n1), chain(fn, kq, vq, n3)
        jax.block_until_ready(r1(q)); jax.block_until_ready(r3(q))
        t0 = time.perf_counter(); jax.block_until_ready(r1(q))
        t1 = time.perf_counter(); jax.block_until_ready(r3(q))
        t2 = time.perf_counter()
        us = ((t2 - t1) - (t1 - t0)) / (n3 - n1) * 1e6
        print(f"  {tag}: {us:8.1f} us/call  (cap={cap}, b={b})", flush=True)


print("kernel timing, cap=2048 b=32:", flush=True)
kernel_timing(2048, 32)
print("kernel timing, cap=8192 b=8:", flush=True)
kernel_timing(8192, 8)

# --- (2) end-to-end 8B int4-weight decode ---------------------------------
rng = np.random.default_rng(0)
h, d, L = cfg.hidden_size, cfg.head_dim, cfg.num_layers
qd, kvd = cfg.num_heads * d, cfg.num_kv_heads * d
s_val = 0.02 / 4.04


def lin_p(k, n):
    w = jnp.asarray(rng.integers(-128, 128, (k // 2, n), dtype=np.int8))
    jax.block_until_ready(w)
    return {"kernel_p": w,
            "gscale": jnp.full((k // 128, n), s_val, jnp.float32)}


def norm():
    return {"scale": jnp.ones((h,), jnp.bfloat16)}


emb = rng.standard_normal((cfg.vocab_size, h), np.float32) * 0.02
params = {"embed_tokens": {"embedding": jnp.asarray(emb, jnp.bfloat16)},
          "final_norm": norm(), "lm_head": lin_p(h, cfg.vocab_size)}
params["layers"] = [
    {"attn_norm": norm(), "ffn_norm": norm(),
     "q_proj": lin_p(h, qd), "k_proj": lin_p(h, kvd),
     "v_proj": lin_p(h, kvd), "o_proj": lin_p(qd, h),
     "gate_proj": lin_p(h, cfg.intermediate_size),
     "up_proj": lin_p(h, cfg.intermediate_size),
     "down_proj": lin_p(cfg.intermediate_size, h)}
    for _ in range(L)]
print("synth done", flush=True)


def measure(tag, b, prompt_len, new_toks, quant_cache):
    r2 = np.random.default_rng(1)
    e = jnp.asarray(r2.standard_normal((b, prompt_len, h)) * 0.02,
                    cfg.jnp_dtype)
    mask = jnp.ones((b, prompt_len), bool)
    pos = jnp.broadcast_to(jnp.arange(prompt_len), (b, prompt_len))
    kw = dict(max_new_tokens=new_toks, temperature=0.0, eos_token_id=-1,
              pad_token_id=0, quantize_cache=quant_cache)
    out = engine.generate(params, cfg, e, mask, pos,
                          jax.random.PRNGKey(0), **kw)
    np.asarray(out.tokens)
    t0 = time.perf_counter()
    out = engine.generate(params, cfg, e, mask, pos,
                          jax.random.PRNGKey(0), **kw)
    np.asarray(out.tokens)
    dt = time.perf_counter() - t0
    print(f"{tag}: {b * new_toks / dt:.0f} tok/s  ({dt:.2f}s)", flush=True)


measure("b32 p64   int8-kv", 32, 64, 128, "int8")
measure("b32 p64   int4-kv", 32, 64, 128, "int4")
measure("b16 p2048 int8-kv", 16, 2048, 128, "int8")
measure("b16 p2048 int4-kv", 16, 2048, 128, "int4")

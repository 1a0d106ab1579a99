"""One-off: full Llama3-8B int4 decode through the real engine on TPU.

Measures b8 (bf16 cache) and b32 (int8 cache) with per-layer int4 params,
unfused vs fused qkv/gateup projections. Random packed bytes ARE valid
int4 nibbles, so the 3.6 GB weight synth never materializes an unpacked
int8 tree.
"""
import pathlib
import sys
import time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import jax, jax.numpy as jnp, numpy as np
from opus_pllm_tpu.core.config import DecoderConfig
from opus_pllm_tpu.infer import engine
from opus_pllm_tpu.models import decoder

cfg = DecoderConfig.llama3_8b()
rng = np.random.default_rng(0)
h, d, L = cfg.hidden_size, cfg.head_dim, cfg.num_layers
qd, kvd = cfg.num_heads * d, cfg.num_kv_heads * d
s_val = 0.02 / 4.04   # int4 uniform(-8..7) std ~4.04 -> weight std ~0.02


def lin_p(k, n):
    w = jnp.asarray(rng.integers(-128, 128, (k // 2, n), dtype=np.int8))
    jax.block_until_ready(w)   # one leaf in flight at a time
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

prompt_len, new_toks = 64, 128


def measure(tag, ps, b, quant_cache):
    r2 = np.random.default_rng(1)
    e = jnp.asarray(r2.standard_normal((b, prompt_len, h)) * 0.02,
                    cfg.jnp_dtype)
    mask = jnp.ones((b, prompt_len), bool)
    pos = jnp.broadcast_to(jnp.arange(prompt_len), (b, prompt_len))
    kw = dict(max_new_tokens=new_toks, temperature=0.0, eos_token_id=-1,
              pad_token_id=0, quantize_cache=quant_cache)
    out = engine.generate(ps, cfg, e, mask, pos, jax.random.PRNGKey(0), **kw)
    np.asarray(out.tokens)
    t0 = time.perf_counter()
    out = engine.generate(ps, cfg, e, mask, pos, jax.random.PRNGKey(0), **kw)
    np.asarray(out.tokens)
    dt = time.perf_counter() - t0
    print(f"{tag}: {b * new_toks / dt:.0f} tok/s  ({dt:.2f}s)", flush=True)


measure("int4 unfused b8", params, 8, False)
measure("int4 unfused b32(qcache)", params, 32, True)

fused = decoder.fuse_projections(params, cfg)
for lp in params["layers"]:
    for k in ("q_proj", "k_proj", "v_proj", "gate_proj", "up_proj"):
        lp[k].clear()
jax.block_until_ready(jax.tree.leaves(fused))
print("fused", flush=True)

measure("int4 fused  b8", fused, 8, False)
measure("int4 fused  b32(qcache)", fused, 32, True)

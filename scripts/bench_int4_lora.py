"""One-off: single-chip 8B int4-base LoRA train step (the QLoRA role:
bitsandbytes load_in_4bit + PEFT, builder.py:44-57 + :105-111).

int4 weights are 3.9 GB vs int8's 8.6 GB, so the freed HBM goes to batch:
measure B=4 (int8-comparable) and B=8. Pass `v2` as argv[1] to synthesize
the v2 magic-bitcast int32 layout (round 4) instead of v1 nibble bytes.
"""
import functools
import pathlib
import sys, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import jax, jax.numpy as jnp, numpy as np
import optax
from opus_pllm_tpu.core.config import DecoderConfig, LoRAConfig, TrainConfig
from opus_pllm_tpu.lora import lora as lora_mod
from opus_pllm_tpu.models import decoder, opus
from opus_pllm_tpu.models.layers import causal_mask
from opus_pllm_tpu.train.optim import adamw

V2 = len(sys.argv) > 1 and sys.argv[1] == "v2"
cfg = DecoderConfig.llama3_8b()
rng = np.random.default_rng(0)
h, d, L = cfg.hidden_size, cfg.head_dim, cfg.num_layers
qd, kvd = cfg.num_heads * d, cfg.num_kv_heads * d
s_val = 0.02 / (4.6 if V2 else 4.04)


def lin_p(k, n, stack=True):
    if V2:
        shape = (L, k // 8, n) if stack else (k // 8, n)
        w = jnp.asarray(rng.integers(-2**31, 2**31, shape,
                                     dtype=np.int64).astype(np.int32))
    else:
        shape = (L, k // 2, n) if stack else (k // 2, n)
        w = jnp.asarray(rng.integers(-128, 128, shape, dtype=np.int8))
    sshape = (L, k // 128, n) if stack else (k // 128, n)
    jax.block_until_ready(w)
    return {"kernel_p": w, "gscale": jnp.full(sshape, s_val, jnp.float32)}


def norm(stack=True):
    return {"scale": jnp.ones((L, h) if stack else (h,), jnp.bfloat16)}


emb = rng.standard_normal((cfg.vocab_size, h), np.float32) * 0.02
params = {
    "embed_tokens": {"embedding": jnp.asarray(emb, jnp.bfloat16)},
    "final_norm": norm(stack=False),
    "lm_head": lin_p(h, cfg.vocab_size, stack=False),
    "layers_stacked": {
        "attn_norm": norm(), "ffn_norm": norm(),
        "q_proj": lin_p(h, qd), "k_proj": lin_p(h, kvd),
        "v_proj": lin_p(h, kvd), "o_proj": lin_p(qd, h),
        "gate_proj": lin_p(h, cfg.intermediate_size),
        "up_proj": lin_p(h, cfg.intermediate_size),
        "down_proj": lin_p(cfg.intermediate_size, h)},
}
print("synth done", flush=True)

S = 512
for B in (4, 8):
    lora = decoder.stack_params(
        lora_mod.init(jax.random.PRNGKey(0), cfg, LoRAConfig(rank=16)))
    tx = adamw(TrainConfig(learning_rate=1e-4), None)
    opt = tx.init(lora)
    ids = jnp.asarray(rng.integers(4, 32000, (B, S)).astype(np.int32))

    def loss_fn(lora, params, ids):
        e = decoder.embed_tokens(params, ids).astype(jnp.bfloat16)
        mask = jnp.ones((B, S), bool)
        pos = jnp.broadcast_to(jnp.arange(S), (B, S))
        hid, _ = decoder.forward(params, cfg, e, pos, causal_mask(mask),
                                 lora=lora, lora_scale=2.0, remat=True,
                                 scan_mode="index", return_hidden=True)
        return opus.next_token_loss_hidden(params, cfg, hid, ids, mask,
                                           chunk=64)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(lora, opt, params, ids):
        loss, g = jax.value_and_grad(loss_fn)(lora, params, ids)
        upd, opt = tx.update(g, opt, lora)
        return optax.apply_updates(lora, upd), opt, loss

    try:
        lora, opt, loss = step(lora, opt, params, ids)
        l0 = float(loss)
        assert np.isfinite(l0)

        def run_chain(n):
            global lora, opt
            t0 = time.perf_counter()
            for _ in range(n):
                lo, op, loss = step(lora, opt, params, ids)
                lora, opt = lo, op
            assert np.isfinite(float(loss))
            return time.perf_counter() - t0

        t_a = run_chain(3)
        t_b = run_chain(9)
        st = max((t_b - t_a) / 6, 1e-9)
        print(f"int4{'v2' if V2 else ''} LoRA train B={B}: "
              f"{B * S / st:.0f} tok/s/chip "
              f"({st * 1e3:.0f} ms/step, l0={l0:.2f})", flush=True)
    except Exception as e:
        print(f"B={B} FAILED: {type(e).__name__}: {str(e)[:300]}",
              flush=True)

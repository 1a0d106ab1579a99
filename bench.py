"""North-star benchmarks (BASELINE.json): encode seqs/sec/chip, Llama3-8B
int8 decode tokens/sec/chip (batch 8 and 32), and stage-(c)+(d) train
tokens/sec/chip.

Prints ONE JSON line per metric as each bench finishes (so partial results
survive a timeout), then a final summary line whose value is the geometric
mean of vs_baseline over the completed metrics. `vs_baseline` compares
against the round-1 recorded TPU values (BENCH_NOTES.md) — the reference
publishes no machine-readable numbers (BASELINE.md), so round 1 established
the baseline and regressions now show up as vs_baseline != 1.

Encode is the prefill hot loop of the reference's eval runner (ESM2 forward
per batch, SURVEY.md §3.1, run_opus_ddp.py:143); decode is the
HF-generate-with-KV-cache inner loop (opus_llama.py:96-132) on the full 8B
architecture with int8 weights (the bitsandbytes-role path); train is the
stage-(c)+(d) LoRA+switch step the reference never shipped launchers for.
"""

from __future__ import annotations

import json
import math
import os
import signal
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# First recorded values on one v5e chip (BENCH_NOTES.md; rounds 1-2). CPU
# smoke runs have no recorded baseline -> vs_baseline 1.0 by definition.
ROUND1_TPU = {
    "esm2_650M_encode_seqs_per_sec_per_chip": 89.55,
    "llama3_8b_int8_decode_tok_per_sec_b8": 628.0,
    "llama3_8b_int8_decode_tok_per_sec_b32": 1620.0,
    # re-baselined round 4: the same-session two-point A/B (round-1 code
    # in a worktree vs HEAD, scripts/ab_stage_cd.py) measured the round-1
    # CODE at 13,873 tok/s and HEAD at 14,440 — the original 16,900 was
    # recorded with plain wall-clock before two-point timing existed and
    # carried a favorable tunnel phase (BENCH_NOTES.md round 4)
    "stage_cd_train_1b_tok_per_sec_per_chip": 13873.0,
    # round 2: single-chip 8B LoRA train (index scan + chunked CE)
    "llama3_8b_int8_lora_train_tok_per_sec_per_chip": 2105.0,
    # round 3: int4 grouped weight storage (kernels/quant4.py)
    "llama3_8b_int4_decode_tok_per_sec_b8": 963.0,
    "llama3_8b_int4_decode_tok_per_sec_b32": 2195.0,
}

_RESULTS = []


def emit(metric: str, value: float, unit: str, on_tpu: bool) -> None:
    base = ROUND1_TPU.get(metric) if on_tpu else None
    vs = round(value / base, 4) if base else 1.0
    if base:
        # only metrics with a real recorded baseline enter the geomean —
        # a missing/renamed baseline must not fabricate a neutral 1.0
        _RESULTS.append((metric, vs))
    print(json.dumps({"metric": metric, "value": round(value, 2),
                      "unit": unit, "vs_baseline": vs}), flush=True)


# ---------------------------------------------------------------------------
# 1. ESM2-650M encode
# ---------------------------------------------------------------------------

def bench_encode(on_tpu: bool) -> None:
    from opus_pllm_tpu.core.config import ESM2Config
    from opus_pllm_tpu.models import esm2

    cfg = ESM2Config.t33_650M() if on_tpu else ESM2Config.t6_8M()
    cfg = type(cfg)(**{**cfg.__dict__, "dtype": "bfloat16" if on_tpu else "float32"})
    batch, seq_len = (128, 512) if on_tpu else (4, 128)   # 128: best measured

    # unrolled layers: ~12% faster than the lax.scan path for ESM2's small
    # matmuls (XLA fuses across layers); compile cost is acceptable here
    params = esm2.init(jax.random.PRNGKey(0), cfg)
    if on_tpu:
        # pre-pack QKV for the fused pair-packed kernel (skips the
        # ~9.8 MB/layer per-call restack)
        from opus_pllm_tpu.kernels.fused_encoder import fuse_encoder_params

        params = fuse_encoder_params(params)
    rng = np.random.default_rng(0)
    toks = rng.integers(4, 24, (batch, seq_len)).astype(np.int32)
    toks[:, 0] = cfg.cls_idx
    toks[:, -1] = cfg.eos_idx
    toks = jnp.asarray(toks)

    # Chain each iteration through the previous result and fetch to host:
    # remote/async backends can otherwise overlap "independent" calls and
    # make block_until_ready() under-report wall time. The chain lives
    # INSIDE the jit (t perturbed by prev[0,0]*0): iterations still
    # serialize on-device through the data dependency, but each is ONE
    # execute dispatch — the old host-side `toks + (acc[0,0]*0)` paid 3-4
    # extra tiny-op round trips per iteration (~24 ms each through this
    # tunnel, ~200 ms/encode of pure measurement overhead that no
    # colocated host would pay; device time per encode is 614 ms).
    iters = 10 if on_tpu else 3
    fn = jax.jit(lambda p, t, prev: esm2.pooled_embedding(
        p, cfg, t + (prev[0, 0] * 0).astype(jnp.int32)))
    acc = jnp.zeros((batch, cfg.embed_dim), jnp.float32)
    acc = fn(params, toks, acc)
    np.asarray(acc)                              # compile + sync
    t0 = time.perf_counter()
    for _ in range(iters):
        acc = fn(params, toks, acc)
    np.asarray(acc)                              # host fetch = full sync
    dt = time.perf_counter() - t0
    seqs_per_sec = batch * iters / dt
    emit("esm2_650M_encode_seqs_per_sec_per_chip" if on_tpu
         else "esm2_8M_encode_seqs_per_sec_cpu_smoke",
         seqs_per_sec, "seqs/sec", on_tpu)
    if on_tpu:
        # MFU next to seqs/s (round-3 verdict weak #7): matmul FLOPs of one
        # encoder forward vs the v5e bf16 peak (197 TFLOP/s). Per layer:
        # QKVO 4 matmuls (S,d)x(d,d) = 8*S*d^2, FFN up+down = 16*S*d^2,
        # attention scores+apply = 4*S^2*d (d = embed_dim across heads).
        d, L, S = cfg.embed_dim, cfg.num_layers, seq_len
        flops_per_seq = L * (24 * S * d * d + 4 * S * S * d)
        mfu = seqs_per_sec * flops_per_seq / 197e12
        emit("esm2_650M_encode_mfu", mfu,
             "fraction of v5e bf16 peak (197 TFLOP/s), matmul FLOPs only",
             False)   # informational: outside the geomean


# ---------------------------------------------------------------------------
# 2. Llama3-8B int8 decode (batch 8 and 32)
# ---------------------------------------------------------------------------

def _synth_int8_decoder(cfg, stacked: bool = False):
    """Random int8 decoder params, synthesized host-side in the quantized
    layout and transferred one leaf at a time. stacked=True builds the
    stacked-scan layout DIRECTLY (per-layer staging + on-device stacking
    OOMs an 8B load even though the train step itself fits — see
    convert.host_arrays / BENCH_NOTES round 2); stacked=False builds the
    per-layer layout, which decodes 12-19% faster at 8B (stacked-scan
    weight streaming costs real decode throughput at this scale).
    Values are irrelevant to the bandwidth-bound measurements; scales
    keep dequantized weights at trained-network magnitude."""
    rng = np.random.default_rng(0)
    h, d, L = cfg.hidden_size, cfg.head_dim, cfg.num_layers
    qd, kvd = cfg.num_heads * d, cfg.num_kv_heads * d
    s_val = 0.02 / 74.0   # int8 uniform std ~74 -> weight std ~0.02

    def lin_q(k, n, in_stack=True):
        shape = (L, k, n) if stacked and in_stack else (k, n)
        sshape = (L, n) if stacked and in_stack else (n,)
        w = jnp.asarray(rng.integers(-127, 128, shape, dtype=np.int8))
        jax.block_until_ready(w)   # one leaf in flight at a time
        return {"kernel_q": w, "scale": jnp.full(sshape, s_val, jnp.float32)}

    def norm(in_stack=True):
        shape = (L, h) if stacked and in_stack else (h,)
        return {"scale": jnp.ones(shape, jnp.bfloat16)}

    emb = (rng.standard_normal((cfg.vocab_size, h), np.float32) * 0.02)
    params = {
        "embed_tokens": {"embedding": jnp.asarray(emb, jnp.bfloat16)},
        "final_norm": norm(in_stack=False),
        "lm_head": lin_q(h, cfg.vocab_size, in_stack=False),
    }

    def layer():
        return {"attn_norm": norm(), "ffn_norm": norm(),
                "q_proj": lin_q(h, qd), "k_proj": lin_q(h, kvd),
                "v_proj": lin_q(h, kvd), "o_proj": lin_q(qd, h),
                "gate_proj": lin_q(h, cfg.intermediate_size),
                "up_proj": lin_q(h, cfg.intermediate_size),
                "down_proj": lin_q(cfg.intermediate_size, h)}

    if stacked:
        params["layers_stacked"] = layer()
    else:
        params["layers"] = [layer() for _ in range(L)]
    return params


def _synth_int4_decoder(cfg):
    """Random int4-packed decoder params (per-layer layout, v2 magic-bitcast
    int32 words — every 8B in-dim is a 512-multiple so quantize_linear4
    picks v2; BENCH_NOTES round 4 measured v2 1.15-1.22x over the v1 byte
    layout e2e). Random words ARE valid packs (any nibble is a biased int4),
    so the 3.6 GB synth never materializes an unpacked tree; scales keep
    dequantized weights at trained magnitude."""
    rng = np.random.default_rng(0)
    h, d, L = cfg.hidden_size, cfg.head_dim, cfg.num_layers
    qd, kvd = cfg.num_heads * d, cfg.num_kv_heads * d
    s_val = 0.02 / 4.6   # biased-nibble uniform std ~4.6 -> weight std ~0.02

    def lin_p(k, n):
        w = jnp.asarray(rng.integers(-2**31, 2**31, (k // 8, n),
                                     dtype=np.int64).astype(np.int32))
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
    return params


def bench_decode(on_tpu: bool) -> None:
    from opus_pllm_tpu.core.config import DecoderConfig
    from opus_pllm_tpu.infer import engine
    from opus_pllm_tpu.kernels.quant import quantize_decoder
    from opus_pllm_tpu.models import decoder

    if on_tpu:
        cfg = DecoderConfig.llama3_8b()
        # (synth, runs) phases: int8 then int4, freeing the 8.6 GB int8
        # tree before the 4.1 GB int4 one lands. Projections stay unfused:
        # fuse_projections measured -9% at b8 / +1% at b32 on int4
        # (BENCH_NOTES.md round 3).
        phases = [
            (lambda: _synth_int8_decoder(cfg),   # per-layer: fastest decode
             [("llama3_8b_int8_decode_tok_per_sec_b8", 8, 128, False),
              ("llama3_8b_int8_decode_tok_per_sec_b32", 32, 128, True)]),
            (lambda: _synth_int4_decoder(cfg),
             [("llama3_8b_int4_decode_tok_per_sec_b8", 8, 128, False),
              ("llama3_8b_int4_decode_tok_per_sec_b32", 32, 128, True),
              # composed recipe: int4 weights + int4 KV via the fused
              # nibble-unpack decode attention (kernels/decode_attention.
              # decode_attention_int4) — the b32 row above runs int8 KV
              # (round-4 verdict weak #2: the composed config was never
              # benched). No round-1 baseline: informational vs 1.0.
              ("llama3_8b_int4w_int4kv_decode_b32", 32, 128, "int4")]),
        ]
    else:
        cfg = DecoderConfig(family="llama", vocab_size=1024, hidden_size=256,
                            intermediate_size=512, num_layers=4, num_heads=8,
                            num_kv_heads=4, head_dim=32, dtype="float32")
        phases = [
            (lambda: quantize_decoder(decoder.init(jax.random.PRNGKey(0),
                                                   cfg)),
             [("llama_tiny_int8_decode_tok_per_sec_cpu_smoke", 2, 16,
               False)])]

    prompt_len = 64
    for synth, runs in phases:
        params = synth()
        for metric, b, new_toks, quant_cache in runs:
            rng = np.random.default_rng(1)
            emb = jnp.asarray(rng.standard_normal(
                (b, prompt_len, cfg.hidden_size)) * 0.02, cfg.jnp_dtype)
            mask = jnp.ones((b, prompt_len), bool)
            pos = jnp.broadcast_to(jnp.arange(prompt_len), (b, prompt_len))
            key = jax.random.PRNGKey(0)
            kw = dict(max_new_tokens=new_toks, temperature=0.0,
                      eos_token_id=-1, pad_token_id=0,
                      quantize_cache=quant_cache)
            out = engine.generate(params, cfg, emb, mask, pos, key, **kw)
            np.asarray(out.tokens)                   # compile + sync
            t0 = time.perf_counter()
            out = engine.generate(params, cfg, emb, mask, pos, key, **kw)
            np.asarray(out.tokens)
            dt = time.perf_counter() - t0
            emit(metric, b * new_toks / dt, "tokens/sec", on_tpu)
        del params   # free before the next phase's synth


# ---------------------------------------------------------------------------
# 3. Stage-(c)+(d) train step (switch + LoRA, remat)
# ---------------------------------------------------------------------------

def bench_train(on_tpu: bool) -> None:
    from opus_pllm_tpu.core.config import (CSTPConfig, DecoderConfig,
                                           ESM2Config, IGNORE_INDEX,
                                           LoRAConfig, OpusConfig,
                                           SEQ_TOKEN_INDEX,
                                           SwitchProjectorConfig, TrainConfig)
    from opus_pllm_tpu.models import opus
    from opus_pllm_tpu.train import multimodal_trainer as mmt

    if on_tpu:
        llm = DecoderConfig(family="llama", vocab_size=32000,
                            hidden_size=2048, intermediate_size=5632,
                            num_layers=22, num_heads=16, num_kv_heads=4,
                            head_dim=128, dtype="bfloat16")   # ~1.1B, d=128
                            # head_dim 128: flash kernel dispatches (d%128)
        esm = ESM2Config.t12_35M()
        esm = type(esm)(**{**esm.__dict__, "dtype": "bfloat16"})
        batch, seq, l_aa, steps, rank = 8, 512, 256, 5, 16
    else:
        llm = DecoderConfig(family="llama", vocab_size=512, hidden_size=128,
                            intermediate_size=256, num_layers=2, num_heads=4,
                            num_kv_heads=2, head_dim=32, dtype="float32")
        esm = ESM2Config.tiny()
        batch, seq, l_aa, steps, rank = 2, 64, 32, 2, 4

    cfg = OpusConfig(
        esm=esm,
        cstp=CSTPConfig(protein_dim=esm.embed_dim, text_dim=llm.hidden_size,
                        proj_dim=llm.hidden_size),
        switch=SwitchProjectorConfig(input_dim=llm.hidden_size,
                                     llm_hidden_size=llm.hidden_size,
                                     n_tokens=8),
        llm=llm, max_prompt_len=seq)
    lcfg = LoRAConfig(rank=rank)
    params = opus.init(jax.random.PRNGKey(0), cfg)
    state, tx = mmt.create_state(jax.random.PRNGKey(1), cfg,
                                 TrainConfig(learning_rate=1e-4), params,
                                 train_switch=True, lora_cfg=lcfg)
    # remat off (CLI --remat none): the 1.1B step trains only
    # switch+LoRA, so the backward skips every frozen-weight grad and
    # the activations fit 16 GB — full per-layer remat paid a whole
    # extra forward for memory this step doesn't need. Measured 18,688
    # vs 13,955 tok/s, loss-identical (scripts/exp_train_remat.py,
    # BENCH_NOTES round 5); "full" remains the default and the 8B path.
    step = mmt.make_train_step(cfg, tx, lora_cfg=lcfg,
                               remat=False if on_tpu else True)

    rng = np.random.default_rng(2)
    ids = rng.integers(4, llm.vocab_size, (batch, seq)).astype(np.int32)
    ids[:, 1] = SEQ_TOKEN_INDEX
    labels = ids.copy()
    labels[:, :16] = IGNORE_INDEX
    esm_toks = rng.integers(4, 24, (batch, 1, l_aa)).astype(np.int32)
    esm_toks[:, :, 0], esm_toks[:, :, -1] = 0, 2
    batch_d = {"input_ids": jnp.asarray(ids),
               "attn_mask": jnp.ones((batch, seq), bool),
               "labels": jnp.asarray(labels),
               "esm_tokens": jnp.asarray(esm_toks)}

    state, m = step(state, params, batch_d)      # compile
    float(m["loss"])      # host fetch = full sync (block_until_ready lies
                          # through the remote relay, BENCH_NOTES.md)

    # Two-point measurement: time an N-step chain and a 3N-step chain and
    # take (t_3N - t_N) / 2N. The per-run constant (dispatch ramp, tunnel
    # round trip, final host fetch) cancels, so the number tracks device
    # step time instead of tunnel phase — wall-clock through the relay
    # swings 0.83-1.05x on identical binaries (BENCH_NOTES.md round 2 /
    # round-2 verdict weak #1).
    def run_chain(n):
        nonlocal state
        t0 = time.perf_counter()
        for _ in range(n):
            state, mm = step(state, params, batch_d)
        loss = float(mm["loss"])     # forces the chain
        assert np.isfinite(loss)
        return time.perf_counter() - t0

    t_a = run_chain(steps)
    t_b = run_chain(3 * steps)
    step_time = max((t_b - t_a) / (2 * steps), 1e-9)
    emit("stage_cd_train_1b_tok_per_sec_per_chip" if on_tpu
         else "stage_cd_train_tok_per_sec_cpu_smoke",
         batch * seq / step_time, "tokens/sec", on_tpu)


def bench_train_8b(on_tpu: bool) -> None:
    """Single-chip 8B int8-base LoRA train step (the round-1 blocker):
    index-mode stacked scan + sequence-chunked CE + remat. Runs LAST —
    the 8 GB stacked synth (~5 min) plus a ~13-min first step through the
    tunnel (per-process runtime warmup; XLA compile itself is seconds)
    must not cost the other metrics under a driver timeout."""
    if not on_tpu:
        return   # CPU smoke of this path: tests/test_train.py chunked-CE
    import functools

    import optax

    from opus_pllm_tpu.core.config import LoRAConfig, TrainConfig
    from opus_pllm_tpu.lora import lora as lora_mod
    from opus_pllm_tpu.models import decoder, opus
    from opus_pllm_tpu.models.layers import causal_mask
    from opus_pllm_tpu.train.optim import adamw

    from opus_pllm_tpu.core.config import DecoderConfig

    cfg = DecoderConfig.llama3_8b()
    params = _synth_int8_decoder(cfg, stacked=True)
    jax.block_until_ready(jax.tree.leaves(params)[0])
    B, S = 4, 512
    lora = decoder.stack_params(
        lora_mod.init(jax.random.PRNGKey(0), cfg, LoRAConfig(rank=16)))
    tx = adamw(TrainConfig(learning_rate=1e-4), None)
    opt = tx.init(lora)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(4, 32000, (B, S)).astype(np.int32))

    def loss_fn(lora, params, ids):
        emb = decoder.embed_tokens(params, ids).astype(jnp.bfloat16)
        mask = jnp.ones((B, S), bool)
        pos = jnp.broadcast_to(jnp.arange(S), (B, S))
        hid, _ = decoder.forward(params, cfg, emb, pos, causal_mask(mask),
                                 lora=lora, lora_scale=2.0, remat=True,
                                 scan_mode="index", return_hidden=True)
        return opus.next_token_loss_hidden(params, cfg, hid, ids, mask,
                                           chunk=64)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(lora, opt, params, ids):
        loss, g = jax.value_and_grad(loss_fn)(lora, params, ids)
        upd, opt = tx.update(g, opt, lora)
        return optax.apply_updates(lora, upd), opt, loss

    lora, opt, loss = step(lora, opt, params, ids)
    l0 = float(loss)                              # warmup + sync
    # finiteness is the only invariant here; loss monotonicity over a few
    # steps is not guaranteed and a spurious failure would drop a real
    # throughput number from the geomean
    assert np.isfinite(l0)

    def run_chain(n):
        nonlocal lora, opt
        t0 = time.perf_counter()
        for _ in range(n):
            lora, opt, loss = step(lora, opt, params, ids)
        lN = float(loss)                          # forces the chain
        assert np.isfinite(lN)
        return time.perf_counter() - t0

    # two-point: per-run constants (tunnel round trip, fetch) cancel
    steps = 3
    t_a = run_chain(steps)
    t_b = run_chain(3 * steps)
    step_time = max((t_b - t_a) / (2 * steps), 1e-9)
    emit("llama3_8b_int8_lora_train_tok_per_sec_per_chip",
         B * S / step_time, "tokens/sec", on_tpu)


# ---------------------------------------------------------------------------
# 4. Continuous-batching serving vs static-batch generate (round-2 verdict
#    weak #2: the serving throughput claim was a projection — measure it)
# ---------------------------------------------------------------------------

def bench_serve(on_tpu: bool) -> None:
    from opus_pllm_tpu.core.config import DecoderConfig
    from opus_pllm_tpu.infer import engine as gen_engine
    from opus_pllm_tpu.models import decoder as dec
    from opus_pllm_tpu.serve.engine import ServeRequest, ServingEngine

    if on_tpu:
        cfg = DecoderConfig(family="llama", vocab_size=32000,
                            hidden_size=2048, intermediate_size=5632,
                            num_layers=22, num_heads=16, num_kv_heads=4,
                            head_dim=128, dtype="bfloat16")   # ~1.1B
        n_req, p, new, slots, spt = 32, 64, 128, 8, 32
    else:
        cfg = DecoderConfig(family="llama", vocab_size=256, hidden_size=64,
                            intermediate_size=128, num_layers=2, num_heads=4,
                            num_kv_heads=2, head_dim=16, dtype="float32")
        n_req, p, new, slots, spt = 4, 8, 8, 2, 4
    params = dec.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)

    # static-batch baseline on the SAME params/shapes: full batch of
    # `slots`, every row generating `new` tokens
    emb = jnp.asarray(rng.standard_normal((slots, p, cfg.hidden_size)) * 0.3,
                      cfg.jnp_dtype)
    mask = jnp.ones((slots, p), bool)
    pos = jnp.broadcast_to(jnp.arange(p), (slots, p))
    kw = dict(max_new_tokens=new, temperature=0.0, eos_token_id=-1,
              pad_token_id=0)
    out = gen_engine.generate(params, cfg, emb, mask, pos,
                              jax.random.PRNGKey(1), **kw)
    np.asarray(out.tokens)                       # compile + sync
    t0 = time.perf_counter()
    out = gen_engine.generate(params, cfg, emb, mask, pos,
                              jax.random.PRNGKey(1), **kw)
    np.asarray(out.tokens)
    static_tps = slots * new / (time.perf_counter() - t0)

    eng = ServingEngine(params, cfg, max_slots=slots,
                        max_len=((p + new + 127) // 128) * 128,
                        prefill_buckets=(p,), steps_per_tick=spt,
                        admit_min_free=slots // 2 or 1)
    eng.warmup()                                 # all shapes compile here
    reqs = [ServeRequest(i, embeds=(rng.standard_normal(
        (p, cfg.hidden_size)) * 0.3).astype(np.float32),
        max_new_tokens=new, eos_token_id=-1) for i in range(n_req)]
    t0 = time.perf_counter()
    done = eng.run(reqs)
    dt = time.perf_counter() - t0
    total = sum(len(c.tokens) for c in done.values())
    assert len(done) == n_req
    serving_tps = total / dt
    emit("serving_1b_tok_per_sec" if on_tpu
         else "serving_tiny_tok_per_sec_cpu_smoke",
         serving_tps, "tokens/sec", on_tpu)
    emit("serving_vs_static_generate", serving_tps / static_tps,
         "ratio (same params/shapes; continuous batching amortizes "
         "admissions)", False)   # ratio: informational, outside geomean
    # engine-side latency (the /metrics histograms): informational —
    # through a remote tunnel these carry the dispatch R/T, colocated
    # they are the real serving numbers
    lat = eng.latency
    if lat["ttft"].count:
        emit("serving_ttft_mean_ms", lat["ttft"].mean * 1e3,
             "ms (engine-side submit->first token; includes queue wait "
             "from oversubscription: n_req >> slots)", False)
        emit("serving_service_ttft_mean_ms",
             lat["service_ttft"].mean * 1e3,
             "ms (slot claim->first token: admission overhead the engine "
             "itself adds, queue-depth independent)", False)
        emit("serving_duration_mean_ms", lat["duration"].mean * 1e3,
             "ms (engine-side submit->completion)", False)

    if not on_tpu:
        return

    # --- speculative serving at the reference's DEFAULT sampled decode
    # (run_opus_ddp.py:156-158: do_sample, T=0.1, top_p=0.7) — rejection-
    # verified speculative sampling (round-4 verdict missing #1/#3).
    # Bracketed honestly without shipping weights: ceiling = identity
    # upper layers (draft == target, acceptance ~1), floor = random
    # weights (~0 acceptance, pure machinery overhead); trained layer-skip
    # drafts land in between (60-80% acceptance in the LayerSkip
    # literature). All three engines share compiled steps via the
    # persistent cache, so only the first warmup pays compiles.
    n_draft_layers = 5                     # ~N/L = 0.23 layer-skip cut

    def ident_upper(ps, n):
        return dict(ps, layers=list(ps["layers"][:n]) + [
            {**lyr,
             "o_proj": {"kernel": jnp.zeros_like(lyr["o_proj"]["kernel"])},
             "down_proj": {"kernel":
                           jnp.zeros_like(lyr["down_proj"]["kernel"])}}
            for lyr in ps["layers"][n:]])

    def run_sampled(ps, draft_layers):
        eng = ServingEngine(
            ps, cfg, max_slots=slots,
            max_len=((p + new + 127) // 128) * 128,
            prefill_buckets=(p,),
            # spec tick sizing is a trade: ticks must stay device-bound
            # over the ~24 ms tunnel RTT (an iteration ~1.68 weight
            # passes ≈ 5 ms device, so >= 8 iterations), but the depth-1
            # pipeline always has one tick in flight when the batch
            # finishes — at spt=32 that wasted tick is ~145 ms (a third
            # of the ceiling run) and the measured ceiling fell BELOW
            # plain; 8 iterations × up to spec_k=4 tokens ≈ one plain
            # tick of progress per tick at high acceptance
            steps_per_tick=(spt if draft_layers is None
                            else max(spt // 4, 8)),
            admit_min_free=slots, draft_layers=draft_layers, spec_k=4,
            spec_adaptive=False)
        eng.warmup(group_sizes=[slots])
        reqs = [ServeRequest(i, embeds=(rng.standard_normal(
            (p, cfg.hidden_size)) * 0.3).astype(np.float32),
            max_new_tokens=new, temperature=0.1, top_p=0.7,
            eos_token_id=-1) for i in range(slots)]
        t0 = time.perf_counter()
        done = eng.run(reqs)
        dt = time.perf_counter() - t0
        total = sum(len(c.tokens) for c in done.values())
        assert len(done) == slots and total == slots * new
        return total / dt

    base_s = run_sampled(params, None)
    floor = run_sampled(params, n_draft_layers)
    ceil = run_sampled(ident_upper(params, n_draft_layers), n_draft_layers)
    emit("serving_spec_sampled_plain_tok_per_sec", base_s,
         "tokens/sec (plain serving, T=0.1/top_p=0.7 — the reference's "
         "default decode)", False)
    emit("serving_spec_sampled_floor_tok_per_sec", floor,
         "tokens/sec (speculative sampling, random weights ~0 acceptance: "
         "machinery-overhead floor)", False)
    emit("serving_spec_sampled_ceiling_tok_per_sec", ceil,
         "tokens/sec (speculative sampling, identity upper layers ~1.0 "
         "acceptance: ceiling; trained drafts land between floor and "
         "ceiling)", False)


def _backend_responsive(timeout_s: int = 420) -> bool:
    """Probe the accelerator backend in a SUBPROCESS with a hard timeout.

    A wedged TPU tunnel hangs inside backend init (no error — observed
    2026-08-17: a killed client left the pool refusing new claims for
    hours), and a hang here would leave the driver with NO bench output
    at all. The subprocess is killable where the in-process C call is
    not; on timeout we fall back to the CPU smoke lane so the JSON-line
    contract still holds."""
    import subprocess
    import sys
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


_SUMMARY_DONE = False


def _emit_summary(note: str = "") -> None:
    """Print the geomean summary line exactly once. Called from normal
    end-of-run AND from the SIGTERM handler so a driver `timeout` can
    never eat the summary (round-3 verdict weak #1: BENCH_r03 rc=124
    truncated before the geomean + regression-naming line ever printed)."""
    global _SUMMARY_DONE
    if _SUMMARY_DONE:
        return
    _SUMMARY_DONE = True
    ok = [v for _, v in _RESULTS if v > 0]
    failed = any(v == 0.0 for _, v in _RESULTS)
    # fail LOUDLY on silent degradation: any baselined metric below 0.9x
    # is named in the summary instead of hiding inside the geomean
    # (round-2 verdict weak #5)
    regressions = sorted(m for m, v in _RESULTS if 0 < v < 0.9)
    # no baselined metrics (CPU smoke) and no failures -> neutral 1.0
    geo = (math.exp(sum(math.log(r) for r in ok) / len(ok)) if ok
           else (0.0 if failed else 1.0))
    unit = f"geomean of vs_baseline over {len(ok)}/{len(_RESULTS)} metrics"
    if regressions:
        unit += f"; REGRESSED <0.9x: {','.join(regressions)}"
    if note:
        unit += f"; {note}"
    print(json.dumps({
        "metric": "north_star_geomean_vs_baseline",
        "value": round(geo, 4),
        "unit": unit,
        "vs_baseline": round(geo, 4)}), flush=True)


def _on_term(signum, frame):  # noqa: ARG001
    # `timeout` sends SIGTERM; emit what we have and exit 0 so the round
    # artifact records an honest partial capture instead of rc=124 with
    # the summary missing. The note names the truncation explicitly.
    _emit_summary(note=f"TRUNCATED by signal {signum} mid-section")
    os._exit(0)


def main() -> None:
    from opus_pllm_tpu.core.util import enable_persistent_compilation_cache

    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--sections", default=None,
                    help="comma-separated subset to run (encode,decode,"
                    "train,train_8b,serve); default all — the driver runs "
                    "everything, a session run can target one section")
    cli = ap.parse_args()
    only = set(cli.sections.split(",")) if cli.sections else None

    signal.signal(signal.SIGTERM, _on_term)
    signal.signal(signal.SIGINT, _on_term)
    enable_persistent_compilation_cache()
    t_start = time.perf_counter()
    if not _backend_responsive():
        print(json.dumps({
            "metric": "backend_unresponsive_falling_back_to_cpu",
            "value": 0, "unit": "accelerator backend init hung >420s "
            "(wedged tunnel?); CPU smoke lane follows",
            "vs_baseline": 1.0}), flush=True)
        jax.config.update("jax_platforms", "cpu")
    on_tpu = jax.default_backend() == "tpu"
    # Order: cheapest-first, and train_8b BEFORE serve — round 3's driver
    # timeout landed inside train_8b-after-serve and cost the lora-train
    # metric; the serving ratio is the more re-derivable number.
    for name, fn in (("encode", bench_encode), ("decode", bench_decode),
                     ("train", bench_train), ("train_8b", bench_train_8b),
                     ("serve", bench_serve)):
        if only is not None and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            fn(on_tpu)
        except Exception as e:  # noqa: BLE001 — report, keep benching
            print(json.dumps({"metric": f"{name}_FAILED", "value": 0,
                              "unit": f"{type(e).__name__}: {e}"[:200],
                              "vs_baseline": 0.0}), flush=True)
            _RESULTS.append((f"{name}_FAILED", 0.0))
        print(f"[bench] section {name}: {time.perf_counter() - t0:.1f}s "
              f"(elapsed {time.perf_counter() - t_start:.1f}s)",
              file=sys.stderr, flush=True)
    _emit_summary()


if __name__ == "__main__":
    main()

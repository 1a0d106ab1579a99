"""On-chip validation suite: run the TPU-only paths against their XLA
references on real hardware (the CPU test suite cannot reach them).

    python scripts/validate_tpu.py [--fast]

Checks: flash attention fwd (d=64 pad + d=128, padding + causal), grads
through the custom VJP, int8 Pallas matmul, stacked-scan generate vs
unrolled, and a converging stage-(c)+(d) train step. Prints PASS/FAIL per
check and exits nonzero on any failure.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from opus_pllm_tpu.core.util import enable_persistent_compilation_cache

enable_persistent_compilation_cache()

FAILURES = []
RESULTS = []


def check(name: str, fn) -> None:
    t0 = time.perf_counter()
    try:
        fn()
        dt = time.perf_counter() - t0
        RESULTS.append({"check": name, "ok": True, "seconds": round(dt, 1)})
        print(f"PASS {name} ({dt:.1f}s)")
    except Exception as e:  # noqa: BLE001 — report-and-continue harness
        FAILURES.append(name)
        RESULTS.append({"check": name, "ok": False,
                        "error": f"{type(e).__name__}: {e}"[:300]})
        print(f"FAIL {name}: {type(e).__name__}: {e}")


def flash_forward(d: int, causal: bool):
    from opus_pllm_tpu.kernels.flash_attention import flash_attention
    from opus_pllm_tpu.models.layers import attention_xla, padding_mask

    rng = np.random.default_rng(0)
    b, s, h = 2, 256, 4
    q, k, v = (jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.bfloat16)
               for _ in range(3))
    if causal:
        rows = jnp.arange(s)[None, None, :, None]
        cols = jnp.arange(s)[None, None, None, :]
        m4 = jnp.broadcast_to(cols <= rows, (b, 1, s, s))
        o = flash_attention(q, k, v, None, causal=True)
    else:
        m4 = padding_mask(jnp.ones((b, s), bool))
        o = flash_attention(q, k, v, m4)
    ox = attention_xla(q, k, v, m4)
    err = np.abs(np.asarray(o, np.float32) - np.asarray(ox, np.float32)).max()
    assert err < 0.05, f"max|diff|={err}"


def flash_grads(d: int = 128):
    """Pallas bwd kernels (dq/dk/dv) vs XLA reference: GQA, padding mask,
    and a fully-padded row (must get exactly zero gradient)."""
    from opus_pllm_tpu.kernels.flash_attention import flash_attention
    from opus_pllm_tpu.models.layers import attention_xla, padding_mask

    rng = np.random.default_rng(0)
    b, s = 2, 256
    hq, hkv = (8, 4) if d == 128 else (4, 4)
    q = jnp.asarray(rng.normal(size=(b, s, hq, d)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(b, s, hkv, d)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(b, s, hkv, d)), jnp.bfloat16)
    am = np.ones((b, s), bool)
    am[1, :] = False
    am[0, -17:] = False
    m = padding_mask(jnp.asarray(am))

    def gr(fn):
        return jax.grad(lambda q, k, v: jnp.sum(
            fn(q, k, v).astype(jnp.float32) ** 2), argnums=(0, 1, 2))(q, k, v)

    gf = gr(lambda q, k, v: flash_attention(q, k, v, m))
    gx = gr(lambda q, k, v: attention_xla(q, k, v, m))
    for name, a, bb in zip(("dq", "dk", "dv"), gf, gx):
        a32, b32 = np.asarray(a, np.float32), np.asarray(bb, np.float32)
        rel = np.abs(a32[0] - b32[0]).max() / (np.abs(b32[0]).max() + 1e-9)
        assert rel < 0.02, (name, rel)
        assert np.abs(a32[1]).max() == 0.0, (name, "padded row nonzero")


def int8_kernel():
    from opus_pllm_tpu.kernels import quant

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(256, 1024)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(1024, 2048)), jnp.float32)
    qv, sc = quant.quantize_per_channel(w)
    y_p = np.asarray(quant.int8_matmul(x, qv, sc, impl="pallas"), np.float32)
    y_x = np.asarray(quant.int8_matmul(x, qv, sc, impl="xla"), np.float32)
    rel = (np.abs(y_p - y_x) / (np.abs(y_x) + 1)).mean()
    assert rel < 0.01, f"rel={rel}"


def int4_kernel():
    """Grouped int4 Pallas matmuls (v1 byte layout AND the v2 magic-bitcast
    int32 layout) vs the XLA unpack reference, decode- and prefill-shaped,
    plus the LoRA-over-frozen-int4 backward."""
    from opus_pllm_tpu.kernels import quant4

    rng = np.random.default_rng(2)
    for (m, k, n) in ((32, 4096, 14336), (256, 1024, 2048)):
        w = rng.normal(size=(k, n)).astype(np.float32) * 0.02
        q, s = quant4.quantize_grouped(w)
        sj = jnp.asarray(s)
        for tag, pack in (("v1", quant4.pack_int4),
                          ("v2", quant4.pack_int4_v2)):
            pk = jnp.asarray(pack(q))
            x = jnp.asarray(rng.normal(size=(m, k)), jnp.bfloat16)
            y = np.asarray(quant4.int4_matmul(x, pk, sj, impl="pallas"),
                           np.float32)
            ref = np.asarray(quant4._matmul_xla(x, pk, sj), np.float32)
            rel = np.abs(y - ref).max() / np.abs(ref).max()
            assert rel < 0.02, (tag, m, k, n, rel)
    # dx through the custom VJP matches the dequantized dense gradient
    x = jnp.asarray(rng.normal(size=(8, 1024)), jnp.bfloat16)
    w = rng.normal(size=(1024, 512)).astype(np.float32) * 0.02
    q, s = quant4.quantize_grouped(w)
    pk, sj = jnp.asarray(quant4.pack_int4(q)), jnp.asarray(s)
    g = jax.grad(lambda x: jnp.sum(
        quant4.int4_matmul(x, pk, sj).astype(jnp.float32) ** 2))(x)
    wd = (q.astype(np.float32).reshape(-1, 128, 512)
          * s[:, None, :]).reshape(1024, 512)
    y = np.asarray(x, np.float32) @ wd
    g_ref = 2.0 * y @ wd.T
    rel = np.abs(np.asarray(g, np.float32) - g_ref).max() / \
        (np.abs(g_ref).max() + 1e-9)
    assert rel < 0.05, rel


def stacked_generate():
    from opus_pllm_tpu.core.config import DecoderConfig
    from opus_pllm_tpu.infer import engine
    from opus_pllm_tpu.models import decoder

    cfg = DecoderConfig(family="llama", vocab_size=2048, hidden_size=512,
                        intermediate_size=1024, num_layers=4, num_heads=4,
                        num_kv_heads=2, head_dim=128, dtype="bfloat16")
    base = decoder.init(jax.random.PRNGKey(0), cfg)
    emb = jax.random.normal(jax.random.PRNGKey(1), (2, 16, cfg.hidden_size),
                            cfg.jnp_dtype) * 0.02
    mask = jnp.ones((2, 16), bool)
    pos = jnp.broadcast_to(jnp.arange(16), (2, 16))

    from opus_pllm_tpu.models.layers import causal_mask

    # compare prefill logits with tolerance: greedy token SEQUENCES diverge
    # permanently after one bf16 fusion-order flip, so they are not a
    # meaningful equivalence check on random weights
    m4 = causal_mask(mask)
    lg1, _ = jax.jit(lambda p: decoder.forward(p, cfg, emb, pos, m4))(base)
    stacked = decoder.stack_params(base)
    lg2, _ = jax.jit(lambda p: decoder.forward(p, cfg, emb, pos, m4))(stacked)
    p1 = jax.nn.softmax(np.asarray(lg1, np.float32), axis=-1)
    p2 = jax.nn.softmax(np.asarray(lg2, np.float32), axis=-1)
    err = np.abs(p1 - p2).max()
    assert err < 0.05, f"prob diff {err}"

    # and the stacked generate runs end to end
    out = engine.generate(stacked, cfg, emb, mask, pos, jax.random.PRNGKey(0),
                          max_new_tokens=8, temperature=0.0, eos_token_id=-1)
    assert np.asarray(out.tokens).shape == (2, 8)


def train_step_converges():
    import __graft_entry__ as g
    from opus_pllm_tpu.core.config import LoRAConfig, TrainConfig
    from opus_pllm_tpu.models import opus
    from opus_pllm_tpu.train import multimodal_trainer as mmt

    cfg = g._smoke_cfg()
    params = opus.init(jax.random.PRNGKey(0), cfg)
    state, tx = mmt.create_state(jax.random.PRNGKey(1), cfg,
                                 TrainConfig(learning_rate=1e-3), params,
                                 train_switch=True, lora_cfg=LoRAConfig(rank=4))
    step = mmt.make_train_step(cfg, tx, lora_cfg=LoRAConfig(rank=4))
    batch = g._example_batch(cfg, batch=4)
    losses = []
    for _ in range(4):
        state, m = step(state, params, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses


def fused_encoder_block():
    """Pair-packed fused LN+QKV+rope+flash vs the XLA composition, bf16."""
    import numpy as np

    from opus_pllm_tpu.core.config import ESM2Config
    from opus_pllm_tpu.models import esm2

    cfg = ESM2Config.t33_650M()
    cfg = type(cfg)(**{**cfg.__dict__, "num_layers": 4, "dtype": "bfloat16"})
    params = esm2.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    toks = rng.integers(4, 24, (4, 512)).astype(np.int32)
    toks[:, 0], toks[:, -1] = 0, 2
    toks[1, -99:] = 1
    toks = jnp.asarray(toks)
    ref = np.asarray(esm2.pooled_embedding(params, cfg, toks, impl="xla"),
                     np.float32)
    got = np.asarray(esm2.pooled_embedding(params, cfg, toks, impl="fused"),
                     np.float32)
    d = np.abs(got - ref)
    assert d.max() < 0.05 and d.mean() < 0.01, (d.max(), d.mean())


def fused_out_proj_parity():
    """fused_out_proj under the REAL Mosaic lowering (ADVICE r4: tests
    cover it only in interpret mode; its (8, E) bias block and 4-D
    a-block are their own lowering surface) vs the transpose+dense
    composition at the north-star encode shape."""
    import numpy as np

    from opus_pllm_tpu.kernels import fused_encoder as fe

    b, hp, s, e = 4, 10, 512, 1280
    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.standard_normal((b, hp, s, 128)) * 0.3, jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((e, e)) * 0.02, jnp.bfloat16)
    bias = jnp.asarray(rng.standard_normal((e,)) * 0.01, jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((b, s, e)) * 0.3, jnp.bfloat16)
    got = np.asarray(fe.fused_out_proj(a, w, bias, x), np.float32)
    unpacked = a.transpose(0, 2, 1, 3).reshape(b, s, e)
    ref = np.asarray(
        x + (unpacked.astype(jnp.float32) @ w.astype(jnp.float32)
             + bias.astype(jnp.float32)).astype(jnp.bfloat16), np.float32)
    d = np.abs(got - ref)
    assert d.max() < 0.25 and d.mean() < 0.01, (d.max(), d.mean())


def fused_decode_attention():
    """int8-KV decode attention kernel vs dequantize-then-attend, and the
    full engine decode (quantize_cache) vs the forced-XLA path."""
    import numpy as np

    from opus_pllm_tpu.core.config import DecoderConfig
    from opus_pllm_tpu.infer import engine
    from opus_pllm_tpu.kernels import decode_attention as da
    from opus_pllm_tpu.models import decoder

    rng = np.random.default_rng(0)
    b, cap, hq, hkv, d = 8, 512, 32, 8, 128
    q = jnp.asarray(rng.standard_normal((b, 1, hq, d)) * 0.3, jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, cap, hkv, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, cap, hkv, d)), jnp.float32)
    kq, vq = decoder._quantize_kv(k), decoder._quantize_kv(v)
    mask = np.zeros((b, cap), bool)
    for i in range(b):
        mask[i, :int(rng.integers(64, cap))] = True
    m4 = jnp.asarray(mask)[:, None, None, :]
    assert da.supports(q, kq, m4)
    out = np.asarray(da.decode_attention_int8(q, kq, vq, m4), np.float32)
    ref = np.asarray(da.decode_attention_int8_reference(q, kq, vq, m4),
                     np.float32)
    assert np.abs(out - ref).max() < 4e-2, np.abs(out - ref).max()

    cfg = DecoderConfig(family="llama", vocab_size=512, hidden_size=512,
                        intermediate_size=1024, num_layers=2, num_heads=4,
                        num_kv_heads=2, head_dim=128, dtype="bfloat16")
    params = decoder.init(jax.random.PRNGKey(1), cfg)
    emb = jnp.asarray(rng.standard_normal((2, 8, 512)) * 0.1, jnp.bfloat16)
    msk = jnp.ones((2, 8), bool)
    pos = jnp.broadcast_to(jnp.arange(8), (2, 8))

    # (1) the fused kernel must actually be DISPATCHED inside the jitted
    # engine (trace-time counter), and generations must be valid ids.
    # Exact token equality vs impl="xla" is flaky by construction: the two
    # paths also differ at PREFILL (flash vs XLA attention) and random tiny
    # weights put the top-2 logits within one bf16 ulp (measured gap 0.013
    # at |logit| 1.6), so the argmax chain forks on benign rounding.
    calls = []
    orig = da.decode_attention_int8
    da.decode_attention_int8 = lambda *a: (calls.append(1), orig(*a))[1]
    try:
        kw = dict(max_new_tokens=8, temperature=0.0, eos_token_id=-1,
                  pad_token_id=0, quantize_cache=True)
        t_fused = np.asarray(engine.generate(
            params, cfg, emb, msk, pos, jax.random.PRNGKey(2), **kw).tokens)
    finally:
        da.decode_attention_int8 = orig
    assert len(calls) == cfg.num_layers, len(calls)
    assert ((t_fused >= 0) & (t_fused < cfg.vocab_size)).all()

    # (2) teacher-forced per-step logit parity: step the decoder over the
    # SAME token stream through both decode-attention paths; only the
    # decode step differs, so tolerance checks the kernel alone.
    l, cap = 8, 256
    logits = {}
    for impl in ("auto", "xla"):
        cache = decoder.init_cache(cfg, 2, cap, dtype=cfg.jnp_dtype,
                                   stacked="layers_stacked" in params,
                                   quantize=True)
        cache["mask"] = cache["mask"].at[:, :l].set(msk)
        rows_i = jnp.arange(l)[None, None, :, None]
        cols_i = jnp.arange(cap)[None, None, None, :]
        pre4 = cache["mask"][:, None, None, :] & (cols_i <= rows_i)
        _, cache = decoder.forward(params, cfg, emb.astype(cfg.jnp_dtype),
                                   pos, pre4, cache, impl="xla",
                                   return_hidden=True)
        steps = []
        for t in range(4):
            nxt = jnp.asarray(t_fused[:, t])
            e = decoder.embed_tokens(params, nxt)[:, None].astype(cfg.jnp_dtype)
            p = jnp.full((2, 1), l + t, jnp.int32)
            cache["mask"] = cache["mask"].at[:, l + t].set(True)
            lg, cache = decoder.forward(params, cfg, e, p,
                                        cache["mask"][:, None, None, :],
                                        cache, impl=impl)
            steps.append(np.asarray(lg[:, 0], np.float32))
        logits[impl] = np.stack(steps)
    diff = np.abs(logits["auto"] - logits["xla"]).max()
    assert diff < 0.05, diff


def fused_decode_attention_int4():
    """Packed-int4 KV decode attention kernel vs unpack+dequantize+attend,
    plus engine dispatch with quantize_cache='int4'."""
    import numpy as np

    from opus_pllm_tpu.core.config import DecoderConfig
    from opus_pllm_tpu.infer import engine
    from opus_pllm_tpu.kernels import decode_attention as da
    from opus_pllm_tpu.models import decoder

    rng = np.random.default_rng(0)
    b, cap, hq, hkv, d = 8, 512, 32, 8, 128
    q = jnp.asarray(rng.standard_normal((b, 1, hq, d)) * 0.3, jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, cap, hkv, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, cap, hkv, d)), jnp.float32)
    kq, vq = decoder._quantize_kv4(k), decoder._quantize_kv4(v)
    mask = np.zeros((b, cap), bool)
    for i in range(b):
        mask[i, :int(rng.integers(64, cap))] = True
    m4 = jnp.asarray(mask)[:, None, None, :]
    assert da.supports_int4(q, kq, m4)
    out = np.asarray(da.decode_attention_int4(q, kq, vq, m4), np.float32)
    ref = np.asarray(da.decode_attention_int8_reference(q, kq, vq, m4),
                     np.float32)
    assert np.abs(out - ref).max() < 4e-2, np.abs(out - ref).max()

    # engine dispatch: the int4 kernel must run once per layer per step
    cfg = DecoderConfig(family="llama", vocab_size=512, hidden_size=512,
                        intermediate_size=1024, num_layers=2, num_heads=4,
                        num_kv_heads=2, head_dim=128, dtype="bfloat16")
    params = decoder.init(jax.random.PRNGKey(1), cfg)
    emb = jnp.asarray(rng.standard_normal((2, 8, 512)) * 0.1, jnp.bfloat16)
    msk = jnp.ones((2, 8), bool)
    pos = jnp.broadcast_to(jnp.arange(8), (2, 8))
    calls = []
    orig = da.decode_attention_int4
    da.decode_attention_int4 = lambda *a: (calls.append(1), orig(*a))[1]
    try:
        toks = np.asarray(engine.generate(
            params, cfg, emb, msk, pos, jax.random.PRNGKey(2),
            max_new_tokens=8, temperature=0.0, eos_token_id=-1,
            pad_token_id=0, quantize_cache="int4").tokens)
    finally:
        da.decode_attention_int4 = orig
    assert len(calls) == cfg.num_layers, len(calls)
    assert ((toks >= 0) & (toks < cfg.vocab_size)).all()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fast", action="store_true",
                    help="skip the train-step check")
    ap.add_argument("--json", default=None,
                    help="write machine-checkable results to this path")
    args = ap.parse_args()

    assert jax.default_backend() == "tpu", \
        f"not on TPU: {jax.default_backend()}"
    check("fused encoder block (pairs)", fused_encoder_block)
    check("fused out-proj parity (real lowering)", fused_out_proj_parity)
    check("fused int8-KV decode attention", fused_decode_attention)
    check("fused int4-KV decode attention", fused_decode_attention_int4)
    check("flash fwd d=128 padding", lambda: flash_forward(128, False))
    check("flash fwd d=64 (padded)", lambda: flash_forward(64, False))
    check("flash fwd causal", lambda: flash_forward(128, True))
    check("flash bwd kernels d=128", lambda: flash_grads(128))
    check("flash bwd kernels d=64", lambda: flash_grads(64))
    check("int8 pallas matmul", int8_kernel)
    check("int4 grouped matmul + vjp", int4_kernel)
    check("stacked-scan generate", stacked_generate)
    if not args.fast:
        check("stage c+d train step", train_step_converges)
    if args.json:
        import json as _json
        with open(args.json, "w") as f:
            _json.dump({"ok": not FAILURES, "device": str(jax.devices()[0]),
                        "checks": RESULTS}, f, indent=1)
            f.write("\n")      # POSIX text file (round-3 advisor item)
    if FAILURES:
        print(f"\n{len(FAILURES)} FAILED: {FAILURES}")
        sys.exit(1)
    print("\nall TPU validations passed")


if __name__ == "__main__":
    main()

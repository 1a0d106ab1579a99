"""Speculative continuous batching on the real chip: ceiling and floor.

The self-speculative serving tick (serve --draft-layers N) pays
N/L-layer drafts x (spec_k-1) plus a spec_k-token verify per iteration,
and wins by acceptance. Random weights give ~zero acceptance (the floor:
pure machinery overhead); zeroing the attention/MLP output projections
of every layer past the draft depth makes those layers residual no-ops,
the draft EQUALS the target, and acceptance is 1.0 (the ceiling). Real
checkpoints land in between — layer-skip drafts on trained LLMs
typically accept 60-80% at N/L ~ 1/4 (self-speculative decoding /
LayerSkip literature), so reporting both bounds brackets the recipe
honestly without shipping weights.

Small batch is the regime that matters: decode at slots<=4 is
weight-streaming bound, so emitting a+1 tokens per weight pass raises
the roofline; at slots 8+ with batch-bound decode the ceiling shrinks.
"""
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from opus_pllm_tpu.core.config import DecoderConfig
from opus_pllm_tpu.models import decoder
from opus_pllm_tpu.serve.engine import ServeRequest, ServingEngine

from opus_pllm_tpu.core.util import enable_persistent_compilation_cache
enable_persistent_compilation_cache()
print("backend:", jax.default_backend(), flush=True)

cfg = DecoderConfig(family="llama", vocab_size=32000, hidden_size=2048,
                    intermediate_size=5632, num_layers=22, num_heads=16,
                    num_kv_heads=4, head_dim=128, dtype="bfloat16")  # ~1.1B
params = decoder.init(jax.random.PRNGKey(0), cfg)
N_DRAFT_LAYERS = 5                    # ~N/L = 0.23, the usual layer-skip cut
P, NEW = 64, 128
rng = np.random.default_rng(0)


def identity_upper(params, n):
    """Zero o_proj/down_proj above layer n: those layers become residual
    no-ops, so the first-n draft equals the target (acceptance 1.0)."""
    out = dict(params)
    out["layers"] = list(params["layers"][:n]) + [
        {**lyr,
         "o_proj": {"kernel": jnp.zeros_like(lyr["o_proj"]["kernel"])},
         "down_proj": {"kernel": jnp.zeros_like(lyr["down_proj"]["kernel"])}}
        for lyr in params["layers"][n:]]
    return out


def run(params, slots, draft_layers, spec_k, spt, label, temp=0.0,
        top_p=1.0):
    eng = ServingEngine(params, cfg, max_slots=slots,
                        max_len=((P + NEW + 127) // 128) * 128,
                        prefill_buckets=(P,), steps_per_tick=spt,
                        admit_min_free=slots,
                        draft_layers=draft_layers, spec_k=spec_k,
                        spec_adaptive=False)   # measure the raw bounds
    eng.warmup()
    reqs = [ServeRequest(i, embeds=(rng.standard_normal(
        (P, cfg.hidden_size)) * 0.3).astype(np.float32),
        max_new_tokens=NEW, temperature=temp, top_p=top_p,
        eos_token_id=-1) for i in range(slots)]
    t0 = time.perf_counter()
    done = eng.run(reqs)
    dt = time.perf_counter() - t0
    total = sum(len(c.tokens) for c in done.values())
    assert len(done) == slots and total == slots * NEW
    # approximate: prefill emits 1 token/row, each tick runs spt
    # iterations, the last tick may be partly wasted on finished rows
    iters = eng._tick * spt
    acc = (total - slots) / max(slots * iters, 1) if draft_layers else 1.0
    print(f"{label}: {total / dt:.0f} tok/s ({dt * 1e3:.0f} ms), "
          f"ticks={eng._tick}"
          + (f", mean accepted/iter={acc:.2f}" if draft_layers else ""),
          flush=True)
    return total / dt


# both decode lanes: greedy (T=0, token-identical speculation) and the
# reference's DEFAULT sampled decode (run_opus_ddp.py:156-158: do_sample,
# T=0.1/top_p=0.7 — rejection-verified speculative sampling)
for temp, top_p, lane in ((0.0, 1.0, "greedy"), (0.1, 0.7, "sampled")):
    for slots in (2, 8):
        spt = 8 if slots == 2 else 16
        kw = dict(temp=temp, top_p=top_p)
        # spec ticks keep the FULL spt (an iteration emits >= 1 token, so
        # min progress matches a plain tick): spt//4 spec ticks sank under
        # the ~24 ms tunnel round trip (depth-1 pipeline overlaps one
        # dispatch only) and capped the measured ceiling at 0.53x
        plain = run(params, slots, None, 0, spt,
                    f"{lane} plain      b{slots}", **kw)
        floor = run(params, slots, N_DRAFT_LAYERS, 4, spt,
                    f"{lane} spec floor b{slots} (random, ~0 acc)", **kw)
        ip = identity_upper(params, N_DRAFT_LAYERS)
        plain_i = run(ip, slots, None, 0, spt,
                      f"{lane} plain-id   b{slots}", **kw)
        ceil = run(ip, slots, N_DRAFT_LAYERS, 4, spt,
                   f"{lane} spec ceil  b{slots} (identity uppers)", **kw)
        print(f"{lane} b{slots}: floor {floor / plain:.2f}x, "
              f"ceiling {ceil / plain_i:.2f}x of plain", flush=True)
print("done", flush=True)

"""Benchmark: ESM2-650M protein-encode throughput (seqs/sec/chip).

The encode path is the prefill hot loop of the reference's eval runner
(ESM2 forward per batch, SURVEY.md §3.1); the north star tracks protein
seqs/sec/chip alongside decode tokens/sec (BASELINE.json). The reference
publishes no machine-readable numbers (BASELINE.md), so vs_baseline is
reported against the first recorded TPU value once one exists; until then
it is 1.0 by definition.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    from opus_pllm_tpu.core.config import ESM2Config
    from opus_pllm_tpu.core.util import enable_persistent_compilation_cache
    from opus_pllm_tpu.models import esm2

    enable_persistent_compilation_cache()

    on_tpu = jax.default_backend() == "tpu"
    # full 650M on TPU; small config keeps CPU smoke runs fast
    cfg = (ESM2Config.t33_650M() if on_tpu else ESM2Config.t6_8M())
    cfg = type(cfg)(**{**cfg.__dict__, "dtype": "bfloat16" if on_tpu else "float32"})
    batch, seq_len = (128, 512) if on_tpu else (4, 128)  # 128: best measured

    # unrolled layers: ~12% faster than the lax.scan path for ESM2's small
    # matmuls (XLA fuses across layers); compile cost is acceptable here
    params = esm2.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    toks = rng.integers(4, 24, (batch, seq_len)).astype(np.int32)
    toks[:, 0] = cfg.cls_idx
    toks[:, -1] = cfg.eos_idx
    toks = jnp.asarray(toks)

    # Chain each iteration through the previous result and fetch to host:
    # remote/async backends can otherwise overlap "independent" calls and
    # make block_until_ready() under-report wall time.
    iters = 10 if on_tpu else 3
    fn = jax.jit(lambda p, t: esm2.pooled_embedding(p, cfg, t))
    acc = fn(params, toks)
    np.asarray(acc)                              # compile + sync
    t0 = time.perf_counter()
    for _ in range(iters):
        # feed the previous result back in so iterations serialize
        acc = fn(params, toks + (acc[0, 0] * 0).astype(jnp.int32))
    np.asarray(acc)                              # host fetch = full sync
    dt = time.perf_counter() - t0

    seqs_per_sec = batch * iters / dt
    print(json.dumps({
        "metric": "esm2_650M_encode_seqs_per_sec_per_chip" if on_tpu
                  else "esm2_8M_encode_seqs_per_sec_cpu_smoke",
        "value": round(seqs_per_sec, 2),
        "unit": "seqs/sec",
        "vs_baseline": 1.0,
    }))


if __name__ == "__main__":
    main()

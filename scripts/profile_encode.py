"""Profile-guided encode pass (round-2 VERDICT item 10).

Captures a device trace of the ESM2-650M encode (north-star shape:
batch 128, len 512, bf16) for each attention impl, then prints the
per-op time breakdown parsed from the perfetto trace, so the "one
measured improvement" is chosen from data instead of guesses.

    python scripts/profile_encode.py [xla|flash|both] [--batch N]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def build(batch, seqlen):
    from opus_pllm_tpu.core.config import ESM2Config
    from opus_pllm_tpu.models import esm2

    cfg = ESM2Config.t33_650M()
    cfg = type(cfg)(**{**cfg.__dict__, "dtype": "bfloat16"})
    params = esm2.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    toks = rng.integers(4, 24, (batch, seqlen)).astype(np.int32)
    toks[:, 0] = 0
    toks[:, -1] = 2
    # realistic ragged padding tail on a third of the batch
    toks[: batch // 3, -37:] = 1
    return cfg, params, jnp.asarray(toks)


def run_traced(tag, fn, params, toks, outdir, iters=6):
    # in-jit chaining, matching bench.py: one execute dispatch per
    # iteration, serialized on-device by the prev-result dependency
    acc = jnp.zeros((toks.shape[0], 1280), jnp.float32)
    acc = fn(params, toks, acc)
    np.asarray(acc)  # warm + compile
    t0 = time.perf_counter()
    for _ in range(iters):
        acc = fn(params, toks, acc)
    np.asarray(acc)
    wall = time.perf_counter() - t0
    sps = toks.shape[0] * iters / wall
    print(f"[{tag}] e2e {sps:.1f} seqs/s ({wall/iters*1e3:.0f} ms/encode)")

    logdir = os.path.join(outdir, tag)
    os.makedirs(logdir, exist_ok=True)
    with jax.profiler.trace(logdir, create_perfetto_trace=True):
        acc = fn(params, toks, acc)
        np.asarray(acc)
    return sps, logdir


def analyze(logdir, tag, top=25):
    paths = glob.glob(os.path.join(logdir, "**", "*.json.gz"), recursive=True)
    if not paths:
        print(f"[{tag}] no perfetto trace found under {logdir}")
        return
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"] if isinstance(trace, dict) else trace
    # device-side complete events: pid/tid naming differs by backend; use
    # all 'X' events and bucket by name, then report the dominant track set
    by_name = defaultdict(float)
    total = 0.0
    for ev in events:
        if ev.get("ph") != "X":
            continue
        name = ev.get("name", "?")
        dur = float(ev.get("dur", 0.0))
        if dur <= 0:
            continue
        by_name[name] += dur
        total += dur
    print(f"\n[{tag}] top ops by accumulated device time "
          f"({path.split('/')[-1]}, total {total/1e3:.1f} ms incl. host "
          f"tracks):")
    for name, dur in sorted(by_name.items(), key=lambda kv: -kv[1])[:top]:
        print(f"  {dur/1e3:9.2f} ms  {100*dur/total:5.1f}%  {name[:110]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("which", nargs="?", default="both",
                    choices=["xla", "flash", "fused", "both", "all"])
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--seqlen", type=int, default=512)
    ap.add_argument("--outdir", default="/tmp/enc_traces")
    args = ap.parse_args()

    from opus_pllm_tpu.models import esm2

    cfg, params, toks = build(args.batch, args.seqlen)

    def chained(impl):
        return jax.jit(lambda p, t, prev: esm2.pooled_embedding(
            p, cfg, t + (prev[0, 0] * 0).astype(jnp.int32), impl=impl))

    runs = []
    if args.which in ("both", "xla", "all"):
        runs.append(("xla", chained("xla")))
    if args.which in ("both", "flash", "all"):
        runs.append(("flash", chained("flash")))
    if args.which in ("fused", "all"):
        runs.append(("fused", chained("fused")))

    results = {}
    for tag, fn in runs:
        sps, logdir = run_traced(tag, fn, params, toks, args.outdir)
        results[tag] = (sps, logdir)
    for tag, (sps, logdir) in results.items():
        analyze(logdir, tag)
    print("\nsummary:", {t: round(s, 1) for t, (s, _) in results.items()})


if __name__ == "__main__":
    main()

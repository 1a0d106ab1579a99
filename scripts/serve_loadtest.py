"""HTTP load test for the serving daemon: concurrent mixed traffic ->
throughput + latency percentiles from the CLIENT side, cross-checked
against the server's own /metrics histograms.

Run against a live `cli serve` (colocated for meaningful numbers — the
round-2/3 serving throughput claims are projections until measured off
the tunnel; BENCH_NOTES.md "Serving engine"):

    python scripts/serve_loadtest.py --url http://localhost:8000 \
        --requests 64 --concurrency 16 --max-new 64

Prints one JSON line: {"tok_per_sec": ..., "ttft_p50_ms": ...,
"ttft_p99_ms": ..., "duration_p50_ms": ..., ...} — the measured
counterpart of bench.py's serving mode (which drives the engine
in-process; this script exercises the full HTTP + threading front).
"""

from __future__ import annotations

import argparse
import json
import threading
import time
import urllib.request


def _post(url: str, path: str, body: dict, timeout: float = 600):
    req = urllib.request.Request(
        url + path, data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


def _get(url: str, path: str, timeout: float = 60):
    with urllib.request.urlopen(url + path, timeout=timeout) as r:
        return r.read().decode()


def _pct(xs, q):
    if not xs:
        return 0.0
    xs = sorted(xs)
    i = min(len(xs) - 1, int(round(q * (len(xs) - 1))))
    return xs[i]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--url", default="http://127.0.0.1:8000")
    ap.add_argument("--requests", type=int, default=64)
    ap.add_argument("--concurrency", type=int, default=16)
    ap.add_argument("--max-new", type=int, default=64)
    ap.add_argument("--prompt", default="Hello, describe a protein.")
    ap.add_argument("--stream", action="store_true",
                    help="measure client-side TTFT via SSE first-delta "
                         "time (blocking mode measures only durations)")
    args = ap.parse_args()

    lock = threading.Lock()
    durations: list = []
    ttfts: list = []
    tokens = [0]
    errors = [0]
    sem = threading.Semaphore(args.concurrency)

    def one(i: int) -> None:
        with sem:
            t0 = time.monotonic()
            try:
                if args.stream:
                    req = urllib.request.Request(
                        args.url + "/v1/generate",
                        data=json.dumps(
                            {"prompt": f"{args.prompt} #{i}",
                             "max_new_tokens": args.max_new,
                             "stream": True}).encode(),
                        headers={"Content-Type": "application/json"})
                    n, first = 0, None
                    with urllib.request.urlopen(req, timeout=600) as r:
                        for raw in r:
                            if not raw.startswith(b"data: "):
                                continue
                            if first is None:
                                first = time.monotonic() - t0
                            ev = json.loads(raw[6:])
                            if ev.get("done"):
                                n = ev["tokens"]
                    dt = time.monotonic() - t0
                    with lock:
                        durations.append(dt)
                        if first is not None:
                            ttfts.append(first)
                        tokens[0] += n
                else:
                    out = _post(args.url, "/v1/generate",
                                {"prompt": f"{args.prompt} #{i}",
                                 "max_new_tokens": args.max_new})
                    dt = time.monotonic() - t0
                    with lock:
                        durations.append(dt)
                        tokens[0] += out["tokens"]
            except Exception:   # noqa: BLE001 — counted, not raised
                with lock:
                    errors[0] += 1

    t0 = time.monotonic()
    threads = [threading.Thread(target=one, args=(i,))
               for i in range(args.requests)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.monotonic() - t0

    out = {
        "requests": args.requests, "concurrency": args.concurrency,
        "errors": errors[0], "wall_s": round(wall, 3),
        "tok_per_sec": round(tokens[0] / wall, 1) if wall else 0.0,
        "req_per_sec": round(len(durations) / wall, 2) if wall else 0.0,
        "duration_p50_ms": round(_pct(durations, 0.5) * 1e3, 1),
        "duration_p99_ms": round(_pct(durations, 0.99) * 1e3, 1),
    }
    if ttfts:
        out["ttft_p50_ms"] = round(_pct(ttfts, 0.5) * 1e3, 1)
        out["ttft_p99_ms"] = round(_pct(ttfts, 0.99) * 1e3, 1)
    # cross-check: the server's own engine-side histograms
    try:
        metrics = _get(args.url, "/metrics")
        for ln in metrics.splitlines():
            if ln.startswith("opus_serve_ttft_seconds_count"):
                out["server_ttft_count"] = int(float(ln.split()[-1]))
            if ln.startswith("opus_serve_ttft_seconds_sum"):
                out["server_ttft_sum_s"] = round(float(ln.split()[-1]), 3)
    except Exception:   # noqa: BLE001 — metrics are optional
        pass
    print(json.dumps(out))


if __name__ == "__main__":
    main()

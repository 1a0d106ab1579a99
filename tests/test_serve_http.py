"""HTTP serving front (serve/server.py): the multimodal annotate path is
token-identical to the one-shot runner at T=0, concurrent requests batch
through one engine, and the stdlib HTTP surface round-trips JSON."""

import json
import threading
import time
import urllib.request

import jax
import numpy as np
import pytest

from opus_pllm_tpu.core.config import GenerationConfig, OpusConfig
from opus_pllm_tpu.evals import runner
from opus_pllm_tpu.infer.tokenization import ByteTokenizer
from opus_pllm_tpu.models import opus
from opus_pllm_tpu.serve.server import OpusServer


@pytest.fixture(scope="module")
def served():
    cfg = OpusConfig.tiny("llama")
    params = opus.init(jax.random.PRNGKey(0), cfg)
    tok = ByteTokenizer()
    # ByteTokenizer is byte-level: the professor system prompt alone is
    # ~260 tokens, so capacity must cover the 384 bucket + generation
    srv = OpusServer(params, cfg, tok, max_slots=4, max_len=512,
                     prefill_buckets=(64, 128, 256, 384), default_max_new=8)
    yield cfg, params, tok, srv
    srv.close()


INSTR = "What is the subcellular localization?"
SEQ = "MKTAYIAKQR"


def test_annotate_matches_oneshot_runner(served):
    cfg, params, tok, srv = served
    out = srv.handle_annotate({"instruction": INSTR, "sequence": SEQ,
                               "max_new_tokens": 8, "temperature": 0.0})
    # the runner's one-shot path on the same prompt at T=0
    from opus_pllm_tpu.infer.conversation import VICUNA_V0, annotation_prompt
    prompt = annotation_prompt("<seq>\n" + INSTR, VICUNA_V0)
    gen = GenerationConfig(max_new_tokens=8, temperature=0.0,
                           eos_token_id=tok.eos_token_id,
                           pad_token_id=tok.pad_token_id)
    ref = runner._generate_batch(params, cfg, tok, [prompt], [SEQ], gen,
                                 prompt_bucket=64, esm_bucket=128,
                                 impl="auto")
    assert out["text"] == ref[0]
    assert out["finish_reason"] in ("eos", "length")


def test_invalid_sequence_rejected(served):
    _, _, _, srv = served
    with pytest.raises(ValueError, match="invalid amino acids"):
        srv.handle_annotate({"instruction": INSTR, "sequence": "MKTA123"})
    with pytest.raises(ValueError, match="required"):
        srv.handle_annotate({"instruction": "", "sequence": SEQ})


def test_overlong_prompt_rejected_not_hung(served):
    """A prompt longer than the largest prefill bucket is rejected by the
    engine thread and the error is routed back to the waiting handler —
    the failure mode before this test was a dead engine thread and an
    eternally-blocked request."""
    _, _, _, srv = served
    # the protein pools to a fixed token count, so blow the bucket with
    # the instruction (byte-level tokenizer: 1 char = 1 token)
    with pytest.raises(ValueError, match="exceeds"):
        srv.handle_annotate({"instruction": INSTR * 20, "sequence": SEQ,
                             "max_new_tokens": 4, "_timeout": 120})
    # the engine thread survived: a normal request still completes
    out = srv.handle_annotate({"instruction": INSTR, "sequence": SEQ,
                               "max_new_tokens": 4, "_timeout": 300})
    assert out["tokens"] > 0


def test_concurrent_requests_batch(served):
    """Requests from several client threads decode together in the slot
    pool and all complete (continuous batching through the HTTP front)."""
    _, _, _, srv = served
    results = {}

    budgets = [4, 5, 6, 7, 4, 8]     # workers 0 and 4 are identical twins
                                     # (both even i -> same sequence)

    def worker(i):
        results[i] = srv.handle_annotate(
            {"instruction": INSTR, "sequence": SEQ * (1 + i % 2),
             "max_new_tokens": budgets[i], "temperature": 0.0})

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert len(results) == 6
    assert all(r["tokens"] > 0 for r in results.values())
    # identical inputs with identical budgets agree at T=0, regardless of
    # which slot/tick each landed in
    assert results[0]["text"] == results[4]["text"]


def test_streaming_matches_blocking(served):
    """SSE-style streaming yields per-tick deltas whose concatenation
    equals the blocking handler's result exactly at T=0 (the engine never
    streams EOS, and the final event carries the '###'-truncated text)."""
    _, _, tok, srv = served
    body = {"instruction": INSTR, "sequence": SEQ,
            "max_new_tokens": 8, "temperature": 0.0}
    blocking = srv.handle_annotate(dict(body))

    events = list(srv.stream_annotate(dict(body)))
    assert events, "no events streamed"
    final = events[-1]
    assert final.get("done") is True
    assert final["text"] == blocking["text"]
    assert final["finish_reason"] == blocking["finish_reason"]
    assert final["tokens"] == blocking["tokens"]
    deltas = events[:-1]
    all_ids = [t for e in deltas for t in e["token_ids"]]
    assert len(all_ids) == blocking["tokens"]
    # incremental text re-decodes consistently
    assert "".join(e["text"] for e in deltas) == tok.decode(all_ids)


def test_stream_cancel_frees_slot(served):
    """Closing a streaming consumer (client disconnect) cancels the
    request: the slot frees without decoding to budget, and the engine
    keeps serving."""
    _, _, _, srv = served
    g = srv.stream_annotate({"instruction": INSTR, "sequence": SEQ,
                             "max_new_tokens": 200, "temperature": 0.0})
    first = next(g)
    assert first["token_ids"]
    g.close()                          # disconnect after one delta
    deadline = time.monotonic() + 120
    while time.monotonic() < deadline:
        if not srv.engine.busy and not np.any(srv.engine.state["active"]):
            break
        time.sleep(0.1)
    assert not np.any(srv.engine.state["active"])
    # no leaked bookkeeping for the cancelled request
    assert not srv._events and not srv._results
    out = srv.handle_annotate({"instruction": INSTR, "sequence": SEQ,
                               "max_new_tokens": 4, "_timeout": 300})
    assert out["tokens"] > 0


def test_streaming_http_sse(served):
    _, _, _, srv = served
    httpd = srv.make_http_server("127.0.0.1", 0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        body = json.dumps({"prompt": "Hello", "max_new_tokens": 5,
                           "stream": True}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/generate", data=body,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=300) as r:
            assert r.headers["Content-Type"] == "text/event-stream"
            events = [json.loads(line[len(b"data: "):])
                      for line in r.read().split(b"\n\n")
                      if line.startswith(b"data: ")]
        assert events[-1]["done"] is True
        assert events[-1]["tokens"] == sum(
            len(e["token_ids"]) for e in events[:-1])
    finally:
        httpd.shutdown()


def test_http_round_trip(served):
    _, _, _, srv = served
    httpd = srv.make_http_server("127.0.0.1", 0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/health") as r:
            health = json.loads(r.read())
        assert health["status"] == "ok" and health["slots"] == 4

        body = json.dumps({"instruction": INSTR, "sequence": SEQ,
                           "max_new_tokens": 6}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/annotate", data=body,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=300) as r:
            out = json.loads(r.read())
        assert out["tokens"] > 0 and isinstance(out["text"], str)

        body = json.dumps({"prompt": "Hello", "max_new_tokens": 4}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/generate", data=body,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=300) as r:
            out = json.loads(r.read())
        assert out["tokens"] > 0

        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/annotate",
            data=json.dumps({"instruction": INSTR,
                             "sequence": "XYZ_12"}).encode(),
            headers={"Content-Type": "application/json"})
        try:
            urllib.request.urlopen(bad, timeout=60)
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert "invalid amino acids" in json.loads(e.read())["error"]
    finally:
        httpd.shutdown()


class _FakeTok:
    """Decode table keyed by token tuple — models byte-fallback BPE where
    an intermediate decode renders an incomplete UTF-8 tail as U+FFFD."""

    def __init__(self, table):
        self.table = table

    def decode(self, toks):
        return self.table[tuple(toks)]


def _fake_stream(deltas, finish="length"):
    from opus_pllm_tpu.serve.engine import Completion
    for d in deltas:
        yield d
    return Completion(0, [t for d in deltas for t in d], finish)


def test_stream_events_append_only_across_split_utf8():
    """A character split across tokens (decode of the partial bytes ends
    in U+FFFD) is held back, not resent: emitted deltas stay append-only
    (the OpenAI chunk contract) and still concatenate to the full text."""
    table = {(1,): "a�", (1, 2): "aé", (1, 2, 3): "aéb"}
    stub = type("S", (), {"tok": _FakeTok(table)})()
    events = list(OpusServer._stream_events(
        stub, _fake_stream([[1], [2], [3]]), truncate=False))
    assert events[-1]["done"] is True
    assert events[-1]["text"] == "aéb"
    texts = [e["text"] for e in events[:-1]]
    assert texts == ["a", "é", "b"]          # no "a�", no resend
    assert "".join(texts) == "aéb"


def test_stream_events_flushes_held_tail():
    """A tail still incomplete at the end flushes as one final delta, so
    delta concatenation equals the full decode."""
    table = {(1,): "a�"}
    stub = type("S", (), {"tok": _FakeTok(table)})()
    events = list(OpusServer._stream_events(
        stub, _fake_stream([[1]]), truncate=False))
    assert [e["text"] for e in events[:-1]] == ["a", "�"]
    assert events[-1]["done"] is True and events[-1]["text"] == "a�"


def test_queued_gauge_reads_engine_backlog(served):
    """/health 'queued' reports the engine's real backlog (queue +
    mid-chunked-prefill), not just the thread-handoff queue that drains
    every loop iteration."""
    _, _, _, srv = served
    assert srv.health()["queued"] == 0
    srv.engine._queue.append(object())        # simulate waiting requests
    srv.engine._chunking[99] = [None, None, 0]
    try:
        assert srv.health()["queued"] == 2
        assert "opus_serve_queued_requests 2" in srv.metrics_text()
    finally:
        srv.engine._queue.pop()
        del srv.engine._chunking[99]


def test_latency_histogram_unit():
    from opus_pllm_tpu.serve.engine import LatencyHistogram
    h = LatencyHistogram(bounds=(0.1, 1.0, 10.0))
    for v in (0.05, 0.5, 0.5, 5.0, 50.0):
        h.observe(v)
    assert h.count == 5 and abs(h.sum - 56.05) < 1e-9
    assert abs(h.mean - 56.05 / 5) < 1e-9
    lines = h.prometheus("x_seconds")
    assert 'x_seconds_bucket{le="0.1"} 1' in lines       # cumulative
    assert 'x_seconds_bucket{le="1.0"} 3' in lines
    assert 'x_seconds_bucket{le="10.0"} 4' in lines
    assert 'x_seconds_bucket{le="+Inf"} 5' in lines
    assert "x_seconds_count 5" in lines


def test_request_latency_observed(served):
    """Every completed request observes queue_wait, TTFT, and duration at
    the engine; /health exposes means and /metrics full histograms.
    Cancelled requests leave no stamp behind."""
    _, _, _, srv = served
    lat = srv.engine.latency
    before = lat["duration"].count
    srv.handle_annotate({"instruction": INSTR, "sequence": SEQ,
                         "max_new_tokens": 4, "temperature": 0.0,
                         "_timeout": 300})
    assert lat["duration"].count == before + 1
    assert lat["ttft"].count >= before + 1
    assert lat["queue_wait"].count >= before + 1
    # TTFT can't exceed full duration for the same request
    assert lat["ttft"].sum <= lat["duration"].sum + 1e-6
    h = srv.health()
    assert h["duration_mean_s"] > 0 and h["ttft_mean_s"] > 0
    text = srv.metrics_text()
    assert f"opus_serve_duration_seconds_count {lat['duration'].count}" \
        in text
    assert 'opus_serve_ttft_seconds_bucket{le="+Inf"}' in text
    assert not srv.engine._t_submit, "stamps must not outlive requests"


def test_drain_rejects_new_and_finishes_inflight():
    """Graceful shutdown: begin_drain makes new submits raise
    ServerDraining (503 over HTTP); drain() waits for in-flight requests
    to complete normally; a drain timeout fails stragglers loudly instead
    of hanging their waiters."""
    from opus_pllm_tpu.core.config import OpusConfig
    from opus_pllm_tpu.models import opus
    from opus_pllm_tpu.serve.server import ServerDraining

    cfg = OpusConfig.tiny("llama")
    params = opus.init(jax.random.PRNGKey(0), cfg)
    tok = ByteTokenizer()
    srv = OpusServer(params, cfg, tok, max_slots=2, max_len=512,
                     prefill_buckets=(64, 128, 256, 384),
                     default_max_new=4)
    try:
        # warm the pipeline so the drain test below isn't compile-bound
        srv.handle_annotate({"instruction": INSTR, "sequence": SEQ,
                             "max_new_tokens": 2, "_timeout": 300})
        # in-flight request, then drain concurrently
        result = {}

        def worker():
            try:
                result["out"] = srv.handle_annotate(
                    {"instruction": INSTR, "sequence": SEQ,
                     "max_new_tokens": 16, "_timeout": 300})
            except Exception as e:   # noqa: BLE001
                result["err"] = e
        t = threading.Thread(target=worker)
        t.start()
        deadline = time.monotonic() + 60
        while not srv.engine.busy and time.monotonic() < deadline:
            time.sleep(0.01)         # wait until it's actually in flight
        clean = srv.drain(timeout=120)
        t.join(timeout=60)
        assert clean and result.get("out", {}).get("tokens") == 16
        assert srv.health()["status"] == "draining"
        with pytest.raises(ServerDraining):
            srv.handle_annotate({"instruction": INSTR, "sequence": SEQ})
        with pytest.raises(ServerDraining):
            srv.submit_streaming(token_ids=srv.token_ids_generate("Hi"),
                                 max_new_tokens=4, temperature=0.0)
    finally:
        srv.close()


def test_drain_timeout_fails_stragglers():
    from opus_pllm_tpu.core.config import OpusConfig
    from opus_pllm_tpu.models import opus
    from opus_pllm_tpu.serve.server import ServerDraining

    cfg = OpusConfig.tiny("llama")
    params = opus.init(jax.random.PRNGKey(0), cfg)
    tok = ByteTokenizer()
    srv = OpusServer(params, cfg, tok, max_slots=2, max_len=2048,
                     prefill_buckets=(64, 128, 256, 384),
                     default_max_new=4)
    try:
        result = {}

        def worker():
            try:
                result["out"] = srv.handle_annotate(
                    {"instruction": INSTR, "sequence": SEQ,
                     "max_new_tokens": 1500, "_timeout": 600})
            except Exception as e:   # noqa: BLE001
                result["err"] = e
        t = threading.Thread(target=worker)
        t.start()
        deadline = time.monotonic() + 120
        while not srv.engine.busy and time.monotonic() < deadline:
            time.sleep(0.01)
        clean = srv.drain(timeout=0.2)   # far shorter than 1500 tokens
        t.join(timeout=60)
        assert not clean
        assert isinstance(result.get("err"), ServerDraining)
        # the slot actually freed (engine cancel processed)
        deadline = time.monotonic() + 60
        while np.any(srv.engine.state["active"]) and \
                time.monotonic() < deadline:
            time.sleep(0.05)
        assert not np.any(srv.engine.state["active"])
    finally:
        srv.close()


def test_http_adapter_management(monkeypatch):
    """POST/GET/DELETE /v1/adapters manage the live bank through the
    engine thread; the new adapter is immediately routable as an OpenAI
    `model` name."""
    import urllib.error

    from opus_pllm_tpu.core.config import LoRAConfig, OpusConfig
    from opus_pllm_tpu.lora import lora as lora_mod
    from opus_pllm_tpu.models import opus

    cfg = OpusConfig.tiny("llama")
    params = opus.init(jax.random.PRNGKey(0), cfg)
    lcfg = LoRAConfig(rank=4, alpha=8.0)
    trees = {}
    for i, name in enumerate(("loc", "go")):
        t = lora_mod.init(jax.random.PRNGKey(10 + i), cfg.llm, lcfg)
        t = jax.tree.map(
            lambda x: x if x.shape[-1] == lcfg.rank else
            0.3 * jax.random.normal(jax.random.PRNGKey(20 + i), x.shape), t)
        trees[name] = lora_mod.fold_scaling(t, lora_mod.scaling(lcfg))
    tok = ByteTokenizer()
    srv = OpusServer(params, cfg, tok, max_slots=2, max_len=512,
                     prefill_buckets=(64, 128, 256, 384),
                     default_max_new=4, lora_bank={"loc": trees["loc"]},
                     adapter_capacity=2)
    monkeypatch.setattr(OpusServer, "_load_adapter_tree",
                        lambda self, path: trees[path])
    httpd = srv.make_http_server("127.0.0.1", 0)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{port}"

    def call(method, path, body=None):
        data = json.dumps(body).encode() if body is not None else None
        req = urllib.request.Request(base + path, data=data, method=method,
                                     headers={"Content-Type":
                                              "application/json"})
        with urllib.request.urlopen(req, timeout=120) as r:
            return json.loads(r.read())
    try:
        assert call("GET", "/v1/adapters") == {
            "adapters": ["loc"], "capacity": 2, "free": 1}
        out = call("POST", "/v1/adapters", {"name": "go", "path": "go"})
        assert out == {"adapters": ["go", "loc"], "capacity": 2, "free": 0}
        # immediately routable as an OpenAI model name
        models = [m["id"] for m in call("GET", "/v1/models")["data"]]
        assert "go" in models
        r = call("POST", "/v1/chat/completions",
                 {"model": "go", "max_tokens": 4, "_timeout": 300,
                  "messages": [{"role": "user", "content": "Hi"}]})
        assert r["choices"][0]["message"]["content"] is not None
        assert call("DELETE", "/v1/adapters/go")["adapters"] == ["loc"]
        try:
            call("DELETE", "/v1/adapters/nope")
            assert False, "expected 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        httpd.shutdown()
        srv.close()


def test_system_prefix_cache_token_identical():
    """cache_system_prefix pins the professor header's KV once; matching
    requests admit with only their suffix and generate token-identically
    to a full-prompt server. Non-matching prompts and adapter requests
    fall back to full admission."""
    from opus_pllm_tpu.core.config import OpusConfig
    from opus_pllm_tpu.models import opus
    cfg = OpusConfig.tiny("llama")
    params = opus.init(jax.random.PRNGKey(0), cfg)
    tok = ByteTokenizer()
    kw = dict(max_slots=2, max_len=512,
              prefill_buckets=(64, 128, 256, 384), default_max_new=8)
    plain = OpusServer(params, cfg, tok, **kw)
    cached = OpusServer(params, cfg, tok, cache_system_prefix=True, **kw)
    try:
        body = {"instruction": INSTR, "sequence": SEQ,
                "max_new_tokens": 8, "temperature": 0.0, "_timeout": 300}
        ref = plain.handle_annotate(dict(body))
        out = cached.handle_annotate(dict(body))
        assert out["text"] == ref["text"] and out["tokens"] == ref["tokens"]
        assert "sys" in cached.engine._prefixes, "prefix must be pinned"
        # the suffix admission actually engaged: prepare_request routes it
        sub = cached.prepare_request(
            cached._prompt_for(INSTR), SEQ)
        assert sub.get("prefix_id") == "sys"
        full = plain.prepare_request(plain._prompt_for(INSTR), SEQ)
        assert "prefix_id" not in full
        assert sub["embeds"].shape[0] < full["embeds"].shape[0]
        # full token count reported either way
        assert sub["_prompt_tokens"] == full["_prompt_tokens"]
        # arbitrary prompts fall back to full admission and still work
        g = cached.handle_generate({"prompt": "Hello", "max_new_tokens": 4,
                                    "_timeout": 300})
        assert g["tokens"] == 4
        # streaming matches too
        evs = list(cached.stream_annotate(dict(body)))
        assert evs[-1]["text"] == ref["text"]
    finally:
        plain.close()
        cached.close()


def test_max_queue_backpressure():
    """max_queue sheds load at admission: with the single slot occupied
    by a long request and one more waiting in the engine queue, the next
    submit raises ServerOverloaded (429); after the backlog drains, the
    server accepts again."""
    from opus_pllm_tpu.core.config import OpusConfig
    from opus_pllm_tpu.models import opus
    from opus_pllm_tpu.serve.server import ServerOverloaded

    cfg = OpusConfig.tiny("llama")
    params = opus.init(jax.random.PRNGKey(0), cfg)
    tok = ByteTokenizer()
    srv = OpusServer(params, cfg, tok, max_slots=1, max_len=512,
                     prefill_buckets=(64, 128, 256, 384),
                     default_max_new=4, max_queue=1)
    try:
        results = []

        def worker(budget):
            results.append(srv.handle_generate(
                {"prompt": "Hello", "max_new_tokens": budget,
                 "_timeout": 600}))
        # A occupies the only slot for a while; B waits in the queue
        ts = [threading.Thread(target=worker, args=(120,)),
              threading.Thread(target=worker, args=(4,))]
        ts[0].start()
        deadline = time.monotonic() + 120
        while not srv.engine.busy and time.monotonic() < deadline:
            time.sleep(0.01)
        ts[1].start()
        while srv._queued() < 1 and time.monotonic() < deadline:
            time.sleep(0.01)
        assert srv._queued() >= 1, "B never reached the backlog"
        with pytest.raises(ServerOverloaded, match="max-queue"):
            srv.handle_generate({"prompt": "Hi", "max_new_tokens": 2})
        for t in ts:
            t.join(timeout=300)
        assert len(results) == 2      # the admitted requests completed
        out = srv.handle_generate({"prompt": "Hi", "max_new_tokens": 2,
                                   "_timeout": 300})
        assert out["tokens"] == 2     # accepts again once drained
    finally:
        srv.close()


def test_text_only_seq_marker_is_literal(served):
    """A literal '<seq>' in a text-only prompt is content, not a splice
    marker: no sentinel reaches the engine (review finding — the -200 id
    clamped to token 0 and silently corrupted the output)."""
    _, _, tok, srv = served
    sub = srv.prepare_request("explain the <seq> marker", None)
    ids = sub["token_ids"]
    assert int(ids.min()) >= 0, "splice sentinel leaked into text path"
    assert tok.decode([int(t) for t in ids if t != tok.bos_token_id]) \
        == "explain the <seq> marker"
    out = srv.handle_generate({"prompt": "explain the <seq> marker",
                               "max_new_tokens": 2, "_timeout": 300})
    assert out["tokens"] == 2


def test_prefix_falls_back_for_overbucket_suffix():
    """--cache-system-prefix must not break prompts whose SUFFIX exceeds
    the largest prefill bucket: they fall back to full admission (which
    chunked prefill handles) instead of a 400 from engine.submit."""
    from opus_pllm_tpu.core.config import OpusConfig
    from opus_pllm_tpu.models import opus
    cfg = OpusConfig.tiny("llama")
    params = opus.init(jax.random.PRNGKey(0), cfg)
    tok = ByteTokenizer()
    srv = OpusServer(params, cfg, tok, max_slots=2, max_len=2048,
                     prefill_buckets=(64, 128, 256, 384),
                     chunk_prefill=64, default_max_new=4,
                     cache_system_prefix=True)
    try:
        short = srv.prepare_request(srv._prompt_for("Where?"), SEQ)
        assert short.get("prefix_id") == "sys"
        long_instr = "Describe the protein. " * 40   # suffix > 384
        sub = srv.prepare_request(srv._prompt_for(long_instr), SEQ)
        assert "prefix_id" not in sub, "over-bucket suffix kept the prefix"
        out = srv.handle_annotate({"instruction": long_instr,
                                   "sequence": SEQ, "max_new_tokens": 2,
                                   "_timeout": 600})
        assert out["tokens"] == 2   # the chunked path served it
    finally:
        srv.close()

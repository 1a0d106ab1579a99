"""OpenAI-compatible API (serve/openai_api.py): /v1/chat/completions and
/v1/completions produce standard response objects over the same engine as
the native front (text equal to the native handlers on identical prompts),
`model` routes bank adapters, protein content-parts splice, streaming
chunks concatenate to the blocking result and end with [DONE]."""

import json
import threading
import urllib.error
import urllib.request

import jax
import pytest

from opus_pllm_tpu.core.config import LoRAConfig, OpusConfig
from opus_pllm_tpu.infer.conversation import VICUNA_V0, truncate_at_sep
from opus_pllm_tpu.infer.tokenization import ByteTokenizer
from opus_pllm_tpu.lora import lora as lora_mod
from opus_pllm_tpu.models import opus
from opus_pllm_tpu.serve import openai_api
from opus_pllm_tpu.serve.server import OpusServer

INSTR = "What is the subcellular localization?"
SEQ = "MKTAYIAKQR"


@pytest.fixture(scope="module")
def served():
    cfg = OpusConfig.tiny("llama")
    params = opus.init(jax.random.PRNGKey(0), cfg)
    tok = ByteTokenizer()
    srv = OpusServer(params, cfg, tok, max_slots=4, max_len=512,
                     prefill_buckets=(64, 128, 256, 384),
                     default_max_new=8, model_id="opus-test")
    yield cfg, params, tok, srv
    srv.close()


def test_completion_matches_generate(served):
    _, _, _, srv = served
    body = {"prompt": "Hello there", "max_tokens": 6, "temperature": 0.0}
    ref = srv.handle_generate({"prompt": "Hello there", "max_new_tokens": 6,
                               "temperature": 0.0})
    out = openai_api.handle_completion(srv, dict(body))
    assert out["object"] == "text_completion"
    assert out["choices"][0]["text"] == ref["text"]
    assert out["choices"][0]["finish_reason"] in ("stop", "length")
    u = out["usage"]
    assert u["completion_tokens"] == ref["tokens"]
    assert u["total_tokens"] == u["prompt_tokens"] + u["completion_tokens"]
    assert out["model"] == "opus-test"


def test_chat_completion_text_only_matches_generate(served):
    """The non-chat-template path assembles the professor conversation;
    the same prompt through /v1/generate produces the same text."""
    _, _, _, srv = served
    messages = [{"role": "user", "content": "Name three amino acids."}]
    prompt = (VICUNA_V0.system + "\n\n"
              "### Student: Name three amino acids.\n### Professor:")
    ref = srv.handle_generate({"prompt": prompt,
                               "max_new_tokens": 6, "temperature": 0.0})
    out = openai_api.handle_chat(srv, {"messages": messages,
                                       "max_tokens": 6,
                                       "temperature": 0.0})
    assert out["object"] == "chat.completion"
    assert out["choices"][0]["message"] == {
        "role": "assistant", "content": ref["text"]}


def test_chat_completion_protein_part_matches_annotate(served):
    """A {"type": "protein"} content part splices the sequence exactly like
    the native /v1/annotate front (same prompt layout -> same tokens)."""
    _, _, _, srv = served
    ref = srv.handle_annotate({"instruction": INSTR, "sequence": SEQ,
                               "max_new_tokens": 8, "temperature": 0.0})
    out = openai_api.handle_chat(srv, {
        "messages": [{"role": "user", "content": [
            {"type": "protein", "sequence": SEQ},
            {"type": "text", "text": INSTR}]}],
        "max_tokens": 8, "temperature": 0.0})
    assert truncate_at_sep(out["choices"][0]["message"]["content"]) == \
        ref["text"]
    # invalid amino acids reject through the same gate as the REPL
    with pytest.raises(ValueError, match="invalid amino acids"):
        openai_api.handle_chat(srv, {
            "messages": [{"role": "user", "content": [
                {"type": "protein", "sequence": "MKT123"},
                {"type": "text", "text": INSTR}]}],
            "max_tokens": 4})


def test_stream_chat_concatenates_and_terminates(served):
    _, _, _, srv = served
    body = {"messages": [{"role": "user", "content": "Hello"}],
            "max_tokens": 6, "temperature": 0.0}
    blocking = openai_api.handle_chat(srv, dict(body))
    events = list(openai_api.stream_chat(srv, dict(body, stream=True)))
    assert events[-1] == "[DONE]"
    chunks = events[:-1]
    assert chunks[0]["choices"][0]["delta"]["role"] == "assistant"
    assert all(c["object"] == "chat.completion.chunk" for c in chunks)
    text = "".join(c["choices"][0]["delta"].get("content", "")
                   for c in chunks)
    assert text == blocking["choices"][0]["message"]["content"]
    assert chunks[-1]["choices"][0]["finish_reason"] == \
        blocking["choices"][0]["finish_reason"]
    assert all(c["choices"][0]["finish_reason"] is None
               for c in chunks[:-1])


def test_stream_completion_concatenates(served):
    _, _, _, srv = served
    body = {"prompt": "Hello", "max_tokens": 5, "temperature": 0.0}
    blocking = openai_api.handle_completion(srv, dict(body))
    events = list(openai_api.stream_completion(srv, dict(body)))
    assert events[-1] == "[DONE]"
    text = "".join(c["choices"][0]["text"] for c in events[:-1])
    assert text == blocking["choices"][0]["text"]


def test_stop_strings_posthoc(served):
    _, _, _, srv = served
    full = openai_api.handle_completion(
        srv, {"prompt": "Hello", "max_tokens": 8, "temperature": 0.0})
    text = full["choices"][0]["text"]
    assert len(text) >= 2, "need output to truncate"
    stop = text[1]
    out = openai_api.handle_completion(
        srv, {"prompt": "Hello", "max_tokens": 8, "temperature": 0.0,
              "stop": stop})
    assert out["choices"][0]["text"] == text[:text.find(stop)]
    assert out["choices"][0]["finish_reason"] == "stop"


def test_unsupported_params_reject(served):
    _, _, _, srv = served
    msgs = [{"role": "user", "content": "hi"}]
    with pytest.raises(ValueError, match="top_p"):
        openai_api.handle_chat(srv, {"messages": msgs, "top_p": 0.0})
    with pytest.raises(ValueError, match="top_p"):
        openai_api.handle_chat(srv, {"messages": msgs, "top_p": 1.5})
    with pytest.raises(ValueError, match="n>1"):
        openai_api.handle_chat(srv, {"messages": msgs, "n": 2})
    with pytest.raises(ValueError, match="logprobs"):
        openai_api.handle_chat(srv, {"messages": msgs, "logprobs": True})
    with pytest.raises(ValueError, match="echo"):
        openai_api.handle_completion(srv, {"prompt": "x", "echo": True})
    with pytest.raises(ValueError, match="role"):
        openai_api.handle_chat(srv, {"messages": [{"role": "tool",
                                                   "content": "x"}]})


def test_model_routes_adapters():
    """`model`=adapter-name selects the bank adapter (vLLM convention):
    output equals a base-model server with that adapter merged in, and
    /v1/models lists base + adapters."""
    cfg = OpusConfig.tiny("llama")
    params = opus.init(jax.random.PRNGKey(0), cfg)
    lcfg = LoRAConfig(rank=4, alpha=8.0)
    t = lora_mod.init(jax.random.PRNGKey(11), cfg.llm, lcfg)
    t = jax.tree.map(
        lambda x: x if x.shape[-1] == lcfg.rank else
        0.3 * jax.random.normal(jax.random.PRNGKey(21), x.shape), t)
    tok = ByteTokenizer()
    body = {"messages": [{"role": "user", "content": "Hello"}],
            "max_tokens": 6, "temperature": 0.0, "_timeout": 300}

    merged = dict(params)
    merged["llm"] = lora_mod.merge(params["llm"], t, lcfg)
    ref_srv = OpusServer(merged, cfg, tok, max_slots=2, max_len=512,
                         prefill_buckets=(64, 128, 256, 384),
                         default_max_new=8)
    try:
        ref = openai_api.handle_chat(ref_srv, dict(body))
    finally:
        ref_srv.close()

    srv = OpusServer(params, cfg, tok, max_slots=2, max_len=512,
                     prefill_buckets=(64, 128, 256, 384), default_max_new=8,
                     model_id="opus-test", lora_bank={"loc": t},
                     lora_scale=lora_mod.scaling(lcfg))
    try:
        models = openai_api.list_models(srv)
        assert [m["id"] for m in models["data"]] == ["opus-test", "loc"]
        out = openai_api.handle_chat(srv, dict(body, model="loc"))
        base = openai_api.handle_chat(srv, dict(body, model="opus-test"))
        assert out["choices"][0]["message"]["content"] == \
            ref["choices"][0]["message"]["content"]
        assert base["choices"][0]["message"]["content"] != \
            out["choices"][0]["message"]["content"]
        with pytest.raises(ValueError, match="not found"):
            openai_api.handle_chat(srv, dict(body, model="nope"))
    finally:
        srv.close()


def test_metrics_endpoint(served):
    """GET /metrics: Prometheus text with live engine counters."""
    _, _, _, srv = served
    before = srv.engine.counters["completions"]
    openai_api.handle_completion(srv, {"prompt": "Hi", "max_tokens": 3,
                                       "temperature": 0.0})
    httpd = srv.make_http_server("127.0.0.1", 0)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/metrics") as r:
            assert r.headers["Content-Type"].startswith("text/plain")
            text = r.read().decode()
    finally:
        httpd.shutdown()
    lines = dict(ln.split() for ln in text.splitlines()
                 if ln and not ln.startswith("#"))
    assert int(lines["opus_serve_completions_total"]) >= before + 1
    assert int(lines["opus_serve_tokens_total"]) >= 3
    assert int(lines["opus_serve_prefills_total"]) >= 1
    assert lines["opus_serve_slots"] == "4"


def test_http_openai_round_trip(served):
    """Real HTTP: chat completion (blocking + SSE), completion, models,
    and the OpenAI nested error shape on a bad request."""
    _, _, _, srv = served
    httpd = srv.make_http_server("127.0.0.1", 0)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{port}"

    def post(path, payload, timeout=300):
        req = urllib.request.Request(
            base + path, data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"})
        return urllib.request.urlopen(req, timeout=timeout)

    try:
        with urllib.request.urlopen(base + "/v1/models") as r:
            models = json.loads(r.read())
        assert models["object"] == "list"
        assert models["data"][0]["id"] == "opus-test"

        with post("/v1/chat/completions",
                  {"messages": [{"role": "user", "content": "Hello"}],
                   "max_tokens": 5, "temperature": 0.0}) as r:
            out = json.loads(r.read())
        assert out["object"] == "chat.completion"
        assert out["usage"]["completion_tokens"] > 0

        with post("/v1/completions",
                  {"prompt": "Hello", "max_tokens": 4}) as r:
            out = json.loads(r.read())
        assert out["object"] == "text_completion"

        with post("/v1/chat/completions",
                  {"messages": [{"role": "user", "content": "Hello"}],
                   "max_tokens": 4, "temperature": 0.0,
                   "stream": True}) as r:
            assert r.headers["Content-Type"] == "text/event-stream"
            frames = [f[len(b"data: "):] for f in r.read().split(b"\n\n")
                      if f.startswith(b"data: ")]
        assert frames[-1] == b"[DONE]"
        assert json.loads(frames[0])["object"] == "chat.completion.chunk"

        try:
            post("/v1/chat/completions", {"messages": [], "model": "nope"},
                 timeout=60)
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
            err = json.loads(e.read())["error"]
            assert err["type"] == "invalid_request_error"
    finally:
        httpd.shutdown()


def test_explicit_zero_max_tokens_rejected(served):
    """max_tokens/max_completion_tokens: an explicit invalid value is a
    400, never a silent fall-through to the next field or the default;
    the newer name wins when both are present."""
    _, _, _, srv = served
    with pytest.raises(ValueError, match="max_tokens"):
        openai_api.handle_completion(
            srv, {"prompt": "Hi", "max_tokens": 0})
    with pytest.raises(ValueError, match="max_completion_tokens"):
        openai_api.handle_chat(
            srv, {"messages": [{"role": "user", "content": "Hi"}],
                  "max_completion_tokens": 0, "max_tokens": 50})
    assert openai_api._max_new(
        srv, {"max_completion_tokens": 3, "max_tokens": 50}) == 3
    assert openai_api._max_new(srv, {}) == srv.default_max_new


def test_embeddings_protein_matches_direct(served):
    """/v1/embeddings protein parts = pooled-ESM -> CSTP protein
    projection (the stage-(a) retrieval representation), order preserved
    in a mixed-length batch."""
    import numpy as np

    from opus_pllm_tpu.bridge import cstp
    from opus_pllm_tpu.models import esm2
    cfg, params, _, srv = served
    seqs = ["MKTAYIAKQR", "ACDEFGHIKLMNP", "MKT"]
    out = openai_api.handle_embeddings(
        srv, {"input": [{"type": "protein", "sequence": s} for s in seqs]})
    assert out["object"] == "list" and len(out["data"]) == 3
    assert [d["index"] for d in out["data"]] == [0, 1, 2]
    toks, _ = esm2.tokenize(seqs, max_len=128)
    ref = cstp.protein_forward(
        params["cstp"], esm2.pooled_embedding(params["esm"], cfg.esm, toks))
    got = np.asarray([d["embedding"] for d in out["data"]])
    np.testing.assert_allclose(got, np.asarray(ref), rtol=2e-5, atol=2e-5)
    assert out["usage"]["total_tokens"] == sum(len(s) + 2 for s in seqs)


def test_embeddings_text_dim_guard_and_matched_config(served):
    """Text embeddings are rejected when the served LLM's hidden size
    differs from cstp.text_dim (the reference's text encoder is a separate
    model); with matching dims they equal text-encoder mean -> CSTP text
    projection and share the protein space."""
    import dataclasses

    import numpy as np

    from opus_pllm_tpu.bridge import cstp
    from opus_pllm_tpu.infer.tokenization import pad_batch
    from opus_pllm_tpu.models import opus, text_encoder
    _, _, _, srv = served
    with pytest.raises(ValueError, match="text_dim"):
        openai_api.handle_embeddings(srv, {"input": "a membrane protein"})

    cfg2 = OpusConfig.tiny("llama")
    cfg2 = dataclasses.replace(
        cfg2, cstp=dataclasses.replace(cfg2.cstp, text_dim=64))
    params2 = opus.init(jax.random.PRNGKey(1), cfg2)
    tok = ByteTokenizer()
    srv2 = OpusServer(params2, cfg2, tok, max_slots=2, max_len=256,
                      prefill_buckets=(64, 128), default_max_new=4)
    try:
        text = "localizes to the nucleus"
        out = openai_api.handle_embeddings(
            srv2, {"input": [text,
                             {"type": "protein", "sequence": "MKTAYIAKQR"}]})
        ids = [tok.bos_token_id] + list(tok.encode(text))
        idsa, mask = pad_batch([ids], tok.pad_token_id, left=False,
                               max_len=64)
        emb = text_encoder.text_embeddings(params2["llm"], cfg2.llm,
                                           idsa, mask, mask_pad=True)
        ref = cstp.text_forward(params2["cstp"], emb)[0]
        got = np.asarray(out["data"][0]["embedding"])
        np.testing.assert_allclose(got, np.asarray(ref), rtol=2e-5,
                                   atol=2e-5)
        prot = np.asarray(out["data"][1]["embedding"])
        assert prot.shape == got.shape        # same shared space
    finally:
        srv2.close()


def test_embeddings_http_and_validation(served):
    _, _, _, srv = served
    httpd = srv.make_http_server("127.0.0.1", 0)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        body = json.dumps({"input": [{"type": "protein",
                                      "sequence": "MKTAYIAKQR"}]}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/embeddings", data=body,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=300) as r:
            out = json.loads(r.read())
        assert out["object"] == "list"
        assert len(out["data"][0]["embedding"]) > 0
        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/embeddings",
            data=json.dumps({"input": []}).encode(),
            headers={"Content-Type": "application/json"})
        try:
            urllib.request.urlopen(bad, timeout=60)
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert e.read()                   # OpenAI error envelope
    finally:
        httpd.shutdown()


def test_stop_filter_unit():
    """_stop_filter holds back max(len(stop))-1 chars so a stop split
    across deltas still matches; on a match the pre-stop text flushes,
    the source closes (engine cancel), finish_reason is 'stop'."""
    closed = []

    def src(texts, done):
        try:
            for t in texts:
                yield {"text": t, "token_ids": [0]}
            yield done
        finally:
            closed.append(True)

    # stop "XY" split across deltas: "aX" + "Yb"
    evs = list(openai_api._stop_filter(
        src(["aX", "Yb"], {"done": True, "text": "aXYb",
                           "finish_reason": "length", "tokens": 4}),
        ["XY"]))
    assert "".join(e.get("text", "") for e in evs if not e.get("done")) \
        == "a"
    assert evs[-1]["done"] and evs[-1]["finish_reason"] == "stop"
    assert closed == [True]

    # no match: held-back tail flushes, the real done event passes through
    closed.clear()
    evs = list(openai_api._stop_filter(
        src(["ab", "cd"], {"done": True, "text": "abcd",
                           "finish_reason": "eos", "tokens": 4}),
        ["ZZZ"]))
    assert "".join(e.get("text", "") for e in evs if not e.get("done")) \
        == "abcd"
    assert evs[-1]["finish_reason"] == "eos"


def test_stream_stop_strings_end_to_end(served):
    """stream=true with `stop`: deltas never contain the stop string and
    the stream finishes with 'stop', matching the blocking truncation."""
    _, _, _, srv = served
    full = openai_api.handle_completion(
        srv, {"prompt": "Hello", "max_tokens": 8, "temperature": 0.0})
    text = full["choices"][0]["text"]
    assert len(text) >= 3, "need output to truncate"
    stop = text[1:3]
    evs = list(openai_api.stream_completion(
        srv, {"prompt": "Hello", "max_tokens": 8, "temperature": 0.0,
              "stop": stop, "_timeout": 300}))
    assert evs[-1] == "[DONE]"
    chunks = [e for e in evs[:-1]]
    streamed = "".join(c["choices"][0]["text"] for c in chunks)
    assert streamed == text[:text.find(stop)]
    assert chunks[-1]["choices"][0]["finish_reason"] == "stop"


def test_empty_stop_strings_rejected(served):
    """stop='' would match at position 0 and empty every completion;
    reject it like OpenAI does (blocking and streaming)."""
    _, _, _, srv = served
    with pytest.raises(ValueError, match="non-empty"):
        openai_api.handle_completion(
            srv, {"prompt": "Hi", "max_tokens": 4, "stop": ""})
    with pytest.raises(ValueError, match="non-empty"):
        openai_api.stream_completion(
            srv, {"prompt": "Hi", "max_tokens": 4, "stop": ["ok", ""]})


def test_top_p_collapses_to_greedy(served):
    """top_p near 0 keeps only the argmax: a sampled completion with a
    tiny nucleus equals the greedy one (per-request top-p reaches the
    engine through the OpenAI front)."""
    _, _, _, srv = served
    body = {"prompt": "Hello there", "max_tokens": 6}
    ref = openai_api.handle_completion(
        srv, dict(body, temperature=0.0))
    out = openai_api.handle_completion(
        srv, dict(body, temperature=0.9, top_p=1e-6))
    assert out["choices"][0]["text"] == ref["choices"][0]["text"]

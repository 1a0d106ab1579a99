"""Self-speculative continuous batching (`ServingEngine(draft_layers=N)`,
CLI `serve --draft-layers`): greedy requests advance up to spec_k tokens
per verify pass — token-identical to the plain engine BY CONSTRUCTION —
while sampled rows (T>0) run rejection-verified speculative sampling
(accept d_j with prob min(1, p/q), residual-resample on rejection),
distribution-IDENTICAL to plain sampling per position — the reference's
default decode mode is sampled (run_opus_ddp.py:156-158: do_sample,
T=0.1/top_p=0.7). Beyond-parity: the reference decodes strictly one
token per forward (opus_llama.py:96-132); its only speculation-free
analogue is HF generate."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opus_pllm_tpu.core.config import DecoderConfig, LoRAConfig
from opus_pllm_tpu.lora import lora as lora_mod
from opus_pllm_tpu.models import decoder
from opus_pllm_tpu.serve.engine import ServeRequest, ServingEngine


@pytest.fixture(scope="module")
def tiny():
    cfg = DecoderConfig(family="llama", vocab_size=128, hidden_size=64,
                        intermediate_size=128, num_layers=3, num_heads=4,
                        num_kv_heads=2, head_dim=16, dtype="float32")
    params = decoder.init(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _emb(cfg, seed, p):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal((p, cfg.hidden_size)) * 0.3).astype(
        np.float32)


def _run(params, cfg, reqs, *, max_ticks=300, **kw):
    eng = ServingEngine(params, cfg, max_slots=kw.pop("max_slots", 2),
                        max_len=kw.pop("max_len", 96),
                        prefill_buckets=kw.pop("prefill_buckets", (16,)),
                        **kw)
    return eng.run(list(reqs), max_ticks=max_ticks), eng


def _mk(i, cfg, seed, p, new, **kw):
    return ServeRequest(i, embeds=_emb(cfg, seed, p), max_new_tokens=new,
                        temperature=kw.pop("temperature", 0.0), **kw)


def test_greedy_identity_mixed_lengths(tiny):
    """Core property: every greedy completion equals the plain engine's,
    across mixed prompt lengths and budgets (acceptance boundaries land
    differently per row)."""
    cfg, params = tiny
    reqs = [(100 + i, 5 + 3 * i) for i in range(4)]
    mk = lambda: [_mk(i, cfg, s, p, 5 + 2 * i)
                  for i, (s, p) in enumerate(reqs)]
    plain, _ = _run(params, cfg, mk())
    spec, eng = _run(params, cfg, mk(), draft_layers=1, spec_k=3)
    assert eng.draft_layers == 1
    for i in range(4):
        assert spec[i].tokens == plain[i].tokens, i
        assert spec[i].finish_reason == plain[i].finish_reason == "length"


def test_eos_mid_chunk(tiny):
    """EOS accepted inside a speculative chunk must cut emission exactly
    there (device consumption rule) and report finish_reason='eos'."""
    cfg, params = tiny
    probe, _ = _run(params, cfg, [_mk("p", cfg, 7, 6, 20)])
    eos = probe["p"].tokens[3]   # EOS lands on the 4th generated token
    mk = lambda: [_mk("r", cfg, 7, 6, 20, eos_token_id=eos)]
    plain, _ = _run(params, cfg, mk())
    spec, _ = _run(params, cfg, mk(), draft_layers=2, spec_k=4)
    assert spec["r"].finish_reason == "eos"
    assert spec["r"].tokens == plain["r"].tokens


def test_budget_exhaustion_mid_chunk(tiny):
    """Budgets smaller than / not divisible by spec_k must truncate the
    accepted chunk at the budget, exactly like plain decode."""
    cfg, params = tiny
    budgets = (1, 2, 5, 7)
    mk = lambda: [_mk(i, cfg, 10 + i, 4 + i, b)
                  for i, b in enumerate(budgets)]
    plain, _ = _run(params, cfg, mk(), max_slots=4)
    spec, _ = _run(params, cfg, mk(), max_slots=4, draft_layers=1,
                   spec_k=4)
    for i, b in enumerate(budgets):
        assert spec[i].tokens == plain[i].tokens
        assert len(spec[i].tokens) == b


def test_mixed_sampled_and_greedy(tiny):
    """Sampled rows speculate via rejection verification without
    disturbing greedy rows' token identity."""
    cfg, params = tiny
    greedy = [_mk(0, cfg, 0, 5, 8), _mk(1, cfg, 1, 9, 6)]
    plain, _ = _run(params, cfg, greedy, max_slots=4)
    mk_all = lambda: [_mk(0, cfg, 0, 5, 8), _mk(1, cfg, 1, 9, 6),
                      _mk(2, cfg, 2, 7, 10, temperature=0.8),
                      _mk(3, cfg, 3, 4, 7, temperature=0.9, top_p=0.7)]
    spec, _ = _run(params, cfg, mk_all(), max_slots=4, draft_layers=1,
                   spec_k=3)
    for i in (0, 1):
        assert spec[i].tokens == plain[i].tokens, i
    for i in (2, 3):
        assert spec[i].finish_reason == "length"
        assert len(spec[i].tokens) == (10 if i == 2 else 7)
        assert all(0 <= t < cfg.vocab_size for t in spec[i].tokens)


def test_full_acceptance_when_upper_layers_are_identity(tiny):
    """Zero the attention/MLP output projections of every layer past the
    draft depth: those layers become residual no-ops, the draft equals the
    target, every proposal verifies, and each greedy row consumes spec_k
    tokens per iteration — the acceptance fast path, observable as a tick
    count ~budget/spec_k instead of ~budget."""
    cfg, params = tiny
    p2 = dict(params)
    p2["layers"] = list(params["layers"][:1]) + [
        {**lyr, "o_proj": {"kernel": jnp.zeros_like(lyr["o_proj"]["kernel"])},
         "down_proj": {"kernel": jnp.zeros_like(lyr["down_proj"]["kernel"])}}
        for lyr in params["layers"][1:]]
    mk = lambda: [_mk("r", cfg, 5, 6, 12)]
    plain, _ = _run(p2, cfg, mk())
    spec, eng = _run(p2, cfg, mk(), draft_layers=1, spec_k=4)
    assert spec["r"].tokens == plain["r"].tokens
    # 12 tokens: 1 from prefill + ceil(11/4) = 3 full-acceptance verify
    # iterations (+1 tick of admission); plain needs 11 decode ticks
    assert eng._tick <= 5, eng._tick


def test_stacked_layout(tiny):
    cfg, params = tiny
    stacked = decoder.stack_params(params)
    mk = lambda: [_mk(i, cfg, 20 + i, 5 + i, 6) for i in range(3)]
    plain, _ = _run(stacked, cfg, mk(), max_slots=4)
    spec, _ = _run(stacked, cfg, mk(), max_slots=4, draft_layers=2,
                   spec_k=3)
    for i in range(3):
        assert spec[i].tokens == plain[i].tokens, i


def test_quantized_cache(tiny):
    """Spec over the int8 KV cache: draft reads the quantized first-N
    slice, verify writes quantized KV — identity holds vs the plain int8
    engine."""
    cfg, params = tiny
    mk = lambda: [_mk(i, cfg, 30 + i, 6, 7) for i in range(2)]
    plain, _ = _run(params, cfg, mk(), quantize_cache="int8")
    spec, _ = _run(params, cfg, mk(), quantize_cache="int8",
                   draft_layers=1, spec_k=3)
    for i in range(2):
        assert spec[i].tokens == plain[i].tokens, i


def test_adapters(tiny):
    """Per-slot LoRA gathers slice to the draft depth as well: adapter
    rows speculate with their own adapter in both draft and verify."""
    cfg, params = tiny
    lcfg = LoRAConfig(rank=4, alpha=8.0)
    t = lora_mod.init(jax.random.PRNGKey(11), cfg, lcfg)
    t = jax.tree.map(
        lambda x: x if x.shape[-1] == lcfg.rank else
        0.3 * jax.random.normal(jax.random.PRNGKey(21), x.shape), t)
    bank = {"a": t}
    s = lora_mod.scaling(lcfg)
    mk = lambda: [_mk(0, cfg, 40, 5, 6, adapter_id="a"),
                  _mk(1, cfg, 41, 8, 6)]
    plain, _ = _run(params, cfg, mk(), lora_bank=bank, lora_scale=s)
    spec, _ = _run(params, cfg, mk(), lora_bank=bank, lora_scale=s,
                   draft_layers=1, spec_k=3)
    assert plain[0].tokens != plain[1].tokens or True  # smoke ordering
    for i in range(2):
        assert spec[i].tokens == plain[i].tokens, i


def test_prefix_cache(tiny):
    """Pinned-prefix admissions compose with speculative decode ticks."""
    cfg, params = tiny
    pref = _emb(cfg, 50, 12)
    sufs = [_emb(cfg, 51 + i, 4) for i in range(2)]
    full = [ServeRequest(i, embeds=np.concatenate([pref, s]),
                         max_new_tokens=6, temperature=0.0)
            for i, s in enumerate(sufs)]
    plain, _ = _run(params, cfg, full, prefill_buckets=(16,), max_len=96)

    eng = ServingEngine(params, cfg, max_slots=2, max_len=96,
                        prefill_buckets=(16,), draft_layers=1, spec_k=3)
    eng.register_prefix("sys", embeds=pref)
    done = eng.run([ServeRequest(i, embeds=s, max_new_tokens=6,
                                 temperature=0.0, prefix_id="sys")
                    for i, s in enumerate(sufs)], max_ticks=200)
    for i in range(2):
        assert done[i].tokens == plain[i].tokens, i


def test_chunked_prefill(tiny):
    """Prompts longer than the largest bucket admit in chunks while other
    slots speculate; results match the plain chunked engine."""
    cfg, params = tiny
    mk = lambda: [_mk(0, cfg, 60, 40, 6), _mk(1, cfg, 61, 6, 8)]
    plain, _ = _run(params, cfg, mk(), prefill_buckets=(8,),
                    chunk_prefill=16, max_len=96)
    spec, _ = _run(params, cfg, mk(), prefill_buckets=(8,),
                   chunk_prefill=16, max_len=96, draft_layers=1, spec_k=3)
    for i in range(2):
        assert spec[i].tokens == plain[i].tokens, i


def test_steps_per_tick(tiny):
    """Multiple spec iterations per compiled tick (scan over spec_one)."""
    cfg, params = tiny
    mk = lambda: [_mk(i, cfg, 70 + i, 5, 9) for i in range(2)]
    plain, _ = _run(params, cfg, mk())
    spec, _ = _run(params, cfg, mk(), draft_layers=1, spec_k=3,
                   steps_per_tick=3)
    for i in range(2):
        assert spec[i].tokens == plain[i].tokens, i


def test_adaptive_falls_back_on_low_acceptance(tiny):
    """Random weights accept ~1/vocab of proposals (~1.0 tokens/iter);
    the adaptive engine must fall back to plain ticks (the EMA drops
    under the 1 + (K-1)*N/L cost threshold) while staying
    token-identical."""
    cfg, params = tiny
    mk = lambda: [_mk(i, cfg, 90 + i, 5, 20) for i in range(2)]
    plain, _ = _run(params, cfg, mk())
    spec, eng = _run(params, cfg, mk(), draft_layers=1, spec_k=4)
    assert eng.spec_adaptive
    assert not eng._spec_on, "engine kept speculating at ~zero acceptance"
    for i in range(2):
        assert spec[i].tokens == plain[i].tokens, i


def test_adaptive_stays_on_full_acceptance(tiny):
    """Identity upper layers accept everything; the engine must keep
    speculating."""
    cfg, params = tiny
    p2 = dict(params)
    p2["layers"] = list(params["layers"][:1]) + [
        {**lyr, "o_proj": {"kernel": jnp.zeros_like(lyr["o_proj"]["kernel"])},
         "down_proj": {"kernel": jnp.zeros_like(lyr["down_proj"]["kernel"])}}
        for lyr in params["layers"][1:]]
    _, eng = _run(p2, cfg, [_mk("r", cfg, 5, 6, 20)], draft_layers=1,
                  spec_k=4)
    assert eng._spec_on
    assert eng._spec_ema is not None and eng._spec_ema > 3.0


def test_adaptive_probe_recovers(tiny):
    """A fallen-back engine re-probes with one spec tick and turns
    speculation back on when the probe's acceptance clears the bar."""
    cfg, params = tiny
    p2 = dict(params)
    p2["layers"] = list(params["layers"][:1]) + [
        {**lyr, "o_proj": {"kernel": jnp.zeros_like(lyr["o_proj"]["kernel"])},
         "down_proj": {"kernel": jnp.zeros_like(lyr["down_proj"]["kernel"])}}
        for lyr in params["layers"][1:]]
    plain, _ = _run(p2, cfg, [_mk("r", cfg, 5, 6, 24)])
    eng = ServingEngine(p2, cfg, max_slots=2, max_len=96,
                        prefill_buckets=(16,), draft_layers=1, spec_k=4)
    eng._spec_on = False           # simulate a prior fallback
    eng._spec_probe_in = 2
    eng.submit(_mk("r", cfg, 5, 6, 24))
    out = {}
    ticks = 0
    while eng.busy and ticks < 300:
        for c in eng.step():
            out[c.request_id] = c
        ticks += 1
    assert eng._spec_on, "probe never re-enabled speculation"
    assert out["r"].tokens == plain["r"].tokens


def _tv(a, b, v):
    """Total-variation distance between two empirical token samples."""
    ha = np.bincount(a, minlength=v) / max(len(a), 1)
    hb = np.bincount(b, minlength=v) / max(len(b), 1)
    return 0.5 * np.abs(ha - hb).sum()


def test_accept_and_emit_matches_target_distribution():
    """Monte-Carlo exactness of the rejection-verified acceptance rule
    (infer/speculative.accept_and_emit): with proposals drawn from q, the
    emitted token at position 0 must be distributed EXACTLY as the target
    p_0 — q(x)min(1, p/q) + P[reject]*residual(x) = p(x) — and the
    position-1 emission, conditioned on reaching it, as p_1. This is the
    theorem that makes speculative sampling output-identical to plain
    sampling; 40k trials pin the TV distance to sampling noise."""
    from opus_pllm_tpu.infer.speculative import accept_and_emit

    V, K, n = 10, 4, 40000
    rng = np.random.default_rng(0)
    # fixed, deliberately mismatched p and q (unnormalized logits)
    p = jax.nn.softmax(jnp.asarray(rng.standard_normal((K, V)) * 1.5))
    q = jax.nn.softmax(jnp.asarray(rng.standard_normal((K - 1, V)) * 1.5))
    p_b = jnp.broadcast_to(p, (n, K, V))
    q_b = jnp.broadcast_to(q, (n, K - 1, V))

    kp, ka = jax.random.split(jax.random.PRNGKey(1))
    # proposals ~ q, independently per trial and position
    props = jax.vmap(
        lambda k: jax.random.categorical(k, jnp.log(q), axis=-1)
    )(jax.random.split(kp, n)).astype(jnp.int32)          # (n, K-1)
    v = jnp.argmax(p_b, axis=-1).astype(jnp.int32)        # unused: sampled
    emit, n_emit = jax.vmap(
        lambda pr, key: accept_and_emit(pr[None], q_b[:1], v[:1], p_b[:1],
                                        jnp.zeros((1,), bool), key)
    )(props, jax.random.split(ka, n))
    emit = np.asarray(emit)[:, 0]                          # (n, K)
    n_emit = np.asarray(n_emit)[:, 0]

    # position 0: unconditional marginal == p[0]
    h0 = np.bincount(emit[:, 0], minlength=V) / n
    assert 0.5 * np.abs(h0 - np.asarray(p[0])).sum() < 0.02
    # position 1: conditioned on the first proposal being accepted
    sel = emit[n_emit >= 2, 1]
    assert len(sel) > n // 10                # acceptance actually happens
    h1 = np.bincount(sel, minlength=V) / len(sel)
    assert 0.5 * np.abs(h1 - np.asarray(p[1])).sum() < 0.03
    # rejections happen too (mismatched q): not a degenerate always-accept
    assert (n_emit == 1).sum() > n // 20


@pytest.fixture(scope="module")
def small_vocab():
    cfg = DecoderConfig(family="llama", vocab_size=32, hidden_size=32,
                        intermediate_size=64, num_layers=3, num_heads=2,
                        num_kv_heads=2, head_dim=16, dtype="float32")
    params = decoder.init(jax.random.PRNGKey(4), cfg)
    return cfg, params


def test_sampled_statistical_equivalence(small_vocab):
    """Engine-level distribution identity: per-position token marginals of
    the speculative engine (T=0.6/top_p=0.9, spec forced on) match the
    plain engine's over ~1200 independent completions of the same prompt.
    Deterministic (fixed key streams) — thresholds sit ~2x above the
    observed sampling noise of two empirical distributions this size."""
    cfg, params = small_vocab
    slots, p, new = 8, 6, 4
    emb = _emb(cfg, 321, p)

    def collect(**kw):
        eng = ServingEngine(params, cfg, max_slots=slots, max_len=32,
                            prefill_buckets=(8,), **kw)
        toks, ticks = [], 0
        for rep in range(150):
            eng.reseed(1000 + rep)
            done = eng.run(
                [ServeRequest((rep, i), embeds=emb, max_new_tokens=new,
                              temperature=0.6, top_p=0.9)
                 for i in range(slots)], max_ticks=100)
            toks.extend(c.tokens for c in done.values())
            ticks += eng._tick
        return np.asarray(toks), ticks, eng

    plain, _, _ = collect()
    spec, _, eng = collect(draft_layers=1, spec_k=3, spec_adaptive=False)
    assert plain.shape == spec.shape == (150 * slots, new)
    # speculation genuinely ran and accepted beyond one token/iteration
    assert eng._spec_ema is not None and eng._spec_ema > 1.02, eng._spec_ema
    # positions 1.. are spec-emitted in the spec engine (position 0 comes
    # from the shared prefill sampler); marginals must agree
    for j in range(new):
        d = _tv(plain[:, j], spec[:, j], cfg.vocab_size)
        assert d < 0.11, (j, d)


def test_validation(tiny):
    cfg, params = tiny
    with pytest.raises(ValueError, match="draft_layers"):
        ServingEngine(params, cfg, draft_layers=cfg.num_layers)
    with pytest.raises(ValueError, match="spec_k"):
        ServingEngine(params, cfg, draft_layers=1, spec_k=1)


def test_mid_stream_admission_and_cancel(tiny):
    """Host-side mutations (admission of a new request, cancel) drain the
    spec pipeline first; survivors keep greedy identity."""
    cfg, params = tiny
    a, b = _mk("a", cfg, 80, 5, 10), _mk("b", cfg, 81, 7, 6)
    plain, _ = _run(params, cfg, [a, b], max_slots=1)

    eng = ServingEngine(params, cfg, max_slots=1, max_len=96,
                        prefill_buckets=(16,), draft_layers=1, spec_k=3)
    eng.submit(_mk("a", cfg, 80, 5, 10))
    out = {}
    for _ in range(3):
        for c in eng.step():
            out[c.request_id] = c
    eng.submit(_mk("b", cfg, 81, 7, 6))
    eng.submit(_mk("dead", cfg, 82, 4, 50))
    assert eng.cancel("dead")
    ticks = 0
    while eng.busy and ticks < 300:
        for c in eng.step():
            out[c.request_id] = c
        ticks += 1
    assert out["a"].tokens == plain["a"].tokens
    assert out["b"].tokens == plain["b"].tokens
    assert out["dead"].finish_reason == "cancelled"

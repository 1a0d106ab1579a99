"""Multi-LoRA serving: per-request adapters gathered from one bank inside
the compiled decode/prefill steps. Each adapter's output in a MIXED batch
must equal a base-only engine running that adapter merged into the weights
(PEFT merge semantics) — the reference's ablation protocol reloads the
model per adapter (eval_total_ablation.sh); here the per-task adapters
serve concurrently from one base."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opus_pllm_tpu.core.config import DecoderConfig, LoRAConfig
from opus_pllm_tpu.lora import lora as lora_mod
from opus_pllm_tpu.models import decoder
from opus_pllm_tpu.serve.engine import ServeRequest, ServingEngine


@pytest.fixture(scope="module")
def setup():
    cfg = DecoderConfig(family="llama", vocab_size=128, hidden_size=64,
                        intermediate_size=128, num_layers=2, num_heads=4,
                        num_kv_heads=2, head_dim=16, dtype="float32")
    params = decoder.init(jax.random.PRNGKey(0), cfg)
    lcfg = LoRAConfig(rank=4, alpha=8.0)
    adapters = {}
    for i, name in enumerate(("loc", "go")):
        t = lora_mod.init(jax.random.PRNGKey(10 + i), cfg, lcfg)
        # PEFT-init B is zero (exact no-op) — randomize it so each
        # adapter actually changes the generation
        t = jax.tree.map(
            lambda x: x if x.shape[-1] == lcfg.rank else
            0.3 * jax.random.normal(jax.random.PRNGKey(20 + i), x.shape),
            t)
        adapters[name] = t
    return cfg, params, lcfg, adapters


def _emb(cfg, seed, p):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal((p, cfg.hidden_size)) * 0.3).astype(
        np.float32)


def _run_single(params, cfg, emb, max_new):
    """Base-only engine, one request — the merged-weights reference."""
    eng = ServingEngine(params, cfg, max_slots=2, max_len=64,
                        prefill_buckets=(16,))
    done = eng.run([ServeRequest(0, embeds=emb, max_new_tokens=max_new,
                                 temperature=0.0)], max_ticks=100)
    return done[0].tokens


def test_mixed_adapters_match_merged_weights(setup):
    cfg, params, lcfg, adapters = setup
    s = lora_mod.scaling(lcfg)
    prompts = {name: _emb(cfg, i, 5 + 3 * i)
               for i, name in enumerate((None, "loc", "go"))}
    refs = {}
    refs[None] = _run_single(params, cfg, prompts[None], 6)
    for name in ("loc", "go"):
        merged = lora_mod.merge(params, adapters[name], lcfg)
        refs[name] = _run_single(merged, cfg, prompts[name], 6)
    # adapters must actually matter, or this test proves nothing
    assert refs["loc"] != refs[None] or refs["go"] != refs[None]

    eng = ServingEngine(params, cfg, max_slots=4, max_len=64,
                        prefill_buckets=(16,), lora_bank=adapters,
                        lora_scale=s)
    done = eng.run([ServeRequest(name, embeds=prompts[name],
                                 max_new_tokens=6, temperature=0.0,
                                 adapter_id=name)
                    for name in (None, "loc", "go")], max_ticks=100)
    for name, ref in refs.items():
        assert done[name].tokens == ref, (name, done[name].tokens, ref)


def test_adapters_match_merged_on_stacked_params(setup):
    """Same parity through the lax.scan (stacked-layers) decode path."""
    cfg, params, lcfg, adapters = setup
    s = lora_mod.scaling(lcfg)
    emb = _emb(cfg, 7, 9)
    merged = lora_mod.merge(params, adapters["go"], lcfg)
    ref = _run_single(decoder.stack_params(merged), cfg, emb, 5)

    stacked = decoder.stack_params(jax.tree.map(lambda x: x, params))
    eng = ServingEngine(stacked, cfg, max_slots=2, max_len=64,
                        prefill_buckets=(16,), lora_bank=adapters,
                        lora_scale=s)
    done = eng.run([ServeRequest(0, embeds=emb, max_new_tokens=5,
                                 temperature=0.0, adapter_id="go")],
                   max_ticks=100)
    assert done[0].tokens == ref


def test_unknown_adapter_rejected(setup):
    cfg, params, lcfg, adapters = setup
    eng = ServingEngine(params, cfg, max_slots=2, max_len=64,
                        prefill_buckets=(16,), lora_bank=adapters)
    with pytest.raises(ValueError, match="unknown adapter"):
        eng.submit(ServeRequest(0, embeds=_emb(cfg, 0, 5),
                                max_new_tokens=4, adapter_id="nope"))
    # and without a bank, any adapter id is unknown
    eng2 = ServingEngine(params, cfg, max_slots=2, max_len=64,
                         prefill_buckets=(16,))
    with pytest.raises(ValueError, match="unknown adapter"):
        eng2.submit(ServeRequest(0, embeds=_emb(cfg, 0, 5),
                                 max_new_tokens=4, adapter_id="loc"))


def test_http_server_routes_adapters(setup):
    """The HTTP front's {"adapter": name} selects a bank adapter: output
    equals a server running that adapter merged into the base weights,
    and unknown names reject cleanly through the engine thread."""
    from opus_pllm_tpu.core.config import OpusConfig
    from opus_pllm_tpu.infer.tokenization import ByteTokenizer
    from opus_pllm_tpu.models import opus
    from opus_pllm_tpu.serve.server import OpusServer

    ocfg = OpusConfig.tiny("llama")
    oparams = opus.init(jax.random.PRNGKey(0), ocfg)
    lcfg = LoRAConfig(rank=4, alpha=8.0)
    t = lora_mod.init(jax.random.PRNGKey(11), ocfg.llm, lcfg)
    t = jax.tree.map(
        lambda x: x if x.shape[-1] == lcfg.rank else
        0.3 * jax.random.normal(jax.random.PRNGKey(21), x.shape), t)
    tok = ByteTokenizer()
    body = {"instruction": "Name the function.", "sequence": "MKTAYIAKQR",
            "max_new_tokens": 6, "temperature": 0.0, "_timeout": 300}

    merged = dict(oparams)
    merged["llm"] = lora_mod.merge(oparams["llm"], t, lcfg)
    ref_srv = OpusServer(merged, ocfg, tok, max_slots=2, max_len=512,
                         prefill_buckets=(64, 128, 256, 384),
                         default_max_new=8)
    try:
        ref = ref_srv.handle_annotate(dict(body))
    finally:
        ref_srv.close()

    srv = OpusServer(oparams, ocfg, tok, max_slots=2, max_len=512,
                     prefill_buckets=(64, 128, 256, 384), default_max_new=8,
                     lora_bank={"fn": t}, lora_scale=lora_mod.scaling(lcfg))
    try:
        out = srv.handle_annotate(dict(body, adapter="fn"))
        base = srv.handle_annotate(dict(body))
        assert out["text"] == ref["text"]
        assert base["text"] != out["text"] or base["tokens"] != out["tokens"]
        with pytest.raises(ValueError, match="unknown adapter"):
            srv.handle_annotate(dict(body, adapter="nope"))
    finally:
        srv.close()


def test_load_peft_adapter_roundtrip(tmp_path, setup):
    """lora_to_peft -> on-disk PEFT dir -> load_peft_adapter reproduces
    the tree and its adapter_config scaling."""
    import json

    from safetensors.numpy import save_file

    from opus_pllm_tpu.core import builder, convert

    cfg, params, lcfg, adapters = setup
    sd = convert.lora_to_peft(adapters["loc"], family="llama")
    d = tmp_path / "lora_adapter"
    d.mkdir()
    save_file({k: np.asarray(v) for k, v in sd.items()},
              str(d / "adapter_model.safetensors"))
    (d / "adapter_config.json").write_text(
        json.dumps({"lora_alpha": lcfg.alpha, "r": lcfg.rank}))

    # accepts the weights dir (contains lora_adapter/) or the dir itself
    tree, scale = builder.load_peft_adapter(str(tmp_path), cfg.num_layers)
    assert scale == lora_mod.scaling(lcfg)
    for got, want in zip(jax.tree.leaves(tree),
                         jax.tree.leaves(adapters["loc"])):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-6)


def test_rank_mismatch_rejected(setup):
    cfg, params, lcfg, adapters = setup
    other = lora_mod.init(jax.random.PRNGKey(9), cfg,
                          LoRAConfig(rank=8, alpha=16.0))
    with pytest.raises(ValueError, match="rank"):
        lora_mod.make_bank({"a": adapters["loc"], "b": other})


def test_nonuniform_layers_named_error(setup):
    """A layers_to_transform-style adapter (some layers untargeted) gets a
    named error, not a raw jax tree-structure mismatch."""
    cfg, params, lcfg, adapters = setup
    partial = {"layers": [dict(adapters["loc"]["layers"][0]), {}]}
    with pytest.raises(ValueError, match="'partial' layer 1"):
        lora_mod.make_bank({"partial": partial})


def test_load_peft_adapter_requires_config(tmp_path, setup):
    """A bank adapter dir without adapter_config.json refuses instead of
    silently folding the fallback 2.0 scaling into B."""
    import numpy as np
    from safetensors.numpy import save_file

    from opus_pllm_tpu.core import builder, convert

    cfg, params, lcfg, adapters = setup
    sd = convert.lora_to_peft(adapters["loc"], family="llama")
    d = tmp_path / "lora_adapter"
    d.mkdir()
    save_file({k: np.asarray(v) for k, v in sd.items()},
              str(d / "adapter_model.safetensors"))
    with pytest.raises(ValueError, match="adapter_config.json"):
        builder.load_peft_adapter(str(tmp_path), cfg.num_layers)


def test_runtime_adapter_add_remove(setup):
    """Dynamic adapter management: an adapter installed into a spare bank
    row at runtime (no recompile — bank shapes fixed at construction)
    generates exactly like a statically-banked engine; removal frees the
    row and is refused while requests use it."""
    cfg, params, lcfg, adapters = setup
    s = lora_mod.scaling(lcfg)
    emb = _emb(cfg, 7, 6)

    static = ServingEngine(params, cfg, max_slots=2, max_len=64,
                           prefill_buckets=(16,), lora_bank=adapters,
                           lora_scale=s)
    ref = static.run([ServeRequest(0, embeds=emb, max_new_tokens=6,
                                   temperature=0.0, adapter_id="go")],
                     max_ticks=100)[0].tokens

    # start with only "loc" + 3 spare rows, install "go" at runtime
    eng = ServingEngine(params, cfg, max_slots=2, max_len=64,
                        prefill_buckets=(16,),
                        lora_bank={"loc": adapters["loc"]},
                        lora_scale=s, adapter_capacity=4)
    assert eng.adapter_capacity == 4 and eng.adapters == ("loc",)
    shapes_before = [x.shape for x in jax.tree.leaves(eng._lora_bank)]
    # "go" was folded at bank scale s in the static engine; fold the same
    # way here (runtime adds go through fold_scaling in the server)
    go = lora_mod.fold_scaling(adapters["go"], 1.0)   # engine lora_scale=s
    eng.add_adapter("go", go)
    assert [x.shape for x in jax.tree.leaves(eng._lora_bank)] == \
        shapes_before, "bank shapes must not change (no recompile)"
    out = eng.run([ServeRequest(0, embeds=emb, max_new_tokens=6,
                                temperature=0.0, adapter_id="go")],
                  max_ticks=100)[0].tokens
    assert out == ref

    # duplicate name / unknown removal / capacity errors are loud
    with pytest.raises(ValueError, match="already serves"):
        eng.add_adapter("go", go)
    with pytest.raises(ValueError, match="unknown adapter"):
        eng.remove_adapter("nope")
    # in-use removal refused
    eng.submit(ServeRequest(1, embeds=emb, max_new_tokens=4,
                            temperature=0.0, adapter_id="go"))
    with pytest.raises(ValueError, match="in-flight"):
        eng.remove_adapter("go")
    while eng.busy:
        eng.step()
    eng.remove_adapter("go")
    assert eng.adapters == ("loc",)
    # the freed row is zero again: base request == no-adapter reference
    base_ref = _run_single(params, cfg, emb, 6)
    out = eng.run([ServeRequest(2, embeds=emb, max_new_tokens=6,
                                temperature=0.0)], max_ticks=100)[2].tokens
    assert out == base_ref

    # fill remaining capacity, then overflow errors
    for i in range(3):
        eng.add_adapter(f"a{i}", go)
    with pytest.raises(ValueError, match="full"):
        eng.add_adapter("overflow", go)

"""Engine-backed annotation eval (runner.run_annotation_eval_engine):
T=0 results and metrics identical to the static-batch runner, mixed
per-example prompt lengths pack correctly, and guardrails reject
unsupported sampling modes."""

import jax
import pytest

from opus_pllm_tpu.core.config import GenerationConfig, OpusConfig
from opus_pllm_tpu.evals import runner
from opus_pllm_tpu.evals.datasets import AnnotationExample
from opus_pllm_tpu.infer.tokenization import ByteTokenizer
from opus_pllm_tpu.models import opus


@pytest.fixture(scope="module")
def setup():
    cfg = OpusConfig.tiny("llama")
    params = opus.init(jax.random.PRNGKey(0), cfg)
    tok = ByteTokenizer()
    # mixed instruction/sequence lengths so prompts land in different
    # buckets and finish at different ticks
    examples = [
        AnnotationExample(instruction="What is the subcellular location?",
                          sequence="MKTAYIAKQR", output="membrane"),
        AnnotationExample(instruction="Name the function.",
                          sequence="MKTAYIAKQRMKTAYIAKQR", output="enzyme"),
        AnnotationExample(instruction="Predict the EC number for this "
                          "enzyme sequence as precisely as possible.",
                          sequence="MKTAY", output="1.1.1.1"),
        AnnotationExample(instruction="Keywords?",
                          sequence="ACDEFGHIKLMNPQRSTVWY", output="binding"),
        AnnotationExample(instruction="Where is it located in the cell?",
                          sequence="MKTAYIAKQRACDEFG", output="nucleus"),
    ]
    return cfg, params, tok, examples


def _gen(tok, n=8):
    return GenerationConfig(max_new_tokens=n, temperature=0.0,
                            eos_token_id=tok.eos_token_id,
                            pad_token_id=tok.pad_token_id)


def test_engine_eval_matches_static_runner(setup):
    cfg, params, tok, examples = setup
    static = runner.run_annotation_eval(
        params, cfg, tok, "mini_localization.json", gen=_gen(tok),
        batch_size=2, examples=list(examples))
    eng = runner.run_annotation_eval_engine(
        params, cfg, tok, "mini_localization.json", gen=_gen(tok),
        max_slots=3, steps_per_tick=2, splice_batch=2,
        examples=list(examples))
    assert [r["generated"] for r in eng.results] == \
        [r["generated"] for r in static.results]
    assert [r["ground_truth"] for r in eng.results] == \
        [r["ground_truth"] for r in static.results]
    assert eng.metrics == static.metrics


def test_engine_eval_accepts_reference_default_sampling(setup):
    """The engine path must run the reference's default decode mode
    T=0.1/top_p=0.7 (run_opus_ddp.py:156-158) — round-3 verdict weak #4
    lifted the temperature-only restriction. Top-p semantics themselves
    are asserted token-for-token in test_serve.py::test_serve_top_p."""
    cfg, params, tok, examples = setup
    gen = GenerationConfig(max_new_tokens=4, temperature=0.1, top_p=0.7,
                           eos_token_id=tok.eos_token_id,
                           pad_token_id=tok.pad_token_id)
    rep = runner.run_annotation_eval_engine(
        params, cfg, tok, "mini_localization.json", gen=gen,
        examples=list(examples))
    assert len(rep.results) == len(examples)
    assert all(isinstance(r["generated"], str) for r in rep.results)


def test_engine_eval_adapter_matches_merged_static(setup):
    """lora_bank + adapter_id: the whole set under one bank adapter equals
    the static runner on that adapter MERGED into the weights — the
    ablation protocol's per-task eval without the per-adapter reload."""
    from opus_pllm_tpu.core.config import LoRAConfig
    from opus_pllm_tpu.lora import lora as lora_mod

    cfg, params, tok, examples = setup
    lcfg = LoRAConfig(rank=4, alpha=8.0)
    t = lora_mod.init(jax.random.PRNGKey(3), cfg.llm, lcfg)
    t = jax.tree.map(
        lambda x: x if x.shape[-1] == lcfg.rank else
        0.3 * jax.random.normal(jax.random.PRNGKey(13), x.shape), t)
    merged = dict(params)
    merged["llm"] = lora_mod.merge(params["llm"], t, lcfg)
    static = runner.run_annotation_eval(
        merged, cfg, tok, "mini_localization.json", gen=_gen(tok),
        batch_size=2, examples=list(examples))
    base_static = runner.run_annotation_eval(
        params, cfg, tok, "mini_localization.json", gen=_gen(tok),
        batch_size=2, examples=list(examples))
    assert [r["generated"] for r in static.results] != \
        [r["generated"] for r in base_static.results], \
        "adapter must change the output or this test proves nothing"

    bank = {"localization": lora_mod.fold_scaling(t, lora_mod.scaling(lcfg))}
    eng = runner.run_annotation_eval_engine(
        params, cfg, tok, "mini_localization.json", gen=_gen(tok),
        max_slots=3, steps_per_tick=2, splice_batch=2,
        examples=list(examples), lora_bank=bank, adapter_id="localization")
    assert [r["generated"] for r in eng.results] == \
        [r["generated"] for r in static.results]
    assert eng.metrics == static.metrics


def test_mcq_engine_matches_static_runner(setup):
    """run_mcq_eval_engine: T=0 results, accuracy, and option histogram
    identical to the static MCQ runner (same ChatML prompt rendering)."""
    from opus_pllm_tpu.evals.datasets import MCQExample

    cfg, params, tok, _ = setup
    examples = [
        MCQExample(question="What is the catalytic residue?",
                   options=["Serine", "Histidine", "Cysteine", "Lysine"],
                   sequence="MKTAYIAKQR", answer="A"),
        MCQExample(question="Which compartment hosts this protein?",
                   options=["Nucleus", "Membrane", "Cytosol", "Golgi"],
                   sequence="ACDEFGHIKLMNPQRSTVWY", answer="B"),
        MCQExample(question="Pick the cofactor.",
                   options=["Zn", "Mg", "Fe", "Cu"],
                   sequence="MKTAY", answer="C"),
    ]
    static = runner.run_mcq_eval(
        params, cfg, tok, "mini_mcq.json", gen=_gen(tok), batch_size=2,
        examples=list(examples))
    eng = runner.run_mcq_eval_engine(
        params, cfg, tok, "mini_mcq.json", gen=_gen(tok),
        max_slots=2, steps_per_tick=2, splice_batch=2,
        examples=list(examples))
    assert [r["generated"] for r in eng.results] == \
        [r["generated"] for r in static.results]
    assert eng.metrics == static.metrics


def test_adapter_for_set_matching():
    """annotate-all maps each test set to the unique adapter whose name
    is a substring of the basename; ambiguity refuses."""
    from opus_pllm_tpu.cli.main import _adapter_for

    names = {"localization": 1, "function": 2}
    assert _adapter_for(names, "/d/test_localization_x.json") == \
        "localization"
    assert _adapter_for(names, "/d/test_go_terms.json") is None
    with pytest.raises(SystemExit, match="multiple adapters"):
        _adapter_for({"go", "go_bp"}, "/d/test_go_bp.json")


def test_adapter_map_upfront_and_overrides(capsys):
    """The full set->adapter mapping computes/prints before the model
    load; --map resolves ambiguity, forces base weights, and rejects
    unknown adapter or set names."""
    from opus_pllm_tpu.cli.main import _adapter_map

    names = {"go", "go_bp", "loc"}
    sets = ["/d/test_go.json", "/d/test_go_bp.json", "/d/test_loc.json"]
    # unresolved ambiguity (test_go_bp matches go AND go_bp) fails fast
    with pytest.raises(SystemExit, match="multiple adapters"):
        _adapter_map(names, sets, None)
    m = _adapter_map(names, sets, ["test_go_bp.json=go_bp",
                                   "test_loc.json="])
    assert m == {"/d/test_go.json": "go",
                 "/d/test_go_bp.json": "go_bp",
                 "/d/test_loc.json": None}   # forced base weights
    out = capsys.readouterr().out
    assert "test_go.json: adapter go" in out
    assert "test_loc.json: adapter <base weights>" in out
    with pytest.raises(SystemExit, match="not a bank adapter"):
        _adapter_map(names, sets, ["test_go_bp.json=nope"])
    with pytest.raises(SystemExit, match="not in --test-jsons"):
        _adapter_map(names, sets, ["other.json=go"])


def test_adapter_specs_validation(tmp_path):
    """Duplicate --adapter names and missing paths refuse pre-load."""
    import argparse

    from opus_pllm_tpu.cli.main import _adapter_specs

    d = str(tmp_path)
    ns = argparse.Namespace(adapter=[f"go={d}", f"go={d}"])
    with pytest.raises(SystemExit, match="duplicate"):
        _adapter_specs(ns)
    ns = argparse.Namespace(adapter=["go=/no/such/dir"])
    with pytest.raises(SystemExit, match="no such directory"):
        _adapter_specs(ns)
    ns = argparse.Namespace(adapter=[f"go={d}"])
    assert _adapter_specs(ns) == {"go": d}


def test_engine_cache_reuses_engine(setup):
    """annotate-all's engine_cache: the second run of the same workload
    shape reuses the SAME engine (no recompile) and still matches."""
    cfg, params, tok, examples = setup
    cache = {}
    r1 = runner.run_annotation_eval_engine(
        params, cfg, tok, "mini_localization.json", gen=_gen(tok),
        max_slots=3, splice_batch=2, examples=list(examples),
        engine_cache=cache)
    assert len(cache) == 1
    eng = next(iter(cache.values()))
    r2 = runner.run_annotation_eval_engine(
        params, cfg, tok, "mini_localization.json", gen=_gen(tok),
        max_slots=3, splice_batch=2, examples=list(examples),
        engine_cache=cache)
    assert cache and next(iter(cache.values())) is eng
    assert [r["generated"] for r in r1.results] == \
        [r["generated"] for r in r2.results]


def test_annotate_parser_adapter_flags():
    from opus_pllm_tpu.cli.main import build_parser

    p = build_parser()
    args = p.parse_args(["annotate", "--test-json", "t.json", "--engine",
                         "--adapter", "loc=/a", "--use-adapter", "loc"])
    assert args.adapter == ["loc=/a"] and args.use_adapter == "loc"
    args = p.parse_args(["annotate-all", "--test-jsons", "a.json", "b.json",
                         "--engine", "--adapter", "loc=/a",
                         "--adapter", "go=/b"])
    assert args.adapter == ["loc=/a", "go=/b"] and args.engine


def test_engine_eval_cache_prefix_token_identical(setup):
    """--cache-prefix: the run's common prompt header (the professor
    preamble) prefills once and every request admits suffix-only —
    results identical to the full-admission engine eval."""
    cfg, params, tok, examples = setup
    full = runner.run_annotation_eval_engine(
        params, cfg, tok, "test_localization.json", gen=_gen(tok),
        max_slots=4, splice_batch=2, examples=examples,
        log_fn=lambda *a: None)
    cache: dict = {}
    pfx = runner.run_annotation_eval_engine(
        params, cfg, tok, "test_localization.json", gen=_gen(tok),
        max_slots=4, splice_batch=2, examples=examples,
        engine_cache=cache, cache_prefix=True, log_fn=lambda *a: None)
    assert pfx.results == full.results
    assert pfx.metrics == full.metrics
    # the prefix actually engaged (shared header >= 16 tokens with the
    # byte tokenizer), content-keyed in the engine
    eng = next(iter(cache.values()))
    assert any(k[0] == "evalpfx" for k in eng._prefixes), \
        "prefix cache never engaged"


def test_common_token_prefix_guards():
    """Sentinel and min-suffix trims of the common-prefix detector."""
    from opus_pllm_tpu.core.config import SEQ_TOKEN_INDEX
    f = runner._common_token_prefix
    assert f([[1, 2, 3, 4], [1, 2, 3, 5]]) == 3
    assert f([[1, 2], [9, 2]]) == 0
    # the splice sentinel never lands inside the text-only prefix
    assert f([[1, 2, SEQ_TOKEN_INDEX, 4, 5],
              [1, 2, SEQ_TOKEN_INDEX, 4, 6]]) == 2
    # every prompt keeps >= 1 suffix token (identical prompts included)
    assert f([[1, 2, 3], [1, 2, 3]]) == 2

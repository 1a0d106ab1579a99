"""CLI adapter-bank eval: `annotate --engine --adapter` equals the
merged-weights run, and `annotate-all --engine --adapter` maps each test
set to its per-task adapter from ONE loaded base — the ablation protocol
(eval_total_ablation.sh) without the per-adapter model reload."""

import json
import os
import shutil

import pytest

torch = pytest.importorskip("torch")
pytest.importorskip("peft")

from opus_pllm_tpu.cli.main import main  # noqa: E402


@pytest.fixture(scope="module")
def dirs(tmp_path_factory):
    from reference_fixtures import (_make_esm_dir, _make_llm_dir,
                                    _make_toy_tokenizer, _make_weights_dir)

    root = str(tmp_path_factory.mktemp("cliadapters"))
    esm_dir = _make_esm_dir(root)
    tok_dir = os.path.join(root, "tok")
    _, vocab = _make_toy_tokenizer(tok_dir)
    llm_dir = _make_llm_dir(root, "llama", vocab)
    for f in os.listdir(tok_dir):
        os.replace(os.path.join(tok_dir, f), os.path.join(llm_dir, f))
    weights = _make_weights_dir(root, "llama", llm_dir)
    # base weights = the same dir MINUS lora_adapter/ (cstp + switch must
    # be identical across runs; only the adapter differs)
    base_w = os.path.join(root, "base-weights")
    shutil.copytree(weights, base_w,
                    ignore=shutil.ignore_patterns("lora_adapter"))
    loc_json = os.path.join(root, "test_localization.json")
    with open(loc_json, "w") as f:
        json.dump([{"instruction": "Where is this protein located?",
                    "input": "MKTAYIAKQR" * (1 + i % 2),
                    "output": "Nucleus"} for i in range(4)], f)
    fn_json = os.path.join(root, "test_function.json")
    with open(fn_json, "w") as f:
        json.dump([{"instruction": "Name the function.",
                    "input": "ACDEFGHIKL",
                    "output": "enzyme"} for i in range(2)], f)
    return dict(esm=esm_dir, llm=llm_dir, weights=weights, base_w=base_w,
                loc_json=loc_json, fn_json=fn_json, root=root)


def _base_args(dirs, weights):
    return ["--model-base", dirs["llm"], "--weights", weights,
            "--esm", dirs["esm"], "--temperature", "0",
            "--batch-size", "2", "--engine", "--max-slots", "4",
            "--max-new-tokens", "6"]


def test_cli_adapter_bank_matches_merged_and_maps_sets(dirs, tmp_path):
    merged_out = str(tmp_path / "merged.json")
    main(["annotate", *_base_args(dirs, dirs["weights"]),
          "--test-json", dirs["loc_json"], "--save-path", merged_out])

    bank_out = str(tmp_path / "bank.json")
    main(["annotate", *_base_args(dirs, dirs["base_w"]),
          "--adapter", f"localization={dirs['weights']}",
          "--test-json", dirs["loc_json"], "--save-path", bank_out])

    base_out = str(tmp_path / "base.json")
    main(["annotate", *_base_args(dirs, dirs["base_w"]),
          "--test-json", dirs["loc_json"], "--save-path", base_out])

    with open(merged_out) as f:
        merged = json.load(f)
    with open(bank_out) as f:
        bank = json.load(f)
    with open(base_out) as f:
        base = json.load(f)
    assert bank == merged
    assert base != merged, "adapter must change the output"

    # annotate-all: localization set -> adapter, function set -> base
    save_dir = str(tmp_path / "abl")
    main(["annotate-all", *_base_args(dirs, dirs["base_w"]),
          "--adapter", f"localization={dirs['weights']}",
          "--test-jsons", dirs["loc_json"], dirs["fn_json"],
          "--repeats", "1", "--save-dir", save_dir])
    with open(os.path.join(save_dir, "test_localization_rep0.json")) as f:
        abl_loc = json.load(f)
    assert abl_loc == merged     # matched set ran under its adapter
    # the function set produced results too (under base weights)
    with open(os.path.join(save_dir, "test_function_rep0.json")) as f:
        abl_fn = json.load(f)
    assert len(abl_fn) == 2


def test_cli_adapter_requires_engine(dirs):
    with pytest.raises(SystemExit, match="--engine"):
        main(["annotate", "--model-base", dirs["llm"],
              "--weights", dirs["base_w"], "--esm", dirs["esm"],
              "--adapter", f"localization={dirs['weights']}",
              "--test-json", dirs["loc_json"]])


def test_cli_mcq_adapter_auto_match(dirs, monkeypatch, tmp_path):
    """`mcq --engine --adapter NAME=PATH` auto-matches the adapter by test
    basename like annotate (a loaded bank must never silently evaluate
    base weights); --use-adapter still forces one."""
    import opus_pllm_tpu.cli.main as climain
    from opus_pllm_tpu.evals import runner as runner_mod

    seen = {}

    class FakeTok:  # just the ids GenerationConfig reads
        eos_token_id = 1
        pad_token_id = 0

    def fake_build(args):
        return object(), {}, FakeTok(), None

    def fake_bank(specs, cfg):
        return {name: {} for name in specs}

    def fake_mcq_engine(params, cfg, tok, test_json, **kw):
        seen["adapter_id"] = kw.get("adapter_id")

        class R:  # noqa: N801 — minimal report stub
            metrics = {"accuracy": 1.0}
        return R()

    monkeypatch.setattr(climain, "_build", fake_build)
    monkeypatch.setattr(climain, "_adapter_bank", fake_bank)
    monkeypatch.setattr(runner_mod, "run_mcq_eval_engine", fake_mcq_engine)
    mcq_json = str(tmp_path / "test_mcq_benchmark.json")
    with open(mcq_json, "w") as f:
        json.dump([], f)

    main(["mcq", "--model-base", dirs["llm"], "--weights", dirs["base_w"],
          "--esm", dirs["esm"], "--engine",
          "--adapter", f"mcq={dirs['weights']}", "--test-json", mcq_json])
    assert seen["adapter_id"] == "mcq"

    main(["mcq", "--model-base", dirs["llm"], "--weights", dirs["base_w"],
          "--esm", dirs["esm"], "--engine",
          "--adapter", f"mcq={dirs['weights']}",
          "--adapter", f"other={dirs['weights']}",
          "--use-adapter", "other", "--test-json", mcq_json])
    assert seen["adapter_id"] == "other"

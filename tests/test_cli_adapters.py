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

"""Multi-chip reachability (round-2 verdict item 2): distributed bootstrap,
--mesh CLI wiring, mesh-sharded eval/train matching single-device outputs,
and eval-loop compile-count hygiene (item 7)."""

import json
import os
import subprocess
import sys

import jax
import numpy as np
import pytest

from opus_pllm_tpu.core.config import GenerationConfig, MeshConfig, OpusConfig
from opus_pllm_tpu.core.mesh import make_mesh, parse_mesh_flag
from opus_pllm_tpu.evals import datasets as ds
from opus_pllm_tpu.evals import runner
from opus_pllm_tpu.infer.tokenization import ByteTokenizer
from opus_pllm_tpu.models import opus
from opus_pllm_tpu.parallel import partition


def test_parse_mesh_flag():
    assert parse_mesh_flag("4,2") == MeshConfig(data=4, model=2)
    assert parse_mesh_flag("8") == MeshConfig(data=8, model=1)
    with pytest.raises(ValueError):
        parse_mesh_flag("1,2,3")


def test_initialize_distributed_single_process_noop(monkeypatch):
    from opus_pllm_tpu.core.mesh import initialize_distributed

    for var in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
                "JAX_PROCESS_ID"):
        monkeypatch.delenv(var, raising=False)
    assert initialize_distributed() is False


def test_initialize_distributed_live_subprocess():
    """Env-driven bootstrap actually brings up the coordinator (run in a
    subprocess: jax.distributed state is process-global)."""
    code = """
import os, socket
s = socket.socket(); s.bind(("127.0.0.1", 0))
port = s.getsockname()[1]; s.close()
os.environ["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
os.environ["JAX_NUM_PROCESSES"] = "1"
os.environ["JAX_PROCESS_ID"] = "0"
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""
import jax
jax.config.update("jax_platforms", "cpu")
from opus_pllm_tpu.core.mesh import initialize_distributed
assert initialize_distributed() is True
assert initialize_distributed() is True   # idempotent
assert jax.process_count() == 1
print("DIST_OK")
"""
    out = subprocess.run([sys.executable, "-c", code], cwd="/root/repo",
                         capture_output=True, text=True, timeout=300)
    assert "DIST_OK" in out.stdout, out.stderr[-2000:]


@pytest.fixture(scope="module")
def tiny_env():
    cfg = OpusConfig.tiny("llama")
    params = opus.init(jax.random.PRNGKey(0), cfg)
    tok = ByteTokenizer()
    examples = [ds.AnnotationExample("Where is protein %d located?" % i,
                                     "MKTAYIAKQR" + "ACDE" * (i % 3),
                                     "Nucleus")
                for i in range(6)]
    return cfg, params, tok, examples


def _gen(tok):
    return GenerationConfig(max_new_tokens=6, temperature=0.0,
                            eos_token_id=tok.eos_token_id,
                            pad_token_id=tok.pad_token_id)


def test_annotation_eval_mesh_matches_single(tiny_env):
    """run_annotation_eval over a 4x2 mesh (params TP+FSDP-sharded, batch
    data-sharded) produces the same results as the single-device run."""
    cfg, params, tok, examples = tiny_env
    single = runner.run_annotation_eval(
        params, cfg, tok, "x_localization_test.json", gen=_gen(tok),
        batch_size=4, prompt_bucket=32, esm_bucket=32,
        examples=examples, log_fn=lambda *_: None)

    mesh = make_mesh(MeshConfig(data=4, model=2))
    sp = partition.shard_params(mesh, params)
    sharded = runner.run_annotation_eval(
        sp, cfg, tok, "x_localization_test.json", gen=_gen(tok),
        batch_size=4, prompt_bucket=32, esm_bucket=32,
        examples=examples, mesh=mesh, log_fn=lambda *_: None)
    assert sharded.results == single.results
    assert sharded.metrics == single.metrics


def test_eval_loop_compile_count_bounded(tiny_env):
    """Non-multiple dataset sizes must NOT trigger a recompile for the
    leftover batch: the final chunk pads to batch_size (runner._pad_chunk),
    so the whole eval adds at most one engine.generate compilation."""
    from opus_pllm_tpu.infer import engine

    cfg, params, tok, examples = tiny_env
    gen = _gen(tok)
    kw = dict(gen=gen, batch_size=4, prompt_bucket=32, esm_bucket=32,
              log_fn=lambda *_: None)
    # warm the (batch=4, bucket) shape
    runner.run_annotation_eval(params, cfg, tok, "x_localization_test.json",
                               examples=examples[:4], **kw)
    before = engine.generate._cache_size()
    rep = runner.run_annotation_eval(params, cfg, tok,
                                     "x_localization_test.json",
                                     examples=examples, **kw)   # 6 = 4 + 2
    assert len(rep.results) == 6
    assert engine.generate._cache_size() == before


# ---------------------------------------------------------------------------
# CLI end-to-end on fabricated HF checkpoints (needs torch/transformers/peft)
# ---------------------------------------------------------------------------

torch = pytest.importorskip("torch")
pytest.importorskip("transformers")
pytest.importorskip("peft")


@pytest.fixture(scope="module")
def cli_dirs(tmp_path_factory):
    from reference_fixtures import (_make_esm_dir, _make_llm_dir,
                                    _make_toy_tokenizer, _make_weights_dir)

    root = str(tmp_path_factory.mktemp("meshcli"))
    esm_dir = _make_esm_dir(root)
    tok_dir = os.path.join(root, "tok")
    _, vocab = _make_toy_tokenizer(tok_dir)
    llm_dir = _make_llm_dir(root, "llama", vocab)
    for f in os.listdir(tok_dir):
        os.replace(os.path.join(tok_dir, f), os.path.join(llm_dir, f))
    weights = _make_weights_dir(root, "llama", llm_dir)
    test_json = os.path.join(root, "mini_localization_test.json")
    with open(test_json, "w") as f:
        json.dump([{"instruction": "Where is this protein located?",
                    "input": "MKTAYIAKQR" * (1 + i % 2),
                    "output": "Nucleus"} for i in range(6)], f)
    train_json = os.path.join(root, "mini_train.json")
    with open(train_json, "w") as f:
        json.dump([{"instruction": "Describe this protein.",
                    "input": "ACDEFGHIKL" * (1 + i % 2),
                    "output": "A small test protein."} for i in range(8)], f)
    return dict(esm=esm_dir, llm=llm_dir, weights=weights,
                test_json=test_json, train_json=train_json)


def test_annotate_cli_mesh_matches_single(cli_dirs, tmp_path):
    """`annotate --mesh 4,2` (TP+FSDP params, DP batches) == single-device
    run — the reachability criterion for the parallelism layer."""
    from opus_pllm_tpu.cli.main import main

    out1, out2 = str(tmp_path / "single.json"), str(tmp_path / "mesh.json")
    base = ["annotate", "--model-base", cli_dirs["llm"],
            "--weights", cli_dirs["weights"], "--esm", cli_dirs["esm"],
            "--test-json", cli_dirs["test_json"],
            "--temperature", "0", "--batch-size", "4"]
    main(base + ["--save-path", out1])
    main(base + ["--save-path", out2, "--mesh", "4,2"])
    with open(out1) as f:
        single = json.load(f)
    with open(out2) as f:
        mesh = json.load(f)
    assert len(single) == 6
    assert mesh == single


def test_annotate_cli_seq_shards_matches_single(cli_dirs, tmp_path):
    """`annotate --seq-shards 4` (KV cache sharded over the ("seq",) mesh,
    infer/sp_engine.py) produces the identical result file at T=0."""
    from opus_pllm_tpu.cli.main import main

    out1, out2 = str(tmp_path / "single.json"), str(tmp_path / "sp.json")
    base = ["annotate", "--model-base", cli_dirs["llm"],
            "--weights", cli_dirs["weights"], "--esm", cli_dirs["esm"],
            "--test-json", cli_dirs["test_json"],
            "--temperature", "0", "--batch-size", "4"]
    main(base + ["--save-path", out1])
    main(base + ["--save-path", out2, "--seq-shards", "4"])
    with open(out1) as f:
        single = json.load(f)
    with open(out2) as f:
        sp = json.load(f)
    assert len(single) == 6
    assert sp == single


def test_train_lora_cli_mesh(cli_dirs, tmp_path):
    """`train-lora --mesh 4,2` runs the sharded train step (ZeRO-style
    sharded optimizer moments) and saves a restorable trainable tree."""
    from opus_pllm_tpu.cli.main import main
    from opus_pllm_tpu.core.checkpoint import CheckpointManager

    out = str(tmp_path / "lora_out")
    main(["train-lora", "--model-base", cli_dirs["llm"],
          "--weights", cli_dirs["weights"], "--esm", cli_dirs["esm"],
          "--train-json", cli_dirs["train_json"], "--out", out,
          "--batch-size", "4", "--epochs", "1", "--max-len", "64",
          "--lora-rank", "2", "--mesh", "4,2"])
    mgr = CheckpointManager(out)
    assert mgr.latest_step() == 2      # 8 items / batch 4
    trainable = mgr.restore()
    assert "lora" in trainable
    leaves = jax.tree.leaves(trainable["lora"])
    assert all(np.all(np.isfinite(np.asarray(x))) for x in leaves)


def test_train_lora_cli_seq_shards(cli_dirs, tmp_path):
    """`train-lora --seq-shards 4` runs the sequence-parallel ring step
    (train/sp.py) end to end and saves a restorable trainable tree."""
    from opus_pllm_tpu.cli.main import main
    from opus_pllm_tpu.core.checkpoint import CheckpointManager

    out = str(tmp_path / "lora_sp_out")
    main(["train-lora", "--model-base", cli_dirs["llm"],
          "--weights", cli_dirs["weights"], "--esm", cli_dirs["esm"],
          "--train-json", cli_dirs["train_json"], "--out", out,
          "--batch-size", "4", "--epochs", "1", "--max-len", "64",
          "--lora-rank", "2", "--seq-shards", "4"])
    mgr = CheckpointManager(out)
    assert mgr.latest_step() == 2
    trainable = mgr.restore()
    assert "lora" in trainable
    leaves = jax.tree.leaves(trainable["lora"])
    assert all(np.all(np.isfinite(np.asarray(x))) for x in leaves)


def test_seq_shards_and_mesh_mutually_exclusive(cli_dirs):
    from opus_pllm_tpu.cli.main import main

    with pytest.raises(SystemExit, match="mutually exclusive"):
        main(["train-lora", "--model-base", cli_dirs["llm"],
              "--weights", cli_dirs["weights"], "--esm", cli_dirs["esm"],
              "--train-json", cli_dirs["train_json"], "--out", "/tmp/x",
              "--mesh", "4", "--seq-shards", "2"])


def test_train_lora_cli_max_steps_and_resume(cli_dirs, tmp_path):
    """`train-lora --max-steps 1 --save-every 1` then `--resume`: the
    resumed run finishes with the same trainable tree as one
    uninterrupted run (identical seeded data stream; resume skips the
    consumed prefix). (Was shadowed by the half-data variant below —
    both interruption modes now run.)"""
    from opus_pllm_tpu.cli.main import main
    from opus_pllm_tpu.core.checkpoint import CheckpointManager

    base = ["train-lora", "--model-base", cli_dirs["llm"],
            "--weights", cli_dirs["weights"], "--esm", cli_dirs["esm"],
            "--train-json", cli_dirs["train_json"],
            "--batch-size", "4", "--epochs", "1", "--max-len", "64",
            "--lora-rank", "2"]

    out_ref = str(tmp_path / "ref")
    main(base + ["--out", out_ref])
    ref = CheckpointManager(out_ref).restore()

    out = str(tmp_path / "resumed")
    main(base + ["--out", out, "--max-steps", "1", "--save-every", "1"])
    assert CheckpointManager(
        str(tmp_path / "resumed" / "resume_state")).latest_step() == 1

    main(base + ["--out", out, "--resume"])
    got = CheckpointManager(out).restore()
    for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(got)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_train_lora_cli_pipe_stages(cli_dirs, tmp_path):
    """`train-lora --pipe-stages 2` runs the pipeline-parallel GPipe step
    (train/pp.py) end to end and saves a restorable trainable tree."""
    from opus_pllm_tpu.cli.main import main
    from opus_pllm_tpu.core.checkpoint import CheckpointManager

    out = str(tmp_path / "lora_pp_out")
    main(["train-lora", "--model-base", cli_dirs["llm"],
          "--weights", cli_dirs["weights"], "--esm", cli_dirs["esm"],
          "--train-json", cli_dirs["train_json"], "--out", out,
          "--batch-size", "4", "--epochs", "1", "--max-len", "64",
          "--lora-rank", "2", "--pipe-stages", "2",
          "--micro-batches", "2"])
    mgr = CheckpointManager(out)
    assert mgr.latest_step() == 2
    trainable = mgr.restore()
    assert "lora" in trainable
    leaves = jax.tree.leaves(trainable["lora"])
    assert all(np.all(np.isfinite(np.asarray(x))) for x in leaves)


def test_pipe_stages_and_seq_shards_mutually_exclusive(cli_dirs):
    from opus_pllm_tpu.cli.main import main

    with pytest.raises(SystemExit, match="mutually exclusive"):
        main(["train-lora", "--model-base", cli_dirs["llm"],
              "--weights", cli_dirs["weights"], "--esm", cli_dirs["esm"],
              "--train-json", cli_dirs["train_json"], "--out", "/tmp/x",
              "--pipe-stages", "2", "--seq-shards", "2"])


def test_train_lora_cli_save_every_and_resume(cli_dirs, tmp_path):
    """`train-lora --save-every 1` then `--resume`: the resumed run
    finishes with the same trainable tree as one uninterrupted run."""
    from opus_pllm_tpu.cli.main import main
    from opus_pllm_tpu.core.checkpoint import CheckpointManager

    base = ["train-lora", "--model-base", cli_dirs["llm"],
            "--weights", cli_dirs["weights"], "--esm", cli_dirs["esm"],
            "--train-json", cli_dirs["train_json"],
            "--batch-size", "4", "--epochs", "1", "--max-len", "64",
            "--lora-rank", "2"]

    out_ref = str(tmp_path / "ref")
    main(base + ["--out", out_ref])
    ref = CheckpointManager(out_ref).restore()

    out = str(tmp_path / "resumed")
    # "crash" after step 1 of 2: one epoch of 8 items / batch 4 = 2 steps,
    # simulated by training only the first half of the data stream
    import json as _json
    with open(cli_dirs["train_json"]) as f:
        items = _json.load(f)
    half_json = str(tmp_path / "half.json")
    with open(half_json, "w") as f:
        _json.dump(items[:4], f)
    half = [a if a != cli_dirs["train_json"] else half_json for a in base]
    main(half + ["--out", out, "--save-every", "1"])
    assert CheckpointManager(
        str(tmp_path / "resumed" / "resume_state")).latest_step() == 1

    main(base + ["--out", out, "--resume"])
    got = CheckpointManager(out).restore()
    for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(got)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_chat_cli_seq_shards_matches_single(cli_dirs, monkeypatch, capsys):
    """`chat --seq-shards 4` routes generation through the sequence-sharded
    engine (the flag was previously accepted and silently ignored) and the
    reply matches the single-device run at T=0."""
    from opus_pllm_tpu.cli.main import main

    def run(extra):
        feeds = iter(["Where is this protein located?", "MKTAYIAKQR", ""])
        monkeypatch.setattr("builtins.input", lambda *_: next(feeds))
        main(["chat", "--model-base", cli_dirs["llm"],
              "--weights", cli_dirs["weights"], "--esm", cli_dirs["esm"],
              "--temperature", "0", "--max-new-tokens", "8"] + extra)
        return capsys.readouterr().out.strip().splitlines()[-1]

    single = run([])
    sp = run(["--seq-shards", "4"])
    assert sp == single

"""CLI surface: parser coverage + train-cstp end-to-end on fake data."""

import pickle

import numpy as np
import pytest

from opus_pllm_tpu.cli.main import build_parser


def test_parser_covers_all_commands():
    p = build_parser()
    for argv in (
        ["annotate", "--test-json", "x.json"],
        ["annotate", "--test-json", "x.json", "--engine",
         "--max-slots", "8", "--steps-per-tick", "2"],
        ["mcq", "--test-json", "x.json"],
        ["chat"],
        ["serve", "--port", "8001", "--max-slots", "4"],
        ["train-cstp", "--vec-pickle", "v.pkl", "--out", "o"],
        ["train-projector", "--train-json", "t.json", "--out", "o"],
        ["train-lora", "--train-json", "t.json", "--out", "o"],
        ["precompute-embeddings", "--json", "a.json", "--out", "o"],
        ["convert-weights", "--out", "o"],
        ["bench"],
    ):
        args = p.parse_args(argv)
        assert callable(args.fn)


def test_train_cstp_cli_end_to_end(tmp_path):
    from opus_pllm_tpu.cli.main import main

    rng = np.random.default_rng(0)
    items = [{"seq_embedding": rng.normal(size=1280).astype(np.float32),
              "text_embedding": rng.normal(size=5120).astype(np.float32)}
             for _ in range(8)]
    vec = tmp_path / "vec.pkl"
    vec.write_bytes(pickle.dumps(items))
    out = tmp_path / "ckpt"
    main(["train-cstp", "--vec-pickle", str(vec), "--out", str(out),
          "--batch-size", "4", "--epochs", "1", "--lr", "1e-3"])
    from opus_pllm_tpu.core.checkpoint import CheckpointManager
    mgr = CheckpointManager(str(out))
    assert mgr.latest_step() == 2   # 8 items / batch 4
    params = mgr.restore()
    assert params["protein_projection"]["kernel"].shape == (1280, 5120)


def test_switch_projector_type_flag_threads_to_config():
    """--switch-projector-type (≙ run_opus_ddp.py:160) reaches the
    SwitchProjectorConfig every model command builds."""
    from opus_pllm_tpu.core.config import SwitchProjectorConfig

    p = build_parser()
    for cmd, extra in (("annotate", ["--test-json", "x.json"]),
                       ("train-projector", ["--train-json", "t", "--out", "o"])):
        args = p.parse_args([cmd, *extra,
                             "--switch-projector-type", "linear"])
        cfg = SwitchProjectorConfig(input_dim=96, llm_hidden_size=64,
                                    projector_type=args.switch_projector_type)
        assert cfg.mlp_depth == 1             # linear = single nn.Linear
    args = p.parse_args(["annotate", "--test-json", "x.json"])
    assert args.switch_projector_type == "mlp2x_gelu"   # reference default


def test_train_cstp_cli_resume(tmp_path):
    """train-cstp --max-steps 1 --save-every 1 then --resume finishes
    identical to an uninterrupted run — the interruption cuts the SAME
    seeded data stream, so the resumed half consumes exactly the batches
    the reference run saw."""
    import pickle

    import jax
    import numpy as np

    from opus_pllm_tpu.cli.main import main
    from opus_pllm_tpu.core.checkpoint import CheckpointManager

    rng = np.random.default_rng(0)
    vec = str(tmp_path / "vec.pkl")
    with open(vec, "wb") as f:
        pickle.dump([{"seq_embedding": rng.standard_normal(1280).astype(
                          np.float32),
                      "text_embedding": rng.standard_normal(5120).astype(
                          np.float32)} for _ in range(16)], f)

    base = ["train-cstp", "--vec-pickle", vec, "--batch-size", "8",
            "--epochs", "1", "--lr", "0.01"]
    out_ref = str(tmp_path / "ref")
    main(base + ["--out", out_ref])
    ref = CheckpointManager(out_ref).restore()

    out = str(tmp_path / "res")
    main(base + ["--out", out, "--max-steps", "1", "--save-every", "1"])
    assert CheckpointManager(
        str(tmp_path / "res" / "resume_state")).latest_step() == 1
    main(base + ["--out", out, "--resume"])
    got = CheckpointManager(out).restore()
    for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(got)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

"""CLI surface: parser coverage + train-cstp end-to-end on fake data."""

import pickle

import numpy as np
import pytest

from opus_pllm_tpu.cli.main import build_parser


def test_parser_covers_all_commands():
    p = build_parser()
    for argv in (
        ["annotate", "--test-json", "x.json"],
        ["mcq", "--test-json", "x.json"],
        ["chat"],
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

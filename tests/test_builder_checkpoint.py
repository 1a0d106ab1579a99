"""Checkpoint manager + reference-contract model assembly."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opus_pllm_tpu.core import builder, checkpoint as ckpt
from opus_pllm_tpu.core.config import (CSTPConfig, DecoderConfig, ESM2Config,
                                       OpusConfig, SwitchProjectorConfig)


def test_orbax_roundtrip(tmp_path):
    tree = {"a": jnp.arange(6, dtype=jnp.float32).reshape(2, 3),
            "nested": {"b": jnp.ones((4,), jnp.bfloat16)}}
    path = str(tmp_path / "ck")
    ckpt.save_pytree(path, tree)
    back = ckpt.restore_pytree(path, like=tree)
    jax.tree.map(lambda x, y: np.testing.assert_array_equal(
        np.asarray(x, np.float32), np.asarray(y, np.float32)), tree, back)


def test_checkpoint_manager_retention_and_resume(tmp_path):
    mgr = ckpt.CheckpointManager(str(tmp_path / "run"), max_to_keep=2)
    for step in (1, 2, 3):
        mgr.save(step, {"w": jnp.full((2,), float(step))})
    assert mgr.latest_step() == 3
    back = mgr.restore(like={"w": jnp.zeros((2,))})
    np.testing.assert_array_equal(np.asarray(back["w"]), [3.0, 3.0])


def test_family_dispatch():
    assert builder.family_from_path("/m/Llama-3-8B") == "llama"
    assert builder.family_from_path("/m/galactica-6.7b") == "opt"
    assert builder.family_from_path("/m/Qwen2.5-7B") == "qwen2"
    with pytest.raises(NotImplementedError):
        builder.family_from_path("/m/mystery")


@pytest.fixture
def reference_weights_dir(tmp_path):
    """Fabricate the reference checkpoint-directory contract with torch."""
    torch = pytest.importorskip("torch")
    cfg = OpusConfig.tiny()
    d = tmp_path / "opus-weights"
    (d / "modality_encoder").mkdir(parents=True)
    (d / "modality_refinement_projector").mkdir()
    # Lightning ckpt: projection linears under state_dict
    c = cfg.cstp
    sd = {"protein_projection.linear.weight": torch.randn(c.proj_dim, c.protein_dim),
          "protein_projection.linear.bias": torch.randn(c.proj_dim),
          "text_projection.linear.weight": torch.randn(c.proj_dim, c.text_dim),
          "text_projection.linear.bias": torch.randn(c.proj_dim)}
    torch.save({"state_dict": sd},
               d / "modality_encoder/modality_encoding_adapter.ckpt")
    # switch projector: nn.Sequential indices 0 (linear), 2 (linear)
    s = cfg.switch
    ssd = {"switch_projector.0.weight": torch.randn(s.output_dim, s.input_dim),
           "switch_projector.0.bias": torch.randn(s.output_dim),
           "switch_projector.2.weight": torch.randn(s.output_dim, s.output_dim),
           "switch_projector.2.bias": torch.randn(s.output_dim)}
    torch.save(ssd, d / ("modality_refinement_projector/"
                         "modality_refinement_projection.bin"))
    return cfg, str(d)


def test_load_pretrained_reference_contract(reference_weights_dir):
    cfg, d = reference_weights_dir
    cfg = OpusConfig(esm=cfg.esm, cstp=cfg.cstp,
                     switch=type(cfg.switch)(input_dim=cfg.switch.input_dim,
                                             llm_hidden_size=cfg.switch.llm_hidden_size,
                                             n_tokens=cfg.switch.n_tokens,
                                             projector_type="mlp2x_gelu"),
                     llm=cfg.llm, max_prompt_len=cfg.max_prompt_len)
    params, unmerged = builder.load_pretrained(None, d, cfg)
    assert unmerged is None
    assert params["cstp"]["protein_projection"]["kernel"].shape == \
        (cfg.cstp.protein_dim, cfg.cstp.proj_dim)
    assert len(params["switch"]["layers"]) == 2
    # loaded model runs end to end
    from opus_pllm_tpu.models import opus
    ids = np.full((1, 8), 7, np.int32)
    ids[0, 1] = -200
    esm_t = np.zeros((1, 1, 6), np.int32)
    esm_t[0, 0, -1] = 2
    logits, _ = opus.forward(params, cfg, jnp.asarray(ids),
                             jnp.ones((1, 8), bool), jnp.asarray(esm_t))
    assert np.isfinite(np.asarray(logits)).all()


def test_host_arrays_load_path_matches_device_path():
    """convert.host_arrays(): leaves stay numpy through convert + int8
    quantize + stack_params (np.stack), and the once-transferred tree is
    leaf-identical to the per-layer device path (the 8B load-OOM fix)."""
    from opus_pllm_tpu.core import convert
    from opus_pllm_tpu.kernels.quant import quantize_decoder
    from opus_pllm_tpu.models import decoder

    torch = pytest.importorskip("torch")
    cfg = DecoderConfig(family="llama", vocab_size=64, hidden_size=16,
                        intermediate_size=32, num_layers=3, num_heads=4,
                        num_kv_heads=2, head_dim=4, dtype="float32")
    rng = np.random.default_rng(0)
    sd = {"model.embed_tokens.weight": rng.standard_normal((64, 16)).astype(np.float32),
          "model.norm.weight": np.ones(16, np.float32),
          "lm_head.weight": rng.standard_normal((64, 16)).astype(np.float32)}
    for i in range(cfg.num_layers):
        lp = f"model.layers.{i}."
        for name, shape in (("self_attn.q_proj", (16, 16)),
                            ("self_attn.k_proj", (8, 16)),
                            ("self_attn.v_proj", (8, 16)),
                            ("self_attn.o_proj", (16, 16)),
                            ("mlp.gate_proj", (32, 16)),
                            ("mlp.up_proj", (32, 16)),
                            ("mlp.down_proj", (16, 32))):
            sd[lp + name + ".weight"] = rng.standard_normal(shape).astype(np.float32)
        sd[lp + "input_layernorm.weight"] = np.ones(16, np.float32)
        sd[lp + "post_attention_layernorm.weight"] = np.ones(16, np.float32)

    with convert.host_arrays():
        host = convert.decoder_from_hf(dict(sd), cfg, quantize_int8=True)
        assert all(isinstance(l, np.ndarray) for l in jax.tree.leaves(host))
        host = decoder.stack_params(host, donate=True)
        assert all(isinstance(l, np.ndarray) for l in jax.tree.leaves(host))
    host = jax.device_put(host)

    dev = decoder.stack_params(
        convert.decoder_from_hf(dict(sd), cfg, quantize_int8=True),
        donate=True)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a, np.float32), np.asarray(b, np.float32)), host, dev)


def test_load_pretrained_raw_pipeline():
    """No weights dir -> random init everywhere, no LoRA (builder.py:117)."""
    cfg = OpusConfig.tiny()
    params, unmerged = builder.load_pretrained(None, None, cfg)
    assert unmerged is None
    assert set(params) == {"esm", "cstp", "switch", "llm"}


def test_decoder_config_from_hf_json(tmp_path):
    import json

    d = tmp_path / "my-llama"
    d.mkdir()
    (d / "config.json").write_text(json.dumps({
        "vocab_size": 1000, "hidden_size": 64, "intermediate_size": 128,
        "num_hidden_layers": 2, "num_attention_heads": 4,
        "num_key_value_heads": 2, "rope_theta": 123.0,
        "rms_norm_eps": 1e-6, "max_position_embeddings": 100}))
    cfg = builder.decoder_config_for(str(d))
    assert cfg.family == "llama" and cfg.num_kv_heads == 2
    assert cfg.rope_theta == 123.0 and cfg.head_dim == 16
    assert builder.context_len_for(str(d)) == 512

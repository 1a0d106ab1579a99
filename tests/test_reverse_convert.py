"""Reverse converters: our trained trees round-trip to reference formats."""

import jax
import jax.numpy as jnp
import numpy as np

from opus_pllm_tpu.bridge import projector
from opus_pllm_tpu.core import convert
from opus_pllm_tpu.core.config import (DecoderConfig, LoRAConfig,
                                       SwitchProjectorConfig)
from opus_pllm_tpu.lora import lora as lora_mod


def test_switch_projector_roundtrip():
    cfg = SwitchProjectorConfig(input_dim=32, llm_hidden_size=16, n_tokens=4,
                                projector_type="mlp2x_gelu")
    params = projector.init(jax.random.PRNGKey(0), cfg)
    sd = convert.switch_projector_to_torch(params)
    assert set(sd) == {"switch_projector.0.weight", "switch_projector.0.bias",
                       "switch_projector.2.weight", "switch_projector.2.bias"}
    back = convert.switch_projector_from_torch(sd, cfg)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-6), params, back)


def test_lora_peft_roundtrip(tmp_path):
    import pytest
    torch = pytest.importorskip("torch")

    cfg = DecoderConfig.tiny()
    lcfg = LoRAConfig(rank=2)
    tree = lora_mod.init(jax.random.PRNGKey(0), cfg, lcfg)
    tree = jax.tree.map(lambda x: x + 0.1, tree)
    sd = convert.lora_to_peft(tree)
    # persist through torch like a real PEFT dir would
    p = tmp_path / "adapter_model.bin"
    convert.save_torch_state_dict(sd, str(p))
    back_tree = convert.lora_from_peft(convert.load_torch_file(str(p)))
    for i, lp in enumerate(tree["layers"]):
        for proj, ab in lp.items():
            got = back_tree[(i, proj)]
            np.testing.assert_allclose(np.asarray(got["A"]),
                                       np.asarray(ab["A"]), rtol=1e-6)
            np.testing.assert_allclose(np.asarray(got["B"]),
                                       np.asarray(ab["B"]), rtol=1e-6)


def test_lora_to_peft_stacked_layout():
    cfg = DecoderConfig.tiny()
    tree = lora_mod.init(jax.random.PRNGKey(0), cfg, LoRAConfig(rank=2))
    from opus_pllm_tpu.models import decoder
    stacked = decoder.stack_params({"layers": tree["layers"]})
    sd1 = convert.lora_to_peft(tree)
    sd2 = convert.lora_to_peft(stacked)
    assert set(sd1) == set(sd2)
    for k in sd1:
        np.testing.assert_allclose(sd1[k], sd2[k], rtol=1e-6)

"""TP+FSDP-sharded inference matches single-device results on the CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from opus_pllm_tpu.core.config import MeshConfig, OpusConfig, SEQ_TOKEN_INDEX
from opus_pllm_tpu.core.mesh import make_mesh
from opus_pllm_tpu.infer import engine
from opus_pllm_tpu.models import decoder, opus
from opus_pllm_tpu.parallel import partition


def test_sharded_generate_matches_single_device():
    cfg = OpusConfig.tiny()
    params = opus.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    b, l = 4, 12
    ids = rng.integers(4, cfg.llm.vocab_size, (b, l)).astype(np.int32)
    ids[:, 1] = SEQ_TOKEN_INDEX
    mask = jnp.ones((b, l), bool)
    esm = rng.integers(4, 24, (b, 1, 8)).astype(np.int32)
    esm[:, :, 0] = 0
    esm[:, :, -1] = 2

    def run(ps, ids_, mask_, esm_):
        sp = opus.splice_prompt(ps, cfg, ids_, mask_, esm_, left_pad=True)
        pos = decoder.positions_from_mask(sp.mask)
        return engine.generate(ps["llm"], cfg.llm, sp.embeds, sp.mask, pos,
                               jax.random.PRNGKey(7), max_new_tokens=6,
                               temperature=0.0, eos_token_id=-1)

    single = run(params, jnp.asarray(ids), mask, jnp.asarray(esm))

    mesh = make_mesh(MeshConfig(data=4, model=2))
    sp_params = partition.shard_params(mesh, params)
    bs = NamedSharding(mesh, P("data"))
    with mesh:
        sharded = run(sp_params,
                      jax.device_put(jnp.asarray(ids), bs),
                      jax.device_put(mask, bs),
                      jax.device_put(jnp.asarray(esm), bs))
    np.testing.assert_array_equal(np.asarray(single.tokens),
                                  np.asarray(sharded.tokens))


def test_conversation_styles():
    from opus_pllm_tpu.infer.conversation import Conversation, SeparatorStyle

    conv = Conversation(system="SYS", roles=["user", "bot"], sep="###")
    conv.append("user", "hi")
    conv.append("bot", "")
    assert conv.get_prompt() == "SYS###user: hi###bot:"

    two = Conversation(system="SYS", roles=["u", "b"], sep=" ", sep2="</s>",
                       sep_style=SeparatorStyle.TWO)
    two.append("u", "q")
    two.append("b", "a")
    assert two.get_prompt() == "SYS u: q b: a</s>"

    mpt = Conversation(system="S", roles=["u", "b"], sep="<|end|>",
                       sep_style=SeparatorStyle.MPT)
    mpt.append("u", "x")
    assert mpt.get_prompt() == "S<|end|>ux<|end|>"

    plain = Conversation(system="", roles=["u", "b"], sep="\n",
                         sep_style=SeparatorStyle.PLAIN)
    plain.append("u", "p1")
    plain.append("b", "p2")
    assert plain.get_prompt() == "p1\np2\n"

    l2 = Conversation(system="S", roles=["u", "b"], sep="<s>", sep2="</s>",
                      sep_style=SeparatorStyle.LLAMA_2)
    l2.append("u", "q")
    l2.append("b", "a")
    out = l2.get_prompt()
    assert "[INST] <<SYS>>\nS\n<</SYS>>\n\nq [/INST]" in out
    assert out.endswith(" a </s>")


def test_length_histogram():
    from opus_pllm_tpu.data.datasets import length_histogram

    h = length_histogram(["A" * 10, "B" * 300, "C" * 2600])
    assert h["[0, 250)"] == 1
    assert h["[250, 500)"] == 1
    assert h["[2500, 3000)"] == 1

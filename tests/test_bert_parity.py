"""BERT encoder numerical parity vs HF BertModel (BERTScore backbone)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opus_pllm_tpu.core.config import BertConfig
from opus_pllm_tpu.models import bert


@pytest.mark.parity
def test_bert_matches_hf():
    torch = pytest.importorskip("torch")
    from transformers import BertConfig as HFBertConfig, BertModel

    from opus_pllm_tpu.core import convert

    cfg = BertConfig.tiny()
    hf_cfg = HFBertConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_layers, num_attention_heads=cfg.num_heads,
        intermediate_size=cfg.intermediate_size,
        max_position_embeddings=cfg.max_position_embeddings,
        type_vocab_size=cfg.type_vocab_size,
        layer_norm_eps=cfg.layer_norm_eps, hidden_act="gelu",
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    torch.manual_seed(0)
    hf = BertModel(hf_cfg, add_pooling_layer=False).eval()
    params = convert.bert_from_hf(hf.state_dict(), cfg)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, (2, 12))
    attn = np.ones((2, 12), dtype=np.int64)
    attn[1, 9:] = 0
    with torch.no_grad():
        golden = hf(torch.tensor(ids),
                    attention_mask=torch.tensor(attn)).last_hidden_state
    ours = bert.encode(params, cfg, jnp.asarray(ids, jnp.int32),
                       jnp.asarray(attn.astype(bool)))
    # compare only non-pad positions (HF computes garbage at masked slots)
    m = attn.astype(bool)
    np.testing.assert_allclose(np.asarray(ours)[m], golden.numpy()[m],
                               rtol=2e-4, atol=2e-4)

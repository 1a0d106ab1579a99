"""ESM2 encoder: shape/pooling unit tests + numerical parity vs HF EsmModel.

The parity test builds a random-weight `transformers.EsmModel` (the HF port of
fair-esm ESM2, same architecture as the reference's esm2_t33_650M —
cstp_v3/modelling.py:21), converts its weights, and checks layer outputs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opus_pllm_tpu.core.config import ESM2Config
from opus_pllm_tpu.models import esm2


def test_tokenize_roundtrip():
    toks, lens = esm2.tokenize(["ACDEF", "KLMNPQRSTV"])
    assert toks.shape == (2, 12)  # longest: 10 + cls + eos
    assert lens.tolist() == [7, 12]
    assert toks[0, 0] == esm2.TOKEN_TO_ID["<cls>"]
    assert toks[0, 6] == esm2.TOKEN_TO_ID["<eos>"]
    assert toks[0, 7] == esm2.TOKEN_TO_ID["<pad>"]
    assert toks[0, 1] == esm2.TOKEN_TO_ID["A"]


def test_encode_shapes_and_padding_invariance():
    cfg = ESM2Config.tiny()
    params = esm2.init(jax.random.PRNGKey(0), cfg)
    toks, _ = esm2.tokenize(["ACDEFGH", "KL"])
    out = esm2.encode(params, cfg, jnp.asarray(toks))
    assert out.shape == (2, 9, cfg.embed_dim)

    # padding the batch further must not change the pooled embedding
    toks_wide, _ = esm2.tokenize(["ACDEFGH", "KL"], max_len=16)
    e1 = esm2.pooled_embedding(params, cfg, jnp.asarray(toks))
    e2 = esm2.pooled_embedding(params, cfg, jnp.asarray(toks_wide))
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), atol=1e-5)


def test_pooled_excludes_cls_eos():
    cfg = ESM2Config.tiny()
    params = esm2.init(jax.random.PRNGKey(1), cfg)
    toks, _ = esm2.tokenize(["ACD"])
    reps = esm2.encode(params, cfg, jnp.asarray(toks))
    pooled = esm2.pooled_embedding(params, cfg, jnp.asarray(toks))
    manual = np.asarray(reps)[0, 1:4].mean(0)
    np.testing.assert_allclose(np.asarray(pooled)[0], manual, rtol=2e-5, atol=1e-5)


@pytest.mark.parity
def test_parity_vs_hf_esm():
    torch = pytest.importorskip("torch")
    from transformers import EsmConfig, EsmModel

    from opus_pllm_tpu.core.convert import esm2_from_hf

    hf_cfg = EsmConfig(
        vocab_size=33, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=256,
        max_position_embeddings=128, position_embedding_type="rotary",
        emb_layer_norm_before=False, token_dropout=True,
        pad_token_id=1, mask_token_id=32, layer_norm_eps=1e-5,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    hf = EsmModel(hf_cfg, add_pooling_layer=False).eval()

    cfg = ESM2Config.tiny()
    params = esm2_from_hf(hf.state_dict(), cfg)

    toks_np, _ = esm2.tokenize(["ACDEFGHIKLMNPQRSTVWY", "MKV"])
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(toks_np, dtype=torch.long),
                 attention_mask=torch.tensor(toks_np != 1, dtype=torch.long)
                 ).last_hidden_state.numpy()
    ours = np.asarray(esm2.encode(params, cfg, jnp.asarray(toks_np)))
    valid = (toks_np != 1)[..., None]
    np.testing.assert_allclose(np.where(valid, ours, 0),
                               np.where(valid, ref, 0), rtol=2e-4, atol=2e-4)

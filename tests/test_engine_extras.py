"""Generation engine extras: stop sequences; evidential loss variants;
AUPR/Fmax multilabel metrics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opus_pllm_tpu.bridge import losses
from opus_pllm_tpu.core.config import DecoderConfig
from opus_pllm_tpu.evals import multilabel as ML
from opus_pllm_tpu.infer import engine
from opus_pllm_tpu.models import decoder


def test_stop_sequence_halts_generation():
    cfg = DecoderConfig.tiny()
    params = decoder.init(jax.random.PRNGKey(0), cfg)
    emb = jax.random.normal(jax.random.PRNGKey(1), (1, 6, cfg.hidden_size)) * 0.1
    mask = jnp.ones((1, 6), bool)
    pos = jnp.broadcast_to(jnp.arange(6), (1, 6))
    base = engine.generate(params, cfg, emb, mask, pos, jax.random.PRNGKey(0),
                           max_new_tokens=8, temperature=0.0, eos_token_id=-1)
    first = int(base.tokens[0, 0])
    stops = engine.make_stop_sequences([[first]])
    stopped = engine.generate(params, cfg, emb, mask, pos,
                              jax.random.PRNGKey(0), max_new_tokens=8,
                              temperature=0.0, eos_token_id=-1,
                              stop_sequences=stops)
    # first token matches its own stop word -> everything after is pad
    assert int(stopped.tokens[0, 0]) == first
    assert (np.asarray(stopped.tokens[0, 1:]) == 0).all()


def test_multi_token_stop_sequence():
    cfg = DecoderConfig.tiny()
    params = decoder.init(jax.random.PRNGKey(0), cfg)
    emb = jax.random.normal(jax.random.PRNGKey(1), (1, 6, cfg.hidden_size)) * 0.1
    mask = jnp.ones((1, 6), bool)
    pos = jnp.broadcast_to(jnp.arange(6), (1, 6))
    base = engine.generate(params, cfg, emb, mask, pos, jax.random.PRNGKey(0),
                           max_new_tokens=8, temperature=0.0, eos_token_id=-1)
    t = [int(x) for x in np.asarray(base.tokens[0])]
    stops = engine.make_stop_sequences([[t[1], t[2]]])
    stopped = engine.generate(params, cfg, emb, mask, pos,
                              jax.random.PRNGKey(0), max_new_tokens=8,
                              temperature=0.0, eos_token_id=-1,
                              stop_sequences=stops)
    got = [int(x) for x in np.asarray(stopped.tokens[0])]
    # earliest window matching the suffix wins; find it in the unstopped run
    first_hit = next(i for i in range(1, len(t))
                     if t[i - 1:i + 1] == [t[1], t[2]])
    assert got[:first_hit + 1] == t[:first_hit + 1]
    assert all(x == 0 for x in got[first_hit + 1:])


def test_evidential_loss_variants_finite_and_distinct():
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(8, 8)) * 3, jnp.float32)
    tg = jnp.arange(8)
    vals = {name: float(fn(logits, tg, global_step=100))
            for name, fn in losses.EVIDENTIAL_LOSSES.items()}
    assert all(np.isfinite(v) for v in vals.values())
    assert len({round(v, 6) for v in vals.values()}) == 3


def test_evidential_mse_matches_torch_formula():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(1)
    x = rng.normal(size=(6, 6)).astype(np.float32)
    tg = np.arange(6)
    ours = float(losses.evidential_mse(jnp.asarray(x), jnp.asarray(tg),
                                       global_step=0, kl_threshold=30))
    xt = torch.tensor(x)
    alpha = torch.nn.functional.elu(xt) + 1 + 1.0   # W/c = 1
    s = alpha.sum(1, keepdim=True)
    label = torch.nn.functional.one_hot(torch.tensor(tg), 6).float()
    err = ((label - alpha / s) ** 2).sum(1, keepdim=True)
    var = (alpha * (s - alpha) / (s * s * (s + 1))).sum(1, keepdim=True)
    np.testing.assert_allclose(ours, float((err + var).mean()), rtol=1e-5)


def test_aupr_fmax_matches_sklearn():
    sk = pytest.importorskip("sklearn.metrics")
    rng = np.random.default_rng(2)
    labels = (rng.random((50, 4)) > 0.6).astype(int)
    labels[:, 0] = np.r_[np.ones(25, int), np.zeros(25, int)]  # ensure both classes
    scores = rng.random((50, 4)) + labels * 0.5
    ours_aupr, ours_fmax = ML.aupr_fmax(labels, scores)
    g_auprs, g_fmax = [], []
    for c in range(4):
        p, r, _ = sk.precision_recall_curve(labels[:, c], scores[:, c])
        g_auprs.append(sk.auc(r, p))
        f1 = 2 * p * r / (p + r + np.finfo(float).eps)
        g_fmax.append(f1.max())
    np.testing.assert_allclose(ours_aupr, np.mean(g_auprs), rtol=1e-6)
    np.testing.assert_allclose(ours_fmax, np.mean(g_fmax), rtol=1e-6)


def test_update_dict_nonnull():
    assert ML.update_dict_nonnull({"a": 1, "b": 2}, {"b": 3, "c": 4}) == \
        {"a": 1, "b": 3, "c": 4}
    assert ML.update_dict_nonnull({"a": 1}, {"a": None}) == {"a": 1}


@pytest.mark.parity
@pytest.mark.parametrize("num_beams", [2, 3])
def test_beam_search_matches_hf(num_beams):
    """beam_generate vs transformers' beam search on identical tiny weights,
    generating from inputs_embeds (the reference calls HF generate with
    num_beams via run_opus_ddp.py:156-158)."""
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig, LlamaForCausalLM

    from opus_pllm_tpu.core.config import DecoderConfig
    from opus_pllm_tpu.core.convert import decoder_from_hf

    v, h = 64, 32
    hf_cfg = LlamaConfig(
        vocab_size=v, hidden_size=h, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=10000.0, rms_norm_eps=1e-5,
        tie_word_embeddings=False, bos_token_id=1, eos_token_id=2,
        pad_token_id=0)
    torch.manual_seed(4)
    hf = LlamaForCausalLM(hf_cfg).eval()
    with torch.no_grad():
        hf.lm_head.weight.mul_(4.0)   # decisive logit gaps

    cfg = DecoderConfig(
        family="llama", vocab_size=v, hidden_size=h, intermediate_size=64,
        num_layers=2, num_heads=2, num_kv_heads=2, head_dim=16,
        max_position_embeddings=128, rope_theta=10000.0, dtype="float32",
        tie_word_embeddings=False)
    params = decoder_from_hf(hf.state_dict(), cfg, dtype=jnp.float32)

    b, l, max_new = 2, 5, 12
    torch.manual_seed(5)
    emb_t = torch.randn(b, l, h) * 0.6
    with torch.no_grad():
        out_hf = hf.generate(
            inputs_embeds=emb_t, attention_mask=torch.ones(b, l,
                                                           dtype=torch.long),
            num_beams=num_beams, do_sample=False, max_new_tokens=max_new,
            eos_token_id=2, pad_token_id=0, use_cache=True)

    emb = jnp.asarray(emb_t.numpy())
    mask = jnp.ones((b, l), bool)
    pos = jnp.broadcast_to(jnp.arange(l), (b, l))
    out = engine.beam_generate(params, cfg, emb, mask, pos,
                               num_beams=num_beams, max_new_tokens=max_new,
                               eos_token_id=2, pad_token_id=0)
    ours_tok = np.asarray(out.tokens)
    ours_len = np.asarray(out.lengths)
    for i in range(b):
        theirs = [int(t) for t in out_hf[i].tolist()]
        # HF pads finished rows; trim at (and including) first EOS
        if 2 in theirs:
            theirs = theirs[:theirs.index(2) + 1]
        ours = [int(t) for t in ours_tok[i, :ours_len[i]]]
        assert ours == theirs, (num_beams, i, ours, theirs)


def test_beam_one_matches_greedy():
    cfg = DecoderConfig.tiny()
    params = decoder.init(jax.random.PRNGKey(0), cfg)
    b, l = 2, 4
    emb = jax.random.normal(jax.random.PRNGKey(1), (b, l, cfg.hidden_size),
                            jnp.float32) * 0.5
    mask = jnp.ones((b, l), bool)
    pos = jnp.broadcast_to(jnp.arange(l), (b, l))
    g = engine.generate(params, cfg, emb, mask, pos, jax.random.PRNGKey(0),
                        max_new_tokens=8, temperature=0.0, eos_token_id=-1,
                        pad_token_id=0)
    bm = engine.beam_generate(params, cfg, emb, mask, pos, num_beams=1,
                              max_new_tokens=8, eos_token_id=-1,
                              pad_token_id=0)
    np.testing.assert_array_equal(np.asarray(g.tokens), np.asarray(bm.tokens))

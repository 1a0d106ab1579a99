"""Tail of the vendored-metric surface: the last 9 names, with
hand-computed goldens where the math is small enough to do by hand."""

import numpy as np
import pytest

from opus_pllm_tpu.evals import metric_registry


def load(name):
    return metric_registry.load(name)


def test_registry_covers_all_54_vendored_names():
    vendored = {
        "accuracy", "bertscore", "bleu", "bleurt", "brier_score", "cer",
        "character", "charcut_mt", "chrf", "code_eval", "comet",
        "competition_math", "confusion_matrix", "coval", "cuad",
        "exact_match", "f1", "frugalscore", "glue", "google_bleu",
        "indic_glue", "mae", "mahalanobis", "mape", "mase",
        "matthews_correlation", "mauve", "mean_iou", "meteor", "mse",
        "nist_mt", "pearsonr", "perplexity", "poseval", "precision",
        "r_squared", "recall", "rl_reliability", "roc_auc", "rouge",
        "sacrebleu", "sari", "seqeval", "smape", "spearmanr", "squad",
        "squad_v2", "super_glue", "ter", "trec_eval", "wer", "wiki_split",
        "xnli", "xtreme_s"}
    assert vendored <= set(metric_registry.available())


# --- cuad ------------------------------------------------------------------

def test_cuad_exact_and_f1():
    m = load("cuad")
    r = m.compute(
        predictions=[{"id": "a", "prediction_text": "the governing law"},
                     {"id": "b", "prediction_text": "wrong answer"}],
        references=[{"id": "a", "answers": {"text": ["the governing law"],
                                            "answer_start": [0]}},
                    {"id": "b", "answers": {"text": ["termination clause"],
                                            "answer_start": [0]}}])
    assert r["exact_match"] == pytest.approx(50.0)
    assert 0.0 < r["f1"] < 100.0 or r["f1"] == pytest.approx(50.0)


def test_cuad_aupr_perfect_ranking():
    m = load("cuad")
    # correct prediction ranked above the wrong one -> AUPR 100
    r = m.compute(
        predictions=[
            {"id": "a", "prediction_text": "alpha beta", "confidence": 0.9},
            {"id": "b", "prediction_text": "zzz", "confidence": 0.1}],
        references=[
            {"id": "a", "answers": {"text": ["alpha beta"]}},
            {"id": "b", "answers": {"text": ["gamma delta"]}}])
    assert r["aupr"] == pytest.approx(100.0)
    assert r["prec_at_80_recall"] == pytest.approx(100.0)


# --- coval -----------------------------------------------------------------

def test_coval_perfect():
    m = load("coval")
    doc = [[(0, 1), (3, 4)], [(6, 7)]]
    r = m.compute(predictions=[doc], references=[doc])
    for k in ("muc/f1", "b_cubed/f1", "ceafe/f1", "lea/f1", "mentions/f1"):
        assert r[k] == pytest.approx(100.0), k
    assert r["conll_score"] == pytest.approx(100.0)


def test_coval_muc_hand_value():
    # key: {a,b,c}; response: {a,b},{c}  ->  MUC R = (3-2)/(3-1) = 0.5,
    # P = ((2-1)+(1-1)) / ((2-1)+(1-1)) = 1.0, F1 = 2/3
    m = load("coval")
    r = m.compute(predictions=[[["a", "b"], ["c"]]],
                  references=[[["a", "b", "c"]]])
    assert r["muc/recall"] == pytest.approx(50.0)
    assert r["muc/precision"] == pytest.approx(100.0)
    assert r["muc/f1"] == pytest.approx(200.0 / 3.0)


def test_coval_b3_hand_value():
    # key {a,b,c} vs resp {a,b},{c}: B3 recall = (2^2/3 + 1/3)/3 = 5/9,
    # precision = (4/2)/3 + (1/1)/3 = 1.0
    m = load("coval")
    r = m.compute(predictions=[[["a", "b"], ["c"]]],
                  references=[[["a", "b", "c"]]])
    assert r["b_cubed/recall"] == pytest.approx(100 * 5 / 9)
    assert r["b_cubed/precision"] == pytest.approx(100.0)


# --- charcut_mt ------------------------------------------------------------

def test_charcut_identical_is_zero():
    m = load("charcut_mt")
    assert m.compute(predictions=["hello world"],
                     references=["hello world"])["charcut_mt"] == 0.0


def test_charcut_disjoint_is_one():
    m = load("charcut_mt")
    assert m.compute(predictions=["aaaa"],
                     references=["bbbb"])["charcut_mt"] == 1.0


def test_charcut_partial_ordering():
    m = load("charcut_mt")
    near = m.compute(predictions=["the cat sat"],
                     references=["the cat sag"])["charcut_mt"]
    far = m.compute(predictions=["qqq www"],
                    references=["the cat sag"])["charcut_mt"]
    assert 0 < near < far <= 1.0


# --- rl_reliability --------------------------------------------------------

def test_rl_reliability_flat_curves():
    m = load("rl_reliability")
    ts = [np.arange(10)] * 3
    flat = [np.ones(10) * 5.0] * 3
    r = m.compute(timesteps=ts, rewards=flat)
    assert r["IqrWithinRuns"] == 0.0
    assert r["IqrAcrossRuns"] == 0.0
    assert r["MaxDrawdown"] == 0.0
    assert r["MedianPerfDuringTraining"] == 5.0


def test_rl_reliability_dispersion_orders():
    m = load("rl_reliability")
    ts = [np.arange(50)] * 4
    rng = np.random.default_rng(0)
    calm = [np.arange(50.0) + rng.normal(0, 0.1, 50) for _ in range(4)]
    wild = [np.arange(50.0) + rng.normal(0, 5.0, 50) for _ in range(4)]
    rc = m.compute(timesteps=ts, rewards=calm)
    rw = m.compute(timesteps=ts, rewards=wild)
    assert rc["IqrWithinRuns"] < rw["IqrWithinRuns"]
    assert rc["MaxDrawdown"] < rw["MaxDrawdown"]
    # risk metrics are lower-is-worse (CVaR of diffs)
    assert rc["LowerCVaROnDiffs"] > rw["LowerCVaROnDiffs"]


# --- mauve -----------------------------------------------------------------

def test_mauve_identical_distributions_near_one():
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(200, 8))
    m = load("mauve")
    r = m.compute(p_features=feats, q_features=feats.copy(),
                  num_buckets=10)
    assert r["mauve"] > 0.98


def test_mauve_disjoint_distributions_near_zero():
    rng = np.random.default_rng(0)
    p = rng.normal(size=(200, 8))
    q = rng.normal(size=(200, 8)) + 50.0
    m = load("mauve")
    r = m.compute(p_features=p, q_features=q, num_buckets=10)
    assert r["mauve"] < 0.05


def test_mauve_requires_features_or_embed_fn():
    with pytest.raises(ValueError, match="embed_fn"):
        load("mauve").compute(predictions=["a"], references=["b"])


# --- model-parameterized scorers ------------------------------------------

def test_perplexity_from_logprobs():
    m = load("perplexity")
    r = m.compute(predictions=["x", "y"],
                  logprobs=[[-1.0, -1.0], [-2.0]])
    assert r["perplexities"][0] == pytest.approx(np.e)
    assert r["perplexities"][1] == pytest.approx(np.exp(2.0))


def test_perplexity_over_own_decoder():
    """End-to-end: make_logprob_fn over a tiny decoder; a sequence the
    model has memorized scores lower perplexity than a random one."""
    import jax

    from opus_pllm_tpu.core.config import DecoderConfig
    from opus_pllm_tpu.infer.scoring import make_logprob_fn
    from opus_pllm_tpu.models import decoder

    cfg = DecoderConfig(family="llama", vocab_size=64, hidden_size=32,
                        intermediate_size=64, num_layers=2, num_heads=2,
                        num_kv_heads=2, head_dim=16, dtype="float32")
    params = decoder.init(jax.random.PRNGKey(0), cfg)
    encode = {"ab": [3, 4, 5, 6], "cd": [9, 9, 9, 9]}.__getitem__
    fn = make_logprob_fn(params, cfg, encode, bos_token_id=1,
                         max_len=16, len_bucket=8)
    lps = fn(["ab", "cd"])
    assert len(lps) == 2 and len(lps[0]) == 4   # BOS prepended, 4 scored
    assert all(np.isfinite(lps[0])) and all(l < 0 for l in lps[0])
    r = load("perplexity").compute(predictions=["ab"], logprob_fn=fn)
    assert np.isfinite(r["mean_perplexity"]) and r["mean_perplexity"] > 1


def test_learned_scorers_require_score_fn():
    for name in ("bleurt", "frugalscore"):
        with pytest.raises(ValueError, match="score_fn"):
            load(name).compute(predictions=["a"], references=["b"])
    with pytest.raises(ValueError, match="score_fn"):
        load("comet").compute(predictions=["a"], references=["b"],
                              sources=["s"])


def test_learned_scorers_with_supplied_fn():
    fake = lambda p, r: [0.5] * len(p)
    r = load("bleurt").compute(predictions=["a", "b"], references=["x", "y"],
                               score_fn=fake)
    assert r["scores"] == [0.5, 0.5] and r["mean_score"] == 0.5
    fake3 = lambda s, p, r: [float(len(s))] * len(p)
    r = load("comet").compute(sources=["s1", "s2"], predictions=["a", "b"],
                              references=["x", "y"], score_fn=fake3)
    assert r["mean_score"] == 2.0

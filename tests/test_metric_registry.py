"""Native metric registry vs sklearn/scipy/jiwer-style goldens."""

import numpy as np
import pytest

from opus_pllm_tpu.evals import metric_registry as mr


def test_load_accepts_reference_style_paths():
    assert mr.load("./metrics/bleu").name == "bleu"
    assert mr.load("f1").name == "f1"
    with pytest.raises(KeyError):
        mr.load("nope")


def test_classification_metrics_match_sklearn():
    sk = pytest.importorskip("sklearn.metrics")
    rng = np.random.default_rng(0)
    r = rng.integers(0, 2, 50)
    p = rng.integers(0, 2, 50)
    assert mr.load("accuracy").compute(predictions=p, references=r)[
        "accuracy"] == pytest.approx(sk.accuracy_score(r, p))
    for name, fn in (("precision", sk.precision_score),
                     ("recall", sk.recall_score), ("f1", sk.f1_score)):
        assert mr.load(name).compute(predictions=p, references=r)[
            name] == pytest.approx(fn(r, p))
    # multiclass micro/macro
    r3 = rng.integers(0, 3, 60)
    p3 = rng.integers(0, 3, 60)
    for avg in ("micro", "macro"):
        assert mr.load("f1").compute(predictions=p3, references=r3,
                                     average=avg)["f1"] == pytest.approx(
            sk.f1_score(r3, p3, average=avg))
    assert mr.load("matthews_correlation").compute(
        predictions=p3, references=r3)["matthews_correlation"] == \
        pytest.approx(sk.matthews_corrcoef(r3, p3))


def test_regression_and_correlation_match_scipy():
    sp = pytest.importorskip("scipy.stats")
    rng = np.random.default_rng(1)
    r = rng.normal(size=40)
    p = r * 0.5 + rng.normal(size=40) * 0.3
    assert mr.load("mae").compute(predictions=p, references=r)[
        "mae"] == pytest.approx(np.mean(np.abs(p - r)))
    assert mr.load("mse").compute(predictions=p, references=r)[
        "mse"] == pytest.approx(np.mean((p - r) ** 2))
    assert mr.load("pearsonr").compute(predictions=p, references=r)[
        "pearsonr"] == pytest.approx(sp.pearsonr(p, r)[0], abs=1e-9)
    # ties exercise the average-rank path
    p_t = np.round(p, 1)
    assert mr.load("spearmanr").compute(predictions=p_t, references=r)[
        "spearmanr"] == pytest.approx(sp.spearmanr(p_t, r)[0], abs=1e-9)


def test_exact_match_flags():
    out = mr.load("exact_match").compute(
        predictions=["Cat.", "dog"], references=["cat", "dog"])
    assert out["exact_match"] == 0.5
    out = mr.load("exact_match").compute(
        predictions=["Cat.", "dog"], references=["cat", "dog"],
        ignore_case=True, ignore_punctuation=True)
    assert out["exact_match"] == 1.0


def test_wer_cer_hand_values():
    # "the cat sat" -> "the cat sat on" : 1 deletion of 4 ref words
    assert mr.load("wer").compute(predictions=["the cat sat"],
                                  references=["the cat sat on"])[
        "wer"] == pytest.approx(1 / 4)
    # kitten -> sitting: classic distance 3 over 7 ref chars
    assert mr.load("cer").compute(predictions=["kitten"],
                                  references=["sitting"])[
        "cer"] == pytest.approx(3 / 7)


def test_chrf_perfect_and_disjoint():
    assert mr.load("chrf").compute(predictions=["hello world"],
                                   references=["hello world"])[
        "score"] == pytest.approx(100.0)
    assert mr.load("chrf").compute(predictions=["aaaa"],
                                   references=["zzzz"])["score"] == 0.0


def test_text_generation_reexports():
    p = ["the protein binds atp"]
    r = ["the protein binds atp"]
    assert mr.load("bleu").compute(predictions=p, references=r)[
        "bleu"] == pytest.approx(1.0)
    rg = mr.load("rouge").compute(predictions=p, references=[r[0]])
    assert rg["rouge1"] == pytest.approx(1.0)
    assert mr.load("meteor").compute(predictions=p, references=r)[
        "meteor"] == pytest.approx(1.0, abs=0.01)
    with pytest.raises(ValueError):
        mr.load("bertscore").compute(predictions=p, references=r)

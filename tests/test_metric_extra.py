"""Extended metric registry: hand-computed goldens per family."""

import numpy as np
import pytest

from opus_pllm_tpu.evals import metric_registry


def load(name):
    return metric_registry.load(name)


def test_registry_covers_45_names():
    assert len(metric_registry.available()) >= 45


# --- MT family -------------------------------------------------------------

def test_sacrebleu_perfect_and_zero():
    m = load("sacrebleu")
    r = m.compute(predictions=["the cat sat on the mat"],
                  references=[["the cat sat on the mat"]])
    assert r["score"] == pytest.approx(100.0)
    # fully wrong 4-token prediction: every order exp-smoothed, bp = 1
    r = m.compute(predictions=["x y z w"],
                  references=[["the cat sat on"]])
    assert r["score"] < 15.0


def test_sacrebleu_partial_monotone():
    m = load("sacrebleu")
    good = m.compute(predictions=["the cat sat on a mat"],
                     references=[["the cat sat on the mat"]])["score"]
    bad = m.compute(predictions=["a dog ran in grass"],
                    references=[["the cat sat on the mat"]])["score"]
    assert 0 < bad < good < 100


def test_google_bleu_hand_value():
    # pred "a b c", ref "a b d": 1-grams match 2/3, 2-grams 1/2, 3-grams 0/1
    # match=3, p_total=6, r_total=6 -> 0.5
    m = load("google_bleu")
    r = m.compute(predictions=["a b c"], references=[["a b d"]])
    assert r["google_bleu"] == pytest.approx(0.5)


def test_ter_identity_and_known_edits():
    m = load("ter")
    assert m.compute(predictions=["a b c"],
                     references=[["a b c"]])["score"] == 0.0
    # one substitution over 3 ref words = 33.3
    r = m.compute(predictions=["a x c"], references=[["a b c"]])
    assert r["score"] == pytest.approx(100.0 / 3, abs=0.1)
    assert r["num_edits"] == 1


def test_ter_shift_cheaper_than_rewrites():
    # "c a b" -> shift "c" to the end = 1 shift vs 2 substitutions
    m = load("ter")
    r = m.compute(predictions=["c a b"], references=[["a b c"]])
    assert r["num_edits"] <= 2


def test_nist_identity_positive():
    m = load("nist_mt")
    r = m.compute(predictions=["the cat sat"], references=[["the cat sat"]])
    assert r["nist_mt"] > 0


def test_character_metric():
    m = load("character")
    assert m.compute(predictions=["abc"], references=["abc"])["cer_score"] == 0
    assert m.compute(predictions=["abd"],
                     references=["abc"])["cer_score"] == pytest.approx(1 / 3)


# --- QA --------------------------------------------------------------------

def test_squad_formats_and_scores():
    m = load("squad")
    preds = [{"prediction_text": "The Eiffel Tower", "id": "1"}]
    refs = [{"answers": {"text": ["eiffel tower"], "answer_start": [0]},
             "id": "1"}]
    r = m.compute(predictions=preds, references=refs)
    assert r["exact_match"] == 100.0 and r["f1"] == 100.0
    # plain-string form, partial overlap
    r = m.compute(predictions=["paris france"], references=["paris"])
    assert r["exact_match"] == 0.0 and 0 < r["f1"] < 100


def test_squad_v2_unanswerable():
    m = load("squad_v2")
    r = m.compute(predictions=[""], references=[{"answers": {"text": []},
                                                "id": "1"}])
    assert r["exact"] == 100.0


# --- sequence labeling -----------------------------------------------------

def test_seqeval_span_f1():
    m = load("seqeval")
    preds = [["B-PER", "I-PER", "O", "B-LOC"]]
    refs = [["B-PER", "I-PER", "O", "B-ORG"]]
    r = m.compute(predictions=preds, references=refs)
    assert r["PER"]["f1"] == 1.0
    assert r["overall_precision"] == 0.5 and r["overall_recall"] == 0.5
    assert r["overall_accuracy"] == 0.75


def test_poseval_token_report():
    m = load("poseval")
    r = m.compute(predictions=[["N", "V", "N"]], references=[["N", "V", "V"]])
    assert r["accuracy"] == pytest.approx(2 / 3)
    assert r["V"]["precision"] == 1.0 and r["V"]["recall"] == 0.5


# --- simplification --------------------------------------------------------

def test_sari_copies_vs_simplifies():
    m = load("sari")
    src = ["the quick brown fox jumped over the lazy dog"]
    ref = [["the fox jumped over the dog"]]
    copy = m.compute(predictions=src, references=ref, sources=src)["sari"]
    good = m.compute(predictions=["the fox jumped over the dog"],
                     references=ref, sources=src)["sari"]
    assert good > copy


def test_wiki_split_bundle():
    m = load("wiki_split")
    r = m.compute(predictions=["a b c"], references=[["a b c"]],
                  sources=["a b c d"])
    assert r["exact"] == 100.0 and r["sacrebleu"] == pytest.approx(100.0)


# --- regression / probabilistic -------------------------------------------

def test_regression_family():
    p, r = [2.0, 4.0], [1.0, 4.0]
    assert load("mape").compute(predictions=p,
                                references=r)["mape"] == pytest.approx(0.5)
    assert load("smape").compute(predictions=p, references=r)[
        "smape"] == pytest.approx((2 * 1 / 3) / 2)
    assert load("r_squared").compute(
        predictions=[1.0, 2.0, 3.0],
        references=[1.0, 2.0, 3.0])["r_squared"] == 1.0
    assert load("brier_score").compute(
        predictions=[1.0, 0.0], references=[1.0, 0.0])["brier_score"] == 0.0
    assert load("mase").compute(
        predictions=[3.0], references=[4.0],
        training=[1.0, 2.0, 3.0])["mase"] == pytest.approx(1.0)


def test_confusion_matrix():
    r = load("confusion_matrix").compute(predictions=[0, 1, 1],
                                         references=[0, 1, 0])
    assert r["confusion_matrix"] == [[1, 1], [0, 1]]


def test_roc_auc_binary_and_perfect():
    m = load("roc_auc")
    r = m.compute(predictions=[0.9, 0.8, 0.2, 0.1],
                  references=[1, 1, 0, 0])
    assert r["roc_auc"] == 1.0
    # pos {0.1, 0.8} vs neg {0.2, 0.9}: only (0.8 > 0.2) of 4 pairs
    r = m.compute(predictions=[0.1, 0.8, 0.2, 0.9],
                  references=[1, 1, 0, 0])
    assert r["roc_auc"] == 0.25


def test_mean_iou():
    m = load("mean_iou")
    r = m.compute(predictions=[np.array([[0, 1], [1, 1]])],
                  references=[np.array([[0, 1], [0, 1]])], num_labels=2)
    # class 0: inter 1, union 2; class 1: inter 2, union 3
    assert r["mean_iou"] == pytest.approx((0.5 + 2 / 3) / 2)


def test_mahalanobis():
    ref = np.array([[0.0, 0.0], [1.0, 1.0], [0.0, 1.0], [1.0, 0.0]])
    r = load("mahalanobis").compute(predictions=[[0.5, 0.5]],
                                    reference_distribution=ref)
    assert r["mahalanobis"][0] == pytest.approx(0.0, abs=1e-9)


# --- IR / math / code ------------------------------------------------------

def test_trec_eval_core_measures():
    run = {"q1": {"d1": 0.9, "d2": 0.5, "d3": 0.1}}
    qrel = {"q1": {"d1": 1, "d3": 1}}
    r = load("trec_eval").compute(predictions=run, references=qrel, k=3)
    assert r["recip_rank"] == 1.0
    assert r["map"] == pytest.approx((1 / 1 + 2 / 3) / 2)


def test_competition_math_normalization():
    m = load("competition_math")
    r = m.compute(predictions=["\\boxed{\\frac{1}{2}}"], references=["1/2"])
    assert r["accuracy"] == 1.0
    r = m.compute(predictions=["0.5"], references=["1/2"])
    assert r["accuracy"] == 0.0


def test_code_eval_gate_and_pass_at_k(monkeypatch):
    m = load("code_eval")
    monkeypatch.delenv("HF_ALLOW_CODE_EVAL", raising=False)
    with pytest.raises(ValueError):
        m.compute(predictions=[["def f():\n    return 1"]],
                  references=["assert f() == 1"])
    monkeypatch.setenv("HF_ALLOW_CODE_EVAL", "1")
    r = m.compute(predictions=[["def f():\n    return 1",
                                "def f():\n    return 2"]],
                  references=["assert f() == 1"], k=(1,))
    assert r["pass@1"] == pytest.approx(0.5)


# --- suite dispatchers -----------------------------------------------------

def test_glue_dispatch():
    g = load("glue")
    assert g.compute(predictions=[1, 0], references=[1, 1],
                     config_name="sst2")["accuracy"] == 0.5
    r = g.compute(predictions=[1, 0, 1], references=[1, 1, 1],
                  config_name="mrpc")
    assert "f1" in r and "accuracy" in r
    r = g.compute(predictions=[1.0, 2.0, 3.0], references=[1.0, 2.0, 3.0],
                  config_name="stsb")
    assert r["pearsonr"] == pytest.approx(1.0)
    assert "matthews_correlation" in g.compute(
        predictions=[1, 0], references=[1, 0], config_name="cola")


def test_super_glue_and_xnli():
    sg = load("super_glue")
    assert sg.compute(predictions=[1, 1], references=[1, 0],
                      config_name="boolq")["accuracy"] == 0.5
    r = sg.compute(predictions=["the cat"], references=["The cat."],
                   config_name="record")
    assert r["exact_match"] == 1.0
    assert load("xnli").compute(predictions=[0, 1],
                                references=[0, 1])["accuracy"] == 1.0


def test_xtreme_s_dispatch():
    x = load("xtreme_s")
    r = x.compute(predictions=["a b"], references=["a c"],
                  config_name="mls")
    assert r["wer"] == pytest.approx(0.5)


def test_reference_path_style_load():
    m = metric_registry.load("./metrics/sacrebleu")
    assert m.name == "sacrebleu"

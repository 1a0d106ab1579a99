"""Eval metrics: golden parity vs rouge_score/sklearn + behavior tests."""

import numpy as np
import pytest

from opus_pllm_tpu.evals import metrics as M
from opus_pllm_tpu.evals import mcq
from opus_pllm_tpu.evals.textproc import porter_stem, stem, tokenize_13a

PREDS = [
    "Catalyzes the hydrolysis of ATP coupled with the transport of ions.",
    "Involved in DNA repair and recombination.\nActs as a helicase.",
    "Binds calcium.",
]
REFS = [
    "Catalyzes ATP hydrolysis coupled with cation transport.",
    "Involved in DNA repair.\nFunctions as an ATP-dependent helicase.",
    "This protein binds calcium ions with high affinity.",
]


def test_rouge_matches_rouge_score_package():
    rs = pytest.importorskip("rouge_score.rouge_scorer")
    scorer = rs.RougeScorer(["rouge1", "rouge2", "rougeL", "rougeLsum"],
                            use_stemmer=False)  # newline-split summaries
    ours = M.rouge_corpus(PREDS, REFS)
    golden = {k: [] for k in ("rouge1", "rouge2", "rougeL", "rougeLsum")}
    for p, r in zip(PREDS, REFS):
        s = scorer.score(r, p)
        for k in golden:
            golden[k].append(s[k].fmeasure)
    for k in golden:
        np.testing.assert_allclose(ours[k], np.mean(golden[k]), atol=1e-6,
                                   err_msg=k)


def test_label_set_metrics_match_sklearn():
    sk = pytest.importorskip("sklearn.metrics")
    from sklearn.preprocessing import MultiLabelBinarizer

    pred = ["atp binding", "dna repair", "zinc"]
    tgt = ["atp binding", "metal binding"]
    mlb = MultiLabelBinarizer(classes=sorted(set(pred + tgt)))
    y_true = mlb.fit_transform([tgt])
    y_pred = mlb.transform([pred])
    acc, p, r, f1 = M.label_set_metrics(pred, tgt)
    assert acc == sk.accuracy_score(y_true, y_pred)
    np.testing.assert_allclose(
        p, sk.precision_score(y_true, y_pred, average="micro", zero_division=0))
    np.testing.assert_allclose(
        r, sk.recall_score(y_true, y_pred, average="micro", zero_division=0))
    np.testing.assert_allclose(
        f1, sk.f1_score(y_true, y_pred, average="micro", zero_division=0))


def test_bleu_perfect_and_zero():
    assert M.bleu_corpus(["the cat sat on the mat"],
                         ["the cat sat on the mat"]) == pytest.approx(1.0)
    assert M.bleu_corpus(["aaa bbb"], ["ccc ddd eee fff ggg"]) == 0.0


def test_bleu_matches_nltk_corpus_bleu():
    nltk_bleu = pytest.importorskip("nltk.translate.bleu_score")
    hyps = [tokenize_13a(p) for p in PREDS]
    refs = [[tokenize_13a(r)] for r in REFS]
    golden = nltk_bleu.corpus_bleu(refs, hyps)
    ours = M.bleu_corpus(PREDS, REFS)
    # ours follows the Google/HF-evaluate BLEU (what the reference uses,
    # eval/metrics/bleu); nltk's corpus_bleu differs by ~1% on short corpora
    np.testing.assert_allclose(ours, golden, rtol=0.02)


def test_meteor_basic_properties():
    assert M.meteor_pair("the cat", "the cat") == pytest.approx(
        0.5 * 1.0 / (0.9 * 1 + 0.1 * 1) * (1 - 0.5 * (1 / 2) ** 3), abs=0.5)
    assert M.meteor_pair("the cat sat", "the cat sat") > 0.9
    assert M.meteor_pair("xyz", "abc") == 0.0
    # stemming stage: running ~ run
    assert M.meteor_pair("running fast", "run fast") > 0.5


def test_porter_stemmer_matches_nltk():
    nltk_porter = pytest.importorskip("nltk.stem.porter")
    ps = nltk_porter.PorterStemmer()
    words = ["localization", "catalyzes", "binding", "transport", "repair",
             "hydrolysis", "running", "flies", "agreed", "caresses",
             "ponies", "relational", "conditional", "happy", "electrical"]
    agree = sum(porter_stem(w) == ps.stem(w) for w in words)
    assert agree >= len(words) - 2  # our fallback tracks nltk closely


def test_dispatch_labels():
    res = [{"generated": "DNA repair; ATP binding.",
            "ground_truth": "dna repair;metal binding"}]
    out = M.compute_metrics(res, "OPI_UniProtSeq_keywords_test_unique.json")
    assert out["Precision"] == 0.5
    assert out["Recall"] == 0.5
    assert out["F1 Score"] == 0.5


def test_dispatch_localization_and_deeploc_map():
    labels = list(M.DEEPLOC_TO_OPI.keys())
    res = [{"generated": M.DEEPLOC_TO_OPI[l].lower(), "ground_truth": l}
           for l in labels]
    out = M.compute_metrics(res, "test_localization.json")
    assert out["Accuracy"] == 1.0


def test_dispatch_function_rouge_bleu_meteor():
    res = [{"generated": p, "ground_truth": r} for p, r in zip(PREDS, REFS)]
    out = M.compute_metrics(res, "OPI_UniProtSeq_function_test_unique.json")
    assert 0 < out["ROUGEScore"]["rouge1"] <= 1
    assert out["BERTScore"] is None
    assert 0 <= out["METEOR"] <= 1


def test_mcq_extraction():
    assert mcq.extract_option_letter("The correct answer is B).") == "B"
    assert mcq.extract_option_letter("b) something") == "B"
    assert mcq.extract_option_letter("answer: c") == "C"
    assert mcq.extract_option_letter("答案是 D") == "D"
    assert mcq.extract_option_letter("no option here") == "no option here"
    acc, counts = mcq.score([
        {"ground_truth": "A) foo", "generated": "The correct answer is A)."},
        {"ground_truth": "B) bar", "generated": "C) wrong"},
    ])
    assert acc == 0.5
    assert counts["A"] == 1 and counts["C"] == 1


def test_bertscore_identical_embeddings():
    rng = np.random.default_rng(0)
    e = rng.normal(size=(2, 5, 8)).astype(np.float32)
    m = np.ones((2, 5), bool)
    out = M.bertscore_from_embeddings(e, m, e, m)
    np.testing.assert_allclose(out["f1"], 1.0, atol=1e-6)

"""METEOR synonym stage behind the WNdb-format loader + the quantified
exact+stem-vs-synonym and ROUGE mean-vs-bootstrap divergences (round-4
verdict missing #4): the zero-egress image ships no WordNet corpus, so
parity with the reference's nltk stage-3 matcher
(eval/metrics/meteor/meteor.py) must be a pure data drop-in — this file
exercises the full code path on the bundled mini-fixture and records the
divergence bounds BENCH_NOTES.md cites."""

import os

import numpy as np
import pytest

from opus_pllm_tpu.evals import metrics
from opus_pllm_tpu.evals.wordnet import WordNetSynonyms

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "mini_wordnet")

# the quality-benchmark function-description pool (scripts/quality_eval.py
# FN_POOL) paired with paraphrases that differ by fixture synonyms — the
# function sets are the only METEOR consumers (metrics.py task=function)
FN_REFS = [
    "Catalyzes the hydrolysis of ATP to drive transport across membranes.",
    "Forms a channel that conducts potassium ions across the membrane.",
    "Acts as a chaperone assisting the folding of nascent polypeptides.",
]
FN_PREDS = [
    "Catalyzes the cleavage of ATP to drive transport across membranes.",
    "Forms a conduit that conducts potassium ions across the membrane.",
    "Acts as an escort assisting the folding of nascent polypeptides.",
]


@pytest.fixture(scope="module")
def wn():
    return WordNetSynonyms(FIXTURE)


def test_loader_reads_wndb_files(wn):
    assert {"hydrolysis", "cleavage"} <= wn.synonyms("hydrolysis")
    assert "transport" in wn.synonyms("convey")          # verb file
    assert "catalytic" in wn.synonyms("enzymatic")       # adj marker strip
    assert "cell membrane" in wn.synonyms("membrane")    # underscore->space
    assert wn.synonyms("nonexistent") == {"nonexistent"}


def test_loader_rejects_empty_dir(tmp_path):
    with pytest.raises(FileNotFoundError, match="WNdb"):
        WordNetSynonyms(str(tmp_path))


def test_meteor_synonym_stage_raises_score(wn):
    """A synonym substitution is a miss for exact+stem but a match for
    the synonym stage — the score ordering the nltk stage produces."""
    ref = "the hydrolysis of the substrate"
    pred = "the cleavage of the substrate"
    base = metrics.meteor_pair(pred, ref, synonyms=None)
    syn = metrics.meteor_pair(pred, ref, synonyms=wn)
    assert syn > base
    exact = metrics.meteor_pair(ref, ref, synonyms=None)
    assert syn == pytest.approx(exact)    # full alignment either way


def test_meteor_none_equals_exact_stem_default_shape(wn):
    """synonyms=None must equal the corpus-less default in this image
    (no WordNet on disk -> "auto" resolves to None here)."""
    for p, r in zip(FN_PREDS, FN_REFS):
        assert metrics.meteor_pair(p, r, synonyms=None) == \
            metrics.meteor_pair(p, r)


def test_function_set_divergence_bound(wn):
    """The recorded bound: on the function-description fixture with one
    synonym substitution per sentence, exact+stem under-scores the
    synonym-aware METEOR by a bounded, positive delta. This is the
    quantified divergence BENCH_NOTES.md cites for the no-corpus image;
    real-corpus parity is the WNdb drop-in."""
    base = metrics.meteor_corpus(FN_PREDS, FN_REFS, synonyms=None)
    syn = metrics.meteor_corpus(FN_PREDS, FN_REFS, synonyms=wn)
    delta = syn - base
    assert 0.0 < delta < 0.15, delta
    # identical texts: no divergence at all
    assert metrics.meteor_corpus(FN_REFS, FN_REFS, synonyms=None) == \
        pytest.approx(metrics.meteor_corpus(FN_REFS, FN_REFS, synonyms=wn))


def test_rouge_bootstrap_mid_close_to_mean():
    """The reference reports BootstrapAggregator `mid`; we default to
    exact means. Quantified: on the function fixture the seeded
    bootstrap median-of-means sits within 0.03 of the mean for every
    ROUGE variant, and is deterministic across calls."""
    mean = metrics.rouge_corpus(FN_PREDS, FN_REFS)
    mid = metrics.rouge_corpus(FN_PREDS, FN_REFS,
                               aggregator="bootstrap_mid")
    mid2 = metrics.rouge_corpus(FN_PREDS, FN_REFS,
                                aggregator="bootstrap_mid")
    assert mid == mid2                                  # seeded
    for k in mean:
        assert abs(mid[k] - mean[k]) < 0.03, (k, mid[k], mean[k])
    with pytest.raises(ValueError, match="aggregator"):
        metrics.rouge_corpus(FN_PREDS, FN_REFS, aggregator="median")


def test_meteor_corpus_with_fixture_on_fn_pool(wn):
    """End-to-end corpus call with an injected WNdb source (the API
    compute_metrics consumers use for real-corpus parity)."""
    v = metrics.meteor_corpus(FN_PREDS, FN_REFS, synonyms=wn)
    assert 0.5 < v <= 1.0
    print(f"fn-fixture meteor: exact+stem="
          f"{metrics.meteor_corpus(FN_PREDS, FN_REFS, synonyms=None):.4f} "
          f"synonym={v:.4f}")

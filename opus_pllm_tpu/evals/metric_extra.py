"""Extended native metrics — the rest of the reference's vendored surface.

The reference vendors 54 HuggingFace `evaluate` modules
(multi_modality_v1/eval/metrics/*) so `evaluate.load()` works offline.
metric_registry.py covers the 17 commonly used ones; this module adds the
remaining self-contained metrics (no external models, datasets, or
network): MT scores (sacrebleu, google_bleu, nist_mt, ter, character),
QA (squad, squad_v2), sequence labeling (seqeval, poseval),
simplification (sari, wiki_split), regression/forecasting (mape, smape,
mase, r_squared, brier_score), ranking/probabilistic (roc_auc,
confusion_matrix, mahalanobis, mean_iou), IR (trec_eval), math
(competition_math), code (code_eval, execution gated like HF's behind
HF_ALLOW_CODE_EVAL=1), and the benchmark-suite dispatchers (glue,
super_glue, xnli, indic_glue, xtreme_s).

The last 9 names (bleurt, comet, mauve, frugalscore, perplexity,
charcut_mt, coval, cuad, rl_reliability) live in metric_tail — the
model-dependent ones take the learned model as an argument (the
bertscore convention) since this zero-egress image downloads nothing.

All functions take (predictions, references, **kw) and return dicts, the
`evaluate` convention, and register into metric_registry._REGISTRY.
"""

from __future__ import annotations

import math
import os
import re
import string
from collections import Counter
from typing import Dict, List, Sequence

import numpy as np

from .metric_registry import _levenshtein, _rank


# ---------------------------------------------------------------------------
# tokenization helpers
# ---------------------------------------------------------------------------

def _tok13a(line: str) -> List[str]:
    """sacrebleu's 13a-style tokenization (simplified: punctuation split)."""
    line = line.replace("<skipped>", "")
    line = re.sub(r"([{-~\[-\` -&\(-\+\:-\@\/])", r" \1 ", line)
    return line.split()


def _ngrams(tokens: Sequence, n: int) -> Counter:
    return Counter(tuple(tokens[i:i + n]) for i in range(len(tokens) - n + 1))


def _as_list_of_refs(references):
    """Normalize references to a list of lists (multi-reference form)."""
    return [r if isinstance(r, (list, tuple)) else [r] for r in references]


# ---------------------------------------------------------------------------
# machine translation family
# ---------------------------------------------------------------------------

def sacrebleu(predictions, references, smooth_method: str = "exp",
              lowercase: bool = False):
    """Corpus BLEU, sacrebleu-style: 13a tokenization, exp smoothing,
    score scaled 0-100 (metrics/sacrebleu)."""
    refs = _as_list_of_refs(references)
    matches = [0] * 4
    totals = [0] * 4
    pred_len = ref_len = 0
    for p, rs in zip(predictions, refs):
        if lowercase:
            p, rs = p.lower(), [r.lower() for r in rs]
        pt = _tok13a(str(p))
        rts = [_tok13a(str(r)) for r in rs]
        pred_len += len(pt)
        # closest reference length (ties -> shorter), as in sacrebleu
        ref_len += min((abs(len(rt) - len(pt)), len(rt)) for rt in rts)[1]
        for n in range(1, 5):
            pg = _ngrams(pt, n)
            best = Counter()
            for rt in rts:
                rg = _ngrams(rt, n)
                for g in pg:
                    best[g] = max(best[g], min(pg[g], rg[g]))
            matches[n - 1] += sum(best.values())
            totals[n - 1] += max(len(pt) - n + 1, 0)
    smooth = 1.0
    precisions = []
    for n in range(4):
        if totals[n] == 0:
            # effective order: segments shorter than n contribute no
            # n-grams; exclude the order instead of zeroing the geomean
            precisions.append(None)
        elif matches[n] == 0 and smooth_method == "exp":
            smooth *= 2.0
            precisions.append(100.0 / (smooth * totals[n]))
        else:
            precisions.append(100.0 * matches[n] / totals[n])
    live = [p for p in precisions if p is not None]
    if live and min(live) > 0:
        score = math.exp(sum(math.log(p) for p in live) / len(live))
    else:
        score = 0.0
    precisions = [p if p is not None else 0.0 for p in precisions]
    bp = 1.0 if pred_len > ref_len else (
        math.exp(1 - ref_len / pred_len) if pred_len else 0.0)
    return {"score": score * bp, "counts": matches, "totals": totals,
            "precisions": precisions, "bp": bp,
            "sys_len": pred_len, "ref_len": ref_len}


def google_bleu(predictions, references, min_len: int = 1, max_len: int = 4):
    """Corpus GLEU: min(n-gram precision, n-gram recall) (metrics/google_bleu)."""
    refs = _as_list_of_refs(references)
    match = p_total = r_total = 0
    for p, rs in zip(predictions, refs):
        pt = str(p).split()
        pg = Counter()
        for n in range(min_len, max_len + 1):
            pg.update(_ngrams(pt, n))
        best_overlap, best_rg_size = 0, 0
        for r in rs:
            rt = str(r).split()
            rg = Counter()
            for n in range(min_len, max_len + 1):
                rg.update(_ngrams(rt, n))
            overlap = sum((pg & rg).values())
            if overlap >= best_overlap:
                best_overlap, best_rg_size = overlap, sum(rg.values())
        match += best_overlap
        p_total += sum(pg.values())
        r_total += best_rg_size
    prec = match / p_total if p_total else 0.0
    rec = match / r_total if r_total else 0.0
    return {"google_bleu": min(prec, rec)}


def nist_mt(predictions, references, n: int = 5):
    """NIST score: information-weighted n-gram precision with the NIST
    brevity penalty (metrics/nist_mt)."""
    refs = _as_list_of_refs(references)
    # information weights from reference n-gram statistics
    info_counts = [Counter() for _ in range(n + 1)]
    total_ref_words = 0
    for rs in refs:
        for r in rs:
            rt = str(r).lower().split()
            total_ref_words += len(rt)
            for k in range(1, n + 1):
                info_counts[k].update(_ngrams(rt, k))

    def info(gram):
        k = len(gram)
        denom = (info_counts[k - 1][gram[:-1]] if k > 1
                 else total_ref_words)
        num = info_counts[k][gram]
        if num == 0 or denom == 0:
            return 0.0
        return math.log2(denom / num)

    num_by_n = [0.0] * (n + 1)
    den_by_n = [0] * (n + 1)
    sys_len = ref_len = 0
    for p, rs in zip(predictions, refs):
        pt = str(p).lower().split()
        sys_len += len(pt)
        ref_len += sum(len(str(r).split()) for r in rs) / len(rs)
        for k in range(1, n + 1):
            pg = _ngrams(pt, k)
            best = Counter()
            for r in rs:
                rg = _ngrams(str(r).lower().split(), k)
                for g in pg:
                    best[g] = max(best[g], min(pg[g], rg[g]))
            num_by_n[k] += sum(info(g) * c for g, c in best.items())
            den_by_n[k] += max(len(pt) - k + 1, 0)
    score = sum(num_by_n[k] / den_by_n[k]
                for k in range(1, n + 1) if den_by_n[k])
    beta = -math.log(0.5) / (math.log(1.5) ** 2)
    ratio = sys_len / ref_len if ref_len else 0.0
    bp = math.exp(-beta * (math.log(min(ratio, 1.0)) ** 2)) if ratio else 0.0
    return {"nist_mt": score * bp}


def _ter_one(pred: List[str], ref: List[str], max_shifts: int = 10) -> int:
    """TER edits: greedy shift search + word edit distance (metrics/ter).
    Each round tries every contiguous pred span that exists somewhere in
    the reference and keeps the move that lowers edit distance most."""
    edits = 0
    cur = list(pred)
    for _ in range(max_shifts):
        base = _levenshtein(cur, ref)
        if base == 0:
            break
        best_gain, best_seq = 0, None
        for i in range(len(cur)):
            for ln in range(1, min(len(cur) - i, 10) + 1):
                span = cur[i:i + ln]
                # only consider spans that appear in the reference
                if not any(ref[j:j + ln] == span
                           for j in range(len(ref) - ln + 1)):
                    continue
                rest = cur[:i] + cur[i + ln:]
                for j in range(len(rest) + 1):
                    if j == i:
                        continue
                    cand = rest[:j] + span + rest[j:]
                    gain = base - _levenshtein(cand, ref)
                    if gain > best_gain:
                        best_gain, best_seq = gain, cand
        if best_seq is None or best_gain <= 1:
            break
        cur = best_seq
        edits += 1          # the shift itself costs one edit
    return edits + _levenshtein(cur, ref)


def ter(predictions, references, normalized: bool = False,
        case_sensitive: bool = False):
    refs = _as_list_of_refs(references)
    total_edits = 0
    total_ref_len = 0.0
    sent_scores = []
    for p, rs in zip(predictions, refs):
        p = str(p) if case_sensitive else str(p).lower()
        rs = [str(r) if case_sensitive else str(r).lower() for r in rs]
        pt = _tok13a(p) if normalized else p.split()
        best = None
        for r in rs:
            rt = _tok13a(r) if normalized else r.split()
            e = _ter_one(pt, rt)
            ln = len(rt)
            if best is None or (e / max(ln, 1)) < (best[0] / max(best[1], 1)):
                best = (e, ln)
        total_edits += best[0]
        avg_len = sum(len(r.split()) for r in rs) / len(rs)
        total_ref_len += avg_len
        sent_scores.append(best[0] / max(avg_len, 1e-9))
    score = 100.0 * total_edits / total_ref_len if total_ref_len else 0.0
    return {"score": score, "num_edits": total_edits,
            "ref_length": total_ref_len}


def character(predictions, references):
    """CharacTER-style score: char-level edit distance / max length,
    averaged per sentence (metrics/character; shift moves omitted)."""
    scores = []
    for p, r in zip(predictions, references):
        p, r = str(p), str(r)
        d = _levenshtein(list(p), list(r))
        scores.append(d / max(len(p), len(r), 1))
    return {"cer_score": float(np.mean(scores)) if scores else 0.0}


# ---------------------------------------------------------------------------
# QA (SQuAD family)
# ---------------------------------------------------------------------------

def _squad_normalize(s: str) -> str:
    s = str(s).lower()
    s = "".join(ch for ch in s if ch not in set(string.punctuation))
    s = re.sub(r"\b(a|an|the)\b", " ", s)
    return " ".join(s.split())


def _squad_f1(pred: str, gold: str) -> float:
    pt, gt = _squad_normalize(pred).split(), _squad_normalize(gold).split()
    common = Counter(pt) & Counter(gt)
    overlap = sum(common.values())
    if not pt or not gt:
        return float(pt == gt)
    if overlap == 0:
        return 0.0
    prec, rec = overlap / len(pt), overlap / len(gt)
    return 2 * prec * rec / (prec + rec)


def _squad_pairs(predictions, references):
    """Accept both the HF dict format and plain string lists."""
    for p, r in zip(predictions, references):
        pred = p["prediction_text"] if isinstance(p, dict) else p
        if isinstance(r, dict):
            golds = r["answers"]["text"] if isinstance(r["answers"], dict) \
                else [a["text"] for a in r["answers"]]
        else:
            golds = r if isinstance(r, (list, tuple)) else [r]
        yield str(pred), [str(g) for g in golds]


def squad(predictions, references):
    em = f1 = n = 0.0
    for pred, golds in _squad_pairs(predictions, references):
        golds = golds or [""]
        em += max(float(_squad_normalize(pred) == _squad_normalize(g))
                  for g in golds)
        f1 += max(_squad_f1(pred, g) for g in golds)
        n += 1
    n = max(n, 1)
    return {"exact_match": 100.0 * em / n, "f1": 100.0 * f1 / n}


def squad_v2(predictions, references, no_answer_threshold: float = 1.0):
    """SQuAD v2: empty gold answers mean unanswerable; a prediction whose
    no_answer_probability exceeds the threshold counts as abstaining."""
    em = f1 = n = 0.0
    probs = [p.get("no_answer_probability", 0.0) if isinstance(p, dict)
             else 0.0 for p in predictions]
    for (pred, golds), na in zip(_squad_pairs(predictions, references),
                                 probs):
        golds = [g for g in golds if g]
        abstain = na > no_answer_threshold
        if not golds:            # unanswerable
            correct = abstain or _squad_normalize(pred) == ""
            em += float(correct)
            f1 += float(correct)
        else:
            if abstain:
                pred = ""
            em += max(float(_squad_normalize(pred) == _squad_normalize(g))
                      for g in golds)
            f1 += max(_squad_f1(pred, g) for g in golds)
        n += 1
    n = max(n, 1)
    return {"exact": 100.0 * em / n, "f1": 100.0 * f1 / n}


# ---------------------------------------------------------------------------
# sequence labeling
# ---------------------------------------------------------------------------

def _spans(tags: Sequence[str]):
    """BIO/BIO2 tag sequence -> set of (type, start, end) entity spans."""
    out, start, typ = [], None, None
    for i, t in enumerate(list(tags) + ["O"]):
        if t.startswith("B-") or t == "O" or \
                (t.startswith("I-") and typ != t[2:]):
            if start is not None:
                out.append((typ, start, i))
                start, typ = None, None
        if t.startswith("B-"):
            start, typ = i, t[2:]
        elif t.startswith("I-") and start is None:
            start, typ = i, t[2:]      # conll leniency: I- after O opens
    return out


def seqeval(predictions, references, **_):
    """Entity-span P/R/F1 (micro overall + per-type) and token accuracy."""
    tp = Counter()
    pred_n = Counter()
    gold_n = Counter()
    correct_tokens = total_tokens = 0
    for p_seq, r_seq in zip(predictions, references):
        ps, rs = set(_spans(p_seq)), set(_spans(r_seq))
        for s in ps & rs:
            tp[s[0]] += 1
        for s in ps:
            pred_n[s[0]] += 1
        for s in rs:
            gold_n[s[0]] += 1
        correct_tokens += sum(a == b for a, b in zip(p_seq, r_seq))
        total_tokens += len(r_seq)
    out = {}
    for typ in sorted(set(pred_n) | set(gold_n)):
        prec = tp[typ] / pred_n[typ] if pred_n[typ] else 0.0
        rec = tp[typ] / gold_n[typ] if gold_n[typ] else 0.0
        f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
        out[typ] = {"precision": prec, "recall": rec, "f1": f1,
                    "number": gold_n[typ]}
    tpa, pa, ga = sum(tp.values()), sum(pred_n.values()), sum(gold_n.values())
    prec = tpa / pa if pa else 0.0
    rec = tpa / ga if ga else 0.0
    out["overall_precision"] = prec
    out["overall_recall"] = rec
    out["overall_f1"] = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
    out["overall_accuracy"] = (correct_tokens / total_tokens
                               if total_tokens else 0.0)
    return out


def poseval(predictions, references, **_):
    """Token-level classification report over tag sequences (metrics/poseval:
    sklearn classification_report on the flattened tags)."""
    p = [t for seq in predictions for t in seq]
    r = [t for seq in references for t in seq]
    labels = sorted(set(p) | set(r))
    out = {}
    f1s, weights = [], []
    for lb in labels:
        tp = sum(1 for a, b in zip(p, r) if a == lb and b == lb)
        pn = sum(1 for a in p if a == lb)
        gn = sum(1 for b in r if b == lb)
        prec = tp / pn if pn else 0.0
        rec = tp / gn if gn else 0.0
        f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
        out[lb] = {"precision": prec, "recall": rec, "f1-score": f1,
                   "support": gn}
        f1s.append(f1)
        weights.append(gn)
    out["accuracy"] = (sum(a == b for a, b in zip(p, r)) / len(r)
                       if r else 0.0)
    out["macro avg"] = {"f1-score": float(np.mean(f1s)) if f1s else 0.0}
    out["weighted avg"] = {
        "f1-score": float(np.average(f1s, weights=weights))
        if sum(weights) else 0.0}
    return out


# ---------------------------------------------------------------------------
# simplification
# ---------------------------------------------------------------------------

def _sari_ngram_sets(src, pred, refs, n):
    s = _ngrams(src, n)
    p = _ngrams(pred, n)
    r_total = Counter()
    for rt in refs:
        r_total.update(_ngrams(rt, n))
    nref = len(refs)

    def ratio(a, b):
        return sum(a.values()) and sum((a & b).values()) / sum(a.values())

    # ADD: in pred, not in src, in any ref
    add_p = p - s
    add_r = Counter({g: 1 for g in r_total if g not in s})
    p_add = (sum((Counter(set(add_p)) & add_r).values()) / len(set(add_p))
             if add_p else 1.0)
    r_add = (sum((Counter(set(add_p)) & add_r).values()) / len(add_r)
             if add_r else 1.0)
    f_add = (2 * p_add * r_add / (p_add + r_add)) if p_add + r_add else 0.0

    # KEEP: in both src and pred, weighted by reference agreement
    keep_p = s & p
    keep_r = Counter({g: r_total[g] / nref for g in s})
    p_keep = (sum(min(keep_p[g], keep_r.get(g, 0)) for g in keep_p)
              / sum(keep_p.values()) if keep_p else 1.0)
    kr_denom = sum(1 for g in s if r_total[g])
    r_keep = (sum(min(keep_p[g] and 1, keep_r.get(g, 0) and 1)
                  for g in keep_p if r_total[g]) / kr_denom
              if kr_denom else 1.0)
    f_keep = (2 * p_keep * r_keep / (p_keep + r_keep)) if p_keep + r_keep \
        else 0.0

    # DEL: in src, not in pred, deletion endorsed by refs
    del_p = s - p
    del_good = Counter({g: 1 for g in del_p
                        if r_total[g] < nref})
    p_del = (sum(del_good.values()) / len(set(del_p)) if del_p else 1.0)
    return f_add, f_keep, p_del


def sari(sources, predictions, references):
    """SARI = mean over sentences of (F_add + F_keep + P_del)/3, n-grams
    1-4, 0/0 = 1 convention (metrics/sari, t2t variant)."""
    refs = _as_list_of_refs(references)
    totals = []
    for src, p, rs in zip(sources, predictions, refs):
        st = str(src).lower().split()
        pt = str(p).lower().split()
        rts = [str(r).lower().split() for r in rs]
        adds, keeps, dels = [], [], []
        for n in range(1, 5):
            a, k, d = _sari_ngram_sets(st, pt, rts, n)
            adds.append(a)
            keeps.append(k)
            dels.append(d)
        totals.append(100.0 * (np.mean(adds) + np.mean(keeps)
                               + np.mean(dels)) / 3.0)
    return {"sari": float(np.mean(totals)) if totals else 0.0}


def wiki_split(sources, predictions, references):
    """sari + sacrebleu + exact (metrics/wiki_split)."""
    refs = _as_list_of_refs(references)
    em = np.mean([float(str(p).strip() == str(r[0]).strip())
                  for p, r in zip(predictions, refs)]) if predictions else 0.0
    return {"sari": sari(sources, predictions, references)["sari"],
            "sacrebleu": sacrebleu(predictions, references)["score"],
            "exact": 100.0 * float(em)}


# ---------------------------------------------------------------------------
# regression / forecasting / probabilistic
# ---------------------------------------------------------------------------

def mape(predictions, references):
    p, r = np.asarray(predictions, float), np.asarray(references, float)
    return {"mape": float(np.mean(np.abs(p - r)
                                  / np.maximum(np.abs(r), 1e-9)))}


def smape(predictions, references):
    p, r = np.asarray(predictions, float), np.asarray(references, float)
    denom = np.maximum((np.abs(p) + np.abs(r)) / 2.0, 1e-9)
    return {"smape": float(np.mean(np.abs(p - r) / denom))}


def mase(predictions, references, training=None, periodicity: int = 1):
    p, r = np.asarray(predictions, float), np.asarray(references, float)
    hist = np.asarray(training if training is not None else references,
                      float)
    scale = np.mean(np.abs(hist[periodicity:] - hist[:-periodicity])) \
        if len(hist) > periodicity else 1.0
    return {"mase": float(np.mean(np.abs(p - r)) / max(scale, 1e-9))}


def r_squared(predictions, references):
    p, r = np.asarray(predictions, float), np.asarray(references, float)
    ss_res = float(np.sum((r - p) ** 2))
    ss_tot = float(np.sum((r - r.mean()) ** 2))
    return {"r_squared": 1.0 - ss_res / ss_tot if ss_tot else 0.0}


def brier_score(predictions, references):
    p, r = np.asarray(predictions, float), np.asarray(references, float)
    return {"brier_score": float(np.mean((p - r) ** 2))}


def confusion_matrix(predictions, references, labels=None):
    p, r = np.asarray(predictions), np.asarray(references)
    if labels is None:
        labels = sorted(set(r.tolist()) | set(p.tolist()))
    idx = {lb: i for i, lb in enumerate(labels)}
    c = np.zeros((len(labels), len(labels)), np.int64)
    for a, b in zip(p, r):
        c[idx[b], idx[a]] += 1
    return {"confusion_matrix": c.tolist()}


def roc_auc(prediction_scores, references, multi_class: str = None):
    """Rank-based (Mann-Whitney) AUC; multiclass via one-vs-rest macro."""
    s = np.asarray(prediction_scores, float)
    y = np.asarray(references)

    def binary_auc(scores, labels):
        ranks = _rank(np.asarray(scores, float))  # tie-averaged (mergesort)
        pos = labels == 1
        n1, n0 = int(pos.sum()), int((~pos).sum())
        if n1 == 0 or n0 == 0:
            return 0.5
        return (ranks[pos].sum() - n1 * (n1 + 1) / 2) / (n1 * n0)

    if s.ndim == 1:
        return {"roc_auc": float(binary_auc(s, (y == np.max(y)).astype(int)
                                            if y.dtype != bool else y))}
    labels = np.unique(y)
    aucs = [binary_auc(s[:, i], (y == lb).astype(int))
            for i, lb in enumerate(labels)]
    return {"roc_auc": float(np.mean(aucs))}


def mean_iou(predictions, references, num_labels: int = None,
             ignore_index: int = 255, **_):
    inter = Counter()
    union = Counter()
    correct = Counter()
    total = Counter()
    for p, r in zip(predictions, references):
        p, r = np.asarray(p).ravel(), np.asarray(r).ravel()
        valid = r != ignore_index
        p, r = p[valid], r[valid]
        labels = range(num_labels) if num_labels else \
            sorted(set(r.tolist()) | set(p.tolist()))
        for lb in labels:
            pm, rm = p == lb, r == lb
            inter[lb] += int((pm & rm).sum())
            union[lb] += int((pm | rm).sum())
            correct[lb] += int((pm & rm).sum())
            total[lb] += int(rm.sum())
    ious = {lb: inter[lb] / union[lb] for lb in union if union[lb]}
    accs = {lb: correct[lb] / total[lb] for lb in total if total[lb]}
    return {"mean_iou": float(np.mean(list(ious.values()))) if ious else 0.0,
            "mean_accuracy": float(np.mean(list(accs.values())))
            if accs else 0.0,
            "overall_accuracy": (sum(correct.values())
                                 / max(sum(total.values()), 1)),
            "per_category_iou": [ious.get(lb, 0.0) for lb in sorted(union)],
            "per_category_accuracy": [accs.get(lb, 0.0)
                                      for lb in sorted(total)]}


def mahalanobis(X, reference_distribution):
    """Mahalanobis distance of each X row from the reference distribution
    (metrics/mahalanobis; X passed as `predictions`)."""
    x = np.asarray(X, float)
    ref = np.asarray(reference_distribution, float)
    mu = ref.mean(axis=0)
    cov = np.cov(ref, rowvar=False)
    cov = np.atleast_2d(cov)
    inv = np.linalg.pinv(cov)
    d = x - mu
    return {"mahalanobis": np.einsum("ij,jk,ik->i", d, inv, d).tolist()}


# ---------------------------------------------------------------------------
# IR / math / code
# ---------------------------------------------------------------------------

def trec_eval(predictions, references, k: int = 10):
    """Core trec_eval measures (MAP, nDCG@k, P@k, MRR) from run/qrel dicts:
    references {qid: {docid: rel}}, predictions {qid: {docid: score}}."""
    run = predictions if isinstance(predictions, dict) else predictions[0]
    qrel = references if isinstance(references, dict) else references[0]
    maps, ndcgs, pks, rrs = [], [], [], []
    for qid, scores in run.items():
        rels = qrel.get(qid, {})
        ranked = sorted(scores, key=lambda d: -scores[d])
        gains = [rels.get(d, 0) for d in ranked]
        n_rel = sum(1 for v in rels.values() if v > 0)
        # MAP
        hits, ap = 0, 0.0
        for i, g in enumerate(gains, 1):
            if g > 0:
                hits += 1
                ap += hits / i
        maps.append(ap / n_rel if n_rel else 0.0)
        # nDCG@k
        dcg = sum(g / math.log2(i + 1) for i, g in enumerate(gains[:k], 1))
        ideal = sorted(rels.values(), reverse=True)[:k]
        idcg = sum(g / math.log2(i + 1) for i, g in enumerate(ideal, 1))
        ndcgs.append(dcg / idcg if idcg else 0.0)
        # P@k
        pks.append(sum(1 for g in gains[:k] if g > 0) / k)
        # MRR
        rr = next((1.0 / i for i, g in enumerate(gains, 1) if g > 0), 0.0)
        rrs.append(rr)
    return {"map": float(np.mean(maps)) if maps else 0.0,
            f"ndcg@{k}": float(np.mean(ndcgs)) if ndcgs else 0.0,
            f"P@{k}": float(np.mean(pks)) if pks else 0.0,
            "recip_rank": float(np.mean(rrs)) if rrs else 0.0}


def _math_normalize(s: str) -> str:
    """Hendrycks-style answer normalization (metrics/competition_math)."""
    s = str(s)
    m = re.search(r"\\boxed\{(.*)\}", s)
    if m:
        s = m.group(1)
    s = s.replace("\\left", "").replace("\\right", "")
    s = s.replace("\\!", "").replace("\\ ", "").replace(" ", "")
    s = s.replace("tfrac", "frac").replace("dfrac", "frac")
    s = s.replace("^{\\circ}", "").replace("^\\circ", "")
    s = s.replace("\\$", "").replace("$", "").replace("\\%", "").replace("%", "")
    s = re.sub(r"\\text\{[^}]*\}", "", s)
    # a/b -> \frac{a}{b}
    m = re.fullmatch(r"(-?\d+)/(\d+)", s)
    if m:
        s = f"\\frac{{{m.group(1)}}}{{{m.group(2)}}}"
    # \fracab -> \frac{a}{b}
    s = re.sub(r"\\frac(\d)(\d)", r"\\frac{\1}{\2}", s)
    if s.startswith("0.") or s.startswith("."):
        s = "0" + s.lstrip("0") if s.startswith(".") else s
    return s


def competition_math(predictions, references):
    acc = [float(_math_normalize(p) == _math_normalize(r))
           for p, r in zip(predictions, references)]
    return {"accuracy": float(np.mean(acc)) if acc else 0.0}


def code_eval(predictions, references, k=(1, 10, 100), timeout: float = 3.0):
    """pass@k over candidate programs: each prediction is a list of
    candidate solutions, each reference a test program that raises on
    failure. Execution is gated behind HF_ALLOW_CODE_EVAL=1, exactly like
    the vendored metric (metrics/code_eval)."""
    if os.environ.get("HF_ALLOW_CODE_EVAL") != "1":
        raise ValueError(
            "code_eval executes untrusted model-generated code; set "
            "HF_ALLOW_CODE_EVAL=1 to acknowledge (matches the HF gate)")
    import subprocess
    import sys as _sys
    # candidate programs must not inherit the TPU tunnel: the image's
    # sitecustomize contacts the axon pool at interpreter startup when
    # PALLAS_AXON_POOL_IPS is set (2-4 s per child — enough to blow the
    # 3 s timeout before the candidate even runs)
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    results = []
    for cands, test in zip(predictions, references):
        ok = 0
        for cand in cands:
            prog = f"{cand}\n{test}\n"
            try:
                r = subprocess.run([_sys.executable, "-c", prog],
                                   capture_output=True, timeout=timeout,
                                   env=env)
                ok += int(r.returncode == 0)
            except subprocess.TimeoutExpired:
                pass
        results.append((len(cands), ok))

    def pass_at_k(n, c, kk):
        if n - c < kk:
            return 1.0
        return 1.0 - np.prod(1.0 - kk / np.arange(n - c + 1, n + 1))

    out = {}
    for kk in ([k] if isinstance(k, int) else k):
        vals = [pass_at_k(n, c, kk) for n, c in results if n >= kk]
        if vals:
            out[f"pass@{kk}"] = float(np.mean(vals))
    return out


# ---------------------------------------------------------------------------
# benchmark-suite dispatchers
# ---------------------------------------------------------------------------

def _suite_accuracy(p, r):
    from .metric_registry import _REGISTRY
    return _REGISTRY["accuracy"](p, r)


def glue(predictions, references, config_name: str = None):
    """metrics/glue: per-task metric dispatch."""
    from .metric_registry import _REGISTRY
    acc = _REGISTRY["accuracy"]
    f1 = _REGISTRY["f1"]
    if config_name in ("mrpc", "qqp"):
        return {**acc(predictions, references),
                **f1(predictions, references)}
    if config_name == "stsb":
        return {**_REGISTRY["pearsonr"](predictions, references),
                **_REGISTRY["spearmanr"](predictions, references)}
    if config_name == "cola":
        return _REGISTRY["matthews_correlation"](predictions, references)
    return acc(predictions, references)   # sst2/mnli/qnli/rte/wnli/ax


def super_glue(predictions, references, config_name: str = None):
    from .metric_registry import _REGISTRY
    acc = _REGISTRY["accuracy"]
    if config_name == "cb":
        return {**acc(predictions, references),
                **_REGISTRY["f1"](predictions, references,
                                  average="macro")}
    if config_name == "record":
        em = np.mean([float(_squad_normalize(p) == _squad_normalize(r))
                      for p, r in zip(predictions, references)]) \
            if predictions else 0.0
        f1v = np.mean([_squad_f1(p, r)
                       for p, r in zip(predictions, references)]) \
            if predictions else 0.0
        return {"exact_match": float(em), "f1": float(f1v)}
    return acc(predictions, references)


def xnli(predictions, references):
    return _suite_accuracy(predictions, references)


def indic_glue(predictions, references, config_name: str = None):
    return _suite_accuracy(predictions, references)


def xtreme_s(predictions, references, config_name: str = None):
    """metrics/xtreme_s: dispatch to wer/cer, bleu, f1, or accuracy."""
    from .metric_registry import _REGISTRY
    if config_name in ("mls", "voxpopuli", "babel", "fleurs-asr"):
        return {**_REGISTRY["wer"](predictions, references),
                **_REGISTRY["cer"](predictions, references)}
    if config_name == "covost2":
        return {"bleu": _REGISTRY["bleu"](predictions, references)["bleu"]}
    if config_name == "minds14":
        return {**_REGISTRY["f1"](predictions, references,
                                  average="macro"),
                **_REGISTRY["accuracy"](predictions, references)}
    return _suite_accuracy(predictions, references)


# ---------------------------------------------------------------------------
# registration
# ---------------------------------------------------------------------------

def _sari_entry(predictions, references, sources=None):
    if sources is None:
        raise ValueError("sari needs sources= (the original sentences)")
    return sari(sources, predictions, references)


def _wiki_split_entry(predictions, references, sources=None):
    if sources is None:
        raise ValueError("wiki_split needs sources=")
    return wiki_split(sources, predictions, references)


def _mahalanobis_entry(predictions, references=None,
                       reference_distribution=None):
    return mahalanobis(predictions,
                       reference_distribution if reference_distribution
                       is not None else references)


EXTRA: Dict[str, callable] = {
    "sari": _sari_entry,
    "wiki_split": _wiki_split_entry,
    "sacrebleu": sacrebleu,
    "google_bleu": google_bleu,
    "nist_mt": nist_mt,
    "ter": ter,
    "character": character,
    "squad": squad,
    "squad_v2": squad_v2,
    "seqeval": seqeval,
    "poseval": poseval,
    "mape": mape,
    "smape": smape,
    "mase": mase,
    "r_squared": r_squared,
    "brier_score": brier_score,
    "confusion_matrix": confusion_matrix,
    "roc_auc": roc_auc,
    "mean_iou": mean_iou,
    "mahalanobis": _mahalanobis_entry,
    "trec_eval": trec_eval,
    "competition_math": competition_math,
    "code_eval": code_eval,
    "glue": glue,
    "super_glue": super_glue,
    "xnli": xnli,
    "indic_glue": indic_glue,
    "xtreme_s": xtreme_s,
}

"""The tail of the vendored-metric surface: the last 9 of the reference's
54 `evaluate` modules (multi_modality_v1/eval/metrics/*).

Self-contained here (pure numpy, no external models): cuad (contract-QA
EM/F1/AUPR), coval (coreference MUC/B3/CEAF_e/LEA + CoNLL), charcut_mt
(character-diff MT score), rl_reliability (robustness statistics over
training curves), mauve (divergence-frontier area, with its own k-means
quantizer — features come in directly or via embed_fn).

Model-parameterized, following the bertscore convention in
metric_registry (the learned model is an argument, not a download —
this image has zero egress): perplexity (logprob_fn or raw logprobs;
infer/scoring.make_logprob_fn builds one over our own decoder), bleurt,
comet, frugalscore (score_fn; the vendored modules download TF/torch
regression checkpoints this framework cannot fetch — callers supply the
scorer, every other part of the metric contract is preserved).

All entries take (predictions, references, **kw) and return dicts, the
`evaluate` convention, and register into metric_registry._REGISTRY via
metric_extra.
"""

from __future__ import annotations

import math
from collections import Counter
from typing import Dict, List, Optional, Sequence

import numpy as np

# NumPy 2.0 renamed trapz -> trapezoid; support both
_trapz = getattr(np, "trapezoid", None) or np.trapz

# ---------------------------------------------------------------------------
# cuad — contract-understanding QA (metrics/cuad)
# ---------------------------------------------------------------------------


def _cuad_tokens(s: str) -> Counter:
    return Counter(str(s).lower().split())


def _cuad_jaccard(pred: str, gold: str) -> float:
    p, g = _cuad_tokens(pred), _cuad_tokens(gold)
    inter = sum((p & g).values())
    union = sum((p | g).values())
    return inter / union if union else float(pred == gold)


def cuad(predictions, references):
    """CUAD metrics: exact match, token F1, and — when predictions carry
    confidence scores — AUPR plus precision at 80%/90% recall, where a
    prediction is correct iff its best token-Jaccard with any gold span
    is >= 0.5 (the CUAD paper's matching rule)."""
    from .metric_extra import _squad_f1, _squad_normalize

    em = f1 = n = 0.0
    scored = []                     # (confidence, correct) per answerable id
    for p, r in zip(predictions, references):
        if isinstance(p, dict):
            texts = p.get("prediction_text", "")
            conf = p.get("confidence", None)
        else:
            texts, conf = p, None
        cands = [str(t) for t in (texts if isinstance(texts, (list, tuple))
                                  else [texts])] or [""]
        if isinstance(r, dict):
            ans = r["answers"]
            golds = ans["text"] if isinstance(ans, dict) else \
                [a["text"] for a in ans]
        else:
            golds = r if isinstance(r, (list, tuple)) else [r]
        golds = [str(g) for g in golds if str(g)] or [""]
        em += max(float(_squad_normalize(c) == _squad_normalize(g))
                  for c in cands for g in golds)
        f1 += max(_squad_f1(c, g) for c in cands for g in golds)
        n += 1
        if conf is not None and golds != [""]:
            iou = max(_cuad_jaccard(c, g) for c in cands for g in golds)
            scored.append((float(conf), iou >= 0.5))
    n = max(n, 1)
    out = {"exact_match": 100.0 * em / n, "f1": 100.0 * f1 / n}
    if scored:
        scored.sort(key=lambda t: -t[0])
        n_pos = sum(c for _, c in scored) or 1
        tp = 0
        recs, precs = [0.0], [1.0]
        for i, (_, correct) in enumerate(scored, 1):
            tp += int(correct)
            recs.append(tp / n_pos)
            precs.append(tp / i)
        out["aupr"] = 100.0 * float(_trapz(precs, recs))
        for target in (0.8, 0.9):
            ok = [p for p, r_ in zip(precs, recs) if r_ >= target]
            out[f"prec_at_{int(target * 100)}_recall"] = \
                100.0 * (max(ok) if ok else 0.0)
    return out


# ---------------------------------------------------------------------------
# coval — coreference resolution (metrics/coval)
# ---------------------------------------------------------------------------


def _clusters(doc) -> List[frozenset]:
    return [frozenset(c) for c in doc if len(c) > 0]


def _muc(key, resp):
    """MUC recall numerator: sum(|k| - #partitions of k by resp)."""
    num = den = 0
    for k in key:
        parts = {next((i for i, r in enumerate(resp) if m in r), ("s", m))
                 for m in k}
        num += len(k) - len(parts)
        den += len(k) - 1
    return num, den


def _b3(key, resp):
    num = den = 0.0
    for k in key:
        for r in resp:
            inter = len(k & r)
            if inter:
                num += inter * inter / len(k)
        den += len(k)
    return num, den


def _ceafe(key, resp):
    """Entity-based CEAF: optimal one-to-one alignment under
    phi4(k, r) = 2|k&r| / (|k| + |r|), exact via Hungarian assignment."""
    from scipy.optimize import linear_sum_assignment

    if not key or not resp:
        return 0.0, float(len(key)), float(len(resp))
    phi = np.zeros((len(key), len(resp)))
    for i, k in enumerate(key):
        for j, r in enumerate(resp):
            phi[i, j] = 2.0 * len(k & r) / (len(k) + len(r))
    ri, ci = linear_sum_assignment(-phi)
    return float(phi[ri, ci].sum()), float(len(key)), float(len(resp))


def _lea(key, resp):
    """Link-based entity-aware recall numerator/denominator (Moosavi &
    Strube 2016); singleton resolution = 1 iff it appears as a singleton
    in the response."""
    def links(n):
        return n * (n - 1) // 2

    num = den = 0.0
    for k in key:
        if len(k) == 1:
            res = 1.0 if any(k == r for r in resp) else 0.0
        else:
            res = sum(links(len(k & r)) for r in resp) / links(len(k))
        num += len(k) * res
        den += len(k)
    return num, den


def _prf(rn, rd, pn, pd):
    r = rn / rd if rd else 0.0
    p = pn / pd if pd else 0.0
    f = 2 * p * r / (p + r) if p + r else 0.0
    return p, r, f


def coval(predictions, references):
    """Coreference metrics over documents of mention clusters: each item
    is a list of clusters, each cluster a list of hashable mentions
    (e.g. (start, end) spans). Returns MUC, B3, CEAF_e, LEA, mention
    detection, and the CoNLL-2012 average F1 — the vendored module's
    surface minus its CoNLL-file parser (callers here hold structured
    clusters, not .conll text)."""
    acc = {m: [0.0, 0.0, 0.0, 0.0] for m in ("muc", "b_cubed", "ceafe",
                                             "lea", "mentions")}
    for p_doc, r_doc in zip(predictions, references):
        resp, key = _clusters(p_doc), _clusters(r_doc)
        for name, fn in (("muc", _muc), ("b_cubed", _b3), ("lea", _lea)):
            rn, rd = fn(key, resp)
            pn, pd = fn(resp, key)
            for i, v in enumerate((rn, rd, pn, pd)):
                acc[name][i] += v
        sim, nk, nr = _ceafe(key, resp)
        for i, v in enumerate((sim, nk, sim, nr)):
            acc["ceafe"][i] += v
        km = {m for c in key for m in c}
        rm = {m for c in resp for m in c}
        for i, v in enumerate((len(km & rm), len(km), len(km & rm),
                               len(rm))):
            acc["mentions"][i] += v
    out = {}
    for name, (rn, rd, pn, pd) in acc.items():
        p, r, f = _prf(rn, rd, pn, pd)
        out[f"{name}/precision"] = 100.0 * p
        out[f"{name}/recall"] = 100.0 * r
        out[f"{name}/f1"] = 100.0 * f
    out["conll_score"] = (out["muc/f1"] + out["b_cubed/f1"]
                          + out["ceafe/f1"]) / 3.0
    return out


# ---------------------------------------------------------------------------
# charcut_mt — character-diff MT score (metrics/charcut_mt)
# ---------------------------------------------------------------------------


def _longest_common_substring(a: str, b: str, min_size: int):
    """(len, ia, ib) of the longest common substring >= min_size, else None.
    O(|a|*|b|) rolling DP — candidate/reference sentences are short."""
    best = (0, -1, -1)
    prev = [0] * (len(b) + 1)
    for i, ca in enumerate(a, 1):
        cur = [0] * (len(b) + 1)
        for j, cb in enumerate(b, 1):
            if ca == cb:
                cur[j] = prev[j - 1] + 1
                if cur[j] > best[0]:
                    best = (cur[j], i - cur[j], j - cur[j])
        prev = cur
    return best if best[0] >= min_size else None


def charcut_mt(predictions, references, min_match_size: int = 3):
    """CharCut (Lardilleux & Lepage 2017): greedily match longest common
    substrings (>= min_match_size chars) between candidate and reference;
    the score is the unmatched-character mass over the total length,
    corpus-level. 0 = identical, 1 = disjoint; lower is better."""
    cost = total = 0
    for p, r in zip(predictions, references):
        a, b = str(p), str(r)
        total += len(a) + len(b)
        # greedy LCS extraction: matched spans are consumed (replaced by
        # separators that can never match again)
        while True:
            m = _longest_common_substring(a, b, min_match_size)
            if m is None:
                break
            ln, ia, ib = m
            a = a[:ia] + "\x00" + a[ia + ln:]
            b = b[:ib] + "\x01" + b[ib + ln:]
        cost += sum(c != "\x00" for c in a) + sum(c != "\x01" for c in b)
    return {"charcut_mt": cost / total if total else 0.0}


# ---------------------------------------------------------------------------
# rl_reliability — robustness statistics over training curves
# ---------------------------------------------------------------------------


def _iqr(x) -> float:
    q75, q25 = np.percentile(x, [75, 25])
    return float(q75 - q25)


def _lower_cvar(x, alpha: float = 0.05) -> float:
    """Mean of the worst alpha-fraction (expected shortfall)."""
    x = np.sort(np.asarray(x, float))
    k = max(int(math.ceil(alpha * len(x))), 1)
    return float(x[:k].mean())


def rl_reliability(timesteps, rewards, config_name: str = "online",
                   eval_points=None, alpha: float = 0.05):
    """Core rl-reliability (Chan et al. 2020) online metrics, computed
    directly instead of through the rl_reliability package the vendored
    module wraps: dispersion within runs (IQR of detrended curves),
    dispersion across runs (IQR over runs at matched timesteps), risk
    within runs (lower CVaR on per-step differences), risk across runs
    (lower CVaR on final performance), drawdown risk, and median
    performance. `timesteps`/`rewards`: one array per run."""
    runs = [np.asarray(r, float) for r in rewards]
    if not runs:
        return {}
    # within-run dispersion/risk work on first differences (detrending)
    diffs = [np.diff(r) for r in runs if len(r) > 1]
    iqr_within = float(np.median([_iqr(d) for d in diffs])) if diffs else 0.0
    cvar_diffs = _lower_cvar(np.concatenate(diffs), alpha) if diffs else 0.0
    # across-run dispersion: align runs on their shared prefix
    min_len = min(len(r) for r in runs)
    stacked = np.stack([r[:min_len] for r in runs])
    iqr_across = float(np.median([_iqr(stacked[:, t])
                                  for t in range(min_len)]))
    finals = [float(r[-1]) for r in runs]
    drawdowns = [float(np.max(np.maximum.accumulate(r) - r)) for r in runs]
    return {
        "IqrWithinRuns": iqr_within,
        "IqrAcrossRuns": iqr_across,
        "LowerCVaROnDiffs": cvar_diffs,
        "LowerCVaROnAcross": _lower_cvar(finals, max(alpha, 1.0 / len(runs))),
        "MaxDrawdown": float(np.median(drawdowns)),
        "MedianPerfDuringTraining": float(np.median(stacked)),
    }


# ---------------------------------------------------------------------------
# mauve — divergence-frontier area (metrics/mauve)
# ---------------------------------------------------------------------------


def _kmeans(x: np.ndarray, k: int, iters: int = 25, seed: int = 0):
    """Plain Lloyd's k-means (deterministic, no sklearn dependency)."""
    rng = np.random.default_rng(seed)
    centers = x[rng.choice(len(x), size=k, replace=False)]
    for _ in range(iters):
        d = ((x[:, None, :] - centers[None, :, :]) ** 2).sum(-1)
        assign = d.argmin(1)
        for j in range(k):
            m = assign == j
            if m.any():
                centers[j] = x[m].mean(0)
    return assign


def mauve(predictions=None, references=None, p_features=None,
          q_features=None, embed_fn=None, num_buckets=None,
          scaling_factor: float = 5.0, divergence_curve_points: int = 25,
          kmeans_seed: int = 0):
    """MAUVE (Pillutla et al. 2021): quantize model (p) and human (q)
    text features into a shared k-means histogram, sweep mixtures
    r_l = l*p + (1-l)*q, and measure the area under the divergence
    frontier (exp(-c*KL(q||r)), exp(-c*KL(p||r))). Features come in as
    p_features/q_features arrays, or are computed by embed_fn over the
    prediction/reference texts (mean-pooled — the vendored module's GPT-2
    featurizer is a download this image cannot perform)."""
    if p_features is None or q_features is None:
        if embed_fn is None:
            raise ValueError(
                "mauve needs p_features/q_features arrays, or embed_fn= "
                "(e.g. models/bert.make_embed_fn over a local encoder) to "
                "featurize predictions/references — no model downloads in "
                "this image")
        pe, pm = embed_fn(list(predictions))
        qe, qm = embed_fn(list(references))
        p_features = (np.asarray(pe) * np.asarray(pm)[..., None]).sum(1) \
            / np.maximum(np.asarray(pm).sum(1, keepdims=True), 1)
        q_features = (np.asarray(qe) * np.asarray(qm)[..., None]).sum(1) \
            / np.maximum(np.asarray(qm).sum(1, keepdims=True), 1)
    p_features = np.asarray(p_features, float)
    q_features = np.asarray(q_features, float)
    n = len(p_features) + len(q_features)
    k = num_buckets if num_buckets else max(2, min(500, n // 10))
    k = max(1, min(k, n))   # k-means cannot seed more centers than rows
    assign = _kmeans(np.concatenate([p_features, q_features]), k,
                     seed=kmeans_seed)
    p_hist = np.bincount(assign[:len(p_features)], minlength=k) \
        / max(len(p_features), 1)
    q_hist = np.bincount(assign[len(p_features):], minlength=k) \
        / max(len(q_features), 1)

    def kl(a, b):
        m = a > 0
        return float(np.sum(a[m] * np.log(a[m] / np.maximum(b[m], 1e-12))))

    lam = np.linspace(1e-4, 1 - 1e-4, divergence_curve_points)
    xs, ys = [], []
    for l in lam:
        r = l * p_hist + (1 - l) * q_hist
        xs.append(math.exp(-scaling_factor * kl(q_hist, r)))
        ys.append(math.exp(-scaling_factor * kl(p_hist, r)))
    xs = np.array([0.0] + xs + [1.0])
    ys = np.array([1.0] + ys + [0.0])
    order = np.argsort(xs)
    score = float(_trapz(ys[order], xs[order]))
    return {"mauve": score, "divergence_curve": np.stack([xs, ys]).tolist(),
            "num_buckets": k}


# ---------------------------------------------------------------------------
# model-parameterized scorers (bertscore convention: the learned model is
# an argument — infer/scoring builds perplexity's from our own decoder)
# ---------------------------------------------------------------------------


def perplexity(predictions, references=None, logprob_fn=None,
               logprobs: Optional[Sequence[Sequence[float]]] = None):
    """Per-text perplexity under a causal LM: exp(-mean token logprob).
    Supply logprob_fn (texts -> list of per-token logprob lists;
    infer/scoring.make_logprob_fn wraps any of our decoder families) or
    precomputed `logprobs`. The vendored module instead downloads an HF
    model_id — impossible here, same contract otherwise."""
    if logprobs is None:
        if logprob_fn is None:
            raise ValueError(
                "perplexity needs logprob_fn= (infer/scoring."
                "make_logprob_fn over a local decoder checkpoint) or "
                "logprobs= — no model downloads in this image")
        logprobs = logprob_fn(list(predictions))
    ppls = [float(np.exp(-np.mean(lp))) if len(lp) else float("nan")
            for lp in logprobs]
    return {"perplexities": ppls,
            "mean_perplexity": float(np.nanmean(ppls)) if ppls else 0.0}


def _scored(name: str, needs_sources: bool = False):
    def metric(predictions, references, sources=None, score_fn=None):
        if score_fn is None:
            raise ValueError(
                f"{name} is a learned metric; its regression model is a "
                "download this zero-egress image cannot perform. Pass "
                f"score_fn={'(sources, predictions, references)' if needs_sources else '(predictions, references)'}"
                " -> list[float] over a locally-available model.")
        if needs_sources:
            if sources is None:
                raise ValueError(f"{name} needs sources=")
            scores = score_fn(list(sources), list(predictions),
                              list(references))
        else:
            scores = score_fn(list(predictions), list(references))
        scores = [float(s) for s in scores]
        return {"scores": scores,
                "mean_score": float(np.mean(scores)) if scores else 0.0}
    metric.__name__ = name
    return metric


bleurt = _scored("bleurt")
comet = _scored("comet", needs_sources=True)
frugalscore = _scored("frugalscore")


def _rl_reliability_entry(predictions, references=None, timesteps=None,
                          rewards=None, **kw):
    return rl_reliability(timesteps if timesteps is not None else references,
                          rewards if rewards is not None else predictions,
                          **kw)


TAIL: Dict[str, callable] = {
    "cuad": cuad,
    "coval": coval,
    "charcut_mt": charcut_mt,
    "rl_reliability": _rl_reliability_entry,
    "mauve": mauve,
    "perplexity": perplexity,
    "bleurt": bleurt,
    "comet": comet,
    "frugalscore": frugalscore,
}

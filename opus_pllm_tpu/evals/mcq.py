"""MCQ answer extraction and scoring (eval_run_multichoice.py:175-212)."""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple

_OPTION_RE = re.compile(
    r"\b([A-Da-d])\s*[)\.）\]】]|answer\s*:\s*([A-Da-d])|"
    r"答案是\s*([A-Da-d])",   # "答案是 X"
    re.IGNORECASE)


def extract_option_letter(text: str):
    """First A-D option letter by pattern; falls back to the raw text when
    nothing matches (so exact-string equality still counts a match)."""
    m = _OPTION_RE.search(text)
    if not m:
        return text
    letter = next((g for g in m.groups() if g is not None), None)
    return letter.upper() if letter else None


def score(results: List[dict]) -> Tuple[float, Dict[str, int]]:
    """results: [{"ground_truth", "generated"}] -> (accuracy, histogram)."""
    counts = {"A": 0, "B": 0, "C": 0, "D": 0, "None": 0}
    correct = 0
    for r in results:
        g = extract_option_letter(r["generated"])
        t = extract_option_letter(r["ground_truth"])
        if g == t:
            correct += 1
        if isinstance(g, str) and g in counts:
            counts[g] += 1
        else:
            counts["None"] += 1
    acc = correct / len(results) if results else 0.0
    return acc, counts

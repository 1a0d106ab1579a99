"""Benchmark dataset loaders + per-task generation policy.

Covers the two benchmark JSON schemas (SURVEY.md §6):
  * annotation sets: [{"instruction", "input": <aa sequence>, "output"}]
    (run_opus_ddp.py:61-67 — entries with null/empty input are dropped)
  * MCQ set: [{"question", "options", "input", "answer"}]
    (eval_run_multichoice.py:87-98)

Per-task `max_new_tokens` and the localization one-word suffix mirror
run_opus_ddp.py:92-101.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from typing import List, Optional

LOCALIZATION_SUFFIX = "Kindly reply with only one word."


@dataclass
class AnnotationExample:
    instruction: str
    sequence: str
    output: str


@dataclass
class MCQExample:
    question: str
    options: List[str]
    sequence: str
    answer: str


def load_annotation_json(path: str) -> List[AnnotationExample]:
    with open(path) as f:
        data = json.load(f)
    return [AnnotationExample(d["instruction"], d["input"], d.get("output", ""))
            for d in data if d.get("input")]


def load_mcq_json(path: str) -> List[MCQExample]:
    with open(path) as f:
        data = json.load(f)
    return [MCQExample(d["question"], list(d["options"]), d["input"],
                       d["answer"]) for d in data if d.get("input")]


def max_new_tokens_for(file_path: str) -> int:
    f = file_path.lower()
    if "localization" in f:
        return 32
    if "keywords" in f:
        return 128
    return 256


def instruction_for(example: AnnotationExample, file_path: str) -> str:
    """Prepend the `<seq>` placeholder line and the task-specific suffix —
    byte-exact run_opus_ddp.py:91-101: instructions that already carry
    `<seq>` pass through untouched; otherwise '<seq>\\n' is prefixed and,
    for localization sets only, the one-word suffix is concatenated
    directly (no separating space — the reference glues it on)."""
    instr = example.instruction
    if "<seq>" in instr:
        return instr
    if "localization" in file_path.lower():
        return "<seq>\n" + instr + LOCALIZATION_SUFFIX
    return "<seq>\n" + instr


def mcq_prompt(question: str, options: List[str]) -> str:
    """MCQ instruction block, byte-exact eval_run_multichoice.py:76-83.

    The reference builds this with an indented triple-quoted f-string, so
    every line after the first carries 8 literal leading spaces (only the
    first option line — `options` is '\\n'.join(...) — is indented). The
    prompt text is the model interface; preserve it exactly."""
    opts = "\n".join(options)
    return (f"Question: {question}\n\n        Options:\n        {opts}\n\n"
            "        Please carefully read the question and select the "
            "single correct answer from A-D.\n"
            "        You can only output one option from A), B), C), D) "
            "with format 'The correct answer is' without explanation.")

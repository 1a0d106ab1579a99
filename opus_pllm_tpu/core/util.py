"""Small shared helpers."""

from __future__ import annotations


def round_up(n: int, multiple: int) -> int:
    """Round n up to a multiple — the shape-bucketing helper used by the
    eval runner, batch collation, precompute, and BERTScore batching so
    jitted pipelines compile a bounded number of shapes."""
    return ((n + multiple - 1) // multiple) * multiple

"""Observability: logging, step timing, throughput meters, profiler traces.

The reference's observability is wall-clock prints (`entries/sec`,
run_opus_ddp.py:143; seconds/epoch, cstp_v3/modelling.py:542-545) plus an
unused rotating-file logger (multi_modality_v1/utils.py:17-90). Here the
same surface is structured and TPU-aware:

  * `build_logger` — rotating file + console handler, rank-0 filtered
  * `rank0_print` — multi-host-safe print (opus_arch.py:26-29 pattern)
  * `StepTimer` / `Throughput` — step timing and items/sec, tokens/sec
  * `profile_trace` — context manager around `jax.profiler` so any train
    or eval loop can emit a TensorBoard-loadable trace
"""

from __future__ import annotations

import contextlib
import logging
import logging.handlers
import os
import time
from typing import Dict, Iterator, Optional

import jax


def rank0_print(*args, **kwargs) -> None:
    if jax.process_index() == 0:
        print(*args, **kwargs)


def build_logger(name: str, log_file: Optional[str] = None,
                 level: int = logging.INFO) -> logging.Logger:
    logger = logging.getLogger(name)
    if logger.handlers:
        return logger
    logger.setLevel(level)
    fmt = logging.Formatter(
        "%(asctime)s | %(levelname)s | %(name)s | %(message)s")
    sh = logging.StreamHandler()
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if log_file and jax.process_index() == 0:
        os.makedirs(os.path.dirname(os.path.abspath(log_file)), exist_ok=True)
        fh = logging.handlers.RotatingFileHandler(
            log_file, maxBytes=32 * 1024 * 1024, backupCount=3)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    if jax.process_index() != 0:
        logger.setLevel(logging.WARNING)
    return logger


class StepTimer:
    """Wall-clock step timer with EMA; call `tick()` once per step."""

    def __init__(self, ema: float = 0.9):
        self.ema = ema
        self.avg_s: Optional[float] = None
        self._last: Optional[float] = None
        self.steps = 0

    def tick(self) -> Optional[float]:
        now = time.perf_counter()
        dt = None
        if self._last is not None:
            dt = now - self._last
            self.avg_s = dt if self.avg_s is None else \
                self.ema * self.avg_s + (1 - self.ema) * dt
            self.steps += 1
        self._last = now
        return dt


class Throughput:
    """items/sec + tokens/sec/chip counters (SURVEY.md §5 requirement)."""

    def __init__(self):
        self.items = 0
        self.tokens = 0
        self._t0 = time.perf_counter()

    def add(self, items: int = 0, tokens: int = 0) -> None:
        self.items += items
        self.tokens += tokens

    def report(self) -> Dict[str, float]:
        dt = max(time.perf_counter() - self._t0, 1e-9)
        chips = max(jax.device_count(), 1)
        return {"seconds": dt,
                "items_per_sec": self.items / dt,
                "tokens_per_sec": self.tokens / dt,
                "items_per_sec_per_chip": self.items / dt / chips,
                "tokens_per_sec_per_chip": self.tokens / dt / chips}


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]) -> Iterator[None]:
    """jax.profiler trace scope; no-op when log_dir is falsy."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region in profiler timelines (TraceAnnotation)."""
    with jax.profiler.TraceAnnotation(name):
        yield

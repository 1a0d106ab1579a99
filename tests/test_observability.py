"""Observability utils: logger, timers, throughput meters."""

import logging
import time

from opus_pllm_tpu.utils import observability as obs


def test_build_logger_rotating_file(tmp_path):
    lf = tmp_path / "logs" / "run.log"
    lg = obs.build_logger("opus_test_logger", str(lf))
    lg.info("hello world")
    for h in lg.handlers:
        h.flush()
    assert lf.exists() and "hello world" in lf.read_text()
    # idempotent: second call reuses handlers
    assert obs.build_logger("opus_test_logger") is lg


def test_step_timer():
    t = obs.StepTimer()
    assert t.tick() is None     # first tick establishes baseline
    time.sleep(0.01)
    dt = t.tick()
    assert dt is not None and dt >= 0.009
    assert t.avg_s is not None and t.steps == 1


def test_throughput_meter():
    m = obs.Throughput()
    m.add(items=10, tokens=100)
    r = m.report()
    assert r["items_per_sec"] > 0
    assert r["tokens_per_sec"] > r["items_per_sec"]
    assert r["tokens_per_sec_per_chip"] <= r["tokens_per_sec"]


def test_annotate_and_trace_noop():
    with obs.profile_trace(None):
        with obs.annotate("region"):
            pass

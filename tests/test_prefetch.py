"""Host->device prefetching (utils/prefetch.py) and its trainer wiring."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opus_pllm_tpu.utils.prefetch import prefetch_to_device


def test_order_and_completeness():
    batches = [{"x": np.full((2,), i)} for i in range(7)]
    out = list(prefetch_to_device(iter(batches), size=3))
    assert len(out) == 7
    for i, b in enumerate(out):
        assert isinstance(b["x"], jax.Array)
        assert int(b["x"][0]) == i


def test_producer_error_reraises():
    def gen():
        yield {"x": np.zeros(2)}
        raise RuntimeError("boom in loader")

    it = prefetch_to_device(gen(), size=2)
    next(it)
    with pytest.raises(RuntimeError, match="boom in loader"):
        list(it)


def test_custom_place_runs_on_producer():
    seen = []

    def place(b):
        seen.append(b)
        return jnp.asarray(b) * 2

    out = list(prefetch_to_device([1, 2, 3], size=1, place=place))
    assert [int(x) for x in out] == [2, 4, 6]
    assert seen == [1, 2, 3]


def test_fit_with_and_without_prefetch_identical():
    """The multimodal train loop produces the same state either way."""
    from opus_pllm_tpu.core.config import (IGNORE_INDEX, LoRAConfig,
                                           OpusConfig, SEQ_TOKEN_INDEX,
                                           TrainConfig)
    from opus_pllm_tpu.models import opus
    from opus_pllm_tpu.train import multimodal_trainer as mmt

    cfg = OpusConfig.tiny("llama")
    tcfg = TrainConfig(learning_rate=1e-3, batch_size=2, log_every=0)
    lcfg = LoRAConfig(rank=2)
    params = opus.init(jax.random.PRNGKey(0), cfg)

    rng = np.random.default_rng(0)
    def batch(i):
        ids = rng.integers(4, cfg.llm.vocab_size, (2, 16)).astype(np.int32)
        ids[:, 1] = SEQ_TOKEN_INDEX
        labels = ids.copy()
        labels[:, :4] = IGNORE_INDEX
        esm = np.full((2, 1, 8), 5, np.int32)
        esm[:, :, 0], esm[:, :, -1] = 0, 2
        return {"input_ids": ids, "attn_mask": np.ones((2, 16), bool),
                "labels": labels, "esm_tokens": esm}

    data = [batch(i) for i in range(3)]

    def run(prefetch):
        state, tx = mmt.create_state(jax.random.PRNGKey(1), cfg, tcfg,
                                     params, train_switch=True,
                                     lora_cfg=lcfg)
        return mmt.fit(state, tx, cfg, tcfg, params, iter(data),
                       lora_cfg=lcfg, log_fn=lambda *a: None,
                       prefetch=prefetch)

    s0, s2 = run(0), run(2)
    l0 = jax.tree.leaves(s0.trainable)
    l2 = jax.tree.leaves(s2.trainable)
    for a, b in zip(l0, l2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_abandoned_consumer_unblocks_producer():
    """A consumer that stops iterating early must not leave the producer
    thread blocked in q.put forever (code-review round-3 finding)."""
    import threading
    import time

    produced = []

    def gen():
        for i in range(100):
            produced.append(i)
            yield {"x": np.full((2,), i)}

    it = prefetch_to_device(gen(), size=2)
    next(it)
    it.close()                     # abandon: GeneratorExit -> finally
    deadline = time.time() + 5.0
    while time.time() < deadline:
        alive = [t for t in threading.enumerate()
                 if t.name == "opus-pllm-prefetch" and t.is_alive()]
        if not alive:
            break
        time.sleep(0.05)
    assert not alive, "producer thread still blocked after consumer close"
    assert len(produced) < 100     # it stopped early, not ran to the end

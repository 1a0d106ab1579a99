"""Sequence-parallel train step (train/sp.py) vs the single-device step:
identical loss and updated trainable params on the virtual "seq" mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opus_pllm_tpu.core.config import (IGNORE_INDEX, LoRAConfig, OpusConfig,
                                       SEQ_TOKEN_INDEX, TrainConfig)
from opus_pllm_tpu.models import opus
from opus_pllm_tpu.parallel import ring
from opus_pllm_tpu.train import multimodal_trainer as mmt
from opus_pllm_tpu.train import sp


def _batch(cfg, b=2, l=24, seed=0):
    rng = np.random.default_rng(seed)
    ids = rng.integers(4, cfg.llm.vocab_size, (b, l)).astype(np.int32)
    ids[:, 1] = SEQ_TOKEN_INDEX
    mask = np.ones((b, l), bool)
    mask[1, -5:] = False                   # right-padded row
    ids[1, -5:] = 0
    labels = ids.copy()
    labels[:, :4] = IGNORE_INDEX
    labels[~mask] = IGNORE_INDEX
    esm = rng.integers(4, 24, (b, 1, 12)).astype(np.int32)
    esm[:, :, 0], esm[:, :, -1] = 0, 2
    return {"input_ids": jnp.asarray(ids),
            "attn_mask": jnp.asarray(mask),
            "labels": jnp.asarray(labels),
            "esm_tokens": jnp.asarray(esm)}


@pytest.mark.parametrize("n_seq,ce_chunk", [(2, 0), (4, 8)])
def test_sp_step_matches_single_device(n_seq, ce_chunk):
    cfg = OpusConfig.tiny("llama")
    lcfg = LoRAConfig(rank=2)
    tcfg = TrainConfig(learning_rate=1e-3)
    params = opus.init(jax.random.PRNGKey(0), cfg)
    batch = _batch(cfg)

    def run(step_builder):
        state, tx = mmt.create_state(jax.random.PRNGKey(1), cfg, tcfg,
                                     params, train_switch=True,
                                     lora_cfg=lcfg)
        step = step_builder(tx)
        new_state, m = step(state, params, batch)
        return float(m["loss"]), new_state

    loss_ref, st_ref = run(lambda tx: mmt.make_train_step(
        cfg, tx, lora_cfg=lcfg, ce_chunk=ce_chunk))
    mesh = ring.make_sp_mesh(n_seq)
    loss_sp, st_sp = run(lambda tx: sp.make_sp_train_step(
        cfg, tx, mesh, lora_cfg=lcfg, ce_chunk=ce_chunk))

    assert np.isfinite(loss_sp)
    np.testing.assert_allclose(loss_sp, loss_ref, rtol=2e-5, atol=2e-6)
    # ring softmax reassociates float sums; Adam's per-element
    # normalization amplifies that on near-zero gradient entries, so the
    # bound is on the update scale (lr=1e-3), not machine epsilon
    for a, b in zip(jax.tree.leaves(st_ref.trainable),
                    jax.tree.leaves(st_sp.trainable)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=2e-4)


def test_sp_step_trains():
    """Loss decreases over a few SP steps (the end-to-end sanity the
    dryrun asserts for the DP/TP step)."""
    cfg = OpusConfig.tiny("llama")
    lcfg = LoRAConfig(rank=2)
    tcfg = TrainConfig(learning_rate=5e-3)
    params = opus.init(jax.random.PRNGKey(0), cfg)
    batch = _batch(cfg, seed=3)
    state, tx = mmt.create_state(jax.random.PRNGKey(1), cfg, tcfg, params,
                                 train_switch=True, lora_cfg=lcfg)
    step = sp.make_sp_train_step(cfg, tx, ring.make_sp_mesh(2),
                                 lora_cfg=lcfg)
    losses = []
    for _ in range(4):
        state, m = step(state, params, batch)
        losses.append(float(m["loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]


def test_sp_step_matches_single_device_dynamic_ntk():
    """With use_dynamic_ntk the rotary base must derive from the GLOBAL
    sequence length, not the local shard length — the SP step pins it via
    ntk_ctx (code-review round-3 finding: loss varied with shard count,
    5.70428 / 5.70303 / 5.70158 at 1/2/4 shards, before the fix)."""
    import dataclasses

    cfg = OpusConfig.tiny("llama")
    llm = dataclasses.replace(cfg.llm, use_dynamic_ntk=True,
                              max_position_embeddings=8)
    cfg = dataclasses.replace(cfg, llm=llm)
    lcfg = LoRAConfig(rank=2)
    tcfg = TrainConfig(learning_rate=1e-3)
    params = opus.init(jax.random.PRNGKey(0), cfg)
    # l=29 -> spliced length 32 (l + n_tokens - 1): divisible by 2 and 4,
    # so the SP pad is a no-op and both paths see the same global context
    batch = _batch(cfg, l=29)

    def run(step_builder):
        state, tx = mmt.create_state(jax.random.PRNGKey(1), cfg, tcfg,
                                     params, train_switch=True,
                                     lora_cfg=lcfg)
        _, m = step_builder(tx)(state, params, batch)
        return float(m["loss"])

    loss_ref = run(lambda tx: mmt.make_train_step(cfg, tx, lora_cfg=lcfg))
    for n_seq in (2, 4):
        loss_sp = run(lambda tx: sp.make_sp_train_step(
            cfg, tx, ring.make_sp_mesh(n_seq), lora_cfg=lcfg))
        np.testing.assert_allclose(loss_sp, loss_ref, rtol=2e-5, atol=2e-6)


def test_sp_grad_accum_matches_full_batch():
    """grad_accum=2 on the SP step equals the same SP step without
    accumulation (valid-token weighting makes the update exact even with
    uneven padding across chunks)."""
    cfg = OpusConfig.tiny("llama")
    lcfg = LoRAConfig(rank=2)
    tcfg = TrainConfig(learning_rate=1e-3)
    params = opus.init(jax.random.PRNGKey(0), cfg)
    batch = _batch(cfg, b=4, seed=5)
    mesh = ring.make_sp_mesh(2)

    def run(ga):
        state, tx = mmt.create_state(jax.random.PRNGKey(1), cfg, tcfg,
                                     params, train_switch=True,
                                     lora_cfg=lcfg)
        step = sp.make_sp_train_step(cfg, tx, mesh, lora_cfg=lcfg,
                                     grad_accum=ga)
        new_state, m = step(state, params, batch)
        return float(m["loss"]), new_state

    loss1, st1 = run(1)
    loss2, st2 = run(2)
    np.testing.assert_allclose(loss2, loss1, rtol=2e-5, atol=2e-6)
    for a, b in zip(jax.tree.leaves(st1.trainable),
                    jax.tree.leaves(st2.trainable)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=2e-4)

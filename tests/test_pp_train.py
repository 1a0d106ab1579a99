"""Pipeline-parallel train step (train/pp.py) vs the single-device step:
identical loss and updated trainable params on the virtual "pipe" mesh."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opus_pllm_tpu.core.config import (IGNORE_INDEX, LoRAConfig, OpusConfig,
                                       SEQ_TOKEN_INDEX, TrainConfig)
from opus_pllm_tpu.models import decoder, opus
from opus_pllm_tpu.parallel import pipeline
from opus_pllm_tpu.train import multimodal_trainer as mmt
from opus_pllm_tpu.train import pp


def _cfg(family="llama", num_layers=4):
    cfg = OpusConfig.tiny(family)
    return dataclasses.replace(
        cfg, llm=dataclasses.replace(cfg.llm, num_layers=num_layers))


def _batch(cfg, b=4, l=24, seed=0):
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


def _stacked(params):
    out = dict(params)
    out["llm"] = decoder.stack_params(dict(params["llm"]))
    return out


@pytest.mark.parametrize("n_pipe,n_micro,ce_chunk", [(2, 2, 0), (4, 4, 8),
                                                     (2, 4, 0)])
def test_pp_step_matches_single_device(n_pipe, n_micro, ce_chunk):
    cfg = _cfg()
    lcfg = LoRAConfig(rank=2)
    tcfg = TrainConfig(learning_rate=1e-3)
    params = opus.init(jax.random.PRNGKey(0), cfg)
    batch = _batch(cfg)

    def run(step_builder, frozen):
        state, tx = mmt.create_state(jax.random.PRNGKey(1), cfg, tcfg,
                                     params, train_switch=True,
                                     lora_cfg=lcfg)
        step = step_builder(tx)
        new_state, m = step(state, frozen, batch)
        return float(m["loss"]), new_state

    loss_ref, st_ref = run(lambda tx: mmt.make_train_step(
        cfg, tx, lora_cfg=lcfg, ce_chunk=ce_chunk), params)
    mesh = pipeline.make_pp_mesh(n_pipe)
    loss_pp, st_pp = run(lambda tx: pp.make_pp_train_step(
        cfg, tx, mesh, lora_cfg=lcfg, ce_chunk=ce_chunk, n_micro=n_micro),
        _stacked(params))

    assert np.isfinite(loss_pp)
    np.testing.assert_allclose(loss_pp, loss_ref, rtol=2e-5, atol=2e-6)
    # microbatched sums reassociate floats; Adam normalization amplifies
    # that on near-zero gradient entries (same bound as the SP test)
    for a, b in zip(jax.tree.leaves(st_ref.trainable),
                    jax.tree.leaves(st_pp.trainable)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=2e-4)


def test_pp_dp_step_matches_single_device():
    """DPxPP: a 2-D ("data","pipe") mesh (2 pipeline replicas x 2 stages)
    matches the single-device step — loss is the global-batch mean and
    LoRA grads sum over the data replicas."""
    cfg = _cfg()
    lcfg = LoRAConfig(rank=2)
    tcfg = TrainConfig(learning_rate=1e-3)
    params = opus.init(jax.random.PRNGKey(0), cfg)
    batch = _batch(cfg)          # B=4 -> 2 per replica, 2 microbatches

    def run(step_builder, frozen):
        state, tx = mmt.create_state(jax.random.PRNGKey(1), cfg, tcfg,
                                     params, train_switch=True,
                                     lora_cfg=lcfg)
        new_state, m = step_builder(tx)(state, frozen, batch)
        return float(m["loss"]), new_state

    loss_ref, st_ref = run(lambda tx: mmt.make_train_step(
        cfg, tx, lora_cfg=lcfg), params)
    mesh = pipeline.make_pp_mesh(2, data=2)
    assert dict(mesh.shape) == {"data": 2, "pipe": 2}
    loss_pp, st_pp = run(lambda tx: pp.make_pp_train_step(
        cfg, tx, mesh, lora_cfg=lcfg, n_micro=2), _stacked(params))

    np.testing.assert_allclose(loss_pp, loss_ref, rtol=2e-5, atol=2e-6)
    for a, b in zip(jax.tree.leaves(st_ref.trainable),
                    jax.tree.leaves(st_pp.trainable)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=2e-4)


def test_pp_step_matches_single_device_opt_family():
    """OPT exercises the no-rope front (learned position embeddings)."""
    cfg = _cfg("opt")
    tcfg = TrainConfig(learning_rate=1e-3)
    params = opus.init(jax.random.PRNGKey(0), cfg)
    batch = _batch(cfg)

    def run(step_builder, frozen):
        state, tx = mmt.create_state(jax.random.PRNGKey(1), cfg, tcfg,
                                     params, train_switch=True,
                                     lora_cfg=None)
        _, m = step_builder(tx)(state, frozen, batch)
        return float(m["loss"])

    loss_ref = run(lambda tx: mmt.make_train_step(cfg, tx), params)
    loss_pp = run(lambda tx: pp.make_pp_train_step(
        cfg, tx, pipeline.make_pp_mesh(2)), _stacked(params))
    np.testing.assert_allclose(loss_pp, loss_ref, rtol=2e-5, atol=2e-6)


def test_pp_step_matches_single_device_int8_base():
    """PP over an int8-quantized frozen base (the single-chip 8B QLoRA
    recipe composed with pipeline stages): the stacked {kernel_q, scale}
    leaf dicts shard over "pipe" like any other stacked leaves."""
    from opus_pllm_tpu.kernels.quant import quantize_decoder

    cfg = _cfg()
    lcfg = LoRAConfig(rank=2)
    tcfg = TrainConfig(learning_rate=1e-3)
    params = opus.init(jax.random.PRNGKey(0), cfg)
    params["llm"] = quantize_decoder(params["llm"])
    batch = _batch(cfg)

    def run(step_builder, frozen):
        state, tx = mmt.create_state(jax.random.PRNGKey(1), cfg, tcfg,
                                     params, train_switch=True,
                                     lora_cfg=lcfg)
        _, m = step_builder(tx)(state, frozen, batch)
        return float(m["loss"])

    loss_ref = run(lambda tx: mmt.make_train_step(cfg, tx, lora_cfg=lcfg),
                   params)
    loss_pp = run(lambda tx: pp.make_pp_train_step(
        cfg, tx, pipeline.make_pp_mesh(2), lora_cfg=lcfg),
        _stacked(params))
    np.testing.assert_allclose(loss_pp, loss_ref, rtol=2e-5, atol=2e-6)


def test_pp_step_trains():
    """Loss decreases over a few PP steps; state stays finite."""
    cfg = _cfg()
    lcfg = LoRAConfig(rank=2)
    tcfg = TrainConfig(learning_rate=5e-3)
    params = opus.init(jax.random.PRNGKey(0), cfg)
    frozen = _stacked(params)
    batch = _batch(cfg, seed=3)
    state, tx = mmt.create_state(jax.random.PRNGKey(1), cfg, tcfg, params,
                                 train_switch=True, lora_cfg=lcfg)
    step = pp.make_pp_train_step(cfg, tx, pipeline.make_pp_mesh(2),
                                 lora_cfg=lcfg)
    losses = []
    for _ in range(4):
        state, m = step(state, frozen, batch)
        losses.append(float(m["loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]


def test_pp_layer_count_must_divide():
    cfg = _cfg(num_layers=3)
    tcfg = TrainConfig(learning_rate=1e-3)
    params = opus.init(jax.random.PRNGKey(0), cfg)
    state, tx = mmt.create_state(jax.random.PRNGKey(1), cfg, tcfg, params,
                                 train_switch=True, lora_cfg=None)
    step = pp.make_pp_train_step(cfg, tx, pipeline.make_pp_mesh(2))
    with pytest.raises(ValueError, match="divisible"):
        step(state, _stacked(params), _batch(cfg))


def test_pp_fit_runs_and_checkpoints(tmp_path):
    """fit() converts to the stacked layout itself and resumes exactly."""
    cfg = _cfg()
    lcfg = LoRAConfig(rank=2)
    tcfg = TrainConfig(learning_rate=1e-3, log_every=0)
    params = opus.init(jax.random.PRNGKey(0), cfg)
    state, tx = mmt.create_state(jax.random.PRNGKey(1), cfg, tcfg, params,
                                 train_switch=True, lora_cfg=lcfg)
    batches = [_batch(cfg, seed=s) for s in range(3)]
    out = pp.fit(state, tx, cfg, tcfg, params, batches,
                 pipeline.make_pp_mesh(2), lora_cfg=lcfg, prefetch=0)
    assert int(out.step) == 3
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree.leaves(out.trainable))


def test_pp_shard_frozen_places_layer_blocks():
    """shard_frozen puts each stage's L/P layer block on its own device
    (the PP memory contract) and replicates the rest."""
    cfg = _cfg()
    params = _stacked(opus.init(jax.random.PRNGKey(0), cfg))
    mesh = pipeline.make_pp_mesh(2)
    placed = pp.shard_frozen(mesh, params)
    leaf = jax.tree.leaves(placed["llm"]["layers_stacked"])[0]
    # 4 layers over 2 stages: each device holds a (2, ...) block
    shard_shapes = {s.data.shape for s in leaf.addressable_shards}
    assert shard_shapes == {(2,) + leaf.shape[1:]}
    emb = placed["llm"]["embed_tokens"]["embedding"]
    assert all(s.data.shape == emb.shape for s in emb.addressable_shards)


def test_pp_grad_accum_matches_full_batch():
    """grad_accum=2 on the PP step (each chunk running a full pipeline
    schedule) equals the same PP step without accumulation."""
    cfg = _cfg()
    lcfg = LoRAConfig(rank=2)
    tcfg = TrainConfig(learning_rate=1e-3)
    params = opus.init(jax.random.PRNGKey(0), cfg)
    batch = _batch(cfg, b=4, seed=5)
    mesh = pipeline.make_pp_mesh(2)
    frozen = _stacked(params)

    def run(ga):
        state, tx = mmt.create_state(jax.random.PRNGKey(1), cfg, tcfg,
                                     params, train_switch=True,
                                     lora_cfg=lcfg)
        step = pp.make_pp_train_step(cfg, tx, mesh, lora_cfg=lcfg,
                                     n_micro=2, grad_accum=ga)
        new_state, m = step(state, frozen, batch)
        return float(m["loss"]), new_state

    loss1, st1 = run(1)
    loss2, st2 = run(2)
    np.testing.assert_allclose(loss2, loss1, rtol=2e-5, atol=2e-6)
    for a, b in zip(jax.tree.leaves(st1.trainable),
                    jax.tree.leaves(st2.trainable)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=2e-4)

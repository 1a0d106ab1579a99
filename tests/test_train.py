"""Training stages: (a) CSTP contrastive, (c)/(d) projector + LoRA.

Multi-device: the stage-(c/d) step runs sharded over the virtual 8-CPU mesh
(the idiomatic replacement for the reference's DDP/DeepSpeed validation,
SURVEY.md §4).
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from opus_pllm_tpu.core.config import (CSTPConfig, IGNORE_INDEX, LoRAConfig,
                                       MeshConfig, OpusConfig,
                                       SEQ_TOKEN_INDEX, TrainConfig)
from opus_pllm_tpu.core.mesh import make_mesh
from opus_pllm_tpu.models import opus
from opus_pllm_tpu.parallel import partition
from opus_pllm_tpu.train import cstp_trainer, multimodal_trainer as mmt


def test_cstp_training_reduces_loss():
    cfg = CSTPConfig.tiny()
    tcfg = TrainConfig(learning_rate=1e-3, weight_decay=1e-4, log_every=0)
    state, tx = cstp_trainer.create_state(jax.random.PRNGKey(0), cfg, tcfg)
    step = cstp_trainer.make_train_step(cfg, tx)
    rng = np.random.default_rng(0)
    se = jnp.asarray(rng.normal(size=(16, cfg.protein_dim)), jnp.float32)
    te = jnp.asarray(rng.normal(size=(16, cfg.text_dim)), jnp.float32)
    losses = []
    for _ in range(12):
        state, metrics = step(state, se, te)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]
    assert int(state.step) == 12


def test_cstp_eval_metrics():
    cfg = CSTPConfig.tiny()
    tcfg = TrainConfig()
    state, _ = cstp_trainer.create_state(jax.random.PRNGKey(0), cfg, tcfg)
    ev = cstp_trainer.make_eval_step(cfg)
    rng = np.random.default_rng(1)
    m = ev(state.params,
           jnp.asarray(rng.normal(size=(8, cfg.protein_dim)), jnp.float32),
           jnp.asarray(rng.normal(size=(8, cfg.text_dim)), jnp.float32))
    assert 0.0 <= float(m["acc_seq2text"]) <= 1.0


def _mm_batch(cfg, b):
    rng = np.random.default_rng(0)
    l = 12
    ids = rng.integers(4, cfg.llm.vocab_size, (b, l)).astype(np.int32)
    ids[:, 1] = SEQ_TOKEN_INDEX
    labels = ids.copy()
    labels[:, :4] = IGNORE_INDEX
    esm = rng.integers(4, 24, (b, 1, 8)).astype(np.int32)
    esm[:, :, 0] = 0
    esm[:, :, -1] = 2
    return {"input_ids": ids, "attn_mask": np.ones((b, l), bool),
            "labels": labels, "esm_tokens": esm}


def test_multimodal_step_trains_only_trainable():
    cfg = OpusConfig.tiny()
    tcfg = TrainConfig(learning_rate=1e-3)
    lcfg = LoRAConfig(rank=2)
    frozen = opus.init(jax.random.PRNGKey(0), cfg)
    state, tx = mmt.create_state(jax.random.PRNGKey(1), cfg, tcfg, frozen,
                                 train_switch=True, lora_cfg=lcfg)
    step = mmt.make_train_step(cfg, tx, lora_cfg=lcfg)
    batch = {k: jnp.asarray(v) for k, v in _mm_batch(cfg, 4).items()}
    before_sw = np.asarray(state.trainable["switch"]["layers"][0]["kernel"]).copy()
    before_b = np.asarray(
        state.trainable["lora"]["layers"][0]["q_proj"]["B"]).copy()
    state, metrics = step(state, frozen, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert not np.allclose(
        before_sw, np.asarray(state.trainable["switch"]["layers"][0]["kernel"]))
    # LoRA B leaves get gradient (B starts 0 but dL/dB = A^T x^T g != 0)
    assert not np.allclose(
        before_b, np.asarray(state.trainable["lora"]["layers"][0]["q_proj"]["B"]))
    # regression: a SECOND donated step must not hit deleted frozen leaves
    # (trainable switch used to alias frozen["switch"]; donation then
    # deleted the frozen buffers after step 1)
    state, metrics = step(state, frozen, batch)
    assert np.isfinite(float(metrics["loss"]))


def test_chunked_ce_matches_full_loss_and_grads():
    """ce_chunk > 0 must be numerically the same loss (and gradients) as
    the full-logits path — only the memory profile differs. Chunk size 5
    does not divide the spliced length, so the padded-tail path runs too."""
    cfg = OpusConfig.tiny()
    lcfg = LoRAConfig(rank=2)
    frozen = opus.init(jax.random.PRNGKey(0), cfg)
    trainable = mmt.init_trainable(jax.random.PRNGKey(1), cfg,
                                   train_switch=True, lora_cfg=lcfg,
                                   frozen_params=frozen)
    batch = {k: jnp.asarray(v) for k, v in _mm_batch(cfg, 4).items()}
    ls = 2.0

    def run(ce_chunk):
        grad_fn = jax.value_and_grad(mmt.loss_fn, has_aux=True)
        (loss, _), grads = grad_fn(trainable, frozen, cfg, batch, ls,
                                   True, ce_chunk)
        return float(loss), grads

    l_full, g_full = run(0)
    l_chunk, g_chunk = run(5)
    np.testing.assert_allclose(l_full, l_chunk, rtol=1e-5)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6),
        g_full, g_chunk)


def test_grad_accum_matches_big_batch_step():
    """grad_accum=2 over batch 4 equals ONE big-batch step: the chunks are
    combined by valid-token weighting, so unequal padding per chunk (row 1
    right-padded here) must not skew the update."""
    cfg = OpusConfig.tiny()
    tcfg = TrainConfig(learning_rate=1e-3)
    lcfg = LoRAConfig(rank=2)
    frozen = opus.init(jax.random.PRNGKey(0), cfg)
    batch = _mm_batch(cfg, 4)
    # make chunk 0 (rows 0-1) carry fewer valid tokens than chunk 1
    batch["attn_mask"][1, -6:] = False
    batch["input_ids"][1, -6:] = 0
    batch["labels"][1, -6:] = IGNORE_INDEX
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    def run(grad_accum):
        state, tx = mmt.create_state(jax.random.PRNGKey(1), cfg, tcfg,
                                     frozen, train_switch=True,
                                     lora_cfg=lcfg)
        step = mmt.make_train_step(cfg, tx, lora_cfg=lcfg,
                                   grad_accum=grad_accum)
        new_state, m = step(state, frozen, batch)
        return float(m["loss"]), new_state

    loss_ref, st_ref = run(1)
    loss_ga, st_ga = run(2)
    np.testing.assert_allclose(loss_ga, loss_ref, rtol=2e-6)
    for a, b in zip(jax.tree.leaves(st_ref.trainable),
                    jax.tree.leaves(st_ga.trainable)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=2e-5)


def test_grad_accum_batch_must_divide():
    import pytest

    cfg = OpusConfig.tiny()
    tcfg = TrainConfig(learning_rate=1e-3)
    frozen = opus.init(jax.random.PRNGKey(0), cfg)
    state, tx = mmt.create_state(jax.random.PRNGKey(1), cfg, tcfg, frozen,
                                 train_switch=True, lora_cfg=None)
    step = mmt.make_train_step(cfg, tx, grad_accum=3)
    batch = {k: jnp.asarray(v) for k, v in _mm_batch(cfg, 4).items()}
    with pytest.raises(ValueError, match="divisible"):
        step(state, frozen, batch)


def test_multimodal_step_sharded_matches_single_device():
    cfg = OpusConfig.tiny()
    tcfg = TrainConfig(learning_rate=1e-3)
    lcfg = LoRAConfig(rank=2)
    frozen = opus.init(jax.random.PRNGKey(0), cfg)
    state, tx = mmt.create_state(jax.random.PRNGKey(1), cfg, tcfg, frozen,
                                 train_switch=True, lora_cfg=lcfg)
    # donate=False: this test reuses `state` for the sharded re-run below
    step = mmt.make_train_step(cfg, tx, lora_cfg=lcfg, donate=False)
    batch = {k: jnp.asarray(v) for k, v in _mm_batch(cfg, 8).items()}
    _, m_single = step(state, frozen, batch)

    mesh = make_mesh(MeshConfig(data=4, model=2))
    sh_frozen = partition.shard_params(mesh, frozen)
    sh_state = mmt.MMTrainState(
        partition.shard_params(mesh, state.trainable),
        jax.tree.map(
            lambda x: jax.device_put(x, NamedSharding(mesh, P()))
            if hasattr(x, "shape") else x, state.opt_state),
        state.step)
    bsh = NamedSharding(mesh, P("data"))
    sh_batch = {k: jax.device_put(v, bsh) for k, v in batch.items()}
    with mesh:
        _, m_sharded = step(sh_state, sh_frozen, sh_batch)
    np.testing.assert_allclose(float(m_single["loss"]),
                               float(m_sharded["loss"]), rtol=1e-4)


def test_lora_train_over_int4_frozen_base():
    """QLoRA-role end-to-end: the frozen LLM stored as grouped int4
    (kernels/quant4.py — the bitsandbytes load_in_4bit role,
    builder.py:44-57 + :105-111) with LoRA adapters training on top.
    Gradients reach the adapters through qdense4's custom VJP; loss
    decreases over a few steps. Dims chosen so every projection's in-dim
    is a BK(=256) multiple — the int4 path actually engages."""
    from opus_pllm_tpu.core.config import (DecoderConfig, ESM2Config,
                                           SwitchProjectorConfig)
    from opus_pllm_tpu.kernels import quant4

    llm = DecoderConfig(family="llama", vocab_size=256, hidden_size=256,
                        intermediate_size=512, num_layers=2, num_heads=4,
                        num_kv_heads=2, head_dim=64,
                        max_position_embeddings=512, dtype="float32")
    esm = ESM2Config.tiny()
    cfg = OpusConfig(
        esm=esm,
        cstp=CSTPConfig(protein_dim=esm.embed_dim, text_dim=llm.hidden_size,
                        proj_dim=llm.hidden_size),
        switch=SwitchProjectorConfig(input_dim=llm.hidden_size,
                                     llm_hidden_size=llm.hidden_size),
        llm=llm, max_prompt_len=64)
    tcfg = TrainConfig(learning_rate=5e-3)
    lcfg = LoRAConfig(rank=4)
    frozen = opus.init(jax.random.PRNGKey(0), cfg)
    frozen["llm"] = quant4.quantize_decoder4(frozen["llm"])
    # the quantizer must actually have produced packed leaves
    assert "kernel_p" in frozen["llm"]["layers"][0]["q_proj"]
    assert "kernel_p" in frozen["llm"]["lm_head"]
    state, tx = mmt.create_state(jax.random.PRNGKey(1), cfg, tcfg, frozen,
                                 train_switch=True, lora_cfg=lcfg)
    step = mmt.make_train_step(cfg, tx, lora_cfg=lcfg)
    batch = {k: jnp.asarray(v) for k, v in _mm_batch(cfg, 4).items()}
    before_b = np.asarray(
        state.trainable["lora"]["layers"][0]["q_proj"]["B"]).copy()
    losses = []
    for _ in range(8):
        state, metrics = step(state, frozen, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses[-1])
    assert losses[-1] < losses[0]
    assert not np.allclose(
        before_b, np.asarray(state.trainable["lora"]["layers"][0]["q_proj"]["B"]))


def test_fit_periodic_save_and_exact_resume(tmp_path):
    """fit(ckpt=..., save_every=1) checkpoints the FULL state (trainable +
    optimizer moments + step); a killed run resumed from the checkpoint
    finishes bit-identical to an uninterrupted run."""
    from opus_pllm_tpu.core.checkpoint import CheckpointManager
    from opus_pllm_tpu.core.config import (IGNORE_INDEX, LoRAConfig,
                                           OpusConfig, SEQ_TOKEN_INDEX,
                                           TrainConfig)
    from opus_pllm_tpu.models import opus as opus_mod
    from opus_pllm_tpu.train import multimodal_trainer as mmt

    cfg = OpusConfig.tiny("llama")
    tcfg = TrainConfig(learning_rate=1e-3, batch_size=2, log_every=0)
    lcfg = LoRAConfig(rank=2)
    params = opus_mod.init(jax.random.PRNGKey(0), cfg)

    rng = np.random.default_rng(0)

    def batch():
        ids = rng.integers(4, cfg.llm.vocab_size, (2, 16)).astype(np.int32)
        ids[:, 1] = SEQ_TOKEN_INDEX
        labels = ids.copy()
        labels[:, :4] = IGNORE_INDEX
        esm = np.full((2, 1, 8), 5, np.int32)
        esm[:, :, 0], esm[:, :, -1] = 0, 2
        return {"input_ids": ids, "attn_mask": np.ones((2, 16), bool),
                "labels": labels, "esm_tokens": esm}

    data = [batch() for _ in range(4)]

    def fresh_state():
        return mmt.create_state(jax.random.PRNGKey(1), cfg, tcfg, params,
                                train_switch=True, lora_cfg=lcfg)

    # uninterrupted reference
    st, tx = fresh_state()
    ref = mmt.fit(st, tx, cfg, tcfg, params, iter(data), lora_cfg=lcfg,
                  log_fn=lambda *a: None, prefetch=0)

    # interrupted: 2 steps with periodic saves, then resume for the rest
    mgr = CheckpointManager(str(tmp_path / "resume"), max_to_keep=2)
    st, tx = fresh_state()
    mmt.fit(st, tx, cfg, tcfg, params, iter(data[:2]), lora_cfg=lcfg,
            log_fn=lambda *a: None, prefetch=0, ckpt=mgr, save_every=1)
    assert mgr.latest_step() == 2

    st2, tx2 = fresh_state()
    st2 = mmt.restore_state(mgr, st2)
    assert int(st2.step) == 2
    out = mmt.fit(st2, tx2, cfg, tcfg, params, iter(data[2:]),
                  lora_cfg=lcfg, log_fn=lambda *a: None, prefetch=0)

    assert int(out.step) == int(ref.step) == 4
    for a, b in zip(jax.tree.leaves(ref.trainable),
                    jax.tree.leaves(out.trainable)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(ref.opt_state),
                    jax.tree.leaves(out.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fit_periodic_validation():
    """fit(val_batches_fn=..., val_every=...) logs a token-weighted
    held-out loss at the interval and once at the end, equal to a manual
    make_eval_step pass over the val set."""
    from opus_pllm_tpu.core.config import (IGNORE_INDEX, LoRAConfig,
                                           OpusConfig, SEQ_TOKEN_INDEX,
                                           TrainConfig)
    from opus_pllm_tpu.models import opus as opus_mod
    from opus_pllm_tpu.train import multimodal_trainer as mmt

    cfg = OpusConfig.tiny("llama")
    tcfg = TrainConfig(learning_rate=1e-3, batch_size=2, log_every=0)
    lcfg = LoRAConfig(rank=2)
    params = opus_mod.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)

    def batch():
        ids = rng.integers(4, cfg.llm.vocab_size, (2, 16)).astype(np.int32)
        ids[:, 1] = SEQ_TOKEN_INDEX
        labels = ids.copy()
        labels[:, :4] = IGNORE_INDEX
        esm = np.full((2, 1, 8), 5, np.int32)
        esm[:, :, 0], esm[:, :, -1] = 0, 2
        return {"input_ids": ids, "attn_mask": np.ones((2, 16), bool),
                "labels": labels, "esm_tokens": esm}

    data = [batch() for _ in range(4)]
    val = [batch() for _ in range(2)]
    logs: list = []
    st, tx = mmt.create_state(jax.random.PRNGKey(1), cfg, tcfg, params,
                              train_switch=True, lora_cfg=lcfg)
    out = mmt.fit(st, tx, cfg, tcfg, params, iter(data), lora_cfg=lcfg,
                  log_fn=logs.append, prefetch=0,
                  val_batches_fn=lambda: iter(val), val_every=2)
    vals = [ln for ln in logs if "val_loss" in ln]
    # steps 2 and 4 (the final step coincides with the interval: no dup)
    assert len(vals) == 2 and vals[0].startswith("step 2") \
        and vals[1].startswith("step 4")

    # the logged value equals a manual token-weighted eval pass
    ev = mmt.make_eval_step(cfg, lora_cfg=lcfg)
    tot = n = 0.0
    for vb in val:
        m = ev(out.trainable, params, {k: jnp.asarray(v)
                                       for k, v in vb.items()})
        tot += float(m["loss"]) * float(m["valid"])
        n += float(m["valid"])
    want = tot / n
    got = float(vals[1].split("val_loss=")[1].split()[0])
    assert abs(got - want) < 5e-4, (got, want)


def test_remat_modes_loss_identical():
    """remat never changes math, only the backward-pass memory/FLOP
    trade: the step's loss and updates must be identical across 'full'
    (per-layer jax.checkpoint), 'none', and 'dots' (checkpoint_dots
    policy). The 1.1B bench step runs remat=none (1.34x measured,
    BENCH_NOTES round 5); this pins the equivalence at test scale."""
    cfg = OpusConfig.tiny()
    tcfg = TrainConfig(learning_rate=1e-3)
    lcfg = LoRAConfig(rank=2)
    frozen = opus.init(jax.random.PRNGKey(0), cfg)
    batch = {k: jnp.asarray(v) for k, v in _mm_batch(cfg, 4).items()}
    outs = {}
    for mode in (True, False, "dots"):
        state, tx = mmt.create_state(jax.random.PRNGKey(1), cfg, tcfg,
                                     frozen, train_switch=True,
                                     lora_cfg=lcfg)
        step = mmt.make_train_step(cfg, tx, lora_cfg=lcfg, remat=mode,
                                   donate=False)
        state, metrics = step(state, frozen, batch)
        outs[mode] = (float(metrics["loss"]),
                      np.asarray(state.trainable["switch"]["layers"][0]
                                 ["kernel"]))
    for mode in (False, "dots"):
        assert abs(outs[mode][0] - outs[True][0]) < 1e-5, mode
        np.testing.assert_allclose(outs[mode][1], outs[True][1],
                                   rtol=2e-5, atol=2e-6)


def test_train_config_remat_mode_mapping():
    assert TrainConfig(remat="full").remat_mode is True
    assert TrainConfig(remat="none").remat_mode is False
    assert TrainConfig(remat="dots").remat_mode == "dots"

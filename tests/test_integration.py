"""Whole-framework integration: stage (a) -> (c)/(d) -> eval, tiny on CPU.

One continuous run through the public API: precompute CSTP pairs from a
UniProtQA pickle, train the CSTP adapter, train switch projector + LoRA on
instruction data (checkpoint mid-run, resume, continue), merge the LoRA,
then run the annotation eval harness with the trained weights.
"""

import json
import pickle

import jax
import jax.numpy as jnp
import numpy as np

from opus_pllm_tpu.core.checkpoint import CheckpointManager
from opus_pllm_tpu.core.config import (CSTPConfig, GenerationConfig,
                                       LoRAConfig, OpusConfig, TrainConfig)
from opus_pllm_tpu.data import precompute
from opus_pllm_tpu.data.collate import instruction_batches
from opus_pllm_tpu.data.datasets import InstructionDataset, UniProtQAVecDataset
from opus_pllm_tpu.evals import runner
from opus_pllm_tpu.infer.tokenization import ByteTokenizer
from opus_pllm_tpu.lora import lora as lora_mod
from opus_pllm_tpu.models import decoder, esm2, opus
from opus_pllm_tpu.train import cstp_trainer, multimodal_trainer as mmt


def test_full_pipeline(tmp_path):
    cfg = OpusConfig.tiny()
    tok = ByteTokenizer()
    params = opus.init(jax.random.PRNGKey(0), cfg)

    # ---- stage (a): pairs -> CSTP training --------------------------------
    recs = {f"P{i}": {"Sequence": "MKTAYIAKQR"[: 4 + i % 6 + 1],
                      "Name": [f"Protein {i}"], "Accession": [f"P{i}"],
                      "Similarity": "kinase family",
                      "Subcellular_Location": "Nucleus"}
            for i in range(8)}
    up = tmp_path / "uniprot.pkl"
    up.write_bytes(pickle.dumps(recs))
    pairs = tmp_path / "pairs.pkl"
    n = precompute.precompute_cstp_pairs(
        params["esm"], cfg.esm, params["llm"], cfg.llm, tok, str(up),
        str(pairs), batch_size=4, len_bucket=16)
    assert n == 8

    se, te = UniProtQAVecDataset(str(pairs)).arrays()
    ccfg = CSTPConfig(protein_dim=se.shape[1], text_dim=te.shape[1],
                      proj_dim=cfg.cstp.proj_dim)
    tc = TrainConfig(learning_rate=1e-3, log_every=0)
    cstate, ctx = cstp_trainer.create_state(jax.random.PRNGKey(1), ccfg, tc)
    cstep = cstp_trainer.make_train_step(ccfg, ctx)
    for i in range(3):
        cstate, m = cstep(cstate, jnp.asarray(se), jnp.asarray(te))
        # cold-start random embeddings can land the evidential loss in its
        # (reference-inherited) dead-gradient region — see bridge/losses.py;
        # here the integration test asserts the pipeline mechanics, while
        # test_train.py asserts convergence on well-conditioned embeddings
        assert np.isfinite(float(m["loss"]))
    vm = cstp_trainer.evaluate(cstate.params, ccfg,
                               [(se, te)])
    assert 0.0 <= vm["acc_seq2text"] <= 1.0
    assert int(cstate.step) == 3
    params["cstp"] = cstate.params   # trained adapter into the full model

    # ---- stages (c)+(d) with mid-run checkpoint + resume -------------------
    sft = [{"instruction": "Where is this protein located?",
            "input": rec["Sequence"], "output": "Nucleus"}
           for rec in recs.values()]
    sft_path = tmp_path / "sft.json"
    sft_path.write_text(json.dumps(sft))
    ds = InstructionDataset(str(sft_path))
    lcfg = LoRAConfig(rank=2)
    tcfg = TrainConfig(learning_rate=5e-3, batch_size=4, log_every=0)
    state, tx = mmt.create_state(jax.random.PRNGKey(2), cfg, tcfg, params,
                                 train_switch=True, lora_cfg=lcfg)
    step = mmt.make_train_step(cfg, tx, lora_cfg=lcfg)
    batches = list(instruction_batches(ds, tok, 4, seed=0, epochs=3,
                                       prompt_bucket=16, esm_bucket=16))
    losses = []
    mgr = CheckpointManager(str(tmp_path / "ck"), max_to_keep=2)
    for i, b in enumerate(batches[:3]):
        state, m = step(state, params, {k: jnp.asarray(v) for k, v in b.items()})
        losses.append(float(m["loss"]))
    mgr.save(int(state.step), state.trainable)

    # resume: restore trainable tree, rebuild optimizer, keep training
    restored = mgr.restore(like=state.trainable)
    state2, tx2 = mmt.create_state(jax.random.PRNGKey(9), cfg, tcfg, params,
                                   train_switch=True, lora_cfg=lcfg)
    state2 = mmt.MMTrainState(restored, tx2.init(restored),
                              jnp.asarray(int(state.step), jnp.int32))
    step2 = mmt.make_train_step(cfg, tx2, lora_cfg=lcfg)
    for b in batches[3:6]:
        state2, m = step2(state2, params, {k: jnp.asarray(v) for k, v in b.items()})
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses

    # ---- assemble inference model: merge LoRA, install trained switch -----
    infer_params = dict(params)
    infer_params["switch"] = state2.trainable["switch"]
    infer_params["llm"] = lora_mod.merge(params["llm"],
                                         state2.trainable["lora"], lcfg)

    # ---- eval harness on a fake localization test set ----------------------
    test = [{"instruction": "Where is this protein located?",
             "input": "MKTAYIAKQR", "output": "Nucleus"} for _ in range(3)]
    tpath = tmp_path / "toy_localization_test.json"
    tpath.write_text(json.dumps(test))
    gen = GenerationConfig(max_new_tokens=8, temperature=0.0,
                           eos_token_id=tok.eos_token_id,
                           pad_token_id=tok.pad_token_id)
    rep = runner.run_annotation_eval(
        infer_params, cfg, tok, str(tpath), gen=gen, batch_size=2,
        prompt_bucket=16, esm_bucket=16, log_fn=lambda *_: None)
    assert len(rep.results) == 3
    assert "Accuracy" in rep.metrics
    assert rep.entries_per_sec > 0

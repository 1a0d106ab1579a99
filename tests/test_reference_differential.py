"""Differential parity: run /root/reference's OWN torch pipeline vs ours.

Round-1 verdict item 1: fabricate tiny checkpoints in the reference's
formats, load them through BOTH the reference's `load_pretrained_model` /
`prepare_inputs_labels_for_multimodal` / `generate`
(multi_modality_v1/model/builder.py:19-131, opus_arch.py:133-294,
opus_llama.py:96-132) and our `core/builder.load_pretrained` +
`infer/engine.generate`, and assert equality end-to-end:

  * pooled ESM -> CSTP -> switch soft-token streams (per family)
  * spliced embedding/label/position streams, left-pad AND right-pad
  * greedy generated token ids (with LoRA merged + CSTP + switch loaded)
  * the evidential CSTP loss on identical logits

fair-esm / pytorch_lightning are unavailable in this image; see
reference_harness.py for the (behavior-preserving) stubs.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")
peft = pytest.importorskip("peft")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import reference_harness as ref  # noqa: E402  (tests/ is on sys.path)

if not ref.reference_available():
    pytest.skip("/root/reference not present", allow_module_level=True)

pytestmark = [pytest.mark.differential, pytest.mark.parity]

from reference_fixtures import (  # noqa: E402,F401
    CSTP_OUT, ESM_DIM, FAMILIES, HIDDEN, INSTRUCTIONS, N_TOKENS, SEQS, Pair)


@pytest.fixture(scope="module", params=FAMILIES)
def pair(request, tmp_path_factory):
    root = tmp_path_factory.mktemp(f"diff-{request.param}")
    return Pair(request.param, str(root))


def test_tokenization_matches(pair):
    ids_ours, _, _ = pair.our_batch()
    for p, ours in zip(pair.prompts(), ids_ours):
        theirs = ref.reference_tokenize(p, pair.tok)
        assert list(ours) == list(theirs)


def test_encode_pipeline_matches(pair):
    from opus_pllm_tpu.models import esm2, opus

    m = pair.ref_model
    with torch.no_grad():
        pooled_ref = m.encode_seq2embedding(SEQS)                  # (B, E)
        cstp_ref = m.encode_projector_embedding(pooled_ref)        # (B, 5120)
        soft_ref = m.switch_projector_embedding(cstp_ref)          # (B, 8, H)

    toks, _ = esm2.tokenize(SEQS)
    pooled = esm2.pooled_embedding(pair.params["esm"], pair.cfg.esm,
                                   jnp.asarray(toks))
    np.testing.assert_allclose(np.asarray(pooled), pooled_ref.numpy(),
                               rtol=2e-3, atol=2e-4)
    soft = opus.encode_proteins(pair.params, pair.cfg,
                                jnp.asarray(toks)[:, None])
    np.testing.assert_allclose(np.asarray(soft)[:, 0], soft_ref.numpy(),
                               rtol=2e-3, atol=2e-3)


def _valid_rows(arr, mask):
    return [np.asarray(arr)[i][np.asarray(mask)[i]] for i in range(len(arr))]


def test_splice_inference_matches(pair):
    from opus_pllm_tpu.models import esm2, opus

    ref_ids, ref_mask = pair.ref_batch()
    # non-None position_ids so the reference returns its rebuilt positions
    # (opus_arch.py:287-288 nulls them when the caller passed None)
    dummy_pos = torch.arange(ref_ids.shape[1]).expand(ref_ids.shape)
    with torch.no_grad():
        (_, pos_ref, mask_ref, _, emb_ref, _) = \
            pair.ref_model.prepare_inputs_labels_for_multimodal(
                ref_ids, dummy_pos, ref_mask, None, None, SEQS,
                inference_mode=True)

    _, ids, mask = pair.our_batch()
    toks, _ = esm2.tokenize(SEQS)
    sp = opus.splice_prompt(pair.params, pair.cfg, ids, mask,
                            jnp.asarray(toks)[:, None], left_pad=True)

    ref_emb_rows = _valid_rows(emb_ref.numpy(), mask_ref.numpy())
    our_emb_rows = _valid_rows(sp.embeds, sp.mask)
    for r, o in zip(ref_emb_rows, our_emb_rows):
        assert r.shape == o.shape
        np.testing.assert_allclose(o, r, rtol=2e-3, atol=2e-3)
    # left-pad position ids restart at 0 on the first valid slot
    for r, o in zip(_valid_rows(pos_ref.numpy(), mask_ref.numpy()),
                    _valid_rows(sp.positions, sp.mask)):
        np.testing.assert_array_equal(o, r)


def test_splice_training_matches(pair):
    """RIGHT-pad path with labels: IGNORE_INDEX at protein slots
    (opus_arch.py:245-269)."""
    from opus_pllm_tpu.core.config import IGNORE_INDEX
    from opus_pllm_tpu.infer.tokenization import pad_batch, tokenize_with_seq
    from opus_pllm_tpu.models import esm2, opus

    ids_list = [tokenize_with_seq(p, pair.tok.encode, None)
                for p in pair.prompts()]
    pad_id = pair.tok.pad_token_id
    arr, mask = pad_batch(ids_list, pad_id, left=False)

    ref_ids = torch.tensor(np.where(mask, arr, pad_id), dtype=torch.long)
    ref_mask = torch.tensor(mask)
    # labels = input ids over valid positions (reference trains with the
    # full spliced stream; IGNORE lands on protein slots)
    labels = torch.where(ref_mask, ref_ids, torch.tensor(IGNORE_INDEX))
    with torch.no_grad():
        (_, _, mask_ref, _, emb_ref, lab_ref) = \
            pair.ref_model.prepare_inputs_labels_for_multimodal(
                ref_ids, None, ref_mask, None, labels, SEQS,
                inference_mode=False)

    toks, _ = esm2.tokenize(SEQS)
    our_labels = jnp.asarray(np.where(mask, arr, IGNORE_INDEX))
    sp = opus.splice_prompt(pair.params, pair.cfg, jnp.asarray(arr),
                            jnp.asarray(mask), jnp.asarray(toks)[:, None],
                            labels=our_labels, left_pad=False)

    for r, o in zip(_valid_rows(emb_ref.numpy(), mask_ref.numpy()),
                    _valid_rows(sp.embeds, sp.mask)):
        np.testing.assert_allclose(o, r, rtol=2e-3, atol=2e-3)
    for r, o in zip(_valid_rows(lab_ref.numpy(), mask_ref.numpy()),
                    _valid_rows(sp.labels, sp.mask)):
        np.testing.assert_array_equal(o, r)


def test_greedy_generate_matches(pair):
    from opus_pllm_tpu.infer import engine
    from opus_pllm_tpu.models import decoder, esm2, opus

    max_new = 16
    eos = pair.vocab["</s>"]
    ref_ids, ref_mask = pair.ref_batch()
    with torch.inference_mode():
        out_ref = pair.ref_model.generate(
            ref_ids, SEQS, attention_mask=ref_mask,
            pad_token_id=pair.tok.eos_token_id, seq_embedding=None,
            do_sample=False, temperature=0.0, top_p=1.0, num_beams=1,
            max_new_tokens=max_new, use_cache=True)

    _, ids, mask = pair.our_batch()
    toks, _ = esm2.tokenize(SEQS)
    sp = opus.splice_prompt(pair.params, pair.cfg, ids, mask,
                            jnp.asarray(toks)[:, None], left_pad=True)
    pos = decoder.positions_from_mask(sp.mask)
    out = engine.generate(
        pair.params["llm"], pair.cfg.llm, sp.embeds, sp.mask, pos,
        jax.random.PRNGKey(0), max_new_tokens=max_new, temperature=0.0,
        eos_token_id=eos, pad_token_id=pair.tok.pad_token_id)

    ours_tok = np.asarray(out.tokens)
    ours_len = np.asarray(out.lengths)
    for i in range(len(SEQS)):
        theirs = [int(t) for t in out_ref[i].tolist()]
        if eos in theirs:
            theirs = theirs[:theirs.index(eos)]
        ours = [int(t) for t in ours_tok[i, :ours_len[i]] if int(t) != eos]
        assert ours == theirs, (pair.family, i, ours, theirs)


def test_evidential_loss_matches_reference():
    """ce_loss (evidence_loss.py:44-66) and TrustEvidenceLoss
    (modelling.py:311-332) vs our losses on identical logits, at annealing
    global steps 10 (coef 0), 200 (partial), 1000 (the fixed call-site
    value)."""
    ref.install()
    from multi_modality_model.cstp_v3 import evidence_loss as ref_el
    from multi_modality_model.cstp_v3.modelling import TrustEvidenceLoss

    from opus_pllm_tpu.bridge import losses

    torch.manual_seed(3)
    b = 128   # the reference's hard-coded W=c=128 batch coupling
    logits = torch.randn(b, b) * 2.0
    targets = torch.arange(b)
    for step in (10, 200, 1000):
        theirs = ref_el.ce_loss(logits, targets, global_step=step).item()
        ours = float(losses.evidential_ce(
            jnp.asarray(logits.numpy()), jnp.asarray(targets.numpy()),
            global_step=step, w=128, num_classes=128))
        np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)

    # full TrustEvidenceLoss: symmetric, T=0.0007, global_step=1000
    p = torch.nn.functional.normalize(torch.randn(b, 32), dim=-1)
    t = torch.nn.functional.normalize(torch.randn(b, 32), dim=-1)
    pred = {"protein2text": (p @ t.T) / 0.0007,
            "text2protein": (t @ p.T) / 0.0007}
    tgt = {"protein2text": targets, "text2protein": targets}
    from opus_pllm_tpu.core.config import CSTPConfig

    theirs = TrustEvidenceLoss(temperature=1.0)(pred, tgt).item()
    ours = float(losses.trust_evidence(
        jnp.asarray(pred["protein2text"].numpy()),
        jnp.asarray(pred["text2protein"].numpy()),
        jnp.asarray(targets.numpy()),
        CSTPConfig(temperature=1.0, evidence_global_step=1000)))
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


def test_beam_search_generate_matches(pair):
    """num_beams=2 through the reference's own generate vs our
    beam_generate on the spliced stream (run_opus_ddp.py:156-158)."""
    from opus_pllm_tpu.infer import engine
    from opus_pllm_tpu.models import decoder, esm2, opus

    if pair.family != "llama":
        pytest.skip("beam differential: one family suffices (engine-level "
                    "HF parity is covered for all shapes in "
                    "test_engine_extras)")
    max_new = 12
    eos = pair.vocab["</s>"]
    ref_ids, ref_mask = pair.ref_batch()
    with torch.inference_mode():
        out_ref = pair.ref_model.generate(
            ref_ids, SEQS, attention_mask=ref_mask,
            pad_token_id=pair.tok.eos_token_id, seq_embedding=None,
            do_sample=False, num_beams=2, max_new_tokens=max_new,
            use_cache=True)

    _, ids, mask = pair.our_batch()
    toks, _ = esm2.tokenize(SEQS)
    sp = opus.splice_prompt(pair.params, pair.cfg, ids, mask,
                            jnp.asarray(toks)[:, None], left_pad=True)
    pos = decoder.positions_from_mask(sp.mask)
    out = engine.beam_generate(
        pair.params["llm"], pair.cfg.llm, sp.embeds, sp.mask, pos,
        num_beams=2, max_new_tokens=max_new, eos_token_id=eos,
        pad_token_id=pair.tok.pad_token_id)
    ours_tok = np.asarray(out.tokens)
    ours_len = np.asarray(out.lengths)
    for i in range(len(SEQS)):
        theirs = [int(t) for t in out_ref[i].tolist()]
        if eos in theirs:
            theirs = theirs[:theirs.index(eos) + 1]
        ours = [int(t) for t in ours_tok[i, :ours_len[i]]]
        assert ours == theirs, (i, ours, theirs)

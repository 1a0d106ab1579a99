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

FAMILIES = ["llama", "opt", "qwen"]
HIDDEN = 64          # LLM hidden size (tiny)
N_TOKENS = 8         # reference switch projector n_tokens (builder.py:11)
CSTP_OUT = 5120      # hard-coded in protein_mlp/builder.py:14
ESM_DIM = 64

SEQS = ["MKTAYIAKQR", "ACDEFGHIKLMNPQRSTVWY"]
INSTRUCTIONS = [
    "What is the subcellular localization of this protein?"
    "Kindly reply with only one word.",
    "Name the enzyme commission number.",
]


def _fp16ify(module: torch.nn.Module) -> None:
    """Snap weights to the fp16 grid so the reference's fp16 load path
    (builder.py:57) is lossless and both sides see identical values."""
    with torch.no_grad():
        for p in module.parameters():
            p.data = p.data.half().float()


def _make_toy_tokenizer(save_dir: str):
    """Slow byte-level GPT2 tokenizer (empty merges): deterministic, full
    byte coverage, loadable via AutoTokenizer(use_fast=False)."""
    from transformers import GPT2Tokenizer
    from transformers.models.gpt2.tokenization_gpt2 import bytes_to_unicode

    os.makedirs(save_dir, exist_ok=True)
    vocab = {ch: i for i, ch in enumerate(bytes_to_unicode().values())}
    for sp in ["<s>", "</s>", "<pad>", "<unk>"]:
        vocab[sp] = len(vocab)
    with open(os.path.join(save_dir, "vocab.json"), "w") as f:
        json.dump(vocab, f)
    with open(os.path.join(save_dir, "merges.txt"), "w") as f:
        f.write("#version: 0.2\n")
    tok = GPT2Tokenizer(
        vocab_file=os.path.join(save_dir, "vocab.json"),
        merges_file=os.path.join(save_dir, "merges.txt"),
        unk_token="<unk>", bos_token="<s>", eos_token="</s>",
        pad_token="<pad>")
    tok.save_pretrained(save_dir)
    return tok, vocab


def _make_llm_dir(root: str, family: str, vocab: dict) -> str:
    v = len(vocab)
    bos, eos, pad = vocab["<s>"], vocab["</s>"], vocab["<pad>"]
    torch.manual_seed({"llama": 0, "opt": 1, "qwen": 2}[family])
    if family == "llama":
        from transformers import LlamaConfig, LlamaForCausalLM
        cfg = LlamaConfig(
            vocab_size=v, hidden_size=HIDDEN, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=512, rope_theta=10000.0,
            rms_norm_eps=1e-5, tie_word_embeddings=False,
            bos_token_id=bos, eos_token_id=eos, pad_token_id=pad)
        model = LlamaForCausalLM(cfg)
        path = os.path.join(root, "tiny-llama-3")
        safe = True
    elif family == "opt":
        from transformers import OPTConfig, OPTForCausalLM
        cfg = OPTConfig(
            vocab_size=v, hidden_size=HIDDEN, ffn_dim=128,
            num_hidden_layers=2, num_attention_heads=4,
            max_position_embeddings=512, do_layer_norm_before=True,
            activation_function="relu", word_embed_proj_dim=HIDDEN,
            bos_token_id=bos, eos_token_id=eos, pad_token_id=pad)
        model = OPTForCausalLM(cfg)
        path = os.path.join(root, "tiny-galactica-opt")
        safe = False      # reference loads OPT with use_safetensors=False
    else:
        from transformers import Qwen2Config, Qwen2ForCausalLM
        cfg = Qwen2Config(
            vocab_size=v, hidden_size=HIDDEN, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=512, rope_theta=10000.0,
            rms_norm_eps=1e-6, tie_word_embeddings=False,
            bos_token_id=bos, eos_token_id=eos, pad_token_id=pad)
        model = Qwen2ForCausalLM(cfg)
        path = os.path.join(root, "tiny-qwen2.5")
        safe = True
    with torch.no_grad():
        # sharpen logits so fp16-merge rounding can't flip the greedy argmax
        model.get_output_embeddings().weight.mul_(3.0)
    _fp16ify(model)
    model.eval().save_pretrained(path, safe_serialization=safe)
    return path


def _make_esm_dir(root: str) -> str:
    from transformers import EsmConfig, EsmModel

    cfg = EsmConfig(
        vocab_size=33, hidden_size=ESM_DIM, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=4 * ESM_DIM,
        max_position_embeddings=128, position_embedding_type="rotary",
        emb_layer_norm_before=False, token_dropout=True,
        pad_token_id=1, mask_token_id=32, layer_norm_eps=1e-5,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    torch.manual_seed(7)
    hf = EsmModel(cfg, add_pooling_layer=False).eval()
    path = os.path.join(root, "tiny-esm2")
    hf.save_pretrained(path)
    return path


def _make_weights_dir(root: str, family: str, llm_dir: str) -> str:
    """Reference checkpoint-directory contract: CSTP Lightning ckpt +
    switch projector .bin + PEFT lora_adapter/."""
    wd = os.path.join(root, f"opus-weights-{family}")
    os.makedirs(os.path.join(wd, "modality_encoder"), exist_ok=True)
    os.makedirs(os.path.join(wd, "modality_refinement_projector"),
                exist_ok=True)
    g = torch.Generator().manual_seed(11)

    def rnd(*shape, scale=0.05):
        return (torch.randn(*shape, generator=g) * scale).half().float()

    # Lightning CSTP ckpt (state_dict + hyper_parameters layout)
    torch.save(
        {"state_dict": {
            "protein_projection.linear.weight": rnd(CSTP_OUT, ESM_DIM),
            "protein_projection.linear.bias": rnd(CSTP_OUT),
            "text_projection.linear.weight": rnd(CSTP_OUT, 32),
            "text_projection.linear.bias": rnd(CSTP_OUT),
        },
         "hyper_parameters": {
             "protein_projection_input_dim": ESM_DIM,
             "protein_projection_output_dim": CSTP_OUT,
             "text_projection_input_dim": 32,
             "text_projection_output_dim": CSTP_OUT,
             "n_heads": 2, "n_layers": 1, "alpha": 0.5,
         }},
        os.path.join(wd, "modality_encoder/modality_encoding_adapter.ckpt"))

    # switch projector: mlp2x_gelu Sequential -> indices 0 and 2
    torch.save(
        {"switch_projector.0.weight": rnd(HIDDEN * N_TOKENS, CSTP_OUT),
         "switch_projector.0.bias": rnd(HIDDEN * N_TOKENS),
         "switch_projector.2.weight": rnd(HIDDEN * N_TOKENS,
                                          HIDDEN * N_TOKENS),
         "switch_projector.2.bias": rnd(HIDDEN * N_TOKENS)},
        os.path.join(wd, "modality_refinement_projector/"
                         "modality_refinement_projection.bin"))

    # genuine PEFT LoRA adapter
    from peft import LoraConfig as PeftLoraConfig, get_peft_model
    from transformers import AutoModelForCausalLM

    base = AutoModelForCausalLM.from_pretrained(llm_dir)
    targets = (["q_proj", "k_proj", "v_proj", "out_proj", "fc1", "fc2"]
               if family == "opt" else
               ["q_proj", "k_proj", "v_proj", "o_proj",
                "gate_proj", "up_proj", "down_proj"])
    pm = get_peft_model(base, PeftLoraConfig(
        r=2, lora_alpha=4, target_modules=targets, lora_dropout=0.0,
        bias="none", task_type="CAUSAL_LM"))
    with torch.no_grad():
        for n, p in pm.named_parameters():
            if "lora_" in n:
                p.data = (torch.randn(p.shape, generator=g) * 0.05
                          ).half().float()
    pm.save_pretrained(os.path.join(wd, "lora_adapter"))
    # peft saves under lora_adapter/<adapter_name>? no: directly in dir
    inner = os.path.join(wd, "lora_adapter", "default")
    if os.path.isdir(inner):   # older/newer peft layout drift
        for f in os.listdir(inner):
            os.replace(os.path.join(inner, f),
                       os.path.join(wd, "lora_adapter", f))
    return wd


class Pair:
    """Reference (torch) and ours (JAX) loaded from the same fixtures."""

    def __init__(self, family: str, root: str):
        self.family = family
        self.esm_dir = _make_esm_dir(root)
        tok_dir = os.path.join(root, f"tok-{family}")
        _, self.vocab = _make_toy_tokenizer(tok_dir)
        self.llm_dir = _make_llm_dir(root, family, self.vocab)
        # model dir must also carry the tokenizer (reference loads it there)
        for f in os.listdir(tok_dir):
            os.replace(os.path.join(tok_dir, f), os.path.join(self.llm_dir, f))
        self.weights_dir = _make_weights_dir(root, family, self.llm_dir)
        self.cstp_ckpt = os.path.join(
            self.weights_dir, "modality_encoder/modality_encoding_adapter.ckpt")

        # ---- reference side ----
        self.tok, self.ref_model, _ = ref.load_reference_model(
            self.llm_dir, self.weights_dir, self.cstp_ckpt, self.esm_dir)

        # ---- our side ----
        from opus_pllm_tpu.core import builder
        from opus_pllm_tpu.core.config import (CSTPConfig, ESM2Config,
                                               OpusConfig,
                                               SwitchProjectorConfig)
        from dataclasses import replace

        llm_cfg = replace(builder.decoder_config_for(self.llm_dir),
                          dtype="float32")
        self.cfg = OpusConfig(
            esm=ESM2Config.tiny(),
            cstp=CSTPConfig(protein_dim=ESM_DIM, text_dim=32,
                            proj_dim=CSTP_OUT),
            switch=SwitchProjectorConfig(input_dim=CSTP_OUT,
                                         llm_hidden_size=HIDDEN,
                                         n_tokens=N_TOKENS),
            llm=llm_cfg, max_prompt_len=96)
        self.params, _ = builder.load_pretrained(
            self.llm_dir, self.weights_dir, self.cfg,
            esm_path=self.esm_dir, dtype=jnp.float32)

    # ---------- prompt/batch builders (both sides) ----------
    def prompts(self):
        return [f"You are a biology professor.\n\n### Student: <seq>\n{ins}\n"
                f"### Professor:" for ins in INSTRUCTIONS]

    def ref_batch(self):
        """Reference ids LEFT-padded; mask = ids != pad — the exact
        run_opus_ddp.py:30-44,113-117 recipe (that module is import-unsafe
        outside its script dir: it does `from metrics_computing_opi ...`)."""
        ids = [torch.tensor(ref.reference_tokenize(p, self.tok),
                            dtype=torch.long) for p in self.prompts()]
        pad_id = self.tok.pad_token_id
        ml = max(t.numel() for t in ids)
        padded = torch.stack([
            torch.cat([torch.full((ml - t.numel(),), pad_id,
                                  dtype=t.dtype), t]) for t in ids])
        return padded, padded != pad_id

    def our_batch(self):
        from opus_pllm_tpu.infer.tokenization import (pad_batch,
                                                      tokenize_with_seq)
        ids = [tokenize_with_seq(p, self.tok.encode, None)
               for p in self.prompts()]
        arr, mask = pad_batch(ids, self.tok.pad_token_id, left=True)
        return ids, jnp.asarray(arr), jnp.asarray(mask)


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

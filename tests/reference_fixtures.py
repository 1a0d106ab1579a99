"""Shared fabricated-checkpoint fixtures for the reference differentials.

Builds tiny checkpoints in the reference's exact formats (HF LLM dirs for
llama/opt/qwen, HF EsmModel dir, Lightning CSTP ckpt, switch-projector .bin,
genuine PEFT lora_adapter/) and loads them through BOTH the reference's own
`load_pretrained_model` (via reference_harness) and our
`core/builder.load_pretrained`, so tests can drive the two stacks
side-by-side. Used by test_reference_differential.py (module-level parity)
and test_reference_harness_differential.py (whole-eval-loop parity).
"""

from __future__ import annotations

import json
import os

import numpy as np
import torch

import jax.numpy as jnp

import reference_harness as ref

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



"""Load and drive /root/reference's OWN PyTorch pipeline on CPU.

The round-1 verdict's top ask: nothing ever executed the reference's actual
code (`multi_modality_v1/model/opus_arch.py` splicing + `opus_llama.py`
generate + `builder.py` load) side-by-side with ours. This harness makes
that possible in this image by stubbing the two unavailable native deps:

  * `esm` (fair-esm): `esm2_t33_650M_UR50D()` returns a tiny
    `transformers.EsmModel` wrapped in the fair-esm forward API
    (tokens -> {"representations": {33: hidden}}), tokenized with OUR
    fair-esm-compatible tokenizer so both sides see identical ESM tokens.
    HF's EsmModel is the ported fair-esm network, and our JAX ESM2 is
    parity-tested against it (tests/test_esm2.py), so the stub preserves
    the reference's numerics.
  * `pytorch_lightning`: `CSTPLightning.__init__` never calls
    `pl.LightningModule.__init__` (modelling.py:475), so a minimal
    LightningModule with Lightning's `load_from_checkpoint` contract
    (ckpt hyper_parameters merged with caller kwargs -> __init__,
    then load_state_dict) is sufficient.

CUDA calls (`.cuda()`, `device='cuda'` autocast) are no-op'd for CPU.

Nothing from the reference is copied here; this module only *imports and
runs* it to assert behavioral equality.
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np

REFERENCE_ROOT = "/root/reference"

_installed = False


def reference_available() -> bool:
    return os.path.isdir(os.path.join(
        REFERENCE_ROOT, "multi_modality_model", "multi_modality_v1"))


def install(esm_model_dir: str | None = None) -> None:
    """Install stubs + CPU patches and put the reference on sys.path.

    Idempotent; `esm_model_dir` (a HF EsmModel directory) can be set or
    changed later via `set_esm_model_dir`.
    """
    global _installed
    import torch
    import torch.nn as nn

    if esm_model_dir is not None:
        set_esm_model_dir(esm_model_dir)
    if _installed:
        return
    _installed = True

    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)

    # ---- CPU no-ops for hard-coded .cuda() calls -------------------------
    if not torch.cuda.is_available():
        torch.nn.Module.cuda = lambda self, *a, **k: self       # type: ignore
        torch.Tensor.cuda = lambda self, *a, **k: self          # type: ignore

    # ---- fair-esm stub ---------------------------------------------------
    esm_mod = types.ModuleType("esm")
    esm_mod._opus_stub = True                                    # type: ignore
    pretrained_mod = types.ModuleType("esm.pretrained")

    class _Alphabet:
        padding_idx = 1     # fair-esm alphabet: cls=0 pad=1 eos=2

        def get_batch_converter(self):
            from opus_pllm_tpu.models import esm2 as our_esm2

            def convert(data):
                seqs = [s for _, s in data]
                toks, _ = our_esm2.tokenize(seqs)
                return None, None, torch.tensor(np.asarray(toks),
                                                dtype=torch.long)
            return convert

    class _TinyFairESM(nn.Module):
        """fair-esm forward API over a tiny HF EsmModel."""

        def __init__(self, hf_dir: str):
            super().__init__()
            from transformers import EsmModel
            self.hf = EsmModel.from_pretrained(
                hf_dir, add_pooling_layer=False).float().eval()

        def forward(self, tokens, repr_layers=(33,), return_contacts=False):
            mask = (tokens != 1).long()
            out = self.hf(input_ids=tokens, attention_mask=mask)
            reps = out.last_hidden_state
            return {"representations": {rl: reps for rl in repr_layers}}

    def esm2_t33_650M_UR50D():
        hf_dir = getattr(esm_mod, "MODEL_DIR", None)
        if hf_dir is None:
            raise RuntimeError(
                "reference_harness: set_esm_model_dir() before building the "
                "reference protein encoder")
        return _TinyFairESM(hf_dir), _Alphabet()

    pretrained_mod.esm2_t33_650M_UR50D = esm2_t33_650M_UR50D    # type: ignore
    esm_mod.pretrained = pretrained_mod                          # type: ignore
    sys.modules["esm"] = esm_mod
    sys.modules["esm.pretrained"] = pretrained_mod

    # ---- pytorch_lightning stub -------------------------------------------
    pl_mod = types.ModuleType("pytorch_lightning")

    class LightningModule(nn.Module):
        @classmethod
        def load_from_checkpoint(cls, checkpoint_path, map_location="cpu",
                                 strict=True, **kwargs):
            ckpt = torch.load(checkpoint_path, map_location="cpu",
                              weights_only=False)
            hparams = dict(ckpt.get("hyper_parameters", {}))
            hparams.update(kwargs)
            model = cls(**hparams)
            model.load_state_dict(ckpt["state_dict"], strict=strict)
            return model

        def log(self, *a, **k):
            pass

        def log_dict(self, *a, **k):
            pass

        def save_hyperparameters(self, *a, **k):
            pass

    util_mod = types.ModuleType("pytorch_lightning.utilities")
    util_mod.rank_zero_info = lambda *a, **k: None               # type: ignore
    pl_mod.LightningModule = LightningModule                     # type: ignore
    pl_mod.utilities = util_mod                                  # type: ignore
    sys.modules["pytorch_lightning"] = pl_mod
    sys.modules["pytorch_lightning.utilities"] = util_mod


def set_esm_model_dir(hf_dir: str) -> None:
    install()
    sys.modules["esm"].MODEL_DIR = hf_dir                        # type: ignore


class FakeAccelerator:
    """Enough of accelerate.Accelerator for builder.py:41,102-103 on CPU."""

    process_index = "cpu"     # device_map={'': 'cpu'}

    def wait_for_everyone(self):
        pass


def load_reference_model(model_base: str, weights_dir: str | None,
                         cstp_ckpt: str | None, esm_model_dir: str):
    """Run the reference's own `load_pretrained_model` on CPU.

    Returns (tokenizer, model fp32, context_len). `weights_dir` follows the
    reference checkpoint-directory contract (lora_adapter/ +
    modality_refinement_projector/); `cstp_ckpt` is the Lightning CSTP path
    (reference passes it as `cstp_path`).
    """
    install(esm_model_dir)
    from multi_modality_model.multi_modality_v1.model import (  # noqa: E501
        builder as ref_builder)
    from multi_modality_model.multi_modality_v1.model.protein_projector import (  # noqa: E501
        builder as ref_pp_builder)

    # The reference's mutable class-level configs (its designed config
    # surface, builder.py:24-28 / protein_projector/builder.py:5-13):
    # point them at the tiny fixture dims + CPU.
    ref_builder.model_args.device = "cpu"
    ref_builder.model_args.esm_ckpt = None
    if cstp_ckpt is not None:
        import torch
        hp = torch.load(cstp_ckpt, map_location="cpu",
                        weights_only=False)["hyper_parameters"]
        PA = ref_pp_builder.Protein_Arguments
        PA.protein_projection_input_dim = hp["protein_projection_input_dim"]
        PA.protein_projection_output_dim = hp["protein_projection_output_dim"]
        PA.text_projection_input_dim = hp["text_projection_input_dim"]
        PA.text_projection_output_dim = hp["text_projection_output_dim"]
    if weights_dir is None:
        # reference leaves this dangling when adapter_path is None
        ref_builder.model_args.pretrain_switch_projector_ckpt = None

    tokenizer, model, context_len = ref_builder.load_pretrained_model(
        model_base, weights_dir, os.path.basename(model_base),
        load_8bit=False, load_4bit=False, accelerator=FakeAccelerator(),
        switch_projector_type="mlp2x_gelu", cstp_path=cstp_ckpt)
    # fp16 CPU inference is slow and adds avoidable rounding on top of the
    # fp16 weight grid; upcast for the numerical comparison (weights were
    # fabricated fp16-representable, so values are unchanged)
    model = model.float().eval()
    return tokenizer, model, context_len


def reference_tokenize(prompt: str, tokenizer):
    """The reference's own `tokenizer_seq_token` (-200 sentinel)."""
    install()
    from multi_modality_model.multi_modality_v1.mm_utils import (
        tokenizer_seq_token)
    return tokenizer_seq_token(prompt, tokenizer, return_tensors=None)

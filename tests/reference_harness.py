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
    # The reference's mutable class-level configs (its designed config
    # surface, builder.py:24-28 / protein_projector/builder.py:5-13):
    # point them at the tiny fixture dims + CPU.
    configure_reference_for_fixtures(esm_model_dir, cstp_ckpt)
    from multi_modality_model.multi_modality_v1.model import (  # noqa: E501
        builder as ref_builder)
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


# ---------------------------------------------------------------------------
# Whole-eval-loop drivers: run the reference's OWN eval_model bodies
# (run_opus_ddp.py:47-148, eval_run_multichoice.py:52-236) single-process.
# ---------------------------------------------------------------------------

EVAL_DIR = os.path.join(REFERENCE_ROOT, "multi_modality_model",
                        "multi_modality_v1", "eval")


def install_evaluate_stub() -> None:
    """Minimal `evaluate` so the reference's vendored metric modules
    (eval/metrics/{bleu,rouge,...}) import and run without the HF
    `evaluate` package: load(path) imports `<path>/<name>.py` as a package
    submodule (the vendored files use relative imports) and returns an
    instance whose .compute(**kw) is the module's own _compute(**kw) —
    the vendored _compute bodies accept the same str-list inputs the
    reference passes, so no feature-schema preprocessing is needed."""
    if "evaluate" in sys.modules and getattr(sys.modules["evaluate"],
                                             "_opus_stub", False):
        return
    import importlib.util
    import platform

    from packaging import version as _version

    ev = types.ModuleType("evaluate")
    ev._opus_stub = True                                         # type: ignore

    class EvaluationModuleInfo:
        def __init__(self, **kw):
            self.__dict__.update(kw)

    class Metric:
        def __init__(self, *a, **kw):
            pass

        def compute(self, **kw):
            return self._compute(**kw)

    def load(path, *a, **k):
        name = os.path.basename(os.path.normpath(path))
        dirpath = os.path.abspath(path)
        pkg_name = f"_opus_refmetric_{name}"
        pkg = types.ModuleType(pkg_name)
        pkg.__path__ = [dirpath]                                 # type: ignore
        sys.modules[pkg_name] = pkg
        spec = importlib.util.spec_from_file_location(
            f"{pkg_name}.{name}", os.path.join(dirpath, f"{name}.py"))
        mod = importlib.util.module_from_spec(spec)
        sys.modules[spec.name] = mod
        spec.loader.exec_module(mod)
        for obj in vars(mod).values():
            if (isinstance(obj, type) and issubclass(obj, Metric)
                    and obj is not Metric):
                inst = obj()
                try:
                    inst._download_and_prepare(None)
                except Exception:
                    pass            # offline: nltk.download etc. may fail
                return inst
        raise RuntimeError(f"no Metric subclass in {path}")

    utils_mod = types.ModuleType("evaluate.utils")
    fu_mod = types.ModuleType("evaluate.utils.file_utils")
    fu_mod.add_start_docstrings = (                              # type: ignore
        lambda *a, **k: (lambda cls: cls))
    utils_mod.file_utils = fu_mod                                # type: ignore
    cfg_mod = types.ModuleType("evaluate.config")
    cfg_mod.PY_VERSION = _version.parse(platform.python_version())  # type: ignore

    ev.load = load                                               # type: ignore
    ev.Metric = Metric                                           # type: ignore
    ev.MetricInfo = EvaluationModuleInfo                         # type: ignore
    ev.EvaluationModuleInfo = EvaluationModuleInfo               # type: ignore
    ev.utils = utils_mod                                         # type: ignore
    ev.config = cfg_mod                                          # type: ignore
    sys.modules["evaluate"] = ev
    sys.modules["evaluate.utils"] = utils_mod
    sys.modules["evaluate.utils.file_utils"] = fu_mod
    sys.modules["evaluate.config"] = cfg_mod


class _SingleProcessAccelerator:
    """accelerate.Accelerator fake for a single CPU process: the scatter
    (split_between_processes) is identity and `process_index` is 'cpu' so
    builder.py:41's device_map targets the CPU. This fakes only the
    process launcher; everything measured by the differential (prompt
    assembly, batching, generate, truncation, metrics) is reference code."""

    is_main_process = True
    process_index = "cpu"

    def wait_for_everyone(self):
        pass

    def split_between_processes(self, obj):
        import contextlib

        @contextlib.contextmanager
        def cm():
            yield obj
        return cm()


def configure_reference_for_fixtures(esm_model_dir: str,
                                     cstp_ckpt: str | None) -> None:
    """Point the reference's mutable class-level configs (its designed
    config surface) at the tiny fixtures + CPU."""
    install(esm_model_dir)
    from multi_modality_model.multi_modality_v1.model import (
        builder as ref_builder)
    from multi_modality_model.multi_modality_v1.model.protein_projector import (  # noqa: E501
        builder as ref_pp_builder)

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


class _chdir:
    def __init__(self, path):
        self.path = path

    def __enter__(self):
        self.prev = os.getcwd()
        os.chdir(self.path)

    def __exit__(self, *exc):
        os.chdir(self.prev)
        return False


def _import_eval_module(name: str):
    """Import a reference eval runner script (they live outside the package
    and import siblings by bare name, so EVAL_DIR must be on sys.path and
    `evaluate` stubbed first)."""
    install()
    install_evaluate_stub()
    if EVAL_DIR not in sys.path:
        sys.path.insert(0, EVAL_DIR)
    with _chdir(EVAL_DIR):
        import importlib
        return importlib.import_module(name)


def _patch_runner(mod):
    """Single-process + CPU patches on an imported reference runner module:
    fake Accelerator, identity gather, and an fp32 upcast after its own
    load_pretrained_model (fp16 CPU inference is painfully slow and the
    fixtures are fp16-representable, so values are unchanged)."""
    mod.Accelerator = _SingleProcessAccelerator
    mod.gather_object = lambda x: x
    orig_load = mod.load_pretrained_model

    def load_fp32(*a, **k):
        tok, model, ctx = orig_load(*a, **k)
        return tok, model.float().eval(), ctx
    mod.load_pretrained_model = load_fp32
    return mod


def run_reference_annotation_eval(llm_dir: str, weights_dir: str,
                                  esm_model_dir: str, cstp_ckpt: str,
                                  input_path: str, save_path: str, *,
                                  temperature: float = 0.0,
                                  top_p: float = 1.0, num_beams: int = 1):
    """Drive run_opus_ddp.eval_model (the reference's primary entry point,
    :47-148) end-to-end and return (results, metrics) — results from the
    JSON it saved, metrics captured from its own process_data call.

    Environment limits (documented, not behavioral): METEOR needs the nltk
    wordnet corpus and BERTScore the bert_score package + a downloaded
    BioBERT — neither exists in this zero-egress image, so those two
    are patched to None on the reference side; the differential for
    'function' sets compares ROUGE/BLEU."""
    import argparse
    import json as _json

    configure_reference_for_fixtures(esm_model_dir, cstp_ckpt)
    mod = _patch_runner(_import_eval_module("run_opus_ddp"))
    import metrics_computing_opi as mco
    captured = {}
    orig_pd = mco.process_data
    orig_meteor, orig_bert = mco.calculate_meteor, mco.calculate_bertscore

    def record(data, fp):
        out = orig_pd(data, fp)
        captured["metrics"] = out
        return out

    args = argparse.Namespace(
        model_base_path=llm_dir, opus_pllm_weights_path=weights_dir,
        is_json=True, input_path=input_path, save_path=save_path,
        temperature=temperature, top_p=top_p, num_beams=num_beams,
        max_new_tokens=32, switch_projector_type="mlp2x_gelu",
        load_4bit=False, load_8bit=False)
    try:
        mco.process_data = record
        mco.calculate_meteor = lambda o, t: None
        mco.calculate_bertscore = lambda o, t: None
        with _chdir(EVAL_DIR):
            mod.eval_model(args)
    finally:
        mco.process_data = orig_pd
        mco.calculate_meteor, mco.calculate_bertscore = orig_meteor, orig_bert
    with open(save_path) as f:
        results = _json.load(f)
    return results, captured.get("metrics", {})


def run_reference_mcq_eval(llm_dir: str, weights_dir: str,
                           esm_model_dir: str, cstp_ckpt: str,
                           input_path: str, save_path: str, *,
                           temperature: float = 0.0, top_p: float = 1.0,
                           num_beams: int = 1, max_new_tokens: int = 50):
    """Drive eval_run_multichoice.eval_model (:52-236) end-to-end; returns
    (results, accuracy, option_counts) with accuracy/histogram parsed from
    the runner's own printed report (it only prints them)."""
    import argparse
    import ast
    import contextlib
    import io
    import json as _json
    import re

    configure_reference_for_fixtures(esm_model_dir, cstp_ckpt)
    mod = _patch_runner(_import_eval_module("eval_run_multichoice"))
    args = argparse.Namespace(
        model_base_path=llm_dir, opus_pllm_weights_path=weights_dir,
        is_json=True, input_path=input_path, save_path=save_path,
        temperature=temperature, top_p=top_p, num_beams=num_beams,
        max_new_tokens=max_new_tokens, switch_projector_type="mlp2x_gelu",
        load_4bit=False, load_8bit=False)
    buf = io.StringIO()
    with _chdir(EVAL_DIR), contextlib.redirect_stdout(buf):
        mod.eval_model(args)
    out = buf.getvalue()
    m_acc = re.search(r"(\d+)/(\d+):Accuracy: ([\d.]+)%", out)
    assert m_acc, f"no accuracy line in reference output:\n{out[-2000:]}"
    accuracy = int(m_acc.group(1)) / int(m_acc.group(2))
    m_hist = re.search(r"\{'A': \d+, 'B': \d+, 'C': \d+, 'D': \d+, "
                       r"'None': \d+\}", out)
    assert m_hist, f"no option histogram in reference output:\n{out[-2000:]}"
    counts = ast.literal_eval(m_hist.group(0))
    with open(save_path) as f:
        results = _json.load(f)
    return results, accuracy, counts

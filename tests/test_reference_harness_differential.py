"""Harness-level differential: the reference's OWN eval loops vs our runners.

Round-2 verdict item 1: everything below drives the *actual* `eval_model`
bodies of run_opus_ddp.py:47-148 (annotation) and
eval_run_multichoice.py:52-236 (MCQ) — prompt assembly, batch-of-8
left-pad, do_sample defaults, '###' post-truncation, gather,
`return_opi_metrics` dispatch — single-process on fabricated checkpoints
and mini benchmark JSONs named to hit every dispatch branch
(localization / go / keywords / ec_number / function / mcq), and asserts
`run_annotation_eval` / `run_mcq_eval` produce the IDENTICAL result JSON
and matching metric dicts at temperature 0.

This converts the round-1/2 "every piece matches" differentials into
"the product matches": the F1-parity criterion minus the real weights.

Environment-blocked legs (zero-egress image), compared as documented:
  * METEOR (reference needs the nltk wordnet corpus) and BERTScore
    (reference needs the `bert_score` package + downloaded BioBERT) are
    disabled on the reference side; the 'function' differential compares
    ROUGE + BLEU.
  * Reference ROUGE reports the BootstrapAggregator `mid` (a bootstrap
    median over 1000 resamples — stochastic); ours reports the exact
    per-sample mean, so ROUGE compares with a small tolerance while BLEU
    (deterministic corpus-level) compares to float precision.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")
peft = pytest.importorskip("peft")

import jax.numpy as jnp  # noqa: E402

import reference_harness as ref  # noqa: E402  (tests/ is on sys.path)

if not ref.reference_available():
    pytest.skip("/root/reference not present", allow_module_level=True)

from reference_fixtures import (  # noqa: E402
    _make_esm_dir, _make_llm_dir, _make_toy_tokenizer, _make_weights_dir)

pytestmark = [pytest.mark.differential, pytest.mark.parity]

SEQ_POOL = [
    "MKTAYIAKQR",
    "ACDEFGHIKLMNPQRSTVWY",
    "MVLSPADKTNVKAAW",
    "MKKLLFAIPLVVPF",
    "GSHMGSAEDNIVQAR",
    "MNPQRSTVWYACDEF",
    "MAHHHHHHVGTK",
    "MSLLTEVETYVLS",
    "MGDVEKGKKIFIMK",
    "MTEYKLVVVGAGGVGK",
]

DEEPLOC_LABELS = [
    "Cell.membrane", "Cytoplasm", "Endoplasmic.reticulum",
    "Golgi.apparatus", "Lysosome/Vacuole", "Mitochondrion", "Nucleus",
    "Peroxisome", "Plastid", "Extracellular",
]


def _write_datasets(root: str) -> dict:
    """Mini benchmark JSONs, one per metric-dispatch branch. Filenames carry
    the keywords both harnesses dispatch on (run_opus_ddp.py:92-101,
    metrics_computing_opi.py:96-122, evals/metrics.task_of)."""
    out = {}

    def w(name, data):
        path = os.path.join(root, name)
        with open(path, "w") as f:
            json.dump(data, f)
        out[name.split("_")[1]] = path
        return path

    # localization: ground truths are exactly the 10 DeepLoc labels, which
    # triggers the deeploc->OPI vocabulary mapping branch on both sides
    w("OPI_localization_mini.json", [
        {"instruction": "What is the subcellular localization of the "
                        "protein?", "input": SEQ_POOL[i],
         "output": DEEPLOC_LABELS[i]}
        for i in range(10)])
    w("OPI_go_mini.json", [
        {"instruction": "What are the GO terms of this protein?",
         "input": SEQ_POOL[i],
         "output": gt} for i, gt in enumerate([
            "GO:0005524; GO:0016887", "GO:0046872",
            "GO:0003677; GO:0006355; GO:0005634", "GO:0016020",
            "GO:0005737; GO:0006412", "GO:0004672; GO:0005524"])])
    w("OPI_keywords_mini.json", [
        {"instruction": "What are the UniProt keywords of this protein?",
         "input": SEQ_POOL[i],
         "output": gt} for i, gt in enumerate([
            "ATP-binding; Hydrolase", "Metal-binding; Zinc",
            "DNA-binding; Nucleus; Transcription",
            "Membrane; Transmembrane", "Cytoplasm; Ribosome",
            "Kinase; Transferase"])])
    w("OPI_ec_number_mini.json", [
        {"instruction": "What is the EC number of this protein?",
         "input": SEQ_POOL[i],
         "output": gt} for i, gt in enumerate([
            "2.7.11.1", "3.6.4.12; 3.6.1.3", "1.1.1.1", "4.2.1.11"])])
    w("uniprot2024_function_mini.json", [
        {"instruction": "Describe the function of this protein.",
         "input": SEQ_POOL[i],
         "output": gt} for i, gt in enumerate([
            "Catalyzes the hydrolysis of ATP to drive protein transport "
            "across membranes.",
            "Binds double-stranded DNA and represses transcription of the "
            "lac operon.",
            "Transfers a phosphate group from ATP to serine residues of "
            "target proteins.",
            "Forms a transmembrane channel that conducts potassium ions "
            "across the plasma membrane.",
            "Acts as a molecular chaperone assisting the folding of newly "
            "synthesized polypeptides."])])
    w("OPI_mcq_mini.json", [
        {"question": q, "options": opts, "input": SEQ_POOL[i],
         "answer": ans} for i, (q, opts, ans) in enumerate([
            ("Where does this protein localize?",
             ["A) Nucleus", "B) Cytoplasm", "C) Membrane", "D) Golgi"],
             "B) Cytoplasm"),
            ("What cofactor does this protein bind?",
             ["A) Zinc", "B) Heme", "C) FAD", "D) NAD+"], "A) Zinc"),
            ("What is the catalytic activity?",
             ["A) Kinase", "B) Phosphatase", "C) Protease", "D) Ligase"],
             "C) Protease"),
            ("Which pathway involves this protein?",
             ["A) Glycolysis", "B) TCA cycle", "C) Urea cycle",
              "D) Beta oxidation"], "D) Beta oxidation"),
            ("What is the oligomeric state?",
             ["A) Monomer", "B) Dimer", "C) Tetramer", "D) Hexamer"],
             "B) Dimer"),
            ("Which residue is phosphorylated?",
             ["A) Ser", "B) Thr", "C) Tyr", "D) His"], "A) Ser"),
            ("What family does it belong to?",
             ["A) Kinase", "B) GPCR", "C) Ion channel", "D) Transporter"],
             "B) GPCR"),
            ("What is the secondary structure content?",
             ["A) All alpha", "B) All beta", "C) Alpha/beta", "D) Coil"],
             "C) Alpha/beta")])])
    return out


class HarnessEnv:
    """Fixture dirs + our loaded params/tokenizer (the reference loads its
    own model inside eval_model, so only our side is materialized here)."""

    def __init__(self, root: str):
        self.root = root
        self.esm_dir = _make_esm_dir(root)
        tok_dir = os.path.join(root, "tok-llama")
        _, self.vocab = _make_toy_tokenizer(tok_dir)
        self.llm_dir = _make_llm_dir(root, "llama", self.vocab)
        for f in os.listdir(tok_dir):
            os.replace(os.path.join(tok_dir, f),
                       os.path.join(self.llm_dir, f))
        self.weights_dir = _make_weights_dir(root, "llama", self.llm_dir)
        self.cstp_ckpt = os.path.join(
            self.weights_dir, "modality_encoder/modality_encoding_adapter.ckpt")
        self.datasets = _write_datasets(root)

        from dataclasses import replace

        from opus_pllm_tpu.core import builder
        from opus_pllm_tpu.core.config import (CSTPConfig, ESM2Config,
                                               OpusConfig,
                                               SwitchProjectorConfig)
        from opus_pllm_tpu.infer.hf_tokenizer import HFTokenizer
        from reference_fixtures import CSTP_OUT, ESM_DIM, HIDDEN, N_TOKENS

        llm_cfg = replace(builder.decoder_config_for(self.llm_dir),
                          dtype="float32")
        self.cfg = OpusConfig(
            esm=ESM2Config.tiny(),
            cstp=CSTPConfig(protein_dim=ESM_DIM, text_dim=32,
                            proj_dim=CSTP_OUT),
            switch=SwitchProjectorConfig(input_dim=CSTP_OUT,
                                         llm_hidden_size=HIDDEN,
                                         n_tokens=N_TOKENS),
            llm=llm_cfg, max_prompt_len=1024)
        self.params, _ = builder.load_pretrained(
            self.llm_dir, self.weights_dir, self.cfg,
            esm_path=self.esm_dir, dtype=jnp.float32)
        self.tok = HFTokenizer(self.llm_dir, family="llama")

    def gen(self, max_new: int):
        from opus_pllm_tpu.core.config import GenerationConfig

        return GenerationConfig(
            max_new_tokens=max_new, temperature=0.0, top_p=1.0,
            eos_token_id=self.tok.eos_token_id,
            pad_token_id=self.tok.pad_token_id)


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    return HarnessEnv(str(tmp_path_factory.mktemp("harness-diff")))


def _run_both_annotation(env, task: str, tmp_path):
    from opus_pllm_tpu.evals import datasets as ds
    from opus_pllm_tpu.evals import runner

    input_path = env.datasets[task]
    ref_save = str(tmp_path / f"ref_{task}.json")
    our_save = str(tmp_path / f"our_{task}.json")
    np.random.seed(0)   # reference ROUGE bootstrap determinism
    ref_results, ref_metrics = ref.run_reference_annotation_eval(
        env.llm_dir, env.weights_dir, env.esm_dir, env.cstp_ckpt,
        input_path, ref_save)
    rep = runner.run_annotation_eval(
        env.params, env.cfg, env.tok, input_path,
        gen=env.gen(ds.max_new_tokens_for(input_path)), batch_size=8,
        save_path=our_save, log_fn=lambda *a: None)
    with open(our_save) as f:
        our_results = json.load(f)
    # the product: identical result files (same outputs, same order)
    assert our_results == ref_results
    return rep.metrics, ref_metrics


def test_localization_harness_matches(env, tmp_path):
    ours, theirs = _run_both_annotation(env, "localization", tmp_path)
    assert theirs.get("Accuracy") is not None
    assert ours["Accuracy"] == pytest.approx(theirs["Accuracy"], abs=1e-9)


@pytest.mark.parametrize("task", ["go", "keywords", "ec"])
def test_label_harness_matches(env, task, tmp_path):
    ours, theirs = _run_both_annotation(env, task, tmp_path)
    for key in ("Precision", "Recall", "F1 Score"):
        assert theirs.get(key) is not None
        assert ours[key] == pytest.approx(theirs[key], abs=1e-9), key


def test_function_harness_matches(env, tmp_path):
    ours, theirs = _run_both_annotation(env, "function", tmp_path)
    assert theirs.get("BLEU") is not None
    assert ours["BLEU"] == pytest.approx(theirs["BLEU"], abs=1e-6)
    for key in ("rouge1", "rouge2", "rougel", "rougeLsum"):
        # reference = bootstrap median (stochastic); ours = exact mean
        assert ours["ROUGEScore"][key] == pytest.approx(
            theirs["ROUGEScore"][key], abs=0.02), key
    # METEOR/BERTScore: environment-blocked on the reference side (module
    # docstring); ours computes METEOR, theirs records None
    assert theirs["METEOR"] is None
    assert "METEOR" in ours


def test_mcq_harness_matches(env, tmp_path):
    from opus_pllm_tpu.evals import runner

    input_path = env.datasets["mcq"]
    ref_save = str(tmp_path / "ref_mcq.json")
    our_save = str(tmp_path / "our_mcq.json")
    ref_results, ref_acc, ref_counts = ref.run_reference_mcq_eval(
        env.llm_dir, env.weights_dir, env.esm_dir, env.cstp_ckpt,
        input_path, ref_save)
    rep = runner.run_mcq_eval(
        env.params, env.cfg, env.tok, input_path, gen=env.gen(50),
        batch_size=8, save_path=our_save, log_fn=lambda *a: None)
    with open(our_save) as f:
        our_results = json.load(f)
    assert our_results == ref_results
    assert rep.metrics["Accuracy"] == pytest.approx(ref_acc, abs=1e-4)
    assert rep.metrics["OptionCounts"] == ref_counts

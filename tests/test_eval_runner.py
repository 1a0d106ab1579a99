"""End-to-end eval runner on a tiny model + byte tokenizer + fake test sets."""

import json

import jax
import numpy as np
import pytest

from opus_pllm_tpu.core.config import GenerationConfig, OpusConfig
from opus_pllm_tpu.evals import datasets as ds
from opus_pllm_tpu.evals import runner
from opus_pllm_tpu.infer.tokenization import ByteTokenizer
from opus_pllm_tpu.models import opus


@pytest.fixture(scope="module", params=["llama", "opt", "qwen2"])
def tiny_model(request):
    cfg = OpusConfig.tiny(request.param)
    params = opus.init(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _fake_annotation_file(tmp_path, name, n=3):
    data = [{"instruction": "What is the subcellular localization?",
             "input": "MKTAYIAKQR" * (i + 1),
             "output": "Nucleus"} for i in range(n)]
    p = tmp_path / name
    p.write_text(json.dumps(data))
    return str(p)


def test_annotation_eval_end_to_end(tiny_model, tmp_path):
    cfg, params = tiny_model
    tok = ByteTokenizer()
    path = _fake_annotation_file(tmp_path, "test_localization.json")
    save = tmp_path / "out.json"
    gen = GenerationConfig(max_new_tokens=8, temperature=0.0,
                           eos_token_id=tok.eos_token_id,
                           pad_token_id=tok.pad_token_id)
    rep = runner.run_annotation_eval(
        params, cfg, tok, path, gen=gen, batch_size=2,
        prompt_bucket=32, esm_bucket=32, save_path=str(save),
        log_fn=lambda *_: None)
    assert len(rep.results) == 3
    assert "Accuracy" in rep.metrics
    assert rep.entries_per_sec > 0
    saved = json.loads(save.read_text())
    assert saved[0]["ground_truth"] == "Nucleus"


def test_mcq_eval_end_to_end(tiny_model, tmp_path):
    cfg, params = tiny_model
    tok = ByteTokenizer()
    data = [{"question": "Which compartment?",
             "options": ["A) Nucleus", "B) Cytoplasm", "C) Membrane", "D) ER"],
             "input": "MKTAYIAKQR", "answer": "A) Nucleus"} for _ in range(2)]
    p = tmp_path / "protein_mcq_choice.json"
    p.write_text(json.dumps(data))
    gen = GenerationConfig(max_new_tokens=6, temperature=0.0,
                           eos_token_id=tok.eos_token_id,
                           pad_token_id=tok.pad_token_id)
    rep = runner.run_mcq_eval(params, cfg, tok, str(p), gen=gen,
                              batch_size=2, prompt_bucket=32, esm_bucket=32,
                              log_fn=lambda *_: None)
    assert len(rep.results) == 2
    assert "Accuracy" in rep.metrics
    assert sum(rep.metrics["OptionCounts"].values()) == 2


def test_max_new_tokens_policy():
    assert ds.max_new_tokens_for("x_localization_test.json") == 32
    assert ds.max_new_tokens_for("uniprot2024_keywords_test.json") == 128
    assert ds.max_new_tokens_for("EC_number_New392.json") == 256


def test_instruction_suffix():
    ex = ds.AnnotationExample("Where is it?", "MKT", "Nucleus")
    s = ds.instruction_for(ex, "test_localization.json")
    assert s.startswith("<seq>\n")
    assert ds.LOCALIZATION_SUFFIX in s
    s2 = ds.instruction_for(ex, "go_test.json")
    assert ds.LOCALIZATION_SUFFIX not in s2


def test_bert_and_bertscore_pipeline():
    from opus_pllm_tpu.core.config import BertConfig
    from opus_pllm_tpu.evals.metrics import compute_metrics
    from opus_pllm_tpu.evals.textproc import WordPieceTokenizer
    from opus_pllm_tpu.models import bert

    cfg = BertConfig.tiny()
    params = bert.init(jax.random.PRNGKey(0), cfg)
    vocab = {"[PAD]": 0, "[UNK]": 1, "[CLS]": 2, "[SEP]": 3}
    for i, w in enumerate("the protein binds dna and atp in cells".split()):
        vocab[w] = 4 + i
    vocab["##s"] = 90
    tok = WordPieceTokenizer(vocab, lowercase=True)
    fn = bert.make_embed_fn(params, cfg, tok, max_tokens=16)
    res = [{"generated": "the protein binds atp",
            "ground_truth": "the protein binds dna"}]
    out = compute_metrics(res, "x_function_test.json", bert_embed_fn=fn)
    bs = out["BERTScore"]
    assert 0 < bs["f1"] <= 1
    # identical texts -> f1 == 1
    res2 = [{"generated": "the protein binds dna",
             "ground_truth": "the protein binds dna"}]
    out2 = compute_metrics(res2, "x_function_test.json", bert_embed_fn=fn)
    np.testing.assert_allclose(out2["BERTScore"]["f1"], 1.0, atol=1e-5)


def test_wordpiece_tokenizer():
    from opus_pllm_tpu.evals.textproc import WordPieceTokenizer

    vocab = {"[PAD]": 0, "[UNK]": 1, "[CLS]": 2, "[SEP]": 3,
             "bind": 4, "##ing": 5, "protein": 6, ",": 7}
    tok = WordPieceTokenizer(vocab, lowercase=True)
    assert tok.tokenize("binding protein,") == ["bind", "##ing", "protein", ","]
    assert tok.tokenize("unknownword") == ["[UNK]"]
    ids = tok.encode("binding", max_tokens=10)
    assert ids[0] == 2 and ids[-1] == 3


class _TemplateTokenizer(ByteTokenizer):
    """Byte tokenizer with a Llama-3-style chat template: records that the
    MCQ runner's default render used the MODEL's template (VERDICT round-1
    item 6; reference: conversation.py:104-111)."""

    def __init__(self):
        super().__init__()
        self.template_calls = []

    def apply_chat_template(self, messages, add_generation_prompt=True):
        self.template_calls.append(messages)
        out = "<|begin_of_text|>"
        for m in messages:
            out += (f"<|start_header_id|>{m['role']}<|end_header_id|>\n\n"
                    f"{m['content']}<|eot_id|>")
        if add_generation_prompt:
            out += "<|start_header_id|>assistant<|end_header_id|>\n\n"
        return out


def test_mcq_default_render_uses_model_chat_template(tiny_model, tmp_path):
    cfg, params = tiny_model
    tok = _TemplateTokenizer()
    data = [{"question": "Which compartment?",
             "options": ["A) Nucleus", "B) Cytoplasm"],
             "input": "MKTAYIAKQR", "answer": "A) Nucleus"}]
    p = tmp_path / "protein_mcq_choice.json"
    p.write_text(json.dumps(data))
    gen = GenerationConfig(max_new_tokens=4, temperature=0.0,
                           eos_token_id=tok.eos_token_id,
                           pad_token_id=tok.pad_token_id)
    runner.run_mcq_eval(params, cfg, tok, str(p), gen=gen, batch_size=1,
                        prompt_bucket=32, esm_bucket=32,
                        log_fn=lambda *_: None)
    assert tok.template_calls, "default render bypassed the chat template"
    msgs = tok.template_calls[0]
    assert msgs[0]["role"] == "system"
    assert msgs[1]["role"] == "user"
    assert msgs[1]["content"].startswith("<seq>\n")


def test_hf_tokenizer_chat_template_matches_hf(tmp_path):
    """HFTokenizer.apply_chat_template == the raw HF tokenizer's rendering
    for a Llama-3-style template (and ChatML fallback when absent)."""
    transformers = pytest.importorskip("transformers")
    import reference_harness  # noqa: F401  (same toy-tokenizer recipe)
    from reference_fixtures import _make_toy_tokenizer

    from opus_pllm_tpu.infer.hf_tokenizer import HFTokenizer

    d = tmp_path / "tiny-llama-tok"
    _make_toy_tokenizer(str(d))
    llama3_template = (
        "{{ '<|begin_of_text|>' }}{% for message in messages %}"
        "{{ '<|start_header_id|>' + message['role'] + '<|end_header_id|>\n\n'"
        " + message['content'] + '<|eot_id|>' }}{% endfor %}"
        "{% if add_generation_prompt %}"
        "{{ '<|start_header_id|>assistant<|end_header_id|>\n\n' }}{% endif %}")
    raw = transformers.AutoTokenizer.from_pretrained(str(d))
    raw.chat_template = llama3_template
    raw.save_pretrained(str(d))

    wrapped = HFTokenizer(str(d), family="llama")
    messages = [{"role": "system", "content": "sys"},
                {"role": "user", "content": "<seq>\nQ?"}]
    ours = wrapped.apply_chat_template(messages, add_generation_prompt=True)
    theirs = raw.apply_chat_template(messages, tokenize=False,
                                     add_generation_prompt=True)
    assert ours == theirs
    assert "<|start_header_id|>assistant<|end_header_id|>" in ours


def test_gather_json_blobs_unequal_shards():
    """The byte-blob allgather path (VERDICT round-1 item 7): a faked
    3-process topology round-trips unequal-size shards, preserving order
    and unicode content."""
    from opus_pllm_tpu.evals.runner import gather_json_blobs

    shards = [
        [{"ground_truth": "Nucleus", "generated": "nucleus membrane"}],
        [{"ground_truth": f"EC {i}.1.1.1", "generated": "答案是 A" * (i + 1)}
         for i in range(5)],
        [],
    ]
    P = len(shards)

    # gather_json_blobs makes exactly two equal-shape allgather calls
    # (sizes, then padded blobs): precompute both rounds' stacks.
    def run_all():
        blobs = [json.dumps(s).encode() for s in shards]
        sizes_round = np.zeros((P, P), np.int32)
        for i, b in enumerate(blobs):
            sizes_round[i, i] = len(b)
        maxlen = max(max(len(b) for b in blobs), 1)
        bufs = np.zeros((P, maxlen), np.uint8)
        for i, b in enumerate(blobs):
            bufs[i, :len(b)] = np.frombuffer(b, np.uint8)
        calls = {"n": 0}

        def allgather(arr):
            calls["n"] += 1
            return sizes_round if arr.dtype == np.int32 else bufs

        out = [gather_json_blobs(shards[pi], P, pi, allgather)
               for pi in range(P)]
        assert calls["n"] == 2 * P
        return out

    expected = [r for s in shards for r in s]
    for merged in run_all():
        assert merged == expected


def test_mcq_scored_eval(tiny_model, tmp_path):
    """Scored MCQ: one prefill forward, answer = argmax over option
    letters of P(first token = letter); deterministic, matches a manual
    logit computation, and the standard scorer/histogram applies."""
    import jax.numpy as jnp

    from opus_pllm_tpu.evals.runner import (_letter_token_candidates,
                                            _logsumexp, _logsumexp_ids,
                                            _mcq_next_logits,
                                            _prepare_inputs)
    cfg, params = tiny_model
    tok = ByteTokenizer()
    data = [{"question": "Which compartment?",
             "options": ["A) Nucleus", "B) Cytoplasm", "C) Membrane",
                         "D) ER"],
             "input": "MKTAYIAKQR" * (1 + i), "answer": "A) Nucleus"}
            for i in range(3)]
    p = tmp_path / "protein_mcq_choice.json"
    p.write_text(json.dumps(data))
    rep = runner.run_mcq_eval_scored(params, cfg, tok, str(p),
                                     batch_size=2, prompt_bucket=32,
                                     esm_bucket=32, log_fn=lambda *_: None)
    assert len(rep.results) == 3
    assert all(r["generated"] in "ABCD" for r in rep.results)
    assert sum(rep.metrics["OptionCounts"].values()) == 3
    # deterministic
    rep2 = runner.run_mcq_eval_scored(params, cfg, tok, str(p),
                                      batch_size=2, prompt_bucket=32,
                                      esm_bucket=32, log_fn=lambda *_: None)
    assert rep2.results == rep.results

    # manual check of example 0: the chosen letter maximizes the
    # logsumexp of its candidate first-token log-probs
    from opus_pllm_tpu.evals import datasets as ds
    from opus_pllm_tpu.infer.conversation import VICUNA_V3
    conv = VICUNA_V3.copy()
    conv.append("user", "<seq>\n" + ds.mcq_prompt(data[0]["question"],
                                                  data[0]["options"]))
    prompt = conv.get_prompt_chatml(add_generation_prompt=True)
    ids, mask, esm = _prepare_inputs(tok, [prompt],
                                     [data[0]["input"]],
                                     prompt_bucket=32, esm_bucket=32)
    lg = np.asarray(_mcq_next_logits(params, cfg, ids, mask, esm))
    logp = (lg - _logsumexp(lg))[0]
    want = max("ABCD", key=lambda c: _logsumexp_ids(
        logp, _letter_token_candidates(tok, c)))
    assert rep.results[0]["generated"] == want

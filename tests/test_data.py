"""Data subsystem: dataset loaders, collation, precompute."""

import json
import pickle

import numpy as np

from opus_pllm_tpu.core.config import ESM2Config, IGNORE_INDEX
from opus_pllm_tpu.data import collate, datasets as D, precompute
from opus_pllm_tpu.infer.tokenization import ByteTokenizer


def test_uniprot_qa_dataset(tmp_path):
    recs = {
        "P1": {"Sequence": "MKTAYIAK", "Name": ["Kinase A."],
               "Accession": ["P1"], "Similarity": "Belongs to kinase family.",
               "Subcellular_Location": "Nucleus."},
        "P2": {"Sequence": "A" * 3000, "Name": ["Too long"], "Accession": ["P2"]},
        "P3": {"Sequence": "ACDEF"},   # missing keys -> 'None'
    }
    p = tmp_path / "uniprot.pkl"
    p.write_bytes(pickle.dumps(recs))
    ds = D.UniProtQADataset(str(p))
    assert len(ds) == 2              # >2500 aa dropped
    t = ds[0]["text"]
    assert "The name of protein is Kinase A" in t   # interior '.' stripped
    assert "Subcellular_Location: Nucleus. " in t
    assert "None" in ds[1]["text"]


def test_vec_dataset_and_iterator(tmp_path):
    items = [{"seq_embedding": np.arange(4, dtype=np.float32) + i,
              "text_embedding": np.ones(6, np.float32) * i} for i in range(10)]
    p = tmp_path / "vec.pkl"
    p.write_bytes(pickle.dumps(items))
    ds = D.UniProtQAVecDataset(str(p))
    se, te = ds.arrays()
    assert se.shape == (10, 4) and te.shape == (10, 6)
    batches = list(D.batch_iterator(10, 4, shuffle=True, seed=1))
    assert len(batches) == 2 and all(len(b) == 4 for b in batches)
    batches = list(D.batch_iterator(10, 4, drop_remainder=False, shuffle=False))
    assert sum(len(b) for b in batches) == 10


def test_fitness_dataset_split_and_normalize(tmp_path):
    rows = ["sequence,set,validation,target,seq_embedding"]
    rows += [f"ACDE,train,False,1.0,\"[0.1, 0.2]\"",
             f"KLMN,train,True,2.0,\"[0.3, 0.4]\"",
             f"PQRS,test,False,3.0,\"[0.5, 0.6]\""]
    p = tmp_path / "fit.csv"
    p.write_text("\n".join(rows))
    tr = D.FitnessDataset(str(p), "train")
    va = D.FitnessDataset(str(p), "validation")
    te = D.FitnessDataset(str(p), "test")
    assert len(tr) == 1 and len(va) == 1 and len(te) == 1
    seq, emb, tgt = tr[0]
    assert seq == "ACDE" and tgt == 1.0
    np.testing.assert_allclose(emb, [0.1, 0.2], rtol=1e-6)
    norm = D.FitnessDataset(str(p), "test", normalize=(1.0, 3.0))
    assert norm[0][2] == 1.0


def test_labeled_embedding_dataset(tmp_path):
    data = {"train": [{"seq": "ACD", "seq_embedding": [1.0, 2.0], "label": 3}]}
    p = tmp_path / "ec.pkl"
    p.write_bytes(pickle.dumps(data))
    ds = D.LabeledEmbeddingDataset(str(p), "train")
    seq, emb, lab = ds[0]
    assert seq == "ACD" and emb.tolist() == [1.0, 2.0] and lab == 3


def test_collate_instruction_batch():
    tok = ByteTokenizer()
    exs = [{"instruction": "What?", "sequence": "MKT", "output": "Nucleus"},
           {"instruction": "Where?", "sequence": "ACDEFG", "output": "ER"}]
    b = collate.collate_instruction_batch(exs, tok, prompt_bucket=16,
                                          esm_bucket=16)
    assert b["input_ids"].shape == b["labels"].shape == b["attn_mask"].shape
    assert b["input_ids"].shape[1] % 16 == 0
    assert b["esm_tokens"].shape[1] == 1
    # prompt region ignored, completion labeled, has EOS
    row = b["labels"][0]
    lab = row[row != IGNORE_INDEX]
    assert lab[-1] == tok.eos_token_id
    assert tok.decode([int(x) for x in lab[:-1]]).strip() == "Nucleus"
    # sentinel survives in input_ids
    assert (b["input_ids"] == -200).sum() == 2


def test_precompute_roundtrip(tmp_path):
    import jax
    from opus_pllm_tpu.models import esm2

    cfg = ESM2Config.tiny()
    params = esm2.init(jax.random.PRNGKey(0), cfg)
    data = [{"instruction": "x", "input": "MKTAYI", "output": "y"},
            {"instruction": "x2", "input": "MKTAYI", "output": "y2"},  # dup seq
            {"instruction": "x3", "input": "ACDEF", "output": "y3"}]
    src = tmp_path / "in.json"
    src.write_text(json.dumps(data))
    out = tmp_path / "out.jsonl"
    n = precompute.precompute_instruction_embeddings(
        params, cfg, str(src), str(out), batch_size=2, len_bucket=8)
    assert n == 3
    lines = [json.loads(l) for l in out.read_text().splitlines()]
    assert len(lines[0]["input_embed"]) == cfg.embed_dim
    # dedup: same sequence -> identical embedding
    assert lines[0]["input_embed"] == lines[1]["input_embed"]
    mp = tmp_path / "map.json"
    k = precompute.precompute_sequence_map(params, cfg, str(src), str(mp),
                                           batch_size=2, len_bucket=8)
    assert k == 2

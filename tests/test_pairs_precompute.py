"""Stage-(a) pair precompute + ablation-loop CLI parsing."""

import pickle

import numpy as np
import pytest

from opus_pllm_tpu.cli.main import build_parser


def test_annotate_all_and_pairs_parse():
    p = build_parser()
    a = p.parse_args(["annotate-all", "--test-jsons", "a.json", "b.json",
                      "--repeats", "3"])
    assert a.test_jsons == ["a.json", "b.json"] and a.repeats == 3
    b = p.parse_args(["precompute-pairs", "--uniprot-pickle", "u.pkl",
                      "--out", "o.pkl"])
    assert callable(b.fn)


def test_precompute_cstp_pairs_end_to_end(tmp_path):
    import jax

    from opus_pllm_tpu.core.config import DecoderConfig, ESM2Config
    from opus_pllm_tpu.data import precompute
    from opus_pllm_tpu.infer.tokenization import ByteTokenizer
    from opus_pllm_tpu.models import decoder, esm2

    recs = {"P1": {"Sequence": "MKTAYIAK", "Name": ["A"], "Accession": ["P1"],
                   "Similarity": "kinase", "Subcellular_Location": "Nucleus"},
            "P2": {"Sequence": "ACDEFGHIKL", "Name": ["B"], "Accession": ["P2"],
                   "Similarity": "none", "Subcellular_Location": "ER"}}
    up = tmp_path / "uniprot.pkl"
    up.write_bytes(pickle.dumps(recs))

    esm_cfg = ESM2Config.tiny()
    esm_params = esm2.init(jax.random.PRNGKey(0), esm_cfg)
    llm_cfg = DecoderConfig.tiny()
    llm_params = decoder.init(jax.random.PRNGKey(1), llm_cfg)
    tok = ByteTokenizer()
    out = tmp_path / "pairs.pkl"
    n = precompute.precompute_cstp_pairs(
        esm_params, esm_cfg, llm_params, llm_cfg, tok, str(up), str(out),
        batch_size=2, len_bucket=16)
    assert n == 2
    pairs = pickle.loads(out.read_bytes())
    assert pairs[0]["seq_embedding"].shape == (esm_cfg.embed_dim,)
    assert pairs[0]["text_embedding"].shape == (llm_cfg.hidden_size,)
    # feeds straight into the stage-(a) trainer dataset
    from opus_pllm_tpu.data.datasets import UniProtQAVecDataset
    ds = UniProtQAVecDataset(str(out))
    se, te = ds.arrays()
    assert se.shape == (2, esm_cfg.embed_dim)
    assert np.isfinite(se).all() and np.isfinite(te).all()

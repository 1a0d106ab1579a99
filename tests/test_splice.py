"""Static splicer vs a direct Python transcription of the reference's dynamic
splice loop (opus_arch.py:192-269)."""

import numpy as np
import jax.numpy as jnp

from opus_pllm_tpu.bridge import splice
from opus_pllm_tpu.core.config import IGNORE_INDEX, SEQ_TOKEN_INDEX


def _reference_splice(input_ids, attn_mask, text_embeds, protein_tokens,
                      labels, left_pad, l_out):
    """Python mirror of prepare_inputs_labels_for_multimodal semantics."""
    B, L, H = text_embeds.shape
    T = protein_tokens.shape[2]
    out_emb = np.zeros((B, l_out, H), dtype=text_embeds.dtype)
    out_lab = np.full((B, l_out), IGNORE_INDEX, dtype=np.int64)
    out_mask = np.zeros((B, l_out), dtype=bool)
    out_pos = np.zeros((B, l_out), dtype=np.int64)
    for i in range(B):
        embeds, labs = [], []
        p = 0
        for j in range(L):
            if not attn_mask[i, j]:
                continue
            if input_ids[i, j] == SEQ_TOKEN_INDEX:
                for tt in range(T):
                    embeds.append(protein_tokens[i, p, tt])
                    labs.append(IGNORE_INDEX)
                p += 1
            else:
                embeds.append(text_embeds[i, j])
                labs.append(labels[i, j])
        n = len(embeds)
        s = l_out - n if left_pad else 0
        for kk in range(n):
            out_emb[i, s + kk] = embeds[kk]
            out_lab[i, s + kk] = labs[kk]
            out_mask[i, s + kk] = True
            out_pos[i, s + kk] = kk
    return out_emb, out_lab, out_mask, out_pos


def _setup(seed=0):
    rng = np.random.default_rng(seed)
    B, L, H, P, T = 3, 10, 8, 2, 4
    ids = rng.integers(5, 90, size=(B, L)).astype(np.int32)
    mask = np.ones((B, L), dtype=bool)
    # sample 0: one protein at pos 1; sample 1: two proteins; sample 2: none
    ids[0, 1] = SEQ_TOKEN_INDEX
    ids[1, 0] = SEQ_TOKEN_INDEX
    ids[1, 5] = SEQ_TOKEN_INDEX
    mask[0, 7:] = False          # right-padded
    mask[2, 4:] = False
    labels = rng.integers(0, 90, size=(B, L)).astype(np.int32)
    text_embeds = rng.normal(size=(B, L, H)).astype(np.float32)
    prot = rng.normal(size=(B, P, T, H)).astype(np.float32)
    return ids, mask, text_embeds, prot, labels, T


def test_splice_matches_reference_rightpad():
    ids, mask, emb, prot, labels, T = _setup()
    l_out = splice.output_len(ids.shape[1], prot.shape[1], T)
    ours = splice.splice(jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(emb),
                         jnp.asarray(prot), jnp.asarray(labels),
                         n_tokens=T, left_pad=False)
    ref = _reference_splice(ids, mask, emb, prot, labels, False, l_out)
    np.testing.assert_allclose(np.asarray(ours.embeds), ref[0], atol=1e-6)
    np.testing.assert_array_equal(np.asarray(ours.labels), ref[1])
    np.testing.assert_array_equal(np.asarray(ours.mask), ref[2])
    np.testing.assert_array_equal(np.asarray(ours.positions) * ref[2],
                                  ref[3] * ref[2])


def test_splice_matches_reference_leftpad():
    ids, mask, emb, prot, labels, T = _setup(1)
    l_out = splice.output_len(ids.shape[1], prot.shape[1], T)
    ours = splice.splice(jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(emb),
                         jnp.asarray(prot), jnp.asarray(labels),
                         n_tokens=T, left_pad=True)
    ref = _reference_splice(ids, mask, emb, prot, labels, True, l_out)
    np.testing.assert_allclose(np.asarray(ours.embeds), ref[0], atol=1e-6)
    np.testing.assert_array_equal(np.asarray(ours.labels), ref[1])
    np.testing.assert_array_equal(np.asarray(ours.mask), ref[2])
    np.testing.assert_array_equal(np.asarray(ours.positions) * ref[2],
                                  ref[3] * ref[2])


def test_splice_no_proteins_is_passthrough():
    rng = np.random.default_rng(2)
    B, L, H = 2, 6, 4
    ids = rng.integers(5, 90, size=(B, L)).astype(np.int32)
    mask = np.ones((B, L), dtype=bool)
    emb = rng.normal(size=(B, L, H)).astype(np.float32)
    prot = np.zeros((B, 1, 3, H), dtype=np.float32)
    labels = rng.integers(0, 90, size=(B, L)).astype(np.int32)
    out = splice.splice(jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(emb),
                        jnp.asarray(prot), jnp.asarray(labels),
                        n_tokens=3, left_pad=False)
    np.testing.assert_allclose(np.asarray(out.embeds)[:, :L], emb, atol=1e-6)
    assert np.asarray(out.mask)[:, L:].sum() == 0

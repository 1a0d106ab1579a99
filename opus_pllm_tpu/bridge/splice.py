"""Static-shape multimodal splicer.

Jit-safe re-design of `prepare_inputs_labels_for_multimodal`
(opus_arch.py:133-294): the reference splits each sample's token list at
`<seq>` sentinels with Python loops and re-pads dynamically; here the splice
is a fixed-capacity gather, so the whole thing compiles once:

  * every input position j has expansion size e_j (= n_tokens for a `<seq>`
    sentinel, 1 for a text token, 0 for padding)
  * exclusive-cumsum(e_j) gives each token's start offset in the output
  * each output slot k finds its source token via searchsorted(starts, k)
    and picks either the text embedding or soft-token `within = k - start`

Semantics preserved from the reference:
  - each `<seq>` expands to the protein's soft tokens in order (seq_idx walks
    the batch's proteins, opus_arch.py:218-227)
  - labels at protein slots = IGNORE_INDEX (opus_arch.py:225-227)
  - RIGHT-pad for training, LEFT-pad for inference (opus_arch.py:245-269)
  - position_ids restart at 0 at the first valid token (opus_arch.py:257)
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..core.config import IGNORE_INDEX, SEQ_TOKEN_INDEX


class Spliced(NamedTuple):
    embeds: jnp.ndarray       # (B, L_out, H)
    labels: jnp.ndarray       # (B, L_out) int32, IGNORE_INDEX at protein/pad
    mask: jnp.ndarray         # (B, L_out) bool
    positions: jnp.ndarray    # (B, L_out) int32


def output_len(input_len: int, max_proteins: int, n_tokens: int) -> int:
    return input_len + max_proteins * (n_tokens - 1)


@functools.partial(jax.jit, static_argnames=("n_tokens", "left_pad", "l_out"))
def splice(input_ids, attn_mask, text_embeds, protein_tokens, labels=None, *,
           n_tokens: int, left_pad: bool, l_out: Optional[int] = None) -> Spliced:
    """Interleave protein soft tokens into the text embedding stream.

    input_ids      : (B, L) int32, RIGHT-padded, SEQ_TOKEN_INDEX sentinels
    attn_mask      : (B, L) bool
    text_embeds    : (B, L, H) — embed_tokens(clamp(input_ids, 0)); sentinel
                     rows are ignored
    protein_tokens : (B, P, T, H) soft tokens; protein p replaces the p-th
                     sentinel of its sample
    labels         : (B, L) optional int32 targets aligned with input_ids

    Returns Spliced with L_out = L + P*(T-1) (or the given l_out).
    """
    b, l = input_ids.shape
    p_max, t = protein_tokens.shape[1], protein_tokens.shape[2]
    assert t == n_tokens
    lo = l_out if l_out is not None else output_len(l, p_max, n_tokens)
    if labels is None:
        labels = jnp.full_like(input_ids, IGNORE_INDEX)

    def one(ids, m, emb, prot, lab):
        is_seq = (ids == SEQ_TOKEN_INDEX) & m
        e = jnp.where(is_seq, n_tokens, jnp.where(m, 1, 0))          # (L,)
        starts = jnp.cumsum(e) - e                                    # excl cumsum
        total = jnp.sum(e)
        rank = jnp.cumsum(is_seq.astype(jnp.int32)) - 1               # protein #

        k = jnp.arange(lo)
        if left_pad:
            k = k - (lo - total)                                       # shift right
        valid = (k >= 0) & (k < total)
        kq = jnp.clip(k, 0, None)
        j = jnp.searchsorted(starts, kq, side="right") - 1
        # guard: searchsorted can land on trailing zero-expansion (pad) slots
        j = jnp.clip(j, 0, l - 1)
        within = kq - starts[j]
        from_protein = is_seq[j]
        text_part = emb[j]
        prot_part = prot[jnp.clip(rank[j], 0, p_max - 1),
                         jnp.clip(within, 0, n_tokens - 1)]
        out_emb = jnp.where(valid[:, None],
                            jnp.where(from_protein[:, None], prot_part, text_part),
                            0.0).astype(emb.dtype)
        out_lab = jnp.where(valid & ~from_protein, lab[j], IGNORE_INDEX)
        out_pos = jnp.where(valid, jnp.clip(k, 0, None), 0)
        return out_emb, out_lab, valid, out_pos

    emb, lab, mask, pos = jax.vmap(one)(input_ids, attn_mask, text_embeds,
                                        protein_tokens, labels)
    return Spliced(emb, lab.astype(jnp.int32), mask, pos.astype(jnp.int32))

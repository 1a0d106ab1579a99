"""CSTP: Contrastive protein-Sequence <-> Text Pretraining adapter (stage a).

Re-implements the reference's active CSTP path (cstp_v3/modelling.py:335-469):
L2-normalize both inputs, project protein 1280->5120 and text 5120->5120 with
single linears, and score with *unnormalized* similarity matrices
`p @ t.T` / `t @ p.T` against diagonal targets (alignment_seq_and_text_h,
modelling.py:432-469).

All projections and similarity logits run in fp32: the evidential loss divides
logits by T=0.0007, so bf16 would overflow (SURVEY.md §7 hard part 5).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..core.config import CSTPConfig
from ..models.layers import dense, dense_init


def init(key, cfg: CSTPConfig):
    kp, kt = jax.random.split(key)
    return {
        "protein_projection": dense_init(kp, cfg.protein_dim, cfg.proj_dim,
                                         jnp.float32, bias=True),
        "text_projection": dense_init(kt, cfg.text_dim, cfg.proj_dim,
                                      jnp.float32, bias=True),
    }


def _l2_normalize(x, eps: float = 1e-12):
    # torch F.normalize semantics: x / max(||x||, eps)
    n = jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True))
    return x / jnp.maximum(n, eps)


def forward(params, protein_emb, text_emb) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(B, Dp), (B, Dt) -> projected (B, P), (B, P). fp32."""
    p = dense(params["protein_projection"], _l2_normalize(protein_emb.astype(jnp.float32)))
    t = dense(params["text_projection"], _l2_normalize(text_emb.astype(jnp.float32)))
    return p, t


def protein_forward(params, protein_emb) -> jnp.ndarray:
    """Inference path: project protein embeddings only (modelling.py:396-400)."""
    x = _l2_normalize(protein_emb.astype(jnp.float32))
    return dense(params["protein_projection"], x)


def text_forward(params, text_emb) -> jnp.ndarray:
    """Project text embeddings into the shared space — the text half of
    CSTPBase.forward (modelling.py:378-394) standalone, for retrieval /
    embedding serving."""
    x = _l2_normalize(text_emb.astype(jnp.float32))
    return dense(params["text_projection"], x)


def alignment(projected_protein, projected_text) -> Dict[str, jnp.ndarray]:
    """Bidirectional unnormalized similarity logits with diagonal targets."""
    p2t = projected_protein @ projected_text.T
    t2p = projected_text @ projected_protein.T
    targets = jnp.arange(projected_protein.shape[0])
    return {"protein2text": p2t, "text2protein": t2p,
            "targets": targets}


def retrieval_accuracy(logits, targets) -> jnp.ndarray:
    """Top-1 retrieval accuracy (validation metric, modelling.py:523-530)."""
    return jnp.mean((jnp.argmax(logits, axis=1) == targets).astype(jnp.float32))

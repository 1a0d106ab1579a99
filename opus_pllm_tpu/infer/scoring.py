"""Causal-LM text scoring over our own decoder families.

Builds the `logprob_fn` the perplexity metric consumes
(evals/metric_tail.perplexity) — the role the vendored HF module fills
by downloading a model_id (metrics/perplexity/perplexity.py), done here
with a locally-loaded decoder instead: texts -> per-token logprobs under
teacher forcing.
"""

from __future__ import annotations

from typing import Callable, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import DecoderConfig
from ..core.util import round_up
from ..models import decoder
from ..models.layers import causal_mask


def make_logprob_fn(params, cfg: DecoderConfig, encode_fn: Callable,
                    *, bos_token_id: int | None = None, max_len: int = 512,
                    batch_size: int = 8,
                    len_bucket: int = 64) -> Callable[[Sequence[str]],
                                                      List[List[float]]]:
    """texts -> list of per-token logprob lists (teacher-forced).

    encode_fn: text -> token ids (e.g. HFTokenizer.encode). A BOS id is
    prepended when given so the first real token is scored too — matching
    the vendored metric's add_start_token=True default. Lengths round up
    to `len_bucket` so the jitted forward compiles a bounded number of
    shapes per corpus.
    """

    @jax.jit
    def scores(p, ids, mask):
        emb = decoder.embed_tokens(p, ids).astype(cfg.jnp_dtype)
        b, s = ids.shape
        pos = jnp.broadcast_to(jnp.arange(s), (b, s))
        hid, _ = decoder.forward(p, cfg, emb, pos, causal_mask(mask),
                                 return_hidden=True)
        logits = decoder.head_logits(p, cfg, hid).astype(jnp.float32)
        lp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
        tgt = ids[:, 1:]
        return jnp.take_along_axis(lp, tgt[:, :, None], axis=-1)[..., 0]

    def logprob_fn(texts: Sequence[str]) -> List[List[float]]:
        encs = []
        for t in texts:
            ids = list(encode_fn(t))[:max_len - 1]
            if bos_token_id is not None and (not ids
                                             or ids[0] != bos_token_id):
                ids = [bos_token_id] + ids
            encs.append(ids)
        out: List[List[float]] = []
        for s in range(0, len(encs), batch_size):
            chunk = encs[s:s + batch_size]
            ln = max(round_up(max(len(e) for e in chunk), len_bucket), 2)
            ids = np.zeros((len(chunk), ln), np.int32)
            mask = np.zeros((len(chunk), ln), bool)
            for i, e in enumerate(chunk):
                ids[i, :len(e)] = e
                mask[i, :len(e)] = True
            lp = np.asarray(scores(params, jnp.asarray(ids),
                                   jnp.asarray(mask)))
            for i, e in enumerate(chunk):
                out.append(lp[i, :max(len(e) - 1, 0)].tolist())
        return out

    return logprob_fn

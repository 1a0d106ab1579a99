"""Prompt tokenization with `<seq>` sentinels + batch padding.

Counterpart of multi_modality_v1/mm_utils.py: `tokenizer_seq_token`
(mm_utils.py:12-32) splits the prompt at `<seq>`, tokenizes each text chunk,
and rejoins with the SEQ_TOKEN_INDEX (-200) sentinel; the DDP runner then
LEFT-pads the batch for generation (run_opus_ddp.py:30-44) while training
RIGHT-pads (opus_arch.py:245-269).

Works with any tokenizer exposing `encode(text) -> List[int]` (HF fast
tokenizers, sentencepiece wrappers, or the test-only toy tokenizer), so the
framework carries no hard transformers dependency at inference time.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

from ..core.config import IGNORE_INDEX, SEQ_TOKEN, SEQ_TOKEN_INDEX


def tokenize_with_seq(prompt: str, encode: Callable[[str], List[int]],
                      bos_token_id: Optional[int] = None) -> List[int]:
    """Tokenize `prompt`, replacing each `<seq>` with one -200 sentinel.

    BOS handling mirrors mm_utils.py:20-27: the reference tokenizes each
    chunk WITH special tokens and keeps a single leading BOS. Here chunks
    are encoded without specials, so when `bos_token_id` is given one BOS is
    always prepended (and any BOS the encoder did emit is deduplicated).
    """
    chunks = [encode(c) for c in prompt.split(SEQ_TOKEN)]
    ids: List[int] = []
    if bos_token_id is not None:
        ids.append(bos_token_id)
        chunks = [c[1:] if c and c[0] == bos_token_id else c for c in chunks]
    for i, c in enumerate(chunks):
        if i > 0:
            ids.append(SEQ_TOKEN_INDEX)
        ids.extend(c)
    return ids


def pad_batch(seqs: Sequence[Sequence[int]], pad_id: int, *, left: bool,
              max_len: Optional[int] = None) -> Tuple[np.ndarray, np.ndarray]:
    """Pad a ragged int batch -> (ids (B, L), mask (B, L)).

    left=True reproduces left_pad_sequence (run_opus_ddp.py:30-44); when
    `max_len` is given the batch pads (or truncates) to exactly that length
    — callers use it for static-shape bucketing. Truncation keeps the TAIL
    for left-pad (prompt end matters for generation) and the HEAD for
    right-pad (training truncates at model_max_length, opus_arch.py:234-237).
    """
    longest = max((len(s) for s in seqs), default=0)
    pad_to = max_len if max_len else longest
    pad_to = max(pad_to, 1)
    ids = np.full((len(seqs), pad_to), pad_id, dtype=np.int32)
    mask = np.zeros((len(seqs), pad_to), dtype=bool)
    for i, s in enumerate(seqs):
        s = list(s)
        if len(s) > pad_to:
            s = s[-pad_to:] if left else s[:pad_to]
        if left:
            ids[i, pad_to - len(s):] = s
            mask[i, pad_to - len(s):] = True
        else:
            ids[i, :len(s)] = s
            mask[i, :len(s)] = True
    return ids, mask


def labels_for_completion(ids: Sequence[int], prompt_len: int) -> List[int]:
    """Training labels: IGNORE_INDEX over the prompt, token ids over the
    completion (instruction-tuning convention for stages c/d)."""
    return [IGNORE_INDEX] * min(prompt_len, len(ids)) + list(ids[prompt_len:])


class ByteTokenizer:
    """Self-contained fallback tokenizer (tests/offline smoke): UTF-8 bytes
    offset by `offset`, ids < offset reserved for specials."""

    def __init__(self, offset: int = 4, bos_token_id: int = 1,
                 eos_token_id: int = 2, pad_token_id: int = 0):
        self.offset = offset
        self.bos_token_id = bos_token_id
        self.eos_token_id = eos_token_id
        self.pad_token_id = pad_token_id
        self.vocab_size = 256 + offset

    def encode(self, text: str) -> List[int]:
        return [b + self.offset for b in text.encode("utf-8")]

    def decode(self, ids: Sequence[int]) -> str:
        bs = bytes(i - self.offset for i in ids
                   if i >= self.offset and i - self.offset < 256)
        return bs.decode("utf-8", errors="ignore")

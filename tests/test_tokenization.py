"""Prompt tokenization with <seq> sentinels and batch padding."""

import numpy as np

from opus_pllm_tpu.core.config import IGNORE_INDEX, SEQ_TOKEN_INDEX
from opus_pllm_tpu.infer.tokenization import (ByteTokenizer, labels_for_completion,
                                              pad_batch, tokenize_with_seq)


def test_sentinel_replacement():
    tok = ByteTokenizer()
    ids = tokenize_with_seq("ab<seq>cd", tok.encode)
    assert ids.count(SEQ_TOKEN_INDEX) == 1
    i = ids.index(SEQ_TOKEN_INDEX)
    assert tok.decode(ids[:i]) == "ab"
    assert tok.decode(ids[i + 1:]) == "cd"


def test_bos_handling():
    tok = ByteTokenizer()
    enc = lambda s: [tok.bos_token_id] + tok.encode(s)
    ids = tokenize_with_seq("x<seq>y", enc, bos_token_id=tok.bos_token_id)
    # single leading BOS, none after the sentinel
    assert ids[0] == tok.bos_token_id
    assert ids.count(tok.bos_token_id) == 1


def test_no_sentinel_passthrough():
    tok = ByteTokenizer()
    assert tokenize_with_seq("plain", tok.encode) == tok.encode("plain")


def test_pad_batch_left_right():
    seqs = [[1, 2, 3], [4]]
    ids, mask = pad_batch(seqs, pad_id=0, left=True)
    assert ids.tolist() == [[1, 2, 3], [0, 0, 4]]
    assert mask.tolist() == [[True, True, True], [False, False, True]]
    ids, mask = pad_batch(seqs, pad_id=0, left=False)
    assert ids.tolist() == [[1, 2, 3], [4, 0, 0]]


def test_pad_batch_truncation_sides():
    seqs = [[1, 2, 3, 4, 5]]
    ids, _ = pad_batch(seqs, 0, left=True, max_len=3)
    assert ids.tolist() == [[3, 4, 5]]        # keep tail for generation
    ids, _ = pad_batch(seqs, 0, left=False, max_len=3)
    assert ids.tolist() == [[1, 2, 3]]        # keep head for training


def test_labels_for_completion():
    ids = [5, 6, 7, 8]
    lab = labels_for_completion(ids, prompt_len=2)
    assert lab == [IGNORE_INDEX, IGNORE_INDEX, 7, 8]

"""HF tokenizer adapter with the reference's per-family fixups.

Wraps a local transformers tokenizer behind the minimal encode/decode
surface the framework uses (infer/tokenization.py), applying the pad/unk/eos
adjustments of load_pretrained_model (model/builder.py:69-94):
  llama : pad = unk = eos
  opt   : pad '<pad>', unk '<unk>', eos '</s>'
  qwen2 : tokenizer as-is
"""

from __future__ import annotations

from typing import List, Optional, Sequence


class HFTokenizer:
    def __init__(self, path: str, family: Optional[str] = None):
        from transformers import AutoTokenizer

        self.tk = AutoTokenizer.from_pretrained(path, use_fast=True,
                                                local_files_only=True)
        if family is None:
            from ..core.builder import family_from_path
            try:
                family = family_from_path(path)
            except NotImplementedError:
                family = "llama"
        self.family = family
        if family == "llama":
            self.tk.pad_token = self.tk.eos_token
            self.pad_token_id = self.eos_token_id = self.tk.eos_token_id
        elif family == "opt":
            self.pad_token_id = self.tk.convert_tokens_to_ids("<pad>")
            self.eos_token_id = self.tk.convert_tokens_to_ids("</s>")
        else:
            self.pad_token_id = (self.tk.pad_token_id
                                 if self.tk.pad_token_id is not None
                                 else self.tk.eos_token_id)
            self.eos_token_id = self.tk.eos_token_id
        self.bos_token_id = self.tk.bos_token_id
        self.vocab_size = len(self.tk)

    def encode(self, text: str) -> List[int]:
        return self.tk.encode(text, add_special_tokens=False)

    def decode(self, ids: Sequence[int]) -> str:
        return self.tk.decode(list(ids), skip_special_tokens=True)

    def apply_chat_template(self, messages, add_generation_prompt=True) -> str:
        if getattr(self.tk, "chat_template", None):
            return self.tk.apply_chat_template(
                messages, tokenize=False,
                add_generation_prompt=add_generation_prompt)
        from .conversation import Conversation
        conv = Conversation(system="", roles=["user", "assistant"])
        for m in messages:
            if m["role"] == "system":
                conv.system = m["content"]
            else:
                conv.append(m["role"], m["content"])
        return conv.get_prompt_chatml(add_generation_prompt)

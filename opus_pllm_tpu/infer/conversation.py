"""Conversation templates (multi_modality_v1/conversation.py re-design).

Keeps the presets and prompt-assembly semantics the eval runners rely on:
- `VICUNA_V0` "curious student & biological professor", roles
  Student/Professor, sep "###" (conversation.py:159-167) — used by the
  annotation runners with the manual "### Student: ... ###Professor:" format
  (run_opus_ddp.py:102-107)
- `VICUNA_V3` user/assistant variant (conversation.py:178-186) — used by the
  MCQ runner
- ChatML rendering for chat-template models (Llama-3-Instruct / Qwen),
  mirroring the default template at conversation.py:146-157.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Dict, List


@dataclass
class Conversation:
    system: str
    roles: List[str]
    messages: List[Dict[str, str]] = field(default_factory=list)
    sep: str = "###"

    def copy(self) -> "Conversation":
        return dataclasses.replace(self, messages=[dict(m) for m in self.messages])

    def append(self, role: str, content: str) -> None:
        self.messages.append({"role": role, "content": content})

    def get_prompt(self) -> str:
        """SINGLE-separator assembly (conversation.py:37-44)."""
        ret = self.system + self.sep
        for m in self.messages:
            if m["content"]:
                ret += m["role"] + ": " + m["content"] + self.sep
            else:
                ret += m["role"] + ":"
        return ret

    def get_prompt_chatml(self, add_generation_prompt: bool = True) -> str:
        parts = [f"<|im_start|>system\n{self.system}<|im_end|>\n"] if self.system else []
        for m in self.messages:
            parts.append(f"<|im_start|>{m['role']}\n{m['content']}<|im_end|>\n")
        if add_generation_prompt:
            parts.append("<|im_start|>assistant\n")
        return "".join(parts)


VICUNA_V0 = Conversation(
    system="A chat between a curious student and a biological professor who "
           "is familiar with protein properties. The biological professor "
           "gives helpful, detailed, and professional answers to student's "
           "questions.",
    roles=["Student", "Professor"],
)

VICUNA_V1 = Conversation(
    system="You are an automated protein annotation system that provides "
           "precise, database-validated identifiers in required formats. "
           "Responses are strictly concise and correct.",
    roles=["Student", "Professor"],
)

VICUNA_V3 = Conversation(
    system="A chat between a curious user and a biological assistant who is "
           "familiar with protein properties. The biological assistant gives "
           "helpful, detailed, and professional answers to user's questions.",
    roles=["user", "assistant"],
)


def annotation_prompt(instruction: str, conv: Conversation = VICUNA_V0) -> str:
    """The exact manual prompt layout of run_opus_ddp.py:102-107."""
    header = f"{conv.system}\n\n"
    return (header + "### " + conv.roles[0] + ": " + instruction + "\n"
            + "### " + "Professor:")


def truncate_at_sep(text: str, sep: str = "###") -> str:
    """Post-process generated text at the first separator
    (after_process_output, run_opus_ddp.py:19-27)."""
    text = text.strip()
    idx = text.find(sep)
    if idx == -1:
        return text
    return text[:idx].strip()

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
import enum
from dataclasses import dataclass, field
from typing import Dict, List, Optional


class SeparatorStyle(enum.Enum):
    """Prompt-assembly styles (conversation.py:7-15). LLAMA_3 / Qwen_2 use
    the chat-template path instead (NotImplemented in the reference too)."""

    SINGLE = enum.auto()
    TWO = enum.auto()
    MPT = enum.auto()
    PLAIN = enum.auto()
    LLAMA_2 = enum.auto()
    CHATML = enum.auto()


@dataclass
class Conversation:
    system: str
    roles: List[str]
    messages: List[Dict[str, str]] = field(default_factory=list)
    sep: str = "###"
    sep2: Optional[str] = None
    sep_style: SeparatorStyle = SeparatorStyle.SINGLE

    def copy(self) -> "Conversation":
        return dataclasses.replace(self, messages=[dict(m) for m in self.messages])

    def append(self, role: str, content: str) -> None:
        self.messages.append({"role": role, "content": content})

    def get_prompt(self) -> str:
        """Manual prompt assembly per sep_style (conversation.py:32-103)."""
        style = self.sep_style
        if style == SeparatorStyle.SINGLE:
            ret = self.system + self.sep
            for m in self.messages:
                if m["content"]:
                    ret += m["role"] + ": " + m["content"] + self.sep
                else:
                    ret += m["role"] + ":"
            return ret
        if style == SeparatorStyle.TWO:
            seps = [self.sep, self.sep2 or self.sep]
            ret = self.system + seps[0]
            for i, m in enumerate(self.messages):
                if m["content"]:
                    ret += m["role"] + ": " + m["content"] + seps[i % 2]
                else:
                    ret += m["role"] + ":"
            return ret
        if style == SeparatorStyle.MPT:
            ret = self.system + self.sep
            for m in self.messages:
                ret += m["role"] + (m["content"] + self.sep
                                    if m["content"] else "")
            return ret
        if style == SeparatorStyle.PLAIN:
            seps = [self.sep, self.sep2 or self.sep]
            ret = self.system
            for i, m in enumerate(self.messages):
                if m["content"]:
                    ret += m["content"] + seps[i % 2]
            return ret
        if style == SeparatorStyle.LLAMA_2:
            wrap_sys = (lambda s: f"<<SYS>>\n{s}\n<</SYS>>\n\n" if s else s)
            ret = ""
            for i, m in enumerate(self.messages):
                content = m["content"]
                if not content:
                    continue
                if i == 0:
                    content = wrap_sys(self.system) + content
                if i % 2 == 0:
                    ret += self.sep + f"[INST] {content} [/INST]"
                else:
                    ret += " " + content + " " + (self.sep2 or "</s>")
            return ret.lstrip(self.sep)
        if style == SeparatorStyle.CHATML:
            return self.get_prompt_chatml(add_generation_prompt=False)
        raise ValueError(f"invalid style: {style}")

    def get_prompt_chatml(self, add_generation_prompt: bool = True) -> str:
        parts = [f"<|im_start|>system\n{self.system}<|im_end|>\n"] if self.system else []
        for m in self.messages:
            parts.append(f"<|im_start|>{m['role']}\n{m['content']}<|im_end|>\n")
        if add_generation_prompt:
            parts.append("<|im_start|>assistant\n")
        return "".join(parts)


# The exact fallback chat template the reference MCQ runner assigns to
# template-less tokenizers (eval_run_multichoice.py:62-74 — an indented
# triple-quoted string, so the rendered prompt carries the literal
# indentation/newline quirks; HF renders jinja with trim_blocks +
# lstrip_blocks, which strips the whitespace around {% %} tags but keeps
# the 12-space indent before each <|im_start|> and the double newline
# after each <|im_end|>). Byte parity matters: the prompt is the model
# interface.
REFERENCE_CHATML_TEMPLATE = (
    "\n"
    "    {% for message in messages %}\n"
    "        {% if message['role'] == 'system' %}\n"
    "            <|im_start|>system\n{{ message['content'] }}<|im_end|>\n\n"
    "        {% elif message['role'] == 'user' %}\n"
    "            <|im_start|>user\n{{ message['content'] }}<|im_end|>\n\n"
    "        {% elif message['role'] == 'assistant' %}\n"
    "            <|im_start|>assistant\n{{ message['content'] }}<|im_end|>\n\n"
    "        {% endif %}\n"
    "    {% endfor %}\n"
    "    {% if add_generation_prompt %}<|im_start|>assistant\n{% endif %}\n"
    "    "
)


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

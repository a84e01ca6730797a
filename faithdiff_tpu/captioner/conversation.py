"""Conversation templates for the captioner.

Capability-equivalent to `/root/reference/llava/conversation.py:9-396`
(Conversation dataclass + template registry; separator styles SINGLE / TWO /
LLAMA_2 / PLAIN). The FaithDiff path uses `vicuna_v1` (TWO); the others are
provided for checkpoint compatibility with differently-finetuned captioners.
"""
from __future__ import annotations

import dataclasses
import enum
from typing import List, Optional, Tuple


class SeparatorStyle(enum.Enum):
    SINGLE = enum.auto()
    TWO = enum.auto()
    LLAMA_2 = enum.auto()
    PLAIN = enum.auto()


@dataclasses.dataclass
class Conversation:
    system: str
    roles: Tuple[str, str]
    messages: List[Tuple[str, Optional[str]]]
    sep_style: SeparatorStyle
    sep: str = "###"
    sep2: Optional[str] = None

    def append_message(self, role: str, message: Optional[str]):
        self.messages.append((role, message))

    def get_prompt(self) -> str:
        msgs = self.messages
        if self.sep_style == SeparatorStyle.SINGLE:
            ret = self.system + self.sep
            for role, message in msgs:
                if message:
                    ret += role + ": " + message + self.sep
                else:
                    ret += role + ":"
            return ret
        if self.sep_style == SeparatorStyle.TWO:
            seps = [self.sep, self.sep2]
            ret = self.system + seps[0]
            for i, (role, message) in enumerate(msgs):
                if message:
                    ret += role + ": " + message + seps[i % 2]
                else:
                    ret += role + ":"
            return ret
        if self.sep_style == SeparatorStyle.LLAMA_2:
            def wrap_sys(msg):
                return f"<<SYS>>\n{msg}\n<</SYS>>\n\n" if msg else msg

            ret = ""
            for i, (role, message) in enumerate(msgs):
                if i == 0 and message:
                    message = wrap_sys(self.system) + message
                if message:
                    if role == self.roles[0]:
                        ret += f"[INST] {message} [/INST]"
                    else:
                        ret += f" {message} {self.sep2}"
            return ret
        if self.sep_style == SeparatorStyle.PLAIN:
            ret = self.system
            for i, (_, message) in enumerate(msgs):
                if message:
                    ret += message + (self.sep if i % 2 == 0 else self.sep2)
            return ret
        raise ValueError(self.sep_style)

    def copy(self) -> "Conversation":
        return Conversation(self.system, self.roles, list(self.messages),
                            self.sep_style, self.sep, self.sep2)


TEMPLATES = {
    "vicuna_v1": Conversation(
        system=("A chat between a curious human and an artificial "
                "intelligence assistant. The assistant gives helpful, "
                "detailed, and polite answers to the human's questions."),
        roles=("USER", "ASSISTANT"),
        messages=[],
        sep_style=SeparatorStyle.TWO,
        sep=" ",
        sep2="</s>",
    ),
    "llava_v1": Conversation(
        system=("A chat between a curious human and an artificial "
                "intelligence assistant. The assistant gives helpful, "
                "detailed, and polite answers to the human's questions."),
        roles=("USER", "ASSISTANT"),
        messages=[],
        sep_style=SeparatorStyle.TWO,
        sep=" ",
        sep2="</s>",
    ),
    "llava_llama_2": Conversation(
        system=("You are a helpful language and vision assistant. You are "
                "able to understand the visual content that the user "
                "provides, and assist the user with a variety of tasks "
                "using natural language."),
        roles=("USER", "ASSISTANT"),
        messages=[],
        sep_style=SeparatorStyle.LLAMA_2,
        sep="<s>",
        sep2="</s>",
    ),
    "plain": Conversation(
        system="",
        roles=("", ""),
        messages=[],
        sep_style=SeparatorStyle.PLAIN,
        sep="\n",
        sep2="\n",
    ),
}


def build_prompt(template: str, question: str,
                 image_token: str = "<image>") -> str:
    """One-turn prompt with the image placeholder, ready to split on
    `image_token` for embedding splice."""
    conv = TEMPLATES[template].copy()
    conv.append_message(conv.roles[0], f"{image_token}\n{question}")
    conv.append_message(conv.roles[1], None)
    return conv.get_prompt()

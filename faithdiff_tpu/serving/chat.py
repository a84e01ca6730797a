"""Interactive captioner chat CLI.

Equivalent of the reference's `llava/serve/cli.py:27-128`: load the
captioner, attach one image, then multi-turn chat in the terminal with the
vicuna template.

Usage: python -m faithdiff_tpu.serving.chat --captioner_dir CKPT --image IMG
"""
from __future__ import annotations

import argparse
import sys

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser("chat")
    p.add_argument("--captioner_dir", required=True)
    p.add_argument("--image", required=True)
    p.add_argument("--temperature", type=float, default=0.2)
    p.add_argument("--max_new_tokens", type=int, default=512)
    p.add_argument("--template", default="vicuna_v1")
    args = p.parse_args(argv)

    from PIL import Image

    from ..captioner.agent import CaptionAgent
    from ..captioner.conversation import TEMPLATES

    agent = CaptionAgent.from_checkpoint(args.captioner_dir)
    agent.temperature = args.temperature
    agent.max_new_tokens = args.max_new_tokens
    image = np.asarray(Image.open(args.image).convert("RGB"))

    conv = TEMPLATES[args.template].copy()
    print(f"loaded {args.captioner_dir}; image {args.image}. "
          "Type a question (ctrl-d to exit).")
    first = True
    while True:
        try:
            question = input(f"{conv.roles[0]}: ").strip()
        except EOFError:
            print()
            return
        if not question:
            continue
        # single-image chat: the image rides along with the running
        # conversation text as the question context
        history = "".join(
            f"{r}: {m} " for r, m in conv.messages if m)
        full_question = (history + question) if not first else question
        answer = agent.caption(image, question=full_question)
        conv.append_message(conv.roles[0], question)
        conv.append_message(conv.roles[1], answer)
        first = False
        print(f"{conv.roles[1]}: {answer}")


if __name__ == "__main__":
    sys.exit(main() or 0)

#!/usr/bin/env python3
# SPDX-License-Identifier: Apache-2.0
"""Simple text generation (parity with the reference's
examples/simple_generate.py, using the TPU LanguageModel API)."""

import sys

from vllm_mlx_tpu.models.llm import LanguageModel


def main():
    if len(sys.argv) < 2:
        print("usage: simple_generate.py /path/to/local/checkpoint")
        return
    model_path = sys.argv[1]

    print(f"Loading model: {model_path}")
    model = LanguageModel(model_path)
    model.load()

    print("\n" + "=" * 50)
    print("Model loaded! Starting generation...")
    print("=" * 50 + "\n")

    prompt = "What is the meaning of life?"
    print(f"Prompt: {prompt}\n")
    output = model.generate(prompt, max_tokens=200, temperature=0.7)
    print(f"Response:\n{output.text}")
    print(f"\nFinish reason: {output.finish_reason}")
    print(f"Speed: {output.tokens_per_second:.1f} tok/s")

    print("\n" + "=" * 50)
    print("Streaming generation:")
    print("=" * 50 + "\n")
    prompt = "Write a haiku about coding:"
    print(f"Prompt: {prompt}\n")
    print("Response: ", end="", flush=True)
    for chunk in model.stream_generate(prompt, max_tokens=100, temperature=0.8):
        print(chunk.text, end="", flush=True)
    print("\n")

    print("=" * 50)
    print("Chat interface:")
    print("=" * 50 + "\n")
    messages = [{"role": "user", "content": "Hello! Can you introduce yourself?"}]
    response = model.chat(messages, max_tokens=150)
    print(f"User: {messages[0]['content']}")
    print(f"Assistant: {response.text}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
# SPDX-License-Identifier: Apache-2.0
"""Use the server with the official OpenAI python client
(parity with the reference's examples/demo_openai_text.py)."""

from openai import OpenAI

client = OpenAI(base_url="http://localhost:8000/v1", api_key="not-needed")

model = client.models.list().data[0].id
print(f"Serving model: {model}\n")

# Non-streaming chat
resp = client.chat.completions.create(
    model=model,
    messages=[{"role": "user", "content": "Explain paged KV caches in one paragraph."}],
    max_tokens=200,
)
print(resp.choices[0].message.content)

# Streaming chat
print("\n--- streaming ---")
stream = client.chat.completions.create(
    model=model,
    messages=[{"role": "user", "content": "Count from 1 to 10."}],
    max_tokens=64,
    stream=True,
)
for chunk in stream:
    delta = chunk.choices[0].delta.content if chunk.choices else None
    if delta:
        print(delta, end="", flush=True)
print()

# Tool calling
resp = client.chat.completions.create(
    model=model,
    messages=[{"role": "user", "content": "What's the weather in Paris?"}],
    tools=[
        {
            "type": "function",
            "function": {
                "name": "get_weather",
                "description": "Get the weather for a city",
                "parameters": {
                    "type": "object",
                    "properties": {"city": {"type": "string"}},
                    "required": ["city"],
                },
            },
        }
    ],
    max_tokens=128,
)
print("\ntool calls:", resp.choices[0].message.tool_calls)

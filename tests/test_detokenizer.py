# SPDX-License-Identifier: Apache-2.0
"""Streaming detokenizer: UTF-8-safe incremental decode (reference
streaming-detok behaviors, scheduler.py:2173-2210)."""

import pytest

from vllm_mlx_tpu.core.detokenizer import StreamingDetokenizer

from test_server import tiny_model_dir  # noqa: F401


@pytest.fixture(scope="module")
def tokenizer(tiny_model_dir):  # noqa: F811
    from transformers import AutoTokenizer

    return AutoTokenizer.from_pretrained(tiny_model_dir)


def test_incremental_equals_full_decode(tokenizer, rng):
    text = "the quick brown fox jumps over the lazy dog again and again"
    ids = tokenizer.encode(text)
    detok = StreamingDetokenizer(tokenizer)
    state = detok.new_state()
    streamed = ""
    for t in ids:
        streamed += detok.step(state, t)
    streamed += detok.flush(state)
    assert streamed == tokenizer.decode(ids, skip_special_tokens=True)


def test_multibyte_held_back_until_complete(tokenizer):
    """Multi-byte characters split across byte-level BPE tokens must not
    leak replacement chars mid-stream."""
    text = "héllo wörld — 你好 🎉"
    ids = tokenizer.encode(text)
    detok = StreamingDetokenizer(tokenizer)
    state = detok.new_state()
    streamed = ""
    for t in ids:
        piece = detok.step(state, t)
        assert "�" not in piece  # never emit partial UTF-8
        streamed += piece
    streamed += detok.flush(state)
    assert streamed == tokenizer.decode(ids, skip_special_tokens=True)
    assert "你好" in streamed and "🎉" in streamed


def test_prompt_tail_context(tokenizer):
    """A prompt tail gives byte-level BPE its leading-space context."""
    prompt_ids = tokenizer.encode("the quick")
    cont_ids = tokenizer.encode(" brown fox")
    detok = StreamingDetokenizer(tokenizer)
    state = detok.new_state(prompt_tail=prompt_ids[-4:])
    out = ""
    for t in cont_ids:
        out += detok.step(state, t)
    out += detok.flush(state)
    assert out == " brown fox"


def test_independent_states(tokenizer):
    a = tokenizer.encode("hello world")
    b = tokenizer.encode("testing one two")
    detok = StreamingDetokenizer(tokenizer)
    sa, sb = detok.new_state(), detok.new_state()
    out_a = out_b = ""
    for ta, tb in zip(a, b):
        out_a += detok.step(sa, ta)
        out_b += detok.step(sb, tb)
    for t in b[len(a):]:
        out_b += detok.step(sb, t)
    out_a += detok.flush(sa)
    out_b += detok.flush(sb)
    assert out_a == tokenizer.decode(a, skip_special_tokens=True)
    assert out_b == tokenizer.decode(b, skip_special_tokens=True)

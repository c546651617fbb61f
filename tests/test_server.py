# SPDX-License-Identifier: Apache-2.0
"""API server end-to-end tests: a real tiny checkpoint + tokenizer served
through BatchedEngine over the aiohttp app (in-process test client).

Mirrors the reference's server handler suites (tests/test_batched_engine.py,
tests/test_openai_compatibility.py style) but against the live engine."""

import asyncio
import json

import numpy as np
import pytest

from vllm_mlx_tpu.config import CacheConfig, SchedulerConfig

CHAT_TEMPLATE = (
    "{% for message in messages %}"
    "<|{{ message.role }}|>{{ message.content }}</s>"
    "{% endfor %}"
    "{% if add_generation_prompt %}<|assistant|>{% endif %}"
)


@pytest.fixture(scope="module")
def tiny_model_dir(tmp_path_factory):
    """Tiny random Llama checkpoint + byte-level BPE tokenizer on disk."""
    import torch
    from tokenizers import Tokenizer, models, pre_tokenizers, decoders, trainers
    from transformers import LlamaConfig, LlamaForCausalLM, PreTrainedTokenizerFast

    d = tmp_path_factory.mktemp("tiny_model")
    tok = Tokenizer(models.BPE(unk_token=None))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=384,
        special_tokens=["</s>", "<|user|>", "<|assistant|>", "<|system|>"],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
    )
    corpus = [
        "the quick brown fox jumps over the lazy dog",
        "hello world how are you today",
        "what is the meaning of life and everything",
        "testing one two three four five six seven",
    ] * 8
    tok.train_from_iterator(corpus, trainer)
    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok,
        eos_token="</s>",
        pad_token="</s>",
    )
    fast.chat_template = CHAT_TEMPLATE
    fast.save_pretrained(d)

    vocab = tok.get_vocab_size()
    torch.manual_seed(0)
    cfg = LlamaConfig(
        vocab_size=vocab,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=1024,
        eos_token_id=fast.eos_token_id,
    )
    LlamaForCausalLM(cfg).eval().save_pretrained(d, safe_serialization=True)
    return str(d)


@pytest.fixture(scope="module")
def server_client(tiny_model_dir):
    """(loop, client) for a running in-process server."""
    from aiohttp.test_utils import TestClient, TestServer

    from vllm_mlx_tpu.api.server import build_app
    from vllm_mlx_tpu.engine.batched import BatchedEngine

    loop = asyncio.new_event_loop()

    engine = BatchedEngine(
        tiny_model_dir,
        cache_config=CacheConfig(
            block_size=8, num_blocks=128, kv_dtype="float32"
        ),
        scheduler_config=SchedulerConfig(
            max_num_seqs=4,
            max_prefill_tokens=64,
            prefill_chunk_sizes=[32, 64],
            max_model_len=512,
        ),
    )
    # force fp32 compute for the tiny CPU model
    from vllm_mlx_tpu.config import ModelConfig

    mc = ModelConfig.from_pretrained(tiny_model_dir)
    mc.dtype = "float32"
    engine._model_config = mc

    async def _start():
        await engine.start()
        app = build_app(
            engine,
            served_models=["tiny-llama"],
            default_max_tokens=16,
        )
        client = TestClient(TestServer(app))
        await client.start_server()
        return client

    client = loop.run_until_complete(_start())
    yield loop, client
    loop.run_until_complete(client.close())
    loop.run_until_complete(engine.stop())
    loop.close()


def _post(server_client, path, body):
    loop, client = server_client

    async def go():
        resp = await client.post(path, json=body)
        data = await resp.json()
        return resp.status, data

    return loop.run_until_complete(go())


def _get(server_client, path):
    loop, client = server_client

    async def go():
        resp = await client.get(path)
        return resp.status, await resp.json()

    return loop.run_until_complete(go())


class TestServerEndpoints:
    def test_health(self, server_client):
        status, data = _get(server_client, "/health")
        assert status == 200
        assert data["status"] == "ok"

    def test_builtin_ui(self, server_client):
        """GET /ui serves the zero-dependency chat page (reference
        gradio_app.py equivalent)."""
        loop, client = server_client

        async def go():
            resp = await client.get("/ui")
            return resp.status, resp.content_type, await resp.text()

        status, ctype, text = loop.run_until_complete(go())
        assert status == 200
        assert ctype == "text/html"
        assert "/v1/chat/completions" in text

    def test_models(self, server_client):
        status, data = _get(server_client, "/v1/models")
        assert status == 200
        assert data["data"][0]["id"] == "tiny-llama"

    def test_chat_completion(self, server_client):
        status, data = _post(
            server_client,
            "/v1/chat/completions",
            {
                "model": "tiny-llama",
                "messages": [{"role": "user", "content": "hello world"}],
                "max_tokens": 8,
                "temperature": 0,
            },
        )
        assert status == 200
        assert data["object"] == "chat.completion"
        choice = data["choices"][0]
        assert choice["message"]["role"] == "assistant"
        assert choice["finish_reason"] in ("stop", "length")
        assert data["usage"]["prompt_tokens"] > 0
        assert data["usage"]["completion_tokens"] > 0

    def test_chat_completion_deterministic(self, server_client):
        body = {
            "model": "tiny-llama",
            "messages": [{"role": "user", "content": "the quick brown"}],
            "max_tokens": 8,
            "temperature": 0,
        }
        _, d1 = _post(server_client, "/v1/chat/completions", body)
        _, d2 = _post(server_client, "/v1/chat/completions", body)
        assert (
            d1["choices"][0]["message"]["content"]
            == d2["choices"][0]["message"]["content"]
        )

    def test_unknown_model_404(self, server_client):
        status, data = _post(
            server_client,
            "/v1/chat/completions",
            {
                "model": "nope",
                "messages": [{"role": "user", "content": "hi"}],
            },
        )
        assert status == 404

    def test_completions(self, server_client):
        status, data = _post(
            server_client,
            "/v1/completions",
            {
                "model": "tiny-llama",
                "prompt": "the quick brown",
                "max_tokens": 6,
                "temperature": 0,
            },
        )
        assert status == 200
        assert data["object"] == "text_completion"
        assert isinstance(data["choices"][0]["text"], str)

    def test_chat_streaming(self, server_client):
        loop, client = server_client

        async def go():
            resp = await client.post(
                "/v1/chat/completions",
                json={
                    "model": "tiny-llama",
                    "messages": [{"role": "user", "content": "hello"}],
                    "max_tokens": 6,
                    "temperature": 0,
                    "stream": True,
                    "stream_options": {"include_usage": True},
                },
            )
            assert resp.status == 200
            assert resp.headers["Content-Type"].startswith("text/event-stream")
            raw = await resp.text()
            return raw

        raw = loop.run_until_complete(go())
        lines = [
            ln[6:] for ln in raw.splitlines() if ln.startswith("data: ")
        ]
        assert lines[-1] == "[DONE]"
        chunks = [json.loads(ln) for ln in lines[:-1]]
        assert chunks[0]["choices"][0]["delta"].get("role") == "assistant"
        text = "".join(
            c["choices"][0]["delta"].get("content") or "" for c in chunks
        )
        finals = [
            c for c in chunks if c["choices"][0]["finish_reason"] is not None
        ]
        assert finals and finals[-1]["usage"]["completion_tokens"] > 0
        # streamed text equals the non-streamed result
        _, full = _post(
            server_client,
            "/v1/chat/completions",
            {
                "model": "tiny-llama",
                "messages": [{"role": "user", "content": "hello"}],
                "max_tokens": 6,
                "temperature": 0,
            },
        )
        assert text == (full["choices"][0]["message"]["content"] or "")

    def test_anthropic_messages(self, server_client):
        status, data = _post(
            server_client,
            "/v1/messages",
            {
                "model": "tiny-llama",
                "max_tokens": 6,
                "messages": [{"role": "user", "content": "hello"}],
            },
        )
        assert status == 200
        assert data["type"] == "message"
        assert data["role"] == "assistant"
        assert data["content"][0]["type"] == "text"
        assert data["usage"]["input_tokens"] > 0

    def test_anthropic_streaming(self, server_client):
        loop, client = server_client

        async def go():
            resp = await client.post(
                "/v1/messages",
                json={
                    "model": "tiny-llama",
                    "max_tokens": 5,
                    "stream": True,
                    "messages": [{"role": "user", "content": "hi there"}],
                },
            )
            return await resp.text()

        raw = loop.run_until_complete(go())
        events = [
            ln[7:] for ln in raw.splitlines() if ln.startswith("event: ")
        ]
        assert events[0] == "message_start"
        assert "content_block_delta" in events
        assert events[-1] == "message_stop"

    def test_anthropic_count_tokens(self, server_client):
        status, data = _post(
            server_client,
            "/v1/messages/count_tokens",
            {
                "model": "tiny-llama",
                "messages": [{"role": "user", "content": "hello world"}],
            },
        )
        assert status == 200
        assert data["input_tokens"] > 0

    def test_status_and_cache_endpoints(self, server_client):
        status, data = _get(server_client, "/v1/status")
        assert status == 200
        assert "engine" in data
        status, data = _get(server_client, "/v1/cache/stats")
        assert status == 200
        loop, client = server_client

        async def clear():
            resp = await client.delete("/v1/cache")
            return resp.status, await resp.json()

        status, data = loop.run_until_complete(clear())
        assert status == 200

    def test_chat_n_choices(self, server_client):
        status, data = _post(
            server_client,
            "/v1/chat/completions",
            {
                "model": "tiny-llama",
                "messages": [{"role": "user", "content": "hello"}],
                "max_tokens": 5,
                "temperature": 0.9,
                "n": 3,
            },
        )
        assert status == 200
        assert len(data["choices"]) == 3
        assert [c["index"] for c in data["choices"]] == [0, 1, 2]
        assert data["usage"]["completion_tokens"] >= 3

    def test_chat_logprobs(self, server_client):
        status, data = _post(
            server_client,
            "/v1/chat/completions",
            {
                "model": "tiny-llama",
                "messages": [{"role": "user", "content": "hi"}],
                "max_tokens": 5,
                "temperature": 0,
                "logprobs": True,
            },
        )
        assert status == 200
        lp = data["choices"][0]["logprobs"]
        assert lp is not None
        assert len(lp["content"]) == data["usage"]["completion_tokens"]
        assert all(c["logprob"] <= 0.0 for c in lp["content"])

    def test_cache_prefix_delete(self, server_client):
        loop, client = server_client

        async def go():
            resp = await client.delete(
                "/v1/cache/prefix", json={"prefix": "hello world"}
            )
            return resp.status, await resp.json()

        status, data = loop.run_until_complete(go())
        assert status == 200
        assert "cleared_blocks" in data

    def test_responses_api(self, server_client):
        status, data = _post(
            server_client,
            "/v1/responses",
            {
                "model": "tiny-llama",
                "input": "hello there",
                "max_output_tokens": 6,
                "temperature": 0,
            },
        )
        assert status == 200
        assert data["object"] == "response"
        assert data["status"] == "completed"
        msg = [o for o in data["output"] if o["type"] == "message"][0]
        assert msg["content"][0]["type"] == "output_text"
        assert data["usage"]["input_tokens"] > 0

    def test_responses_streaming(self, server_client):
        loop, client = server_client

        async def go():
            resp = await client.post(
                "/v1/responses",
                json={
                    "model": "tiny-llama",
                    "input": [
                        {
                            "type": "message",
                            "role": "user",
                            "content": [
                                {"type": "input_text", "text": "hi"}
                            ],
                        }
                    ],
                    "max_output_tokens": 5,
                    "stream": True,
                },
            )
            return await resp.text()

        raw = loop.run_until_complete(go())
        events = [
            ln[7:] for ln in raw.splitlines() if ln.startswith("event: ")
        ]
        assert events[0] == "response.created"
        assert events[-1] == "response.completed"

    def test_stop_string_streaming_no_leak(self, server_client):
        """Streamed deltas must never contain any part of a stop string."""
        loop, client = server_client

        _, free = _post(
            server_client,
            "/v1/chat/completions",
            {
                "model": "tiny-llama",
                "messages": [{"role": "user", "content": "go"}],
                "max_tokens": 12,
                "temperature": 0,
            },
        )
        full_text = free["choices"][0]["message"]["content"] or ""
        if len(full_text) < 5:
            pytest.skip("model output too short for this probe")
        stop_str = full_text[3:6]

        async def go():
            resp = await client.post(
                "/v1/chat/completions",
                json={
                    "model": "tiny-llama",
                    "messages": [{"role": "user", "content": "go"}],
                    "max_tokens": 12,
                    "temperature": 0,
                    "stream": True,
                    "stop": [stop_str],
                },
            )
            return await resp.text()

        raw = loop.run_until_complete(go())
        chunks = [
            json.loads(ln[6:])
            for ln in raw.splitlines()
            if ln.startswith("data: ") and ln[6:] != "[DONE]"
        ]
        streamed = "".join(
            c["choices"][0]["delta"].get("content") or "" for c in chunks
        )
        assert stop_str not in streamed
        assert streamed == full_text[:3]

    def test_stop_string(self, server_client):
        _, free = _post(
            server_client,
            "/v1/chat/completions",
            {
                "model": "tiny-llama",
                "messages": [{"role": "user", "content": "count up"}],
                "max_tokens": 12,
                "temperature": 0,
            },
        )
        full_text = free["choices"][0]["message"]["content"] or ""
        if len(full_text) > 3:
            stop_str = full_text[2:4]
            _, stopped = _post(
                server_client,
                "/v1/chat/completions",
                {
                    "model": "tiny-llama",
                    "messages": [{"role": "user", "content": "count up"}],
                    "max_tokens": 12,
                    "temperature": 0,
                    "stop": [stop_str],
                },
            )
            text = stopped["choices"][0]["message"]["content"] or ""
            assert stop_str not in text


class TestAdviceR1Fixes:
    def test_seed_over_http_reproducible(self, server_client):
        """API `seed` must reach the engine (ADVICE r1: it was dropped in
        _sampling_kwargs, making seeded sampling a silent no-op)."""
        body = {
            "model": "tiny-llama",
            "messages": [{"role": "user", "content": "tell me a story"}],
            "max_tokens": 10,
            "temperature": 0.9,
            "top_p": 0.95,
            "seed": 4242,
        }
        _, a = _post(server_client, "/v1/chat/completions", body)
        _, b = _post(server_client, "/v1/chat/completions", body)
        assert (
            a["choices"][0]["message"]["content"]
            == b["choices"][0]["message"]["content"]
        )

    def test_presence_penalty_over_http(self, server_client):
        status, data = _post(
            server_client,
            "/v1/chat/completions",
            {
                "model": "tiny-llama",
                "messages": [{"role": "user", "content": "hello"}],
                "max_tokens": 8,
                "temperature": 0,
                "presence_penalty": 1.5,
            },
        )
        assert status == 200
        assert data["choices"][0]["message"]["content"] is not None

    def test_multi_prompt_streaming(self, server_client):
        """stream=true with a list of prompts must stream ALL prompts with
        per-choice indices (ADVICE r1: extras were silently dropped)."""
        loop, client = server_client

        async def go():
            resp = await client.post(
                "/v1/completions",
                json={
                    "model": "tiny-llama",
                    "prompt": ["the quick brown", "hello world how"],
                    "max_tokens": 5,
                    "temperature": 0,
                    "stream": True,
                },
            )
            assert resp.status == 200
            return await resp.text()

        raw = loop.run_until_complete(go())
        lines = [ln[6:] for ln in raw.splitlines() if ln.startswith("data: ")]
        assert lines[-1] == "[DONE]"
        chunks = [json.loads(ln) for ln in lines[:-1]]
        by_idx = {}
        for c in chunks:
            for ch in c["choices"]:
                by_idx.setdefault(ch["index"], []).append(ch)
        assert set(by_idx) == {0, 1}
        for idx, chs in by_idx.items():
            assert any(ch["finish_reason"] for ch in chs)
            # each prompt's streamed text matches its non-streamed result
        _, full = _post(
            server_client,
            "/v1/completions",
            {
                "model": "tiny-llama",
                "prompt": ["the quick brown", "hello world how"],
                "max_tokens": 5,
                "temperature": 0,
            },
        )
        for idx in (0, 1):
            streamed = "".join(ch["text"] or "" for ch in by_idx[idx])
            assert streamed == full["choices"][idx]["text"]


class TestFsmConstrainedDecoding:
    def test_json_schema_enforced_over_http(self, server_client):
        """response_format=json_schema on a RANDOM-weight model: only the
        FSM allow-mask can make the output schema-valid (reference
        guarantees this via lm-format-enforcer)."""
        schema = {
            "type": "object",
            "properties": {
                "name": {"type": "string", "maxLength": 12},
                "count": {"type": "integer"},
            },
            "required": ["name", "count"],
            "additionalProperties": False,
        }
        for temp in (0.0, 0.9):
            status, data = _post(
                server_client,
                "/v1/chat/completions",
                {
                    "model": "tiny-llama",
                    "messages": [{"role": "user", "content": "go"}],
                    "max_tokens": 200,
                    "temperature": temp,
                    "seed": 7,
                    "response_format": {
                        "type": "json_schema",
                        "json_schema": {"name": "t", "schema": schema},
                    },
                },
            )
            assert status == 200
            text = data["choices"][0]["message"]["content"]
            obj = json.loads(text)
            assert set(obj) == {"name", "count"}
            assert isinstance(obj["name"], str)
            assert isinstance(obj["count"], int)

    def test_json_object_enforced(self, server_client):
        status, data = _post(
            server_client,
            "/v1/chat/completions",
            {
                "model": "tiny-llama",
                "messages": [{"role": "user", "content": "go"}],
                "max_tokens": 200,
                "temperature": 0.8,
                "seed": 3,
                "response_format": {"type": "json_object"},
            },
        )
        assert status == 200
        # free-form strings can hit the token cap mid-string on a random
        # model; the server repairs truncated JSON (reference behavior),
        # so the payload must still parse
        json.loads(data["choices"][0]["message"]["content"])


class TestServerHardening:
    def test_rate_limiter_429(self, tiny_model_dir, server_client):
        """Token-bucket rate limiting (reference server.py:1607)."""
        loop, _ = server_client
        from aiohttp.test_utils import TestClient, TestServer

        from vllm_mlx_tpu.api.server import build_app

        engine = loop.run_until_complete(_noop_engine())

        async def go():
            app = build_app(
                engine,
                served_models=["tiny-llama"],
                rate_limit_rps=1.0,
                rate_limit_burst=2,
            )
            client = TestClient(TestServer(app))
            await client.start_server()
            statuses = []
            for _ in range(5):
                resp = await client.post(
                    "/v1/messages/count_tokens",
                    json={
                        "model": "tiny-llama",
                        "messages": [{"role": "user", "content": "x"}],
                    },
                )
                statuses.append(resp.status)
            await client.close()
            return statuses

        statuses = loop.run_until_complete(go())
        assert statuses[:2] == [200, 200]
        assert 429 in statuses[2:]

    def test_request_timeout_408(self, server_client):
        loop, client = server_client
        from aiohttp.test_utils import TestClient, TestServer

        from vllm_mlx_tpu.api.server import build_app

        engine = client.app[_engine_key()]

        async def go():
            app = build_app(
                engine,
                served_models=["tiny-llama"],
                request_timeout=0.05,
            )
            c2 = TestClient(TestServer(app))
            await c2.start_server()
            resp = await c2.post(
                "/v1/chat/completions",
                json={
                    "model": "tiny-llama",
                    "messages": [{"role": "user", "content": "x"}],
                    "max_tokens": 200,
                    "temperature": 0,
                },
            )
            status = resp.status
            data = await resp.json()
            await c2.close()
            return status, data

        status, data = loop.run_until_complete(go())
        assert status == 408
        assert data["error"]["type"] == "timeout_error"

    def test_status_per_request_fields(self, server_client):
        # generate something, then check the status shape (no active
        # requests after completion, but the key must exist)
        _post(
            server_client,
            "/v1/chat/completions",
            {
                "model": "tiny-llama",
                "messages": [{"role": "user", "content": "x"}],
                "max_tokens": 4,
                "temperature": 0,
            },
        )
        status, data = _get(server_client, "/v1/status")
        assert status == 200
        assert "requests" in data["engine"]
        assert isinstance(data["engine"]["requests"], list)


def _engine_key():
    from vllm_mlx_tpu.api.server import ENGINE_KEY

    return ENGINE_KEY


async def _noop_engine():
    """Engine stub good enough for count_tokens routing."""
    from unittest.mock import MagicMock

    eng = MagicMock()
    eng.is_running = True
    tok = MagicMock()
    tok.encode = lambda s: [0] * max(1, len(s) // 4)
    eng.tokenizer = tok
    eng.apply_chat_template = lambda messages, **kw: "x" * 16
    return eng

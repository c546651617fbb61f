# SPDX-License-Identifier: Apache-2.0
"""Responses API: function_call streaming items + background mode
(VERDICT r2 missing #11; reference api/responses_models.py + server.py
/v1/responses). Scripted engines stand in for the model."""

import asyncio
import json

import pytest


def _scripted_engine(chunks, delay=0.0):
    from vllm_mlx_tpu.engine.base import BaseEngine, GenerationOutput

    class Scripted(BaseEngine):
        model_path = "scripted"
        is_running = True
        tokenizer = None
        model_config = None
        aborted = []

        async def start(self):
            pass

        async def stop(self):
            pass

        async def generate(self, *a, **k):
            raise NotImplementedError

        async def stream_generate(self, *a, **k):
            raise NotImplementedError

        async def chat(self, messages, **kw):
            if delay:
                await asyncio.sleep(delay)
            return GenerationOutput(
                text="".join(chunks),
                token_ids=list(range(len(chunks))),
                finished=True,
                finish_reason="stop",
                prompt_tokens=3,
                completion_tokens=len(chunks),
            )

        def abort_request(self, rid):
            self.aborted.append(rid)

        def get_stats(self):
            return {}

        async def stream_chat(self, messages, **kw):
            for i, c in enumerate(chunks):
                yield GenerationOutput(
                    text=c,
                    token_ids=[i],
                    finished=(i == len(chunks) - 1),
                    finish_reason="stop" if i == len(chunks) - 1 else None,
                    prompt_tokens=3,
                    completion_tokens=i + 1,
                )

    return Scripted()


async def _client(eng, **kw):
    from aiohttp.test_utils import TestClient, TestServer

    from vllm_mlx_tpu.api.server import build_app

    app = build_app(
        eng, served_models=["scripted"], default_max_tokens=64, **kw
    )
    client = TestClient(TestServer(app))
    await client.start_server()
    return client


TOOL_BODY = {
    "type": "function",
    "name": "get_weather",
    "parameters": {"type": "object"},
}


def test_background_mode_poll_and_complete():
    async def go():
        eng = _scripted_engine(["hello ", "world"], delay=0.05)
        client = await _client(eng)
        resp = await client.post(
            "/v1/responses",
            json={
                "model": "scripted",
                "input": "hi",
                "background": True,
            },
        )
        body = await resp.json()
        assert resp.status == 200
        assert body["status"] == "queued"
        rid = body["id"]
        for _ in range(100):
            r = await client.get(f"/v1/responses/{rid}")
            body = await r.json()
            if body["status"] == "completed":
                break
            await asyncio.sleep(0.02)
        assert body["status"] == "completed"
        texts = [
            c["text"]
            for item in body["output"]
            if item.get("type") == "message"
            for c in item.get("content", [])
            if c.get("type") == "output_text"
        ]
        assert texts == ["hello world"]
        # unknown id -> 404
        r = await client.get("/v1/responses/resp_nope")
        assert r.status == 404
        await client.close()

    asyncio.new_event_loop().run_until_complete(go())


def test_background_cancel():
    async def go():
        eng = _scripted_engine(["never"], delay=5.0)
        client = await _client(eng)
        resp = await client.post(
            "/v1/responses",
            json={"model": "scripted", "input": "hi", "background": True},
        )
        rid = (await resp.json())["id"]
        await asyncio.sleep(0.05)
        r = await client.post(f"/v1/responses/{rid}/cancel")
        body = await r.json()
        assert body["status"] == "cancelled"
        assert rid in eng.aborted
        await client.close()

    asyncio.new_event_loop().run_until_complete(go())


def test_streaming_function_call_items():
    tool_text = (
        "Checking. <tool_call>"
        + json.dumps(
            {"name": "get_weather", "arguments": {"city": "Paris", "n": 3}}
        )
        + "</tool_call>"
    )
    chunks = [tool_text[i : i + 7] for i in range(0, len(tool_text), 7)]

    async def go():
        eng = _scripted_engine(chunks)
        client = await _client(eng, tool_parser_name="hermes")
        resp = await client.post(
            "/v1/responses",
            json={
                "model": "scripted",
                "input": "hi",
                "stream": True,
                "tools": [TOOL_BODY],
            },
        )
        raw = await resp.text()
        await client.close()
        return raw

    raw = asyncio.new_event_loop().run_until_complete(go())
    events = []
    for line in raw.splitlines():
        if line.startswith("data: "):
            events.append(json.loads(line[6:]))
    types = [e["type"] for e in events]
    # the function_call item lifecycle streamed
    assert "response.output_item.added" in types
    arg_deltas = [
        e for e in types if e == "response.function_call_arguments.delta"
    ]
    assert len(arg_deltas) > 1  # incremental argument fragments
    assert "response.function_call_arguments.done" in types
    done = next(
        e
        for e in events
        if e["type"] == "response.function_call_arguments.done"
    )
    assert json.loads(done["arguments"]) == {"city": "Paris", "n": 3}
    fc_added = next(
        e
        for e in events
        if e["type"] == "response.output_item.added"
        and e["item"]["type"] == "function_call"
    )
    assert fc_added["item"]["name"] == "get_weather"
    # completed body carries the call + the content text
    completed = next(
        e for e in events if e["type"] == "response.completed"
    )
    out_types = [i["type"] for i in completed["response"]["output"]]
    assert "function_call" in out_types

    text_deltas = "".join(
        e["delta"]
        for e in events
        if e["type"] == "response.output_text.delta"
    )
    assert text_deltas.strip() == "Checking."

    asyncio.new_event_loop().close()


def test_previous_response_id_chains_conversation():
    async def go():
        eng = _scripted_engine(["echo"])
        client = await _client(eng)
        r1 = await client.post(
            "/v1/responses",
            json={"model": "scripted", "input": "first turn", "store": True},
        )
        rid = (await r1.json())["id"]
        # capture what the engine sees on the second turn
        seen = {}
        orig = eng.stream_chat

        async def spy_chat(messages, **kw):
            seen["messages"] = messages
            return await eng.__class__.chat(eng, messages, **kw)

        eng.chat = spy_chat
        r2 = await client.post(
            "/v1/responses",
            json={
                "model": "scripted",
                "input": "second turn",
                "previous_response_id": rid,
            },
        )
        assert r2.status == 200
        roles = [m["role"] for m in seen["messages"]]
        assert roles == ["user", "assistant", "user"]
        assert seen["messages"][1]["content"] == "echo"
        # unknown prev id -> 404
        r3 = await client.post(
            "/v1/responses",
            json={
                "model": "scripted",
                "input": "x",
                "previous_response_id": "resp_missing",
            },
        )
        assert r3.status == 404
        # GET must not leak private keys
        g = await client.get(f"/v1/responses/{rid}")
        assert "_messages" not in await g.json()
        await client.close()

    asyncio.new_event_loop().run_until_complete(go())

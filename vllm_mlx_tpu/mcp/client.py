# SPDX-License-Identifier: Apache-2.0
"""MCP clients (reference mcp/client.py:23): JSON-RPC 2.0 over a
subprocess's stdin/stdout (stdio transport) or over HTTP+SSE (remote
transport: GET an event stream, POST messages to the server-announced
endpoint, responses arrive as ``message`` events)."""

from __future__ import annotations

import asyncio
import json
import logging
from typing import Any, Dict, List, Optional

logger = logging.getLogger(__name__)

PROTOCOL_VERSION = "2024-11-05"


class MCPError(Exception):
    pass


class MCPStdioClient:
    """One MCP server over stdio."""

    def __init__(
        self,
        name: str,
        command: str,
        args: Optional[List[str]] = None,
        env: Optional[Dict[str, str]] = None,
        timeout: float = 30.0,
    ) -> None:
        self.name = name
        self.command = command
        self.args = args or []
        self.env = env or {}
        self.timeout = timeout
        self._proc: Optional[asyncio.subprocess.Process] = None
        self._next_id = 1
        self._lock = asyncio.Lock()
        self.server_info: Dict[str, Any] = {}
        self.tools: List[Dict[str, Any]] = []

    async def start(self) -> None:
        import os

        env = dict(os.environ)
        env.update(self.env)
        self._proc = await asyncio.create_subprocess_exec(
            self.command,
            *self.args,
            stdin=asyncio.subprocess.PIPE,
            stdout=asyncio.subprocess.PIPE,
            stderr=asyncio.subprocess.DEVNULL,
            env=env,
        )
        init = await self._request(
            "initialize",
            {
                "protocolVersion": PROTOCOL_VERSION,
                "capabilities": {},
                "clientInfo": {"name": "vllm-mlx-tpu", "version": "0.1.0"},
            },
        )
        self.server_info = init.get("serverInfo", {})
        await self._notify("notifications/initialized", {})
        result = await self._request("tools/list", {})
        self.tools = result.get("tools", [])
        logger.info(
            "MCP server %s: %d tools", self.name, len(self.tools)
        )

    async def stop(self) -> None:
        if self._proc is not None:
            try:
                self._proc.terminate()
                await asyncio.wait_for(self._proc.wait(), timeout=5)
            except (ProcessLookupError, asyncio.TimeoutError):
                try:
                    self._proc.kill()
                except ProcessLookupError:
                    pass
            self._proc = None

    async def call_tool(
        self, tool_name: str, arguments: Dict[str, Any]
    ) -> Any:
        result = await self._request(
            "tools/call", {"name": tool_name, "arguments": arguments}
        )
        content = result.get("content", [])
        texts = [
            c.get("text", "")
            for c in content
            if isinstance(c, dict) and c.get("type") == "text"
        ]
        if result.get("isError"):
            raise MCPError("; ".join(texts) or "tool error")
        return "\n".join(texts) if texts else json.dumps(result)

    # -------------------------------------------------------------- plumbing
    async def _send(self, msg: Dict[str, Any]) -> None:
        if self._proc is None or self._proc.stdin is None:
            raise MCPError(f"MCP server {self.name} not running")
        data = (json.dumps(msg) + "\n").encode()
        self._proc.stdin.write(data)
        await self._proc.stdin.drain()

    async def _notify(self, method: str, params: Dict[str, Any]) -> None:
        await self._send(
            {"jsonrpc": "2.0", "method": method, "params": params}
        )

    async def _request(self, method: str, params: Dict[str, Any]) -> Any:
        async with self._lock:
            req_id = self._next_id
            self._next_id += 1
            await self._send(
                {
                    "jsonrpc": "2.0",
                    "id": req_id,
                    "method": method,
                    "params": params,
                }
            )
            while True:
                line = await asyncio.wait_for(
                    self._proc.stdout.readline(), timeout=self.timeout
                )
                if not line:
                    raise MCPError(f"MCP server {self.name} closed stdout")
                try:
                    msg = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if msg.get("id") != req_id:
                    continue  # notification or stale response
                if "error" in msg:
                    raise MCPError(str(msg["error"]))
                return msg.get("result", {})


class MCPSSEClient:
    """One remote MCP server over HTTP+SSE.

    Protocol: GET the SSE URL; the server's first ``endpoint`` event
    names the POST URL for JSON-RPC messages; responses (matched by id)
    arrive as ``message`` events on the stream.
    """

    def __init__(
        self,
        name: str,
        url: str,
        headers: Optional[Dict[str, str]] = None,
        timeout: float = 30.0,
    ) -> None:
        self.name = name
        self.url = url
        self.headers = headers or {}
        self.timeout = timeout
        self.server_info: Dict[str, Any] = {}
        self.tools: List[Dict[str, Any]] = []
        self._session = None
        self._sse_resp = None
        self._reader_task: Optional[asyncio.Task] = None
        self._endpoint: Optional[str] = None
        self._endpoint_ready: Optional[asyncio.Event] = None
        self._pending: Dict[int, asyncio.Future] = {}
        self._next_id = 1

    async def start(self) -> None:
        import aiohttp

        self._session = aiohttp.ClientSession(
            timeout=aiohttp.ClientTimeout(total=None, sock_read=None)
        )
        self._endpoint_ready = asyncio.Event()
        self._sse_resp = await self._session.get(
            self.url, headers={**self.headers, "Accept": "text/event-stream"}
        )
        if self._sse_resp.status != 200:
            raise MCPError(
                f"SSE connect failed: HTTP {self._sse_resp.status}"
            )
        self._reader_task = asyncio.create_task(self._read_events())
        try:
            await asyncio.wait_for(
                self._endpoint_ready.wait(), timeout=self.timeout
            )
        except asyncio.TimeoutError:
            raise MCPError("SSE server sent no endpoint event")
        init = await self._request(
            "initialize",
            {
                "protocolVersion": PROTOCOL_VERSION,
                "capabilities": {},
                "clientInfo": {"name": "vllm-mlx-tpu", "version": "0.1.0"},
            },
        )
        self.server_info = init.get("serverInfo", {})
        await self._post(
            {"jsonrpc": "2.0", "method": "notifications/initialized",
             "params": {}}
        )
        result = await self._request("tools/list", {})
        self.tools = result.get("tools", [])
        logger.info(
            "MCP SSE server %s: %d tools", self.name, len(self.tools)
        )

    async def _read_events(self) -> None:
        """Parse the SSE stream: ``event:``/``data:`` line pairs."""
        import urllib.parse

        event = "message"
        data_lines: List[str] = []
        try:
            async for raw in self._sse_resp.content:
                line = raw.decode("utf-8", "replace").rstrip("\r\n")
                if line.startswith("event:"):
                    event = line[6:].strip()
                elif line.startswith("data:"):
                    data_lines.append(line[5:].strip())
                elif line == "":
                    data = "\n".join(data_lines)
                    data_lines = []
                    if not data:
                        continue
                    if event == "endpoint":
                        self._endpoint = urllib.parse.urljoin(self.url, data)
                        self._endpoint_ready.set()
                    elif event == "message":
                        try:
                            msg = json.loads(data)
                        except json.JSONDecodeError:
                            continue
                        fut = self._pending.pop(msg.get("id"), None)
                        if fut is not None and not fut.done():
                            fut.set_result(msg)
                    event = "message"
        except Exception as e:  # stream closed
            for fut in self._pending.values():
                if not fut.done():
                    fut.set_exception(MCPError(f"SSE stream closed: {e}"))
            self._pending.clear()

    async def _post(self, msg: Dict[str, Any]) -> None:
        if self._endpoint is None:
            raise MCPError(f"MCP SSE server {self.name} has no endpoint")
        async with self._session.post(
            self._endpoint, json=msg, headers=self.headers
        ) as resp:
            if resp.status >= 400:
                raise MCPError(f"SSE POST failed: HTTP {resp.status}")

    async def _request(self, method: str, params: Dict[str, Any]) -> Any:
        req_id = self._next_id
        self._next_id += 1
        fut: asyncio.Future = asyncio.get_running_loop().create_future()
        self._pending[req_id] = fut
        try:
            await self._post(
                {"jsonrpc": "2.0", "id": req_id, "method": method,
                 "params": params}
            )
            msg = await asyncio.wait_for(fut, timeout=self.timeout)
        finally:
            self._pending.pop(req_id, None)
            if not fut.done():
                fut.cancel()
        if "error" in msg:
            raise MCPError(str(msg["error"]))
        return msg.get("result", {})

    async def call_tool(
        self, tool_name: str, arguments: Dict[str, Any]
    ) -> Any:
        result = await self._request(
            "tools/call", {"name": tool_name, "arguments": arguments}
        )
        content = result.get("content", [])
        texts = [
            c.get("text", "")
            for c in content
            if isinstance(c, dict) and c.get("type") == "text"
        ]
        if result.get("isError"):
            raise MCPError("; ".join(texts) or "tool error")
        return "\n".join(texts) if texts else json.dumps(result)

    async def stop(self) -> None:
        if self._reader_task is not None:
            self._reader_task.cancel()
            try:
                await self._reader_task
            except (asyncio.CancelledError, Exception):
                pass
            self._reader_task = None
        if self._sse_resp is not None:
            self._sse_resp.close()
            self._sse_resp = None
        if self._session is not None:
            await self._session.close()
            self._session = None

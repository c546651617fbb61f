# SPDX-License-Identifier: Apache-2.0
"""MCP stdio client: JSON-RPC 2.0 over a subprocess's stdin/stdout
(reference mcp/client.py:23)."""

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

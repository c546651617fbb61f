# SPDX-License-Identifier: Apache-2.0
"""MCP manager + executor (reference mcp/manager.py:22, mcp/executor.py:64):
multi-server lifecycle, tool namespace, validated parallel execution,
OpenAI tool-format conversion (reference mcp/tools.py)."""

from __future__ import annotations

import asyncio
import logging
import time
from typing import Any, Dict, List, Optional

from .client import MCPError, MCPSSEClient, MCPStdioClient
from .security import (
    MCPSecurity,
    MCPSecurityError,
    SecurityPolicy,
    validate_mcp_server_config,
)

logger = logging.getLogger(__name__)


class MCPManager:
    def __init__(self, policy: Optional[SecurityPolicy] = None) -> None:
        self.clients: Dict[str, MCPStdioClient] = {}
        self.security = MCPSecurity(policy)
        # tool name -> (server, tool spec)
        self._tool_index: Dict[str, tuple] = {}

    async def start(self, server_configs: List[Dict[str, Any]]) -> None:
        for spec in server_configs:
            name = spec.get("name", "")
            try:
                validate_mcp_server_config(spec)
                if spec.get("url"):  # remote SSE transport
                    self.security.validate_url(spec["url"])
                    client: Any = MCPSSEClient(
                        name, spec["url"], spec.get("headers")
                    )
                else:
                    self.security.validate_server(
                        spec["command"], spec.get("args", []),
                        spec.get("env", {}),
                    )
                    client = MCPStdioClient(
                        name,
                        spec["command"],
                        spec.get("args"),
                        spec.get("env"),
                    )
                await client.start()
                self.clients[name] = client
            except (MCPSecurityError, MCPError, OSError) as e:
                logger.error("MCP server %s failed to start: %s", name, e)
        self._reindex()

    def _reindex(self) -> None:
        self._tool_index.clear()
        for sname, client in self.clients.items():
            for tool in client.tools:
                tname = tool.get("name", "")
                key = tname
                if key in self._tool_index:
                    key = f"{sname}__{tname}"
                self._tool_index[key] = (sname, tool)

    async def stop(self) -> None:
        for client in self.clients.values():
            await client.stop()
        self.clients.clear()
        self._tool_index.clear()

    # ----------------------------------------------------------------- tools
    def list_tools(self) -> List[Dict[str, Any]]:
        return [
            {"server": sname, **tool}
            for _, (sname, tool) in self._tool_index.items()
        ]

    def list_servers(self) -> List[Dict[str, Any]]:
        return [
            {
                "name": n,
                "info": c.server_info,
                "tools": [t.get("name") for t in c.tools],
            }
            for n, c in self.clients.items()
        ]

    def openai_tools(self) -> List[Dict[str, Any]]:
        """Expose MCP tools in OpenAI function format for chat requests."""
        out = []
        for key, (_, tool) in self._tool_index.items():
            out.append(
                {
                    "type": "function",
                    "function": {
                        "name": key,
                        "description": tool.get("description", ""),
                        "parameters": tool.get(
                            "inputSchema", {"type": "object"}
                        ),
                    },
                }
            )
        return out

    # -------------------------------------------------------------- execute
    async def execute(
        self, tool_name: str, arguments: Dict[str, Any]
    ) -> Dict[str, Any]:
        if tool_name not in self._tool_index:
            return {"ok": False, "error": f"unknown tool {tool_name!r}"}
        sname, tool = self._tool_index[tool_name]
        t0 = time.time()
        try:
            self.security.validate_tool_call(sname, tool_name, arguments)
            result = await self.clients[sname].call_tool(
                tool.get("name", tool_name), arguments
            )
            self.security.record(
                sname, tool_name, True, time.time() - t0,
                arguments=arguments,
            )
            return {"ok": True, "result": result}
        except (MCPError, MCPSecurityError, asyncio.TimeoutError) as e:
            self.security.record(
                sname, tool_name, False, time.time() - t0, str(e),
                arguments=arguments,
            )
            return {"ok": False, "error": str(e)}

    async def execute_many(
        self, calls: List[Dict[str, Any]], parallel: bool = True
    ) -> List[Dict[str, Any]]:
        if parallel:
            return list(
                await asyncio.gather(
                    *[
                        self.execute(c["name"], c.get("arguments", {}))
                        for c in calls
                    ]
                )
            )
        return [
            await self.execute(c["name"], c.get("arguments", {}))
            for c in calls
        ]

# SPDX-License-Identifier: Apache-2.0
"""MCP integration: real stdio JSON-RPC round trip against a toy server
subprocess, security policy, config loading."""

import asyncio
import json

import pytest

from vllm_mlx_tpu.mcp.config import load_mcp_config
from vllm_mlx_tpu.mcp.manager import MCPManager
from vllm_mlx_tpu.mcp.security import (
    MCPSecurity,
    MCPSecurityError,
    SecurityPolicy,
)

TOY_SERVER = r'''
import json, sys

TOOLS = [
    {
        "name": "add",
        "description": "Add two numbers",
        "inputSchema": {
            "type": "object",
            "properties": {"a": {"type": "number"}, "b": {"type": "number"}},
            "required": ["a", "b"],
        },
    },
    {"name": "fail", "description": "Always errors", "inputSchema": {"type": "object"}},
]

for line in sys.stdin:
    try:
        msg = json.loads(line)
    except json.JSONDecodeError:
        continue
    method = msg.get("method")
    mid = msg.get("id")
    if method == "initialize":
        resp = {"jsonrpc": "2.0", "id": mid, "result": {
            "protocolVersion": "2024-11-05",
            "capabilities": {"tools": {}},
            "serverInfo": {"name": "toy", "version": "1.0"}}}
    elif method == "tools/list":
        resp = {"jsonrpc": "2.0", "id": mid, "result": {"tools": TOOLS}}
    elif method == "tools/call":
        params = msg.get("params", {})
        if params.get("name") == "add":
            args = params.get("arguments", {})
            total = args.get("a", 0) + args.get("b", 0)
            resp = {"jsonrpc": "2.0", "id": mid, "result": {
                "content": [{"type": "text", "text": str(total)}]}}
        else:
            resp = {"jsonrpc": "2.0", "id": mid, "result": {
                "content": [{"type": "text", "text": "boom"}], "isError": True}}
    elif mid is None:
        continue  # notification
    else:
        resp = {"jsonrpc": "2.0", "id": mid,
                "error": {"code": -32601, "message": "unknown"}}
    sys.stdout.write(json.dumps(resp) + "\n")
    sys.stdout.flush()
'''


@pytest.fixture
def toy_server_file(tmp_path):
    f = tmp_path / "toy_mcp.py"
    f.write_text(TOY_SERVER)
    return str(f)


def test_manager_round_trip(toy_server_file):
    async def go():
        mgr = MCPManager()
        await mgr.start(
            [
                {
                    "name": "toy",
                    "command": "python3",
                    "args": [toy_server_file],
                }
            ]
        )
        try:
            tools = mgr.list_tools()
            assert {t["name"] for t in tools} == {"add", "fail"}
            oa = mgr.openai_tools()
            assert oa[0]["type"] == "function"
            result = await mgr.execute("add", {"a": 2, "b": 40})
            assert result["ok"] and result["result"] == "42"
            bad = await mgr.execute("fail", {})
            assert not bad["ok"]
            missing = await mgr.execute("nope", {})
            assert not missing["ok"]
            many = await mgr.execute_many(
                [
                    {"name": "add", "arguments": {"a": 1, "b": 2}},
                    {"name": "add", "arguments": {"a": 3, "b": 4}},
                ]
            )
            assert [m["result"] for m in many] == ["3", "7"]
        finally:
            await mgr.stop()

    asyncio.run(go())


class TestSecurity:
    def test_command_allowlist(self):
        sec = MCPSecurity()
        sec.validate_server("python3", ["server.py"], {})
        with pytest.raises(MCPSecurityError):
            sec.validate_server("bash", ["-c", "x"], {})

    def test_dangerous_args(self):
        sec = MCPSecurity()
        with pytest.raises(MCPSecurityError):
            sec.validate_server("python3", ["a; rm -rf /"], {})
        with pytest.raises(MCPSecurityError):
            sec.validate_server("python3", ["../../etc/passwd"], {})

    def test_env_blocklist(self):
        sec = MCPSecurity()
        with pytest.raises(MCPSecurityError):
            sec.validate_server("python3", [], {"LD_PRELOAD": "evil.so"})

    def test_rate_limit(self):
        sec = MCPSecurity(SecurityPolicy(max_calls_per_minute=3))
        for _ in range(3):
            sec.validate_tool_call("s", "t", {})
        with pytest.raises(MCPSecurityError):
            sec.validate_tool_call("s", "t", {})

    def test_audit(self):
        sec = MCPSecurity()
        sec.record("s", "t", True, 0.01)
        assert sec.audit_log[-1]["ok"]


def test_config_loading(tmp_path):
    cfg = tmp_path / "mcp.json"
    cfg.write_text(
        json.dumps(
            {
                "mcpServers": {
                    "files": {
                        "command": "npx",
                        "args": ["-y", "@modelcontextprotocol/server-filesystem"],
                    }
                }
            }
        )
    )
    servers = load_mcp_config(str(cfg))
    assert servers[0]["name"] == "files"
    assert servers[0]["command"] == "npx"

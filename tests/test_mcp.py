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


class TestSecurityDepth:
    """Deep policy coverage (reference mcp/security.py:112-829)."""

    def test_blocked_commands_even_with_allow_any(self):
        sec = MCPSecurity(SecurityPolicy(allow_any_command=True))
        for cmd in ("bash", "rm", "curl", "nc", "sudo", "/bin/sh"):
            with pytest.raises(MCPSecurityError):
                sec.validate_command(cmd)

    def test_command_shapes(self):
        sec = MCPSecurity()
        with pytest.raises(MCPSecurityError):
            sec.validate_command("")  # empty
        with pytest.raises(MCPSecurityError):
            sec.validate_command("-rf")  # option-like
        with pytest.raises(MCPSecurityError):
            sec.validate_command("./python3")  # relative path
        with pytest.raises(MCPSecurityError):
            sec.validate_command("python3; whoami")  # metachars
        sec.validate_command("/usr/bin/python3")  # abs path of allowed
        strict = MCPSecurity(SecurityPolicy(allow_absolute_paths=False))
        with pytest.raises(MCPSecurityError):
            strict.validate_command("/usr/bin/python3")

    def test_control_chars_rejected_everywhere(self):
        sec = MCPSecurity()
        with pytest.raises(MCPSecurityError):
            sec.validate_args(["a\x00b"])
        with pytest.raises(MCPSecurityError):
            sec.validate_env({"SAFE": "a\x1bb"})
        with pytest.raises(MCPSecurityError):
            sec.validate_tool_call("s", "reader", {"x": "a\x00"})

    def test_env_value_and_name_validation(self):
        sec = MCPSecurity()
        with pytest.raises(MCPSecurityError):
            sec.validate_env({"bad-name!": "x"})
        with pytest.raises(MCPSecurityError):
            sec.validate_env({"NODE_OPTIONS": "--require evil"})
        with pytest.raises(MCPSecurityError):
            sec.validate_env({"OK": 5})  # non-string value
        sec.validate_env({"API_BASE": "https://internal"})

    def test_url_policy(self, monkeypatch):
        import socket as sock

        sec = MCPSecurity()
        with pytest.raises(MCPSecurityError):
            sec.validate_url("ftp://host/sse")
        with pytest.raises(MCPSecurityError):
            sec.validate_url("http://user:pw@host/sse")
        monkeypatch.setattr(
            sock, "getaddrinfo",
            lambda *a, **k: [(2, 1, 6, "", ("10.0.0.1", 80))],
        )
        with pytest.raises(MCPSecurityError):
            sec.validate_url("https://internal.example/sse")
        lax = MCPSecurity(SecurityPolicy(allow_private_urls=True))
        lax.validate_url("http://localhost:9000/sse")

    def test_blocked_and_high_risk_tools(self):
        sec = MCPSecurity(SecurityPolicy(blocked_tools=["fs_*"]))
        with pytest.raises(MCPSecurityError):
            sec.validate_tool_call("s", "fs_write", {})
        with pytest.raises(MCPSecurityError):
            sec.validate_tool_call("s", "run_shell_command", {})
        with pytest.raises(MCPSecurityError):
            sec.validate_tool_call("s", "delete_file", {})
        sec.validate_tool_call("s", "read_page", {})
        permissive = MCPSecurity(
            SecurityPolicy(allow_high_risk_tools=True)
        )
        permissive.validate_tool_call("s", "run_shell_command", {})

    def test_per_tool_rate_limit(self):
        sec = MCPSecurity(
            SecurityPolicy(max_calls_per_minute=100,
                           max_calls_per_tool_per_minute=2)
        )
        sec.validate_tool_call("s", "reader", {})
        sec.validate_tool_call("s", "reader", {})
        with pytest.raises(MCPSecurityError):
            sec.validate_tool_call("s", "reader", {})
        sec.validate_tool_call("s", "lister", {})  # other tools unaffected

    def test_argument_depth_and_size(self):
        sec = MCPSecurity(SecurityPolicy(max_tool_arg_depth=3))
        deep = {"a": {"b": {"c": {"d": 1}}}}
        with pytest.raises(MCPSecurityError):
            sec.validate_tool_call("s", "reader", deep)
        small = MCPSecurity(SecurityPolicy(max_tool_args_bytes=10))
        with pytest.raises(MCPSecurityError):
            small.validate_tool_call("s", "reader", {"k": "x" * 100})

    def test_audit_redaction_and_query(self):
        sec = MCPSecurity()
        sec.record("s", "login", True, 0.01,
                   arguments={"api_key": "sk-123", "query": "hi",
                              "nested": {"password": "p"}})
        sec.record("s", "fail", False, 0.01, error="boom")
        entry = sec.get_audit_log(tool="login")[-1]
        assert entry["arguments"]["api_key"] == "[REDACTED]"
        assert entry["arguments"]["nested"]["password"] == "[REDACTED]"
        assert entry["arguments"]["query"] == "hi"
        errs = sec.get_audit_log(only_errors=True)
        assert len(errs) == 1 and errs[0]["tool"] == "fail"
        assert sec.clear_audit_log() == 2
        assert sec.get_audit_log() == []

    def test_server_config_validation(self):
        from vllm_mlx_tpu.mcp.security import validate_mcp_server_config

        validate_mcp_server_config(
            {"name": "files", "command": "npx", "args": []}
        )
        validate_mcp_server_config({"name": "web", "url": "https://x/sse"})
        with pytest.raises(MCPSecurityError):
            validate_mcp_server_config({"name": "x"})  # no transport
        with pytest.raises(MCPSecurityError):
            validate_mcp_server_config(
                {"name": "x", "command": "npx", "url": "https://y"}
            )
        with pytest.raises(MCPSecurityError):
            validate_mcp_server_config(
                {"name": "bad name!", "command": "npx"}
            )
        with pytest.raises(MCPSecurityError):
            validate_mcp_server_config(
                {"name": "x", "command": "npx", "args": "oops"}
            )


def test_sse_transport_round_trip():
    """A minimal MCP server over HTTP+SSE driven through the manager:
    endpoint announcement, initialize, tools/list, tools/call."""
    import asyncio
    import json as _json

    from aiohttp import web
    from aiohttp.test_utils import TestClient, TestServer

    from vllm_mlx_tpu.mcp.manager import MCPManager
    from vllm_mlx_tpu.mcp.security import SecurityPolicy

    async def go():
        queues = {}

        async def sse(request):
            resp = web.StreamResponse(
                headers={"Content-Type": "text/event-stream"}
            )
            await resp.prepare(request)
            q = asyncio.Queue()
            queues["q"] = q
            await resp.write(b"event: endpoint\ndata: /messages\n\n")
            while True:
                msg = await q.get()
                if msg is None:
                    break
                payload = _json.dumps(msg).encode()
                await resp.write(
                    b"event: message\ndata: " + payload + b"\n\n"
                )
            return resp

        async def messages(request):
            msg = await request.json()
            mid = msg.get("id")
            method = msg.get("method")
            if mid is None:
                return web.Response(status=202)  # notification
            if method == "initialize":
                result = {"serverInfo": {"name": "toy-sse"},
                          "capabilities": {}}
            elif method == "tools/list":
                result = {"tools": [{
                    "name": "echo",
                    "description": "echo text",
                    "inputSchema": {"type": "object"},
                }]}
            elif method == "tools/call":
                text = msg["params"]["arguments"].get("text", "")
                result = {"content": [{"type": "text",
                                       "text": f"echo: {text}"}]}
            else:
                result = {}
            await queues["q"].put(
                {"jsonrpc": "2.0", "id": mid, "result": result}
            )
            return web.Response(status=202)

        app = web.Application()
        app.router.add_get("/sse", sse)
        app.router.add_post("/messages", messages)
        client = TestClient(TestServer(app))
        await client.start_server()
        url = client.make_url("/sse")
        try:
            mgr = MCPManager(SecurityPolicy(allow_private_urls=True))
            await mgr.start([{"name": "toysse", "url": str(url)}])
            assert mgr.list_servers()[0]["info"]["name"] == "toy-sse"
            tools = mgr.list_tools()
            assert tools and tools[0]["name"] == "echo"
            out = await mgr.execute("echo", {"text": "hi"})
            assert out["ok"] and out["result"] == "echo: hi"
            await mgr.stop()
            if "q" in queues:
                await queues["q"].put(None)
        finally:
            await client.close()

    asyncio.run(go())

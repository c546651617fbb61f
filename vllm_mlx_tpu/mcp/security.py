# SPDX-License-Identifier: Apache-2.0
"""MCP security policy (reference mcp/security.py:112-829).

Executing user-configured subprocesses and forwarding model-chosen tool
calls is the highest-risk surface in the server, so every layer is
validated:

* server launch — command allowlist (basename + absolute-path rules),
  shell-metacharacter / control-character / path-traversal scanning of
  command and args, env-var name and VALUE checks;
* remote (SSE) servers — scheme allowlist, no userinfo, public-address
  resolution (shares the media-fetch SSRF policy);
* tool calls — blocked-tool patterns, high-risk tool gating
  (exec/shell/delete classes need an explicit opt-in), recursive
  argument scanning with size caps, global + per-tool rate limits;
* audit — every execution recorded with secrets redacted, queryable
  and clearable.
"""

from __future__ import annotations

import fnmatch
import logging
import re
import time
import urllib.parse
from collections import deque
from dataclasses import dataclass, field
from typing import Any, Deque, Dict, List, Optional

logger = logging.getLogger(__name__)

# Interpreters/launchers commonly used for MCP servers.
DEFAULT_ALLOWED_COMMANDS = {
    "node", "npx", "python", "python3", "uv", "uvx", "deno", "bun",
}

# Binaries that must never be MCP server commands even under
# allow_any_command (reference security.py BLOCKED_COMMANDS).
BLOCKED_COMMANDS = {
    "bash", "sh", "zsh", "fish", "dash", "ksh", "csh",
    "rm", "dd", "mkfs", "shutdown", "reboot", "halt",
    "curl", "wget", "nc", "ncat", "netcat", "socat", "telnet",
    "sudo", "su", "doas", "chroot",
    "eval", "exec", "source",
}

_SHELL_META = re.compile(r"[;&|`$><\n\r]")
# interpreter escape hatches: inline-eval/exec flags turn an allowlisted
# launcher into arbitrary code execution (node --eval, python -c, ...)
_DANGEROUS_OPTION = re.compile(
    r"^-{1,2}(rm|exec|eval|e|c|p)$|^--?(rm|exec|eval)\b", re.IGNORECASE
)
_CONTROL_CHARS = re.compile(r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]")
_TRAVERSAL = re.compile(r"(\.\./|\.\.\\|%2e%2e)", re.IGNORECASE)

# env var names that alter linker/interpreter behavior (injection vectors)
_SENSITIVE_ENV = re.compile(
    r"^(LD_PRELOAD|LD_LIBRARY_PATH|LD_AUDIT|DYLD_|PYTHONPATH|PYTHONSTARTUP"
    r"|NODE_OPTIONS|RUBYOPT|PERL5OPT|IFS|BASH_ENV|ENV|GCONV_PATH)",
    re.IGNORECASE,
)

# high-risk tool name classes: refused unless allow_high_risk_tools
# (reference security.py:644 _check_high_risk_tool)
HIGH_RISK_TOOL_PATTERNS = (
    "*exec*", "*shell*", "*command*", "*terminal*",
    "*delete*", "*remove*", "*destroy*", "*drop*",
    "*sudo*", "*admin*", "*kill*",
)

_SECRET_KEY = re.compile(
    r"(password|passwd|secret|token|api_?key|credential|auth|private)",
    re.IGNORECASE,
)


class MCPSecurityError(Exception):
    pass


@dataclass
class SecurityPolicy:
    allowed_commands: set = field(
        default_factory=lambda: set(DEFAULT_ALLOWED_COMMANDS)
    )
    allow_any_command: bool = False
    allow_absolute_paths: bool = True  # /usr/bin/python3 style launchers
    blocked_tools: List[str] = field(default_factory=list)  # glob patterns
    allow_high_risk_tools: bool = False
    max_calls_per_minute: int = 60
    max_calls_per_tool_per_minute: int = 30
    max_argument_length: int = 4096
    max_tool_args_bytes: int = 64 * 1024
    max_tool_arg_depth: int = 8
    audit: bool = True
    allow_private_urls: bool = False  # SSE servers on localhost/intranet


def _scan_string(value: str, context: str) -> None:
    if _CONTROL_CHARS.search(value):
        raise MCPSecurityError(f"{context} contains control characters")
    if _TRAVERSAL.search(value):
        raise MCPSecurityError(f"{context} contains path traversal")


class MCPSecurity:
    def __init__(self, policy: Optional[SecurityPolicy] = None) -> None:
        self.policy = policy or SecurityPolicy()
        self._call_times: Deque[float] = deque()
        self._tool_call_times: Dict[str, Deque[float]] = {}
        self.audit_log: List[Dict] = []

    # --------------------------------------------------------- server launch
    def validate_server(
        self, command: str, args: List[str], env: Dict[str, str]
    ) -> None:
        self.validate_command(command)
        self.validate_args(args)
        self.validate_env(env)

    def validate_command(self, command: str) -> None:
        if not command or not command.strip():
            raise MCPSecurityError("empty MCP command")
        _scan_string(command, "command")
        if _SHELL_META.search(command):
            raise MCPSecurityError("command contains shell metacharacters")
        if command.startswith("-"):
            raise MCPSecurityError("command looks like an option")
        is_abs = command.startswith("/")
        if ("/" in command or "\\" in command) and not is_abs:
            raise MCPSecurityError(
                "relative command paths are not allowed"
            )
        if is_abs and not self.policy.allow_absolute_paths:
            raise MCPSecurityError("absolute command paths are disabled")
        base = command.rsplit("/", 1)[-1].lower()
        if base in BLOCKED_COMMANDS:
            raise MCPSecurityError(f"command {base!r} is blocked")
        if not self.policy.allow_any_command and (
            base not in self.policy.allowed_commands
        ):
            raise MCPSecurityError(
                f"command {base!r} not in MCP allowlist "
                f"({sorted(self.policy.allowed_commands)})"
            )

    def validate_args(self, args: List[str]) -> None:
        for a in args:
            if not isinstance(a, str):
                raise MCPSecurityError("MCP args must be strings")
            if len(a) > self.policy.max_argument_length:
                raise MCPSecurityError("argument too long")
            _scan_string(a, "argument")
            if _SHELL_META.search(a):
                raise MCPSecurityError(
                    f"argument {a!r} contains shell metacharacters"
                )
            if _DANGEROUS_OPTION.match(a):
                raise MCPSecurityError(
                    f"argument {a!r} is a blocked interpreter option"
                )

    def validate_env(self, env: Optional[Dict[str, str]]) -> None:
        for k, v in (env or {}).items():
            if _SENSITIVE_ENV.search(k):
                raise MCPSecurityError(f"env var {k!r} is not allowed")
            if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", k):
                raise MCPSecurityError(f"invalid env var name {k!r}")
            if not isinstance(v, str):
                raise MCPSecurityError(f"env var {k!r} value must be str")
            _scan_string(v, f"env[{k}]")
            if len(v) > self.policy.max_argument_length:
                raise MCPSecurityError(f"env var {k!r} value too long")

    def validate_url(self, url: str) -> None:
        """SSE server URL policy (reference security.py:385): http(s)
        only, no embedded credentials, resolved address must be public
        unless the policy opts in to private hosts."""
        parsed = urllib.parse.urlparse(url)
        if parsed.scheme not in ("http", "https"):
            raise MCPSecurityError(
                f"MCP server URL scheme {parsed.scheme!r} not allowed"
            )
        if parsed.username or parsed.password:
            raise MCPSecurityError("MCP server URL must not embed userinfo")
        if not parsed.hostname:
            raise MCPSecurityError("MCP server URL has no host")
        _scan_string(url, "url")
        if not self.policy.allow_private_urls:
            from ..media_fetch import (
                FetchPolicy,
                UnsafeRemoteURLError,
                validate_url_safety,
            )

            try:
                validate_url_safety(url, FetchPolicy())
            except UnsafeRemoteURLError as e:
                raise MCPSecurityError(str(e)) from e

    # ------------------------------------------------------------ tool calls
    def validate_tool_call(
        self, server: str, tool: str, arguments: Any
    ) -> None:
        full = f"{server}.{tool}"
        self._check_blocked(tool, full)
        self._check_high_risk(tool, full)
        self._check_rate(full)
        self._validate_arguments(arguments)

    def _check_blocked(self, tool: str, full: str) -> None:
        for pat in self.policy.blocked_tools:
            if fnmatch.fnmatch(tool, pat) or fnmatch.fnmatch(full, pat):
                raise MCPSecurityError(f"tool {full!r} is blocked by policy")

    def _check_high_risk(self, tool: str, full: str) -> None:
        if self.policy.allow_high_risk_tools:
            return
        low = tool.lower()
        for pat in HIGH_RISK_TOOL_PATTERNS:
            if fnmatch.fnmatch(low, pat):
                raise MCPSecurityError(
                    f"tool {full!r} matches high-risk pattern {pat!r} "
                    "(set allow_high_risk_tools to permit)"
                )

    def _check_rate(self, full: str) -> None:
        now = time.time()
        while self._call_times and now - self._call_times[0] > 60:
            self._call_times.popleft()
        if len(self._call_times) >= self.policy.max_calls_per_minute:
            raise MCPSecurityError("MCP tool-call rate limit exceeded")
        per = self._tool_call_times.setdefault(full, deque())
        while per and now - per[0] > 60:
            per.popleft()
        if len(per) >= self.policy.max_calls_per_tool_per_minute:
            raise MCPSecurityError(
                f"rate limit for tool {full!r} exceeded"
            )
        self._call_times.append(now)
        per.append(now)

    def _validate_arguments(self, arguments: Any) -> None:
        blob = repr(arguments)
        if len(blob) > self.policy.max_tool_args_bytes:
            raise MCPSecurityError("tool arguments too large")

        def walk(value: Any, depth: int) -> None:
            if depth > self.policy.max_tool_arg_depth:
                raise MCPSecurityError("tool arguments nested too deeply")
            if isinstance(value, str):
                if _CONTROL_CHARS.search(value):
                    raise MCPSecurityError(
                        "tool argument contains control characters"
                    )
            elif isinstance(value, dict):
                for k, v in value.items():
                    if isinstance(k, str) and _CONTROL_CHARS.search(k):
                        raise MCPSecurityError(
                            "tool argument key contains control characters"
                        )
                    walk(v, depth + 1)
            elif isinstance(value, (list, tuple)):
                for v in value:
                    walk(v, depth + 1)

        walk(arguments, 0)

    # ------------------------------------------------------------------ audit
    def record(
        self,
        server: str,
        tool: str,
        ok: bool,
        duration: float,
        error: str = "",
        arguments: Any = None,
    ) -> None:
        if not self.policy.audit:
            return
        entry = {
            "ts": time.time(),
            "server": server,
            "tool": tool,
            "ok": ok,
            "duration_ms": round(duration * 1000, 1),
            "error": error[:500],
        }
        if arguments is not None:
            entry["arguments"] = self._sanitize(arguments)
        self.audit_log.append(entry)
        if len(self.audit_log) > 1000:
            del self.audit_log[:500]
        logger.info("[mcp_audit] %s", entry)

    def _sanitize(self, obj: Any, depth: int = 0) -> Any:
        """Redact secret-looking keys and truncate long strings before
        logging (reference security.py:774)."""
        if depth > 6:
            return "..."
        if isinstance(obj, dict):
            return {
                k: ("[REDACTED]" if isinstance(k, str) and _SECRET_KEY.search(k)
                    else self._sanitize(v, depth + 1))
                for k, v in obj.items()
            }
        if isinstance(obj, (list, tuple)):
            return [self._sanitize(v, depth + 1) for v in obj[:20]]
        if isinstance(obj, str) and len(obj) > 200:
            return obj[:200] + "..."
        return obj

    def get_audit_log(
        self,
        server: Optional[str] = None,
        tool: Optional[str] = None,
        only_errors: bool = False,
        limit: int = 100,
    ) -> List[Dict]:
        out = [
            e
            for e in self.audit_log
            if (server is None or e["server"] == server)
            and (tool is None or e["tool"] == tool)
            and (not only_errors or not e["ok"])
        ]
        return out[-limit:]

    def clear_audit_log(self) -> int:
        n = len(self.audit_log)
        self.audit_log.clear()
        return n


def validate_mcp_server_config(config: Dict[str, Any]) -> None:
    """Static validation of one server's config dict before launch
    (reference security.py:450)."""
    name = config.get("name", "")
    if not re.fullmatch(r"[A-Za-z0-9._-]{1,64}", str(name)):
        raise MCPSecurityError(f"invalid MCP server name {name!r}")
    if "url" in config and "command" in config:
        raise MCPSecurityError(
            f"server {name!r}: specify either 'command' (stdio) or "
            "'url' (SSE), not both"
        )
    if "url" not in config and "command" not in config:
        raise MCPSecurityError(f"server {name!r}: missing command/url")
    args = config.get("args", [])
    if not isinstance(args, list):
        raise MCPSecurityError(f"server {name!r}: args must be a list")
    env = config.get("env", {})
    if not isinstance(env, dict):
        raise MCPSecurityError(f"server {name!r}: env must be a dict")

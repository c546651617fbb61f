# SPDX-License-Identifier: Apache-2.0
"""MCP security policy (reference mcp/security.py:112-829): command
allowlisting, argument/env validation, rate limiting, audit logging."""

from __future__ import annotations

import logging
import re
import shlex
import time
from collections import deque
from dataclasses import dataclass, field
from typing import Deque, Dict, List, Optional

logger = logging.getLogger(__name__)

# Interpreters/launchers commonly used for MCP servers.
DEFAULT_ALLOWED_COMMANDS = {
    "node", "npx", "python", "python3", "uv", "uvx", "deno", "bun",
}

_DANGEROUS_ARG_PATTERNS = [
    re.compile(r"[;&|`$]"),  # shell metacharacters
    re.compile(r"\.\./"),  # path traversal
    re.compile(r"^-{1,2}(rm|exec|eval)\b", re.IGNORECASE),
]

_SENSITIVE_ENV = re.compile(
    r"(LD_PRELOAD|LD_LIBRARY_PATH|PYTHONPATH|NODE_OPTIONS)", re.IGNORECASE
)


class MCPSecurityError(Exception):
    pass


@dataclass
class SecurityPolicy:
    allowed_commands: set = field(
        default_factory=lambda: set(DEFAULT_ALLOWED_COMMANDS)
    )
    allow_any_command: bool = False
    max_calls_per_minute: int = 60
    max_argument_length: int = 4096
    audit: bool = True


class MCPSecurity:
    def __init__(self, policy: Optional[SecurityPolicy] = None) -> None:
        self.policy = policy or SecurityPolicy()
        self._call_times: Deque[float] = deque()
        self.audit_log: List[Dict] = []

    # ---------------------------------------------------------- validation
    def validate_server(
        self, command: str, args: List[str], env: Dict[str, str]
    ) -> None:
        base = command.rsplit("/", 1)[-1]
        if not self.policy.allow_any_command and (
            base not in self.policy.allowed_commands
        ):
            raise MCPSecurityError(
                f"command {base!r} not in MCP allowlist "
                f"({sorted(self.policy.allowed_commands)})"
            )
        for a in args:
            if len(a) > self.policy.max_argument_length:
                raise MCPSecurityError("argument too long")
            for pat in _DANGEROUS_ARG_PATTERNS:
                if pat.search(a):
                    raise MCPSecurityError(
                        f"argument {a!r} matches blocked pattern"
                    )
        for k in env:
            if _SENSITIVE_ENV.search(k):
                raise MCPSecurityError(f"env var {k!r} is not allowed")

    def validate_tool_call(self, server: str, tool: str, arguments) -> None:
        now = time.time()
        while self._call_times and now - self._call_times[0] > 60:
            self._call_times.popleft()
        if len(self._call_times) >= self.policy.max_calls_per_minute:
            raise MCPSecurityError("MCP tool-call rate limit exceeded")
        self._call_times.append(now)
        blob = str(arguments)
        if len(blob) > 64 * 1024:
            raise MCPSecurityError("tool arguments too large")

    # --------------------------------------------------------------- audit
    def record(
        self, server: str, tool: str, ok: bool, duration: float, error: str = ""
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
        self.audit_log.append(entry)
        if len(self.audit_log) > 1000:
            del self.audit_log[:500]
        logger.info("[mcp_audit] %s", entry)

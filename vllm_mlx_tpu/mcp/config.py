# SPDX-License-Identifier: Apache-2.0
"""MCP server configuration loading (reference mcp/config.py:26).

JSON format (Claude-Desktop-compatible):
  {"mcpServers": {"name": {"command": "npx", "args": [...], "env": {...}}}}
"""

from __future__ import annotations

import json
from typing import Dict, List


def load_mcp_config(path: str) -> List[Dict]:
    with open(path) as f:
        data = json.load(f)
    servers = data.get("mcpServers") or data.get("servers") or {}
    out = []
    for name, spec in servers.items():
        out.append(
            {
                "name": name,
                "command": spec.get("command", ""),
                "args": spec.get("args", []),
                "env": spec.get("env", {}),
            }
        )
    return out

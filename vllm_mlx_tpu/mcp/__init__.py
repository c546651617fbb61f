# SPDX-License-Identifier: Apache-2.0
"""MCP (Model Context Protocol) tool integration.

Parity with the reference's mcp/ package (client/manager/executor/
security/tools, reference mcp/ ~2,618 LoC): stdio JSON-RPC client,
multi-server manager, validated execution with security policy, and
OpenAI-format tool conversion.
"""

from .manager import MCPManager  # noqa: F401
from .config import load_mcp_config  # noqa: F401

# SPDX-License-Identifier: Apache-2.0
"""API layer: OpenAI + Anthropic schemas, adapters, server."""

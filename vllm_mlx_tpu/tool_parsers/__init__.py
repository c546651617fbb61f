# SPDX-License-Identifier: Apache-2.0
"""Tool-call parsers: extract function calls from model output.

Parity with the reference's tool_parsers/ package (18 format-specific
parsers + registry with lazy registration, reference
abstract_tool_parser.py:40-284). Each parser understands one model
family's tool-call serialization and exposes both whole-text extraction
and a streaming interface that buffers tool-call regions while passing
normal content through.
"""

from .abstract_tool_parser import (  # noqa: F401
    ExtractedToolCalls,
    ToolParser,
    ToolParserStreamState,
    get_tool_parser,
    list_tool_parsers,
    register_tool_parser,
)

# import for side-effect registration
from . import json_parser  # noqa: F401, E402
from . import hermes  # noqa: F401, E402
from . import llama  # noqa: F401, E402
from . import mistral  # noqa: F401, E402
from . import qwen  # noqa: F401, E402
from . import misc_parsers  # noqa: F401, E402
from . import poolside  # noqa: F401, E402
from . import harmony  # noqa: F401, E402

# Extra stop tokens some formats need (reference tool_parsers/__init__.py:68)
PARSER_EXTRA_STOP_TOKENS = {
    "mistral": [],
    "hermes": [],
}

# SPDX-License-Identifier: Apache-2.0
"""JSON schema utilities: $ref resolution/simplification, prompt
construction, balanced extraction, truncated-JSON repair, validation.

Mirrors the behavioral pieces of the reference's constrained/ package
(schema simplification + $ref resolve constrained/json_schema_processor.py:97-265;
balanced scanning + repair api/tool_calling.py:459-584)."""

from __future__ import annotations

import json
import logging
from typing import Any, Dict, List, Optional, Tuple

logger = logging.getLogger(__name__)


# ------------------------------------------------------------- simplification
def simplify_schema(schema: Dict[str, Any]) -> Dict[str, Any]:
    """Resolve local $refs and drop annotation-only keys."""
    defs = {}
    for key in ("$defs", "definitions"):
        defs.update(schema.get(key, {}) or {})

    def resolve(node: Any, depth: int = 0) -> Any:
        if depth > 12:
            return {}
        if isinstance(node, dict):
            if "$ref" in node:
                ref = node["$ref"]
                name = ref.rsplit("/", 1)[-1]
                target = defs.get(name)
                if target is not None:
                    merged = {
                        k: v for k, v in node.items() if k != "$ref"
                    }
                    resolved = resolve(target, depth + 1)
                    if isinstance(resolved, dict):
                        resolved = {**resolved, **merged}
                    return resolved
                return {}
            return {
                k: resolve(v, depth + 1)
                for k, v in node.items()
                if k not in ("$defs", "definitions", "$schema", "$id")
            }
        if isinstance(node, list):
            return [resolve(v, depth + 1) for v in node]
        return node

    return resolve(schema)


# ------------------------------------------------------------------- prompting
def build_json_system_prompt(schema: Optional[Dict[str, Any]] = None) -> str:
    """System-prompt guidance for JSON output (reference
    api/tool_calling.py:876 builds the equivalent)."""
    if schema:
        simple = simplify_schema(schema)
        return (
            "You must respond with a single valid JSON object that "
            "conforms exactly to this JSON schema, with no extra text, "
            "no markdown fences, and no explanations:\n"
            f"{json.dumps(simple, ensure_ascii=False)}"
        )
    return (
        "You must respond with a single valid JSON object. Output only "
        "the JSON — no extra text, no markdown fences, no explanations."
    )


# ------------------------------------------------------------------ extraction
def extract_json(text: str) -> Optional[str]:
    """First balanced JSON value in text (fences stripped), repaired if
    truncated. Returns the JSON string or None."""
    from ..tool_parsers.abstract_tool_parser import scan_balanced_json

    work = text.strip()
    if work.startswith("```"):
        first_nl = work.find("\n")
        if first_nl != -1:
            work = work[first_nl + 1:]
        if work.rstrip().endswith("```"):
            work = work.rstrip()[:-3]
    span = scan_balanced_json(work, 0)
    if span is not None:
        candidate = work[span[0]: span[1]]
        try:
            json.loads(candidate)
            return candidate
        except json.JSONDecodeError:
            pass
    # truncated output: repair from the first opener
    start = min(
        [i for i in (work.find("{"), work.find("[")) if i != -1],
        default=-1,
    )
    if start == -1:
        return None
    repaired = repair_json(work[start:])
    try:
        json.loads(repaired)
        return repaired
    except json.JSONDecodeError:
        return None


def repair_json(fragment: str) -> str:
    """Close unterminated strings/objects/arrays of a truncated JSON
    fragment (reference api/tool_calling.py truncated-JSON repair)."""
    stack: List[str] = []
    in_str = False
    esc = False
    last_valid = len(fragment)
    for c in fragment:
        if in_str:
            if esc:
                esc = False
            elif c == "\\":
                esc = True
            elif c == '"':
                in_str = False
            continue
        if c == '"':
            in_str = True
        elif c in "{[":
            stack.append(c)
        elif c in "}]":
            if stack:
                stack.pop()
    out = fragment
    if esc:
        out = out[:-1]
    if in_str:
        out += '"'
    # drop a trailing comma / colon dangling before closers
    stripped = out.rstrip()
    if stripped.endswith((",", ":")):
        out = stripped[:-1]
    for opener in reversed(stack):
        out += "}" if opener == "{" else "]"
    return out


# ------------------------------------------------------------------ validation
def validate_against_schema(
    obj: Any, schema: Dict[str, Any], path: str = "$"
) -> List[str]:
    """Minimal JSON-schema validator. Returns a list of error strings."""
    errors: List[str] = []
    schema = schema or {}
    if "const" in schema:
        if obj != schema["const"]:
            errors.append(f"{path}: expected const {schema['const']!r}")
        return errors
    if "enum" in schema:
        if obj not in schema["enum"]:
            errors.append(f"{path}: {obj!r} not in enum")
        return errors
    stype = schema.get("type")
    if isinstance(stype, list):
        sub_errors = []
        for t in stype:
            e = validate_against_schema(obj, {**schema, "type": t}, path)
            if not e:
                return []
            sub_errors = e
        return sub_errors
    if stype == "object":
        if not isinstance(obj, dict):
            return [f"{path}: expected object"]
        props = schema.get("properties", {})
        for req in schema.get("required", []):
            if req not in obj:
                errors.append(f"{path}: missing required {req!r}")
        for k, v in obj.items():
            if k in props:
                errors.extend(
                    validate_against_schema(v, props[k], f"{path}.{k}")
                )
            elif schema.get("additionalProperties") is False:
                errors.append(f"{path}: unexpected property {k!r}")
    elif stype == "array":
        if not isinstance(obj, list):
            return [f"{path}: expected array"]
        items = schema.get("items")
        if isinstance(items, dict):
            for i, v in enumerate(obj):
                errors.extend(
                    validate_against_schema(v, items, f"{path}[{i}]")
                )
        if "minItems" in schema and len(obj) < schema["minItems"]:
            errors.append(f"{path}: fewer than {schema['minItems']} items")
        if "maxItems" in schema and len(obj) > schema["maxItems"]:
            errors.append(f"{path}: more than {schema['maxItems']} items")
    elif stype == "string":
        if not isinstance(obj, str):
            errors.append(f"{path}: expected string")
    elif stype == "number":
        if not isinstance(obj, (int, float)) or isinstance(obj, bool):
            errors.append(f"{path}: expected number")
    elif stype == "integer":
        if not isinstance(obj, int) or isinstance(obj, bool):
            errors.append(f"{path}: expected integer")
    elif stype == "boolean":
        if not isinstance(obj, bool):
            errors.append(f"{path}: expected boolean")
    elif stype == "null":
        if obj is not None:
            errors.append(f"{path}: expected null")
    return errors

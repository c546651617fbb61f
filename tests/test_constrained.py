# SPDX-License-Identifier: Apache-2.0
"""Structured-output utilities: schema simplification, extraction,
truncated-JSON repair, validation."""

import json

from vllm_mlx_tpu.constrained import (
    build_json_system_prompt,
    extract_json,
    repair_json,
    simplify_schema,
    validate_against_schema,
)


class TestSimplify:
    def test_ref_resolution(self):
        schema = {
            "type": "object",
            "properties": {"addr": {"$ref": "#/$defs/Address"}},
            "$defs": {
                "Address": {
                    "type": "object",
                    "properties": {"city": {"type": "string"}},
                }
            },
        }
        s = simplify_schema(schema)
        assert s["properties"]["addr"]["type"] == "object"
        assert "$defs" not in s

    def test_recursive_ref_bounded(self):
        schema = {
            "$defs": {"Node": {"$ref": "#/$defs/Node"}},
            "$ref": "#/$defs/Node",
        }
        simplify_schema(schema)  # must not hang


class TestExtractRepair:
    def test_clean(self):
        assert extract_json('{"a": 1}') == '{"a": 1}'

    def test_fenced(self):
        assert (
            extract_json('```json\n{"a": 1}\n```') == '{"a": 1}'
        )

    def test_prefixed_text(self):
        out = extract_json('Sure, here it is: {"a": [1, 2]} hope that helps')
        assert json.loads(out) == {"a": [1, 2]}

    def test_truncated_object(self):
        out = extract_json('{"a": 1, "b": {"c": [1, 2')
        assert json.loads(out) == {"a": 1, "b": {"c": [1, 2]}}

    def test_truncated_string(self):
        out = extract_json('{"name": "alice and bo')
        assert json.loads(out) == {"name": "alice and bo"}

    def test_trailing_comma_repair(self):
        assert json.loads(repair_json('{"a": 1,')) == {"a": 1}

    def test_no_json(self):
        assert extract_json("there is nothing here") is None


class TestValidate:
    SCHEMA = {
        "type": "object",
        "required": ["name", "age"],
        "properties": {
            "name": {"type": "string"},
            "age": {"type": "integer"},
            "tags": {"type": "array", "items": {"type": "string"}},
            "kind": {"enum": ["a", "b"]},
        },
        "additionalProperties": False,
    }

    def test_valid(self):
        obj = {"name": "x", "age": 3, "tags": ["t"], "kind": "a"}
        assert validate_against_schema(obj, self.SCHEMA) == []

    def test_missing_required(self):
        errs = validate_against_schema({"name": "x"}, self.SCHEMA)
        assert any("age" in e for e in errs)

    def test_wrong_types(self):
        errs = validate_against_schema(
            {"name": 5, "age": "old"}, self.SCHEMA
        )
        assert len(errs) >= 2

    def test_enum(self):
        errs = validate_against_schema(
            {"name": "x", "age": 1, "kind": "z"}, self.SCHEMA
        )
        assert any("enum" in e for e in errs)

    def test_additional_props(self):
        errs = validate_against_schema(
            {"name": "x", "age": 1, "zzz": 0}, self.SCHEMA
        )
        assert any("zzz" in e for e in errs)

    def test_bool_not_integer(self):
        errs = validate_against_schema(
            {"name": "x", "age": True}, self.SCHEMA
        )
        assert errs


def test_prompt_building():
    p = build_json_system_prompt({"type": "object"})
    assert "JSON schema" in p
    p2 = build_json_system_prompt(None)
    assert "valid JSON" in p2

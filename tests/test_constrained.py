# SPDX-License-Identifier: Apache-2.0
"""Structured-output utilities: schema simplification, extraction,
truncated-JSON repair, validation."""

import json

import numpy as np
import pytest

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


# ---------------------------------------------------------------- FSM layer
class TestJsonFsm:
    """Character-level FSM (reference: lm-format-enforcer semantics,
    constrained/json_schema_processor.py:645-913)."""

    def _accepts(self, fsm, text):
        st = fsm.initial()
        for ch in text:
            st = fsm.advance(st, ch)
            if st is None:
                return False
        return fsm.can_finish(st)

    def test_free_json(self):
        from vllm_mlx_tpu.constrained.fsm import JsonFsm

        f = JsonFsm(None)
        for t in ['{"a": 1}', '[1, 2.5, -3e2]', '"hi\\n"', "true", "null",
                  '{"x":{"y":[false]}} ', "0", "-0.5", "{}", "[]", '" "']:
            assert self._accepts(f, t), t
        for t in ["{a:1}", "[1,]", "01", "tru", '{"a" 1}', '"\\x"',
                  "{,}", "--1", "[1 2]", '{"a":1,}']:
            assert not self._accepts(f, t), t

    def test_schema_objects(self):
        from vllm_mlx_tpu.constrained.fsm import JsonFsm

        sch = {
            "type": "object",
            "properties": {
                "name": {"type": "string"},
                "age": {"type": "integer"},
                "tag": {"enum": ["a", "b"]},
            },
            "required": ["name", "age"],
            "additionalProperties": False,
        }
        f = JsonFsm(sch)
        assert self._accepts(f, '{"name": "bob", "age": 3}')
        assert self._accepts(f, '{"age": 3, "name": "x", "tag": "b"}')
        assert not self._accepts(f, '{"name": "bob"}')
        assert not self._accepts(f, '{"name": 1, "age": 3}')
        assert not self._accepts(f, '{"nope": 1, "name": "x", "age": 2}')
        assert not self._accepts(f, '{"tag": "c", "name": "x", "age": 2}')
        assert not self._accepts(f, '{"name": "x", "name": "y", "age": 1}')

    def test_schema_arrays_nested(self):
        from vllm_mlx_tpu.constrained.fsm import JsonFsm

        sch = {
            "type": "array",
            "items": {
                "type": "object",
                "properties": {"v": {"type": "number"}},
                "required": ["v"],
            },
            "minItems": 1,
            "maxItems": 2,
        }
        f = JsonFsm(sch)
        assert self._accepts(f, '[{"v": 1.5}]')
        assert self._accepts(f, '[{"v": 1}, {"v": -2e3}]')
        assert not self._accepts(f, "[]")
        assert not self._accepts(f, '[{"v":1},{"v":2},{"v":3}]')
        assert not self._accepts(f, '[{"v": "s"}]')

    def test_anyof_and_const(self):
        from vllm_mlx_tpu.constrained.fsm import JsonFsm

        f = JsonFsm({"anyOf": [{"type": "string"}, {"type": "null"}]})
        assert self._accepts(f, '"x"') and self._accepts(f, "null")
        assert not self._accepts(f, "1")
        f2 = JsonFsm({"const": 42})
        assert self._accepts(f2, "42") and not self._accepts(f2, "43")


class TestTokenEnforcer:
    @pytest.fixture(scope="class")
    def tok(self):
        from tokenizers import (
            Tokenizer, decoders, models, pre_tokenizers, trainers,
        )
        from transformers import PreTrainedTokenizerFast

        t = Tokenizer(models.BPE(unk_token=None))
        t.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
        t.decoder = decoders.ByteLevel()
        trainer = trainers.BpeTrainer(
            vocab_size=300, special_tokens=["</s>"],
            initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
        )
        t.train_from_iterator(
            ['{"name": "bob", "age": 3}', '{"x": [1, 2.5, true]}'] * 4,
            trainer,
        )
        return PreTrainedTokenizerFast(
            tokenizer_object=t, eos_token="</s>", pad_token="</s>"
        )

    def test_mask_walk_yields_valid_json(self, tok):
        """Random walks under the mask: every terminating walk must parse
        and validate (free strings are legitimately unbounded, so a walk
        that never closes its string just doesn't terminate — that's the
        FSM being honest, not a bug)."""
        import json

        from vllm_mlx_tpu.constrained.fsm import JsonTokenEnforcer

        sch = {
            "type": "object",
            "properties": {
                "name": {"type": "string"},
                "age": {"type": "integer"},
            },
            "required": ["name", "age"],
            "additionalProperties": False,
        }
        enf = JsonTokenEnforcer(tok, sch)
        completed = 0
        for seed in range(6):
            rng = np.random.default_rng(seed)
            st = enf.initial_state()
            ids = []
            for _ in range(300):
                mask = enf.allowed_mask(st)
                assert mask.any()
                allowed = np.flatnonzero(mask)
                pick = int(rng.choice(allowed))
                if pick == tok.eos_token_id:
                    break
                ids.append(pick)
                st = enf.advance(st, pick)
            else:
                continue  # didn't terminate under this seed
            completed += 1
            obj = json.loads(tok.decode(ids))
            assert set(obj) == {"name", "age"}
            assert isinstance(obj["name"], str)
            assert isinstance(obj["age"], int) and not isinstance(obj["age"], bool)
        assert completed >= 2, "too few walks terminated"

    def test_mask_cache_hits(self, tok):
        from vllm_mlx_tpu.constrained.fsm import JsonTokenEnforcer

        enf = JsonTokenEnforcer(tok, None)
        st = enf.initial_state()
        m1 = enf.allowed_mask(st)
        m2 = enf.allowed_mask(st)
        assert m1 is m2  # cached object


class TestFsmLengthBounds:
    def _accepts(self, fsm, text):
        st = fsm.initial()
        for ch in text:
            st = fsm.advance(st, ch)
            if st is None:
                return False
        return fsm.can_finish(st)

    def test_string_max_min_length(self):
        from vllm_mlx_tpu.constrained.fsm import JsonFsm

        f = JsonFsm({"type": "string", "minLength": 2, "maxLength": 4})
        assert self._accepts(f, '"ab"') and self._accepts(f, '"abcd"')
        assert not self._accepts(f, '"a"')
        assert not self._accepts(f, '"abcde"')

    def test_number_length_cap(self):
        from vllm_mlx_tpu.constrained.fsm import JsonFsm

        f = JsonFsm({"type": "number"})
        assert self._accepts(f, "1" * 20)
        assert not self._accepts(f, "1" * 30)

    def test_filler_whitespace_capped(self):
        from vllm_mlx_tpu.constrained.fsm import JsonFsm

        f = JsonFsm(None)
        assert self._accepts(f, "  1")
        assert not self._accepts(f, "    1")  # > MAX_FILLER_WS
        # whitespace inside strings is content, never capped
        assert self._accepts(f, '"      lots   of   space      "')

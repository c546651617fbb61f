# SPDX-License-Identifier: Apache-2.0
"""FSM-constrained JSON decoding: character-level schema FSM + token
trie -> per-state vocabulary allow-masks for the fused sampler.

TPU-native equivalent of the reference's lm-format-enforcer integration
(reference constrained/json_schema_processor.py:645-913 allow-mask
logits, constrained/cache.py:136 token-trie caching): the reference
filters logits through a Python processor per request per step; here a
state's allowed-token set is computed once (trie x FSM walk), cached,
and shipped to the device as a packed bitmask consumed by
``sample_tokens(allow_mask=...)``.

States are small immutable tuples (a stack of parse frames), crucially
*position-independent* — the state inside a string body or between
object members does not grow with consumed text — so a generation
revisits a handful of states and the mask cache converges quickly.

Supported schema subset (after ``simplify_schema`` $ref resolution):
``type`` (object/array/string/number/integer/boolean/null, or a list),
``properties``/``required``/``additionalProperties``, ``items``,
``minItems``/``maxItems``, ``enum``/``const``, ``anyOf``/``oneOf``.
Unknown/absent constraints fall back to "any JSON value".
"""

from __future__ import annotations

import json
import threading
from typing import Any, Dict, FrozenSet, List, Optional, Tuple

import numpy as np

WS = " \t\n\r"
DIGITS = "0123456789"
HEX = "0123456789abcdefABCDEF"
# characters a free-form string body accepts (anything except the
# terminator/escape and raw control chars; non-ASCII included)
_CTRL = set(chr(c) for c in range(0x20))

State = Tuple  # tuple of frames; () = complete document


# --------------------------------------------------------------- schema IR
class _Node:
    __slots__ = (
        "kinds", "props", "required", "additional", "items",
        "min_items", "max_items", "enum", "idx", "min_len", "max_len",
    )

    def __init__(self) -> None:
        self.kinds: Tuple[str, ...] = ()
        self.props: Dict[str, int] = {}
        self.required: FrozenSet[str] = frozenset()
        self.additional: Optional[int] = None  # node idx or None(=forbid)
        self.items: Optional[int] = None
        self.min_items = 0
        self.max_items: Optional[int] = None
        self.enum: Optional[Tuple[str, ...]] = None  # JSON-encoded literals
        self.idx = 0
        self.min_len = 0  # string minLength
        self.max_len: Optional[int] = None  # string maxLength


_ANY_KINDS = (
    "object", "array", "string", "number", "boolean", "null"
)


def _compile_schema(schema: Optional[Dict[str, Any]]) -> List[_Node]:
    """Flatten a (simplified) schema into an indexed node table. anyOf is
    expanded into a union node whose kinds/branches merge."""
    nodes: List[_Node] = []

    def add(sc: Any) -> int:
        n = _Node()
        n.idx = len(nodes)
        nodes.append(n)
        if not isinstance(sc, dict) or not sc:
            n.kinds = _ANY_KINDS
            n.additional = n.idx
            n.items = n.idx
            return n.idx
        if "const" in sc:
            n.enum = (json.dumps(sc["const"], ensure_ascii=False),)
            n.kinds = ("enum",)
            return n.idx
        if "enum" in sc:
            n.enum = tuple(
                json.dumps(v, ensure_ascii=False) for v in sc["enum"]
            )
            n.kinds = ("enum",)
            return n.idx
        variants = sc.get("anyOf") or sc.get("oneOf")
        if variants:
            # union: treat as enum of sub-nodes via a synthetic "union"
            n.kinds = ("union",)
            n.props = {str(i): add(v) for i, v in enumerate(variants)}
            return n.idx
        t = sc.get("type")
        kinds: Tuple[str, ...]
        if t is None:
            kinds = _ANY_KINDS
        elif isinstance(t, list):
            kinds = tuple(t)
        else:
            kinds = (str(t),)
        n.kinds = kinds
        if "object" in kinds:
            props = sc.get("properties") or {}
            n.props = {k: add(v) for k, v in props.items()}
            n.required = frozenset(sc.get("required") or ())
            ap = sc.get("additionalProperties", not props)
            if ap is False:
                n.additional = None
            elif ap is True or ap is None:
                n.additional = add({}) if props else n.idx
            else:
                n.additional = add(ap)
            if not props and n.additional is None:
                n.additional = add({})
        if "string" in kinds:
            n.min_len = int(sc.get("minLength") or 0)
            ml = sc.get("maxLength")
            n.max_len = int(ml) if ml is not None else None
        if "array" in kinds:
            n.items = add(sc.get("items") or {})
            n.min_items = int(sc.get("minItems") or 0)
            mx = sc.get("maxItems")
            n.max_items = int(mx) if mx is not None else None
        return n.idx

    add(schema if schema is not None else {})
    return nodes


# ----------------------------------------------------------------- the FSM
class JsonFsm:
    """Character-level FSM for schema-constrained JSON.

    ``advance(state, ch)`` returns the next state or ``None`` (rejected).
    ``()`` (empty stack) means the document is complete; only EOS (and
    trailing whitespace) may follow.
    """

    def __init__(self, schema: Optional[Dict[str, Any]] = None) -> None:
        from .json_schema import simplify_schema

        self.nodes = _compile_schema(
            simplify_schema(schema) if schema else None
        )

    # frame constructors (plain tuples -> hashable states)
    # ("value", node)                    expecting a value of node
    # ("ws_then", frame)                 skip ws then the frame
    # ("str_body", node|-1)              inside a free string
    # ("str_esc", node|-1)               after backslash
    # ("str_hex", k, node|-1)            \uXXXX with k digits left
    # ("lit", "remaining")               fixed char sequence
    # ("num", phase)  phases: "int1","int","frac0","frac","exp0","exp1","exp"
    # ("obj", node, done_keys, phase)    phase: "first","key","colon","sep"
    # ("key", node, done, "prefix")      matching a property name
    # ("arr", node, count, phase)        phase: "first","sep"
    # ("enum", node, variant_mask, pos)  fixed-literal alternatives

    # -- helpers ----------------------------------------------------------
    def _start_value(
        self, node_idx: int, rest: State, ch: str
    ) -> Optional[State]:
        """Consume ``ch`` as the first char of a value of ``node_idx``."""
        n = self.nodes[node_idx]
        if ch in WS:
            return (("value", node_idx),) + rest
        outs: Optional[State] = None
        if "union" in n.kinds:
            for sub in n.props.values():
                outs = self._start_value(sub, rest, ch)
                if outs is not None:
                    return outs
            return None
        if "enum" in n.kinds and n.enum is not None:
            alive = tuple(
                lit for lit in n.enum if lit and lit[0] == ch
            )
            if not alive:
                return None
            done = any(len(lit) == 1 for lit in alive)
            remaining = tuple(lit[1:] for lit in alive if len(lit) > 1)
            if remaining:
                return (("enumlit", remaining),) + rest
            return rest if done else None
        if ch == "{" and "object" in n.kinds:
            return (("obj", node_idx, frozenset(), "first"),) + rest
        if ch == "[" and "array" in n.kinds:
            return (("arr", node_idx, 0, "first"),) + rest
        if ch == '"' and "string" in n.kinds:
            if n.max_len is not None or n.min_len:
                return (("str_body", node_idx, 0),) + rest
            return (("str_body", -1),) + rest
        if "number" in n.kinds or "integer" in n.kinds:
            is_int = "number" not in n.kinds
            if ch == "-":
                return (("num", "int1", is_int, 1),) + rest
            if ch in DIGITS:
                if ch == "0":
                    return (("num", "frac0", is_int, 1),) + rest
                return (("num", "int", is_int, 1),) + rest
        if ch == "t" and "boolean" in n.kinds:
            return (("lit", "rue"),) + rest
        if ch == "f" and "boolean" in n.kinds:
            return (("lit", "alse"),) + rest
        if ch == "n" and "null" in n.kinds:
            return (("lit", "ull"),) + rest
        return None

    def _num_can_end(self, phase: str) -> bool:
        return phase in ("int", "frac0", "frac", "exp")

    # -- main transition ---------------------------------------------------
    # Public states are (ws_run, frames): ``ws_run`` counts consecutive
    # *filler* whitespace (between values/members, or after the closed
    # document) and is capped so a random/greedy model can't loop on
    # whitespace tokens forever. Whitespace inside strings is content
    # and never capped.
    MAX_FILLER_WS = 2
    MAX_NUM_LEN = 24  # hard cap: greedy digit loops must terminate
    _FILLER_KINDS = ("value", "obj", "arr", "arrval", "colon")

    def initial(self) -> State:
        return (0, (("value", 0),))

    def advance(self, state: State, ch: str) -> Optional[State]:
        ws_run, frames = state
        filler = ch in WS and (
            not frames or frames[0][0] in self._FILLER_KINDS
        )
        if filler and ws_run >= self.MAX_FILLER_WS:
            return None
        nxt = self._advance_frames(frames, ch)
        if nxt is None:
            return None
        return (ws_run + 1 if filler else 0, nxt)

    def can_finish(self, state: State) -> bool:
        return self._frames_can_finish(state[1])

    def is_closed(self, state: State) -> bool:
        return not state[1]

    def _advance_frames(self, state: Tuple, ch: str) -> Optional[Tuple]:
        if not state:
            return state if ch in WS else None
        frame, rest = state[0], state[1:]
        kind = frame[0]

        if kind == "value":
            return self._start_value(frame[1], rest, ch)

        if kind == "enumlit":
            alive = tuple(r for r in frame[1] if r and r[0] == ch)
            ended = any(r == ch for r in frame[1])
            remaining = tuple(r[1:] for r in alive if len(r) > 1)
            if remaining:
                return (("enumlit", remaining),) + rest
            return rest if ended else None

        if kind == "lit":
            remaining = frame[1]
            if remaining and ch == remaining[0]:
                if len(remaining) == 1:
                    return rest
                return (("lit", remaining[1:]),) + rest
            return None

        if kind == "str_body":
            bounded = len(frame) == 3
            node = self.nodes[frame[1]] if bounded else None
            if ch == '"':
                if bounded and frame[2] < node.min_len:
                    return None
                return rest
            if bounded and node.max_len is not None and (
                frame[2] >= node.max_len
            ):
                return None
            if ch == "\\":
                return (("str_esc",) + frame[1:],) + rest
            if ch in _CTRL:
                return None
            if bounded:
                return (("str_body", frame[1], frame[2] + 1),) + rest
            return state

        if kind == "str_esc":
            nxt_body = (
                ("str_body", frame[1], frame[2] + 1)
                if len(frame) == 3
                else ("str_body", frame[1])
            )
            if ch in '"\\/bfnrt':
                return (nxt_body,) + rest
            if ch == "u":
                return (("str_hex", 4, nxt_body),) + rest
            return None

        if kind == "str_hex":
            if ch in HEX:
                k = frame[1] - 1
                if k == 0:
                    return (frame[2],) + rest
                return (("str_hex", k, frame[2]),) + rest
            return None

        if kind == "num":
            phase, is_int, cnt = frame[1], frame[2], frame[3]
            if cnt >= self.MAX_NUM_LEN and ch not in ",]}" and ch not in WS:
                return None

            def nf(ph):
                return (("num", ph, is_int, cnt + 1),) + rest

            if phase == "int1":  # after '-': need a digit
                if ch == "0":
                    return nf("frac0")
                if ch in DIGITS:
                    return nf("int")
                return None
            if phase in ("int", "frac0"):
                if phase == "int" and ch in DIGITS:
                    return nf("int")
                if not is_int:
                    if ch == ".":
                        return nf("fracd")
                    if ch in "eE":
                        return nf("exp0")
                return self._end_number(rest, ch)
            if phase == "fracd":  # need >=1 fraction digit
                return nf("frac") if ch in DIGITS else None
            if phase == "frac":
                if ch in DIGITS:
                    return nf("frac")
                if ch in "eE":
                    return nf("exp0")
                return self._end_number(rest, ch)
            if phase == "exp0":
                if ch in "+-":
                    return nf("exp1")
                return nf("exp") if ch in DIGITS else None
            if phase == "exp1":
                return nf("exp") if ch in DIGITS else None
            if phase == "exp":
                if ch in DIGITS:
                    return nf("exp")
                return self._end_number(rest, ch)
            return None

        if kind == "obj":
            node, done, phase = frame[1], frame[2], frame[3]
            n = self.nodes[node]
            if ch in WS:
                return state
            if phase == "first":
                if ch == "}" and not (n.required - done):
                    return rest
                if ch == '"':
                    return (("key", node, done, ""),) + rest
                return None
            if phase == "key":
                if ch == '"':
                    return (("key", node, done, ""),) + rest
                return None
            if phase == "sep":
                if ch == "," :
                    # more members possible?
                    if self._open_keys(n, done):
                        return (("obj", node, done, "key"),) + rest
                    return None
                if ch == "}" and not (n.required - done):
                    return rest
                return None
            return None

        if kind == "key":
            node, done, prefix = frame[1], frame[2], frame[3]
            n = self.nodes[node]
            if ch == '"':
                # key complete: must be a full open property (or free key
                # under additionalProperties)
                if prefix in n.props and prefix not in done:
                    vnode = n.props[prefix]
                elif n.additional is not None and prefix not in n.props:
                    vnode = n.additional
                else:
                    return None
                return (
                    ("colon", node, done | {prefix}, vnode),
                ) + rest
            new = prefix + ch
            if n.additional is not None:
                if ch == "\\":  # free keys may escape; bail to simple mode
                    return None
                if ch in _CTRL:
                    return None
                return (("key", node, done, new),) + rest
            # strict keys: must extend some unused property name
            if any(
                k.startswith(new) and k not in done for k in n.props
            ):
                return (("key", node, done, new),) + rest
            return None

        if kind == "colon":
            node, done, vnode = frame[1], frame[2], frame[3]
            if ch in WS:
                return state
            if ch == ":":
                return (
                    ("value", vnode),
                    ("obj", node, done, "sep"),
                ) + rest
            return None

        if kind == "arr":
            node, count, phase = frame[1], frame[2], frame[3]
            n = self.nodes[node]
            if ch in WS:
                return state
            if phase == "first":
                if ch == "]" and count >= n.min_items:
                    return rest
                if n.max_items is not None and count >= n.max_items:
                    return None
                nxt = self._start_value(
                    n.items if n.items is not None else 0,
                    (("arr", node, count + 1, "sep"),) + rest,
                    ch,
                )
                return nxt
            if phase == "sep":
                if ch == ",":
                    if n.max_items is not None and count >= n.max_items:
                        return None
                    return (("arrval", node, count),) + rest
                if ch == "]" and count >= n.min_items:
                    return rest
                return None
            return None

        if kind == "arrval":
            node, count = frame[1], frame[2]
            n = self.nodes[node]
            if ch in WS:
                return state
            return self._start_value(
                n.items if n.items is not None else 0,
                (("arr", node, count + 1, "sep"),) + rest,
                ch,
            )

        return None

    def _open_keys(self, n: _Node, done: FrozenSet[str]) -> bool:
        if n.additional is not None:
            return True
        return any(k not in done for k in n.props)

    def _end_number(self, rest: State, ch: str) -> Optional[State]:
        """A number ended by a delimiter: re-dispatch ``ch`` to the
        continuation (the popped stack)."""
        return self._advance_frames(rest, ch)

    def _frames_can_finish(self, frames: Tuple) -> bool:
        """True if the document is already complete, or completes after
        popping finished number frames."""
        if not frames:
            return True
        if frames[0][0] == "num" and self._num_can_end(frames[0][1]):
            return not frames[1:]
        return False


# ------------------------------------------------------------- token layer
class _Trie:
    __slots__ = ("children", "token_ids")

    def __init__(self) -> None:
        self.children: Dict[str, "_Trie"] = {}
        self.token_ids: List[int] = []


_TRIE_CACHE: Dict[int, Tuple[_Trie, List[Optional[str]]]] = {}
_TRIE_LOCK = threading.Lock()


def _token_strings(tokenizer) -> List[Optional[str]]:
    """Per-id decoded text; specials map to None (never allowed except
    EOS, which is handled separately)."""
    vocab_size = len(tokenizer)
    special = set(getattr(tokenizer, "all_special_ids", []) or [])
    out: List[Optional[str]] = [None] * vocab_size
    # batch-decode one id at a time via convert_ids_to_tokens fast path
    for tid in range(vocab_size):
        if tid in special:
            continue
        try:
            s = tokenizer.decode([tid])
        except Exception:
            continue
        if s:
            out[tid] = s
    return out


def build_token_trie(tokenizer) -> Tuple[_Trie, List[Optional[str]]]:
    """(trie, per-id strings) — built once per tokenizer and cached."""
    key = id(tokenizer)
    with _TRIE_LOCK:
        hit = _TRIE_CACHE.get(key)
        if hit is not None:
            return hit
    strings = _token_strings(tokenizer)
    root = _Trie()
    for tid, s in enumerate(strings):
        if s is None:
            continue
        node = root
        for ch in s:
            nxt = node.children.get(ch)
            if nxt is None:
                nxt = node.children[ch] = _Trie()
            node = nxt
        node.token_ids.append(tid)
    with _TRIE_LOCK:
        _TRIE_CACHE[key] = (root, strings)
    return root, strings


class JsonTokenEnforcer:
    """Schema-valid token masks for one tokenizer+schema pair.

    ``allowed_mask(state)`` -> bool[vocab]; ``advance(state, token_id)``
    -> next state (or the same state, rejecting, if the token wasn't
    legal — callers should only feed sampled tokens that were masked).
    """

    def __init__(
        self,
        tokenizer,
        schema: Optional[Dict[str, Any]] = None,
        eos_ids: Optional[List[int]] = None,
        max_cache: int = 2048,
    ) -> None:
        self.fsm = JsonFsm(schema)
        self.tokenizer = tokenizer
        self.vocab_size = len(tokenizer)
        self.trie, self._token_str = build_token_trie(tokenizer)
        self.eos_ids = list(eos_ids or [])
        if not self.eos_ids and tokenizer.eos_token_id is not None:
            self.eos_ids = [tokenizer.eos_token_id]
        self._mask_cache: Dict[State, np.ndarray] = {}
        self._max_cache = max_cache

    def initial_state(self) -> State:
        return self.fsm.initial()

    def advance(self, state: State, token_id: int) -> State:
        s = self._token_str[token_id] if token_id < self.vocab_size else None
        if s is None:
            return state
        cur: Optional[State] = state
        for ch in s:
            nxt = self.fsm.advance(cur, ch)
            if nxt is None:
                return cur  # shouldn't happen for masked samples
            cur = nxt
        return cur

    def is_complete(self, state: State) -> bool:
        return self.fsm.can_finish(state)

    def allowed_mask(self, state: State) -> np.ndarray:
        cached = self._mask_cache.get(state)
        if cached is not None:
            return cached
        mask = np.zeros(self.vocab_size, dtype=bool)
        if self.fsm.is_closed(state):
            # document fully closed: force EOS (whitespace padding would
            # otherwise run to the token cap)
            for e in self.eos_ids:
                if e < self.vocab_size:
                    mask[e] = True
            self._mask_cache[state] = mask
            return mask

        # iterative DFS over (trie node, fsm state)
        stack = [(self.trie, state)]
        while stack:
            node, st = stack.pop()
            for ch, child in node.children.items():
                nxt = self.fsm.advance(st, ch)
                if nxt is None:
                    continue
                if child.token_ids:
                    for tid in child.token_ids:
                        mask[tid] = True
                if child.children:
                    stack.append((child, nxt))
        if self.fsm.can_finish(state):
            for e in self.eos_ids:
                if e < self.vocab_size:
                    mask[e] = True
        if not mask.any():
            # dead end (shouldn't happen): allow EOS so the request
            # terminates instead of hanging
            for e in self.eos_ids:
                if e < self.vocab_size:
                    mask[e] = True
        if len(self._mask_cache) >= self._max_cache:
            self._mask_cache.pop(next(iter(self._mask_cache)))
        self._mask_cache[state] = mask
        return mask

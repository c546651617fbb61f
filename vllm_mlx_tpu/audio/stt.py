# SPDX-License-Identifier: Apache-2.0
"""Speech-to-text engine (reference audio/stt.py:32 ``STTEngine`` over
mlx-audio Whisper).

TPU-native pipeline: 30 s segments are batched — mel frontend + encoder
run once over all segments, then ONE batched greedy decode loop with a
dense self-attention KV cache serves every segment in parallel. Long
audio therefore costs ~(encoder + longest-transcript decode), which is
what makes RTF > 100x reachable (BASELINE.md north star).
"""

from __future__ import annotations

import functools
import logging
import time
from typing import Any, Dict, List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from .mel import (
    N_SAMPLES,
    SAMPLE_RATE,
    load_wav,
    log_mel_spectrogram,
    pad_or_trim,
)

logger = logging.getLogger(__name__)

MAX_NEW_TOKENS = 224


class STTEngine:
    def __init__(self, model_path: str, dtype: str = "float32") -> None:
        self.model_path = model_path
        self.dtype = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
        self._loaded = False
        self.cfg = None
        self.params = None
        self.tokenizer = None

    def load(self) -> "STTEngine":
        if self._loaded:
            return self
        import json as _json
        import os as _os

        try:
            with open(_os.path.join(self.model_path, "config.json")) as f:
                mt = _json.load(f).get("model_type", "")
        except OSError:
            mt = ""
        if mt in ("parakeet_ctc", "parakeet_tdt"):
            # FastConformer encoder + CTC/TDT decoding — the
            # architecture the reference benchmarks as parakeet
            # (models/parakeet.py)
            from ..models.parakeet import ParakeetSTT

            self._backend = ParakeetSTT(
                self.model_path, dtype=self.dtype
            ).load()
            self.tokenizer = self._backend.tokenizer
            self._loaded = True
            logger.info("parakeet (%s) loaded: %s", mt, self.model_path)
            return self
        self._backend = None
        from ..models.whisper import (
            WhisperConfig,
            load_whisper_params,
        )

        t0 = time.time()
        self.cfg = WhisperConfig.from_pretrained(self.model_path)
        self.params = load_whisper_params(
            self.model_path, self.cfg, dtype=self.dtype
        )
        from transformers import AutoTokenizer

        try:
            self.tokenizer = AutoTokenizer.from_pretrained(
                self.model_path, local_files_only=True
            )
        except (OSError, TypeError, ValueError) as e:
            # checkpoint without tokenizer files (e.g. RTF benching on a
            # weights-only export): decode to raw token ids
            logger.warning("no tokenizer at %s (%s); using id decoder",
                           self.model_path, e)

            class _IdTokenizer:
                def convert_tokens_to_ids(self, tok):
                    return None

                def decode(self, ids, skip_special_tokens=True):
                    return " ".join(str(i) for i in ids)

            self.tokenizer = _IdTokenizer()
        self._build_jits()
        self._loaded = True
        logger.info("whisper loaded in %.1fs: %s", time.time() - t0, self.model_path)
        return self

    @property
    def is_loaded(self) -> bool:
        return self._loaded

    def _build_jits(self) -> None:
        from ..models import whisper as wh

        cfg = self.cfg

        @jax.jit
        def _encode(params, mel):
            enc = wh.encode(params, cfg, mel)
            return enc, wh.decoder_cross_kv(params, cfg, enc)

        @functools.partial(jax.jit, donate_argnums=(3,))
        def _prefill(params, tokens, cross_kv, self_kv):
            logits, self_kv = wh.decode_step(
                params, cfg, tokens, jnp.int32(0), self_kv, cross_kv,
                jnp.int32(0),
            )
            return logits[:, -1], self_kv

        @functools.partial(jax.jit, donate_argnums=(4,))
        def _step(params, tokens, pos, cross_kv, self_kv, suppress_mask):
            logits, self_kv = wh.decode_step(
                params, cfg, tokens[:, None], pos, self_kv, cross_kv, pos
            )
            lg = logits[:, -1] + suppress_mask
            nxt = jnp.argmax(lg, axis=-1).astype(jnp.int32)
            return nxt, self_kv

        @functools.partial(
            jax.jit, donate_argnums=(4,), static_argnames=("steps",)
        )
        def _multi_step(
            params, tokens, pos, cross_kv, self_kv, suppress_mask,
            steps=16,
        ):
            # bundled greedy decode: every host round-trip costs ~30 ms
            # on this platform (NOTES_TPU_ENV.md), so chain ``steps``
            # decoder steps in ONE program and fetch one token block —
            # the same trick as the LLM engine's decode_fast_multi
            def body(carry, _):
                nxt, pos_, kv = carry
                logits, kv = wh.decode_step(
                    params, cfg, nxt[:, None], pos_, kv, cross_kv, pos_
                )
                nxt2 = jnp.argmax(
                    logits[:, -1] + suppress_mask, axis=-1
                ).astype(jnp.int32)
                return (nxt2, pos_ + 1, kv), nxt2

            (nxt, pos, self_kv), toks = jax.lax.scan(
                body, (tokens, pos, self_kv), None, length=steps,
                unroll=min(8, steps),  # scan-iteration overhead is
                # significant on this platform (see decode_fast_multi)
            )
            return nxt, toks, self_kv  # toks: [steps, B]

        self._encode_jit = _encode
        self._prefill_jit = _prefill
        self._step_jit = _step
        self._multi_step_jit = _multi_step

    # ------------------------------------------------------------- prompting
    def _prompt_tokens(self, language: Optional[str]) -> List[int]:
        cfg = self.cfg
        prompt = [cfg.decoder_start_token_id]
        forced = {idx: tok for idx, tok in (cfg.forced_decoder_ids or [])}
        if language:
            lang_tok = self.tokenizer.convert_tokens_to_ids(
                f"<|{language}|>"
            )
            if lang_tok is not None and lang_tok >= 0:
                forced[1] = lang_tok
        for i in sorted(forced):
            prompt.append(forced[i])
        if len(prompt) == 1:
            # no generation config: assume en/transcribe/notimestamps
            for tok_name in ("<|en|>", "<|transcribe|>", "<|notimestamps|>"):
                t = self.tokenizer.convert_tokens_to_ids(tok_name)
                if isinstance(t, int) and t > 0:
                    prompt.append(t)
        return prompt

    def _suppress_mask(self) -> np.ndarray:
        mask = np.zeros(self.cfg.vocab_size, np.float32)
        for t in self.cfg.suppress_tokens or []:
            if 0 <= t < self.cfg.vocab_size:
                mask[t] = -1e9
        return mask

    # ------------------------------------------------------------ transcribe
    def transcribe(
        self,
        audio: Union[str, np.ndarray],
        *,
        language: Optional[str] = None,
        max_new_tokens: int = MAX_NEW_TOKENS,
    ) -> Dict[str, Any]:
        if not self._loaded:
            self.load()
        if getattr(self, "_backend", None) is not None:
            return self._backend.transcribe(
                audio, language=language, max_new_tokens=max_new_tokens
            )
        from ..models.whisper import init_self_kv

        t0 = time.time()
        if isinstance(audio, str):
            audio = load_wav(audio)
        audio = np.asarray(audio, np.float32)
        duration = len(audio) / SAMPLE_RATE
        n_seg = max(1, -(-len(audio) // N_SAMPLES))
        segs = np.stack(
            [
                pad_or_trim(audio[i * N_SAMPLES : (i + 1) * N_SAMPLES])
                for i in range(n_seg)
            ]
        )
        # pad batch to a power of two to bound compile variants
        b = 1
        while b < n_seg:
            b *= 2
        if b > n_seg:
            segs = np.concatenate(
                [segs, np.zeros((b - n_seg, N_SAMPLES), np.float32)]
            )
        mel = log_mel_spectrogram(
            jnp.asarray(segs), n_mels=self.cfg.num_mel_bins
        ).astype(self.dtype)
        _, cross_kv = self._encode_jit(self.params, mel)

        prompt = self._prompt_tokens(language)
        self_kv = init_self_kv(self.cfg, b, dtype=self.dtype)
        tokens = jnp.asarray(np.tile(prompt, (b, 1)).astype(np.int32))
        last_logits, self_kv = self._prefill_jit(
            self.params, tokens, cross_kv, self_kv
        )
        suppress = jnp.asarray(self._suppress_mask())
        begin = jnp.asarray(self._suppress_mask())
        for t in self.cfg.begin_suppress_tokens or []:
            begin = begin.at[t].set(-1e9)
        nxt = jnp.argmax(last_logits + begin, axis=-1).astype(jnp.int32)

        eos = self.cfg.eos_token_id
        out_tokens = [np.asarray(nxt)]
        pos = len(prompt)
        max_steps = min(
            max_new_tokens, self.cfg.max_target_positions - len(prompt) - 1
        )
        finished = np.asarray(out_tokens[0]) == eos
        bundle = 16
        done = 1
        pending = []  # dispatched-but-unfetched token blocks
        while done < max_steps and not finished.all():
            steps = min(bundle, max_steps - done)
            nxt, toks, self_kv = self._multi_step_jit(
                self.params, nxt, jnp.int32(pos), cross_kv, self_kv,
                suppress, steps=steps,
            )
            pos += steps
            done += steps
            pending.append(toks)
            if len(pending) >= 2:
                # fetch the OLDER bundle while the newer one computes —
                # the fetch sync never stalls the device (EOS detection
                # lags one bundle; over-decoded tokens are discarded)
                block = np.asarray(pending.pop(0))
                for r in range(block.shape[0]):
                    out_tokens.append(block[r])
                    finished |= block[r] == eos
        for toks in pending:
            block = np.asarray(toks)
            for r in range(block.shape[0]):
                out_tokens.append(block[r])
                finished |= block[r] == eos
        toks = np.stack(out_tokens, axis=1)  # [B, steps]
        texts = []
        for i in range(n_seg):
            row = toks[i]
            end = np.where(row == eos)[0]
            row = row[: end[0]] if len(end) else row
            texts.append(
                self.tokenizer.decode(row.tolist(), skip_special_tokens=True)
            )
        wall = time.time() - t0
        text = "".join(texts).strip()
        return {
            "text": text,
            "segments": texts,
            "duration": duration,
            "language": language,
            "wall_time": wall,
            "rtf": duration / wall if wall > 0 else 0.0,
        }

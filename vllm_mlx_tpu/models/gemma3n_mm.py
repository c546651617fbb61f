# SPDX-License-Identifier: Apache-2.0
"""Gemma-3n multimodal serving wrapper (HF ``Gemma3nForConditional-
Generation``) — the reference's "Gemma 4 … (vision + audio)" row
(reference docs/reference/models.md:38).

Native AUDIO-in-chat: the USM conformer tower (models/gemma3n_audio.py)
encodes waveforms into soft tokens, embedded into text space by the
multimodal embedder and padded to the processor's fixed 188-token
sequence; soft rows flow to the unified engine as embeds-override rows
(same contract as models/mllm.MultimodalLM). Hard multimodal ids
(boa/eoa/boi/eoi and friends, ids >= the media vocab offsets) are
embedded INSIDE the text forward via id routing, so decode-time special
tokens match HF exactly.

VISION: HF's tower is timm MobileNetV5 (absent from this image — no
oracle); `models/gemma3n_vision.py` carries a best-effort
reconstruction with timm-compatible naming. Checkpoints whose tower
layout matches load and serve images natively; mismatches fail loud
at load with the full key diff, and image requests then fail loud
with that reason (text+audio keep serving). Everything downstream of
the tower — sqrt(C) scaling, soft-token embedder, placeholder
filling, generation — is HF-parity-tested with a stub tower.
"""

from __future__ import annotations

import json
import math
import os
from functools import partial
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from .gemma3n_audio import (
    Gemma3nAudioCfg,
    embed_hard,
    embed_soft,
    encode,
    gemma3n_mel,
    load_audio_params,
    load_embedder_params,
)

Params = Dict[str, Any]


class Gemma3nMultimodalLM:
    """Gemma-3n audio+text served through the unified engine."""

    supports_audio = True

    def __init__(self, model_path: str, dtype: Optional[str] = None) -> None:
        self.model_path = model_path
        self._dtype = dtype
        self._loaded = False

    def load(self) -> "Gemma3nMultimodalLM":
        if self._loaded:
            return self
        from . import gemma3n_text

        with open(os.path.join(self.model_path, "config.json")) as f:
            cfg = json.load(f)
        self.cfg = ModelConfig.from_hf_config(cfg["text_config"])
        self.audio_cfg = Gemma3nAudioCfg.from_hf(cfg.get("audio_config", {}))
        vision_cfg = cfg.get("vision_config", {})
        self.audio_token_id = cfg.get("audio_token_id", 262_273)
        self.image_token_id = cfg.get("image_token_id", 262_145)
        self.boa_token_id = cfg.get("boa_token_id", 256_000)
        self.eoa_token_id = cfg.get("eoa_token_id", 262_272)
        self.audio_seq_len = cfg.get("audio_soft_tokens_per_image", 188)
        self.vision_vocab_offset = vision_cfg.get("vocab_offset", 262_144)
        self.vision_vocab_size = vision_cfg.get("vocab_size", 128)
        self.boi_token_id = cfg.get("boi_token_id", 255_999)
        self.eoi_token_id = cfg.get("eoi_token_id", 262_144)
        self.image_seq_len = cfg.get("vision_soft_tokens_per_image", 256)
        from .gemma3n_vision import Gemma3nVisionCfg

        self.vision_cfg = Gemma3nVisionCfg(
            hidden_size=vision_cfg.get("hidden_size", 2048),
            # HF keeps the input size in preprocessor_config.json, not
            # the vision config; 768 is the released models' size
            image_size=vision_cfg.get("image_size", 768),
            rms_norm_eps=vision_cfg.get("rms_norm_eps", 1e-6),
            vocab_offset=self.vision_vocab_offset,
            vocab_size=self.vision_vocab_size,
            soft_tokens_per_image=self.image_seq_len,
        )
        # wire the id-routing geometry into the text stack (decode-time
        # hard embedding; models/gemma3n_text.py forward)
        self.cfg.gemma3n_cfg.update(
            vision_vocab_offset=self.vision_vocab_offset,
            audio_vocab_offset=self.audio_cfg.vocab_offset,
            audio_vocab_size=self.audio_cfg.vocab_size,
            mm_rms_eps=self.audio_cfg.rms_norm_eps,
        )

        jdt = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[
            self._dtype or self.cfg.dtype
        ]
        from . import loader

        tower: Dict[str, np.ndarray] = {}
        vis_tower_t: Dict[str, np.ndarray] = {}
        embed_audio_t: Dict[str, np.ndarray] = {}
        embed_vision_t: Dict[str, np.ndarray] = {}
        for name, tensor in loader.iter_safetensors(self.model_path):
            if "audio_tower." in name:
                tower[name.split("audio_tower.", 1)[1]] = tensor
            elif "vision_tower." in name:
                vn = name.split("vision_tower.", 1)[1]
                if vn.startswith("timm_model."):
                    vn = vn[len("timm_model."):]
                vis_tower_t[vn] = tensor
            elif "embed_audio." in name:
                embed_audio_t[name.split("embed_audio.", 1)[1]] = tensor
            elif "embed_vision." in name:
                embed_vision_t[name.split("embed_vision.", 1)[1]] = tensor
        self.audio_params = load_audio_params(tower, self.audio_cfg, jdt)
        # vision tower: load if the checkpoint layout matches the
        # MobileNetV5 reconstruction; remember the reason if not, so
        # image requests fail loud with it (text+audio keep serving)
        self.vision_params = None
        self.vision_error: Optional[str] = (
            "checkpoint has no vision tower weights"
        )
        if vis_tower_t:
            from .gemma3n_vision import load_vision_params

            try:
                self.vision_params = load_vision_params(
                    vis_tower_t, self.vision_cfg, jdt
                )
                self.vision_error = None
            except ValueError as e:  # layout mismatch — fail loud later
                self.vision_error = str(e)
        self.params = gemma3n_text.load_text_params(
            self.model_path, self.cfg, self._dtype
        )
        self.params["embed_audio"] = load_embedder_params(embed_audio_t, jdt)
        self.params["embed_vision"] = load_embedder_params(
            embed_vision_t, jdt
        )
        self._encode_jit = jax.jit(partial(encode, cfg=self.audio_cfg))
        self._embed_soft_jit = jax.jit(
            partial(embed_soft, eps=self.audio_cfg.rms_norm_eps)
        )
        from .gemma3n_vision import encode_image as _vis_encode

        self._vis_encode_jit = jax.jit(
            partial(_vis_encode, cfg=self.vision_cfg)
        )
        self._embed_vis_soft_jit = jax.jit(
            partial(embed_soft, eps=self.vision_cfg.rms_norm_eps)
        )
        self._loaded = True
        return self

    @property
    def text_config(self) -> ModelConfig:
        return self.cfg

    @property
    def lm_params(self) -> Params:
        return self.params

    # --------------------------------------------------------------- encoding
    def encode_audio(
        self, audio: np.ndarray, sample_rate: int = 16_000
    ) -> np.ndarray:
        """Waveform -> EXACTLY audio_seq_len (188) soft rows [L, H_text]:
        encoder output embedded into text space, padded with the
        embedding of the last audio-vocab id (HF Gemma3nModel.forward
        padding semantics)."""
        mel, valid = gemma3n_mel(
            np.asarray(audio, np.float32),
            n_mels=self.audio_cfg.input_feat_size,
        )
        # static-shape bucket: pad the mel time axis to a multiple of
        # 128 frames so repeat calls reuse compiled shapes
        t = mel.shape[0]
        t_pad = max(128, -(-t // 128) * 128)
        mel_p = np.zeros((1, t_pad, mel.shape[1]), np.float32)
        mel_p[0, :t] = mel
        valid_p = np.zeros((1, t_pad), bool)
        valid_p[0, :t] = valid
        enc, enc_valid = self._encode_jit(
            self.audio_params, mel=jnp.asarray(mel_p),
            valid=jnp.asarray(valid_p),
        )
        feats = self._embed_soft_jit(self.params["embed_audio"], enc[0])
        n_valid = int(np.asarray(jnp.sum(enc_valid[0])))
        feats = np.asarray(feats[:n_valid], np.float32)
        if feats.shape[0] >= self.audio_seq_len:
            return feats[: self.audio_seq_len]
        pad_row = np.asarray(
            embed_hard(
                self.params["embed_audio"],
                jnp.asarray(
                    [self.audio_cfg.vocab_offset
                     + self.audio_cfg.vocab_size - 1]
                ),
                self.audio_cfg.vocab_offset,
                self.audio_cfg.rms_norm_eps,
            ),
            np.float32,
        )
        pad = np.repeat(pad_row, self.audio_seq_len - feats.shape[0], axis=0)
        return np.concatenate([feats, pad], axis=0)

    def embed_image_features(self, feats: np.ndarray) -> np.ndarray:
        """Tower-space features [N, C_vision] -> soft rows [N, H_text]
        (HF get_image_features: scale by sqrt(C), then the multimodal
        embedder's soft path)."""
        scaled = jnp.asarray(feats, jnp.float32) * math.sqrt(
            self.vision_cfg.hidden_size
        )
        return np.asarray(
            self._embed_vis_soft_jit(self.params["embed_vision"], scaled),
            np.float32,
        )

    def encode_image(self, pixels: np.ndarray) -> np.ndarray:
        """pixel_values [3, S, S] (SigLIP-normalized NCHW) -> EXACTLY
        image_seq_len (256) soft rows [L, H_text]."""
        if self.vision_params is None:
            raise NotImplementedError(
                "Gemma-3n image input unavailable for this checkpoint: "
                f"{self.vision_error}"
            )
        feats = self._vis_encode_jit(
            self.vision_params, jnp.asarray(pixels, jnp.float32)[None]
        )[0]
        return self.embed_image_features(np.asarray(feats, np.float32))

    # --------------------------------------------------------- prompt building
    def expand_image_tokens(self, tokenizer, prompt: str) -> str:
        """HF Gemma3nProcessor: each image placeholder becomes
        ``\\n\\n<start_of_image> + 256 soft tokens + <end_of_image>\\n\\n``."""
        img_tok = tokenizer.convert_ids_to_tokens(self.image_token_id)
        boi = tokenizer.convert_ids_to_tokens(self.boi_token_id)
        eoi = tokenizer.convert_ids_to_tokens(self.eoi_token_id)
        if not img_tok or img_tok not in prompt:
            return prompt  # tokenizer/prompt without image tokens
        full = f"\n\n{boi or ''}{img_tok * self.image_seq_len}{eoi or ''}\n\n"
        return prompt.replace(img_tok, full)

    def expand_audio_tokens(self, tokenizer, prompt: str) -> str:
        """HF Gemma3nProcessor: each audio placeholder becomes
        ``\\n\\n<start_of_audio> + 188 soft tokens + <end_of_audio>\\n\\n``."""
        audio_tok = tokenizer.convert_ids_to_tokens(self.audio_token_id)
        boa = tokenizer.convert_ids_to_tokens(self.boa_token_id)
        eoa = tokenizer.convert_ids_to_tokens(self.eoa_token_id)
        if not audio_tok or audio_tok not in prompt:
            return prompt  # tokenizer/prompt without audio tokens
        full = f"\n\n{boa or ''}{audio_tok * self.audio_seq_len}{eoa or ''}\n\n"
        return prompt.replace(audio_tok, full)

    def build_multimodal_prompt(
        self,
        token_ids: List[int],
        media_features: List[np.ndarray],
        media_kinds: Optional[List[str]] = None,
    ) -> Tuple[List[int], np.ndarray, np.ndarray]:
        """Fill each placeholder run (188-token audio / 256-token image)
        with its feature rows, in prompt order. Hard multimodal ids need
        NO override rows — the text forward embeds them by id. Returns
        (ids, embeds [T, H], mask)."""
        kinds = media_kinds or ["audio"] * len(media_features)
        seq_len = {"audio": self.audio_seq_len, "image": self.image_seq_len}
        tok_of = {
            "audio": self.audio_token_id, "image": self.image_token_id,
        }
        h = self.cfg.hidden_size
        ids = list(token_ids)
        embeds = np.zeros((len(ids), h), np.float32)
        mask = np.zeros(len(ids), bool)
        mi = 0
        i = 0
        placeholder_ids = set(tok_of.values())
        while i < len(ids):
            if ids[i] in placeholder_ids and mi < len(media_features):
                kind = kinds[mi]
                if ids[i] != tok_of[kind]:
                    raise ValueError(
                        f"media #{mi} is {kind} but the next placeholder "
                        f"run in the prompt is id {ids[i]}"
                    )
                feats = media_features[mi]
                run = 0
                while (
                    i + run < len(ids)
                    and ids[i + run] == ids[i]
                    and run < feats.shape[0]
                ):
                    embeds[i + run] = feats[run]
                    mask[i + run] = True
                    run += 1
                if run != seq_len[kind]:
                    raise ValueError(
                        f"{kind} placeholder run of {run} tokens != "
                        f"{kind}_seq_len {seq_len[kind]}"
                    )
                mi += 1
                i += run
            else:
                i += 1
        if mi != len(media_features):
            raise ValueError(
                f"{len(media_features)} media items but only {mi} "
                "placeholder runs in the prompt"
            )
        return ids, embeds, mask

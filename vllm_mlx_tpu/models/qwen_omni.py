# SPDX-License-Identifier: Apache-2.0
"""Qwen2.5-Omni (thinker half): audio+vision+video chat with TMRoPE.

The reference serves omni checkpoints through mlx-vlm with explicit
omni-model handling — A/V fusion from video, sound_clips/input_features
forwarding (reference vllm_mlx/models/mllm.py:964,1304,1578-1618). The
TPU build owns the towers (HF ``Qwen2_5OmniThinkerForConditional
Generation`` parity):

* **audio tower** — Whisper-style convs applied per 2-second window
  (``n_window*2`` mel frames per chunk, independently zero-padded),
  sinusoid positions reset per chunk, bidirectional attention
  block-diagonal WITHIN each chunk, then AvgPool1d(2) -> LayerNorm ->
  Linear into the LM embedding space;
* **vision tower** — exactly the Qwen2.5-VL window-attention ViT
  (reused from models/qwen_vl.py: permutation bookkeeping host-side,
  dense segment-masked attention on device);
* **TMRoPE** — M-RoPE where temporal positions advance in ABSOLUTE
  time units (``position_id_per_seconds`` = 25/s): audio tokens are
  1-D runs (40 ms each), video frame positions scale by
  ``second_per_grid``, and with ``use_audio_in_video`` the video and
  audio token runs are INTERLEAVED in 2-second chunks sharing the
  same temporal axis (HF ``get_rope_index``, modeling_qwen2_5_omni.py:189);
* the **talker / token2wav** speech-out stack is intentionally not
  served — speech output requests fail loud (the thinker half is the
  serving-relevant component; reference deployments stream text).

TPU mapping: all host bookkeeping (chunking, gather indices, position
tables) is tiny numpy; device programs are dense MXU matmuls with
segment-mask attention, jitted per shape bucket. Audio of a given mel
length and images of a given patch count reuse compiled variants, and
encoded features are content-hash cached by the engine.
"""

from __future__ import annotations

import json
import logging
import math
import os
from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..ops.layers import linear
from .qwen_vl import (
    QwenVLVisionConfig,
    load_qwen_vl_vision_params,
    prepare_vision_inputs,
    vision_encode,
)
from .whisper import _attn_block, _gelu, _ln

logger = logging.getLogger(__name__)

Params = Dict[str, Any]


# ------------------------------------------------------------ audio encoder
@dataclass
class OmniAudioConfig:
    num_mel_bins: int = 128
    d_model: int = 1280
    encoder_layers: int = 32
    encoder_attention_heads: int = 20
    encoder_ffn_dim: int = 5120
    max_source_positions: int = 1500
    n_window: int = 100
    output_dim: int = 3584

    @property
    def chunk_mel(self) -> int:
        return self.n_window * 2  # mel frames per window

    @classmethod
    def from_hf(cls, cfg: Dict[str, Any]) -> "OmniAudioConfig":
        return cls(
            num_mel_bins=cfg.get("num_mel_bins", 128),
            d_model=cfg.get("d_model", 1280),
            encoder_layers=cfg.get("encoder_layers", 32),
            encoder_attention_heads=cfg.get("encoder_attention_heads", 20),
            encoder_ffn_dim=cfg.get("encoder_ffn_dim", 5120),
            max_source_positions=cfg.get("max_source_positions", 1500),
            n_window=cfg.get("n_window", 100),
            output_dim=cfg.get("output_dim", 3584),
        )


def audio_out_len(mel_len: int) -> int:
    """Placeholder-token count for ``mel_len`` valid mel frames (HF
    ``_get_feat_extract_output_lengths``: conv stride 2, then pool 2)."""
    aftercnn = (mel_len - 1) // 2 + 1
    return (aftercnn - 2) // 2 + 1


def sinusoid_positions(length: int, channels: int) -> np.ndarray:
    """HF SinusoidsPositionEmbedding (modeling_qwen2_5_omni.py:683)."""
    inc = math.log(10000) / (channels // 2 - 1)
    inv = np.exp(-inc * np.arange(channels // 2, dtype=np.float32))
    t = np.arange(length, dtype=np.float32)[:, None] * inv[None, :]
    return np.concatenate([np.sin(t), np.cos(t)], axis=1)


def prepare_audio_chunks(
    mel: np.ndarray, cfg: OmniAudioConfig
) -> Dict[str, np.ndarray]:
    """Split one audio's mel [n_mels, L] into independently padded
    2-second windows + the gather/segment bookkeeping for the encoder
    (HF chunks then pads each; conv padding sees zeros at chunk edges)."""
    n_mels, mel_len = mel.shape
    cm = cfg.chunk_mel
    n_chunks = -(-mel_len // cm)
    lens = [cm] * (n_chunks - 1) + [mel_len - cm * (n_chunks - 1)]
    chunks = np.zeros((n_chunks, cm, n_mels), np.float32)
    for i, ln in enumerate(lens):
        chunks[i, :ln] = mel[:, i * cm : i * cm + ln].T
    conv_lens = [(ln - 1) // 2 + 1 for ln in lens]
    half = cm // 2
    gather = np.concatenate(
        [np.arange(cl) + i * half for i, cl in enumerate(conv_lens)]
    ).astype(np.int32)
    seg = np.repeat(
        np.arange(n_chunks, dtype=np.int32), np.asarray(conv_lens)
    )
    return {
        "chunks": chunks,
        "mel_lens": np.asarray(lens, np.int32),
        "gather": gather,
        "seg": seg,
    }


def omni_audio_encode(
    params: Params,
    cfg: OmniAudioConfig,
    chunks: jax.Array,  # [n_chunks, chunk_mel, n_mels]
    mel_lens: jax.Array,  # [n_chunks] valid mel frames per chunk
    gather: jax.Array,  # [N] flat index of valid post-conv rows
    seg: jax.Array,  # [N] chunk id per valid row
) -> jax.Array:
    """One audio's windows -> projected features [N//2, output_dim]."""
    enc = params["encoder"]
    x = jax.lax.conv_general_dilated(
        chunks.astype(jnp.float32),
        enc["conv1_w"].astype(jnp.float32),
        window_strides=(1,),
        padding=((1, 1),),
        dimension_numbers=("NWC", "OIW", "NWC"),
    ) + enc["conv1_b"]
    # HF masks conv1's output at mel resolution before conv2
    valid = (
        jnp.arange(chunks.shape[1])[None, :] < mel_lens[:, None]
    )
    x = _gelu(x) * valid[:, :, None]
    x = jax.lax.conv_general_dilated(
        x,
        enc["conv2_w"].astype(jnp.float32),
        window_strides=(2,),
        padding=((1, 1),),
        dimension_numbers=("NWC", "OIW", "NWC"),
    ) + enc["conv2_b"]
    x = _gelu(x).astype(chunks.dtype)
    x = x + enc["pos"][None, : x.shape[1]]
    x = x.reshape(-1, cfg.d_model)[gather][None]  # [1, N, D]
    mask = jnp.where(
        seg[:, None] == seg[None, :], 0.0, -1e30
    )[None, None].astype(jnp.float32)
    for p in enc["layers"]:
        h = _ln(x, p["ln1_w"], p["ln1_b"])
        x = x + _attn_block(
            p["self"], h, h, cfg.encoder_attention_heads, mask=mask
        )
        h = _ln(x, p["ln2_w"], p["ln2_b"])
        h = _gelu(linear(h, p["fc1_w"], p["fc1_b"]))
        x = x + linear(h, p["fc2_w"], p["fc2_b"])
    x = x[0]
    n = x.shape[0]
    x = x[: (n // 2) * 2].reshape(n // 2, 2, -1).mean(axis=1)
    x = _ln(x, enc["ln_w"], enc["ln_b"])
    return linear(x, params["proj_w"], params["proj_b"])


def load_omni_audio_params(
    tensors: Dict[str, np.ndarray], cfg: OmniAudioConfig, dtype=jnp.float32
) -> Params:
    """Map ``audio_tower.``-relative HF tensors; k_proj carries no bias
    (modeling_qwen2_5_omni.py:576)."""
    layers: List[Dict] = [dict() for _ in range(cfg.encoder_layers)]
    enc: Params = {"layers": layers}
    params: Params = {"encoder": enc}

    def put(t):
        return jnp.asarray(np.asarray(t)).astype(dtype)

    for name, t in tensors.items():
        if name == "conv1.weight":
            enc["conv1_w"] = put(t)
        elif name == "conv1.bias":
            enc["conv1_b"] = put(t)
        elif name == "conv2.weight":
            enc["conv2_w"] = put(t)
        elif name == "conv2.bias":
            enc["conv2_b"] = put(t)
        elif name == "ln_post.weight":
            enc["ln_w"] = put(t)
        elif name == "ln_post.bias":
            enc["ln_b"] = put(t)
        elif name == "proj.weight":
            params["proj_w"] = put(t)
        elif name == "proj.bias":
            params["proj_b"] = put(t)
        elif name.startswith("layers."):
            parts = name.split(".")
            i = int(parts[1])
            rest = ".".join(parts[2:])
            ld = layers[i]
            key = {
                "self_attn_layer_norm.weight": "ln1_w",
                "self_attn_layer_norm.bias": "ln1_b",
                "final_layer_norm.weight": "ln2_w",
                "final_layer_norm.bias": "ln2_b",
                "fc1.weight": "fc1_w",
                "fc1.bias": "fc1_b",
                "fc2.weight": "fc2_w",
                "fc2.bias": "fc2_b",
            }.get(rest)
            if key:
                ld[key] = put(t)
            elif rest.startswith("self_attn."):
                sub = rest[len("self_attn."):]
                proj, kind = sub.rsplit(".", 1)
                amap = {
                    "q_proj": "q", "k_proj": "k",
                    "v_proj": "v", "out_proj": "o",
                }
                if proj in amap:
                    ld.setdefault("self", {})[
                        f"{amap[proj]}_{'w' if kind == 'weight' else 'b'}"
                    ] = put(t)
    enc["pos"] = jnp.asarray(
        sinusoid_positions(cfg.max_source_positions, cfg.d_model)
    ).astype(dtype)
    return params


# --------------------------------------------------------------- TMRoPE
def _chunk_spans(values: np.ndarray, per_chunk: int) -> List[Tuple[int, int]]:
    """(start, end) index spans where ``values`` fall in successive
    ``per_chunk`` ranges (HF get_chunked_index)."""
    spans: List[Tuple[int, int]] = []
    start, current = 0, 1
    for i, v in enumerate(values):
        if v >= current * per_chunk:
            spans.append((start, i))
            start = i
            current += 1
    spans.append((start, len(values)))
    return spans


def _vision_grid_positions(
    grid: Tuple[int, int, int], merge: int, t_index: np.ndarray
) -> np.ndarray:
    """[3, t*lh*lw] (t, h, w) positions (HF get_llm_pos_ids_for_vision,
    without the start offset)."""
    t, h, w = grid
    lh, lw = h // merge, w // merge
    tp = np.repeat(t_index.astype(np.int64), lh * lw)
    hp = np.tile(np.repeat(np.arange(lh, dtype=np.int64), lw), t)
    wp = np.tile(np.arange(lw, dtype=np.int64), t * lh)
    return np.stack([tp, hp, wp])


def compute_omni_positions(
    token_ids: Sequence[int],
    events: List[Dict[str, Any]],
    *,
    image_token_id: int,
    video_token_id: int,
    audio_token_id: int,
    merge: int = 2,
    position_id_per_seconds: int = 25,
    seconds_per_chunk: float = 2.0,
) -> Tuple[np.ndarray, int]:
    """TMRoPE positions for an EXPANDED omni prompt (HF get_rope_index,
    modeling_qwen2_5_omni.py:189-468, single sequence).

    ``events``: ordered media descriptors matching placeholder runs:
    {"kind": "audio", "len": n} |
    {"kind": "image", "grid": (t, h, w)} |
    {"kind": "video", "grid": ..., "second_per_grid": s} |
    {"kind": "video_audio", "grid": ..., "second_per_grid": s,
     "audio_len": n}  (use_audio_in_video interleave).

    Returns (positions [3, T] int32, decode position delta).
    """
    ids = np.asarray(token_ids, np.int64)
    n = len(ids)
    pos_list: List[np.ndarray] = []
    st = 0

    def st_idx() -> int:
        return int(pos_list[-1].max()) + 1 if pos_list else 0

    def text(k: int) -> None:
        if k > 0:
            s = st_idx()
            pos_list.append(
                np.broadcast_to(np.arange(s, s + k, dtype=np.int64), (3, k))
            )

    for ev in events:
        kind = ev["kind"]
        tok = {
            "audio": audio_token_id,
            "image": image_token_id,
            "video": video_token_id,
            "video_audio": video_token_id,
        }[kind]
        hits = np.nonzero(ids[st:] == tok)[0]
        if hits.size == 0:
            raise ValueError(
                f"no {kind} placeholder run found for media event"
            )
        run = st + int(hits[0])
        if kind == "audio":
            text(run - st - 1)  # text before the audio_bos token
            text(1)  # audio_bos
            text(ev["len"])  # audio rows: 1-D arange on all 3 axes
            text(1)  # audio_eos
            st = run + ev["len"] + 1
        elif kind in ("image", "video"):
            text(run - st - 1)
            text(1)  # vision_bos
            t = ev["grid"][0]
            if kind == "image":
                t_index = (
                    np.arange(t, dtype=np.int64) * position_id_per_seconds
                )
            else:
                # float multiply THEN truncate (HF .long() after the
                # float product — unlike Qwen2.5-VL which casts first)
                t_index = (
                    np.arange(t, dtype=np.float64)
                    * float(ev.get("second_per_grid", 1.0))
                    * position_id_per_seconds
                ).astype(np.int64)
            vp = _vision_grid_positions(ev["grid"], merge, t_index)
            pos_list.append(vp + st_idx())
            text(1)  # vision_eos
            st = run + vp.shape[1] + 1
        else:  # video_audio interleave
            text(run - st - 2)  # text before vision_bos + audio_bos
            s = st_idx()
            both = np.full((3, 1), s, np.int64)
            pos_list.append(both)  # vision_bos
            pos_list.append(both.copy())  # audio_bos (SAME position)
            s = st_idx()
            audio_len = ev["audio_len"]
            t = ev["grid"][0]
            t_index = (
                np.arange(t, dtype=np.float64)
                * float(ev.get("second_per_grid", 1.0))
                * position_id_per_seconds
            ).astype(np.int64)
            vp = _vision_grid_positions(ev["grid"], merge, t_index) + s
            ap = (
                np.broadcast_to(
                    np.arange(audio_len, dtype=np.int64), (3, audio_len)
                )
                + s
            )
            per_chunk = int(position_id_per_seconds * seconds_per_chunk)
            vs = _chunk_spans(vp[0] - s, per_chunk)
            asp = _chunk_spans(ap[0] - s, per_chunk)
            for j in range(max(len(vs), len(asp))):
                if j < len(vs):
                    pos_list.append(vp[:, vs[j][0] : vs[j][1]])
                if j < len(asp):
                    pos_list.append(ap[:, asp[j][0] : asp[j][1]])
            s = st_idx()
            eos = np.full((3, 1), s, np.int64)
            pos_list.append(eos)  # audio_eos
            pos_list.append(eos.copy())  # vision_eos (SAME position)
            st = run + audio_len + vp.shape[1] + 2
    text(n - st)
    positions = (
        np.concatenate(pos_list, axis=1)
        if pos_list
        else np.zeros((3, 0), np.int64)
    )
    if positions.shape[1] != n:
        raise ValueError(
            f"position count {positions.shape[1]} != prompt length {n}"
        )
    delta = int(positions.max()) + 1 - n if n else 0
    return positions.astype(np.int32), delta


def interleave_video_audio(
    video_len: int,
    audio_len: int,
    grid: Tuple[int, int, int],
    second_per_grid: float,
    merge: int = 2,
    position_id_per_seconds: int = 25,
    seconds_per_chunk: float = 2.0,
) -> List[Tuple[str, int, int]]:
    """2-second-chunk interleave order for use_audio_in_video (HF
    processor replace_multimodal_special_tokens,
    processing_qwen2_5_omni.py:248-282): [(kind, start, end), ...]
    slices into each modality's feature rows, video chunk first.

    The processor chunks on the FLOAT temporal values (no truncation —
    unlike get_rope_index's .long()); mirror exactly.
    """
    t, h, w = grid
    lh, lw = h // merge, w // merge
    tvals = np.repeat(
        np.arange(t, dtype=np.float64) * second_per_grid
        * position_id_per_seconds,
        lh * lw,
    )
    if len(tvals) != video_len:
        raise ValueError("video grid does not match feature rows")
    per_chunk = int(position_id_per_seconds * seconds_per_chunk)
    vs = _chunk_spans(tvals, per_chunk)
    asp = _chunk_spans(np.arange(audio_len, dtype=np.float64), per_chunk)
    out: List[Tuple[str, int, int]] = []
    for j in range(max(len(vs), len(asp))):
        if j < len(vs):
            out.append(("video", vs[j][0], vs[j][1]))
        if j < len(asp):
            out.append(("audio", asp[j][0], asp[j][1]))
    return out


# ------------------------------------------------------------------ the model
class QwenOmniModel:
    """Qwen2.5-Omni thinker: audio + vision towers feeding the unified
    engine's embeds-override rows with TMRoPE positions. Speech output
    (talker/token2wav) is out of scope and fails loud at load."""

    supports_audio = True

    def __init__(self, model_path: str, dtype: Optional[str] = None) -> None:
        self.model_path = model_path
        self._dtype = dtype
        self._loaded = False

    def load(self) -> "QwenOmniModel":
        if self._loaded:
            return self
        from . import loader

        with open(os.path.join(self.model_path, "config.json")) as f:
            raw = json.load(f)
        if raw.get("model_type") == "qwen2_5_omni":
            thinker = raw.get("thinker_config") or {}
        else:  # standalone qwen2_5_omni_thinker checkpoint
            thinker = raw
        text_cfg = thinker.get("text_config") or {}
        self.cfg = ModelConfig.from_hf_config(text_cfg)
        self.vision_cfg = QwenVLVisionConfig.from_hf_config(
            {
                **(thinker.get("vision_config") or {}),
                "model_type": "qwen2_5_omni_vision",
            },
            self.cfg.hidden_size,
        )
        self.audio_cfg = OmniAudioConfig.from_hf(
            thinker.get("audio_config") or {}
        )
        self.image_token_id = thinker.get("image_token_index", 151655)
        self.video_token_id = thinker.get("video_token_index", 151656)
        self.audio_token_id = thinker.get("audio_token_index", 151646)
        self.audio_start_token_id = thinker.get(
            "audio_start_token_id", 151647
        )
        self.audio_end_token_id = thinker.get("audio_end_token_id", 151648)
        self.vision_start_token_id = thinker.get(
            "vision_start_token_id", 151652
        )
        self.position_id_per_seconds = thinker.get(
            "position_id_per_seconds", 25
        )
        self.seconds_per_chunk = float(
            thinker.get("seconds_per_chunk", 2.0)
        )

        jdt = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[
            self._dtype or self.cfg.dtype
        ]
        vision_tensors: Dict[str, np.ndarray] = {}
        audio_tensors: Dict[str, np.ndarray] = {}
        for name, tensor in loader.iter_safetensors(self.model_path):
            if "visual." in name:
                vision_tensors[name.split("visual.", 1)[1]] = tensor
            elif "audio_tower." in name:
                audio_tensors[name.split("audio_tower.", 1)[1]] = tensor
        # omni's vision attention carries SEPARATE q/k/v linears
        # (modeling_qwen2_5_omni.py:900-902) where Qwen2.5-VL fuses
        # them; concat into the shared loader's qkv layout
        for i in range(self.vision_cfg.depth):
            for kind in ("weight", "bias"):
                parts = [
                    vision_tensors.pop(f"blocks.{i}.attn.{p}.{kind}", None)
                    for p in ("q", "k", "v")
                ]
                if all(p is not None for p in parts):
                    vision_tensors[f"blocks.{i}.attn.qkv.{kind}"] = (
                        np.concatenate(
                            [np.asarray(p) for p in parts], axis=0
                        )
                    )
        self.vision_params = load_qwen_vl_vision_params(
            vision_tensors, self.vision_cfg, dtype=jdt
        )
        self.audio_params = load_omni_audio_params(
            audio_tensors, self.audio_cfg, dtype=jdt
        )
        self.params = loader.load_params(
            self.model_path, self.cfg, dtype=self._dtype
        )
        self._encode_jits: Dict[Any, Any] = {}
        self._loaded = True
        return self

    @property
    def text_config(self) -> ModelConfig:
        return self.cfg

    @property
    def lm_params(self) -> Params:
        return self.params

    # --------------------------------------------------------------- encoding
    def encode_media(
        self, flatten_patches: np.ndarray, grid_thw: Tuple[int, int, int]
    ) -> np.ndarray:
        """One image/video clip -> merged vision features (natural
        order), via the shared Qwen-VL window-attention encoder."""
        prep = prepare_vision_inputs(
            self.vision_cfg, flatten_patches, [grid_thw]
        )
        key = ("v", prep["patches"].shape[0])
        fn = self._encode_jits.get(key)
        if fn is None:
            fn = jax.jit(partial(vision_encode, cfg=self.vision_cfg))
            self._encode_jits[key] = fn
        out = fn(
            self.vision_params,
            patches=jnp.asarray(prep["patches"]),
            cos=jnp.asarray(prep["cos"]),
            sin=jnp.asarray(prep["sin"]),
            full_seg=jnp.asarray(prep["full_seg"]),
            win_seg=jnp.asarray(prep["win_seg"]),
        )
        return np.asarray(out, np.float32)[prep["inverse"]]

    def encode_audio(
        self, audio: np.ndarray, sample_rate: int = 16000
    ) -> np.ndarray:
        """Waveform -> projected feature rows [audio_out_len, H_text]."""
        from ..audio.mel import log_mel_spectrogram, pad_or_trim

        max_mel = self.audio_cfg.max_source_positions * 2
        mel_len = min(-(-len(audio) // 160), max_mel)
        padded = pad_or_trim(
            np.asarray(audio, np.float32), max_mel * 160
        )
        mel = np.asarray(
            log_mel_spectrogram(
                jnp.asarray(padded[None]),
                n_mels=self.audio_cfg.num_mel_bins,
            )[0],
            np.float32,
        )[:, :mel_len]
        prep = prepare_audio_chunks(mel, self.audio_cfg)
        key = ("a", prep["chunks"].shape[0], prep["gather"].shape[0])
        fn = self._encode_jits.get(key)
        if fn is None:
            fn = jax.jit(partial(omni_audio_encode, cfg=self.audio_cfg))
            self._encode_jits[key] = fn
        out = fn(
            self.audio_params,
            chunks=jnp.asarray(prep["chunks"]),
            mel_lens=jnp.asarray(prep["mel_lens"]),
            gather=jnp.asarray(prep["gather"]),
            seg=jnp.asarray(prep["seg"]),
        )
        return np.asarray(out, np.float32)[: audio_out_len(mel_len)]

    # --------------------------------------------------------- prompt building
    def build_multimodal_prompt(
        self,
        token_ids: List[int],
        media: List[Dict[str, Any]],
    ) -> Tuple[List[int], np.ndarray, np.ndarray, np.ndarray, int]:
        """Expand placeholders (audio/image/video, incl. the
        use_audio_in_video interleave) and compute TMRoPE positions.

        ``media``: ordered descriptors, one per placeholder token:
        {"kind": "audio", "features": [n, H]} |
        {"kind": "image"|"video", "features": [n, H],
         "grid": (t, h, w), "second_per_grid": s} |
        {"kind": "video_audio", "features": ..., "grid": ...,
         "second_per_grid": s, "audio_features": [n, H]}.

        Returns (ids, prompt_embeds [T, H], embeds_mask [T],
        mrope_positions [3, T], mrope_delta).
        """
        h = self.cfg.hidden_size
        out_ids: List[int] = []
        rows: List[Optional[np.ndarray]] = []
        events: List[Dict[str, Any]] = []
        mi = 0
        placeholder = {
            self.audio_token_id,
            self.image_token_id,
            self.video_token_id,
        }

        def emit(tid: int, feats: Optional[np.ndarray] = None) -> None:
            if feats is None:
                out_ids.append(tid)
                rows.append(None)
            else:
                for r in range(feats.shape[0]):
                    out_ids.append(tid)
                    rows.append(feats[r])

        for tid in token_ids:
            if tid not in placeholder or mi >= len(media):
                emit(tid)
                continue
            m = media[mi]
            mi += 1
            kind = m["kind"]
            if kind == "audio":
                emit(self.audio_token_id, m["features"])
                events.append(
                    {"kind": "audio", "len": m["features"].shape[0]}
                )
            elif kind in ("image", "video"):
                emit(tid, m["features"])
                events.append(
                    {
                        "kind": kind,
                        "grid": m["grid"],
                        "second_per_grid": m.get("second_per_grid", 1.0),
                    }
                )
            elif kind == "video_audio":
                vfeats, afeats = m["features"], m["audio_features"]
                spans = interleave_video_audio(
                    vfeats.shape[0],
                    afeats.shape[0],
                    m["grid"],
                    m.get("second_per_grid", 1.0),
                    merge=self.vision_cfg.spatial_merge_size,
                    position_id_per_seconds=self.position_id_per_seconds,
                    seconds_per_chunk=self.seconds_per_chunk,
                )
                emit(self.audio_start_token_id)
                for mk, s, e in spans:
                    if mk == "video":
                        emit(self.video_token_id, vfeats[s:e])
                    else:
                        emit(self.audio_token_id, afeats[s:e])
                emit(self.audio_end_token_id)
                events.append(
                    {
                        "kind": "video_audio",
                        "grid": m["grid"],
                        "second_per_grid": m.get("second_per_grid", 1.0),
                        "audio_len": afeats.shape[0],
                    }
                )
            else:
                raise ValueError(f"unknown media kind {kind!r}")
        embeds = np.zeros((len(out_ids), h), np.float32)
        mask = np.zeros(len(out_ids), bool)
        for i, r in enumerate(rows):
            if r is not None:
                embeds[i] = r
                mask[i] = True
        positions, delta = compute_omni_positions(
            out_ids,
            events,
            image_token_id=self.image_token_id,
            video_token_id=self.video_token_id,
            audio_token_id=self.audio_token_id,
            merge=self.vision_cfg.spatial_merge_size,
            position_id_per_seconds=self.position_id_per_seconds,
            seconds_per_chunk=self.seconds_per_chunk,
        )
        return out_ids, embeds, mask, positions, delta


def is_qwen_omni_config(cfg: Dict[str, Any]) -> bool:
    return cfg.get("model_type", "") in (
        "qwen2_5_omni",
        "qwen2_5_omni_thinker",
    )

# SPDX-License-Identifier: Apache-2.0
"""Continuous-batching engine (reference engine/batched.py:178).

Loads a checkpoint into the unified TPU runner, starts the engine-core
thread, and exposes async generate/chat with chat templating. Unlike the
reference there is no mlx-lm BatchGenerator underneath — the scheduler
owns batching outright (SURVEY.md section 0.4).
"""

from __future__ import annotations

import asyncio
import logging
import os
import uuid
from typing import Any, AsyncIterator, Dict, List, Optional

from ..config import CacheConfig, ModelConfig, SchedulerConfig
from ..core.engine_core import AsyncEngineCore
from ..core.model_runner import (
    ModelRunner,
    enable_persistent_compilation_cache,
)
from ..core.output_collector import RequestStreamState
from ..core.request import Request, SamplingParams
from ..core.scheduler import Scheduler
from ..cache.prefix_cache import PrefixCache
from ..utils.tokenizer import (
    apply_chat_template,
    collect_eos_ids,
    load_tokenizer,
)
from .base import BaseEngine, GenerationOutput

logger = logging.getLogger(__name__)

def _media_spans(ids, mask, keys, counts):
    """Per-media (start_row, end_row, content_hash) spans over the
    expanded prompt (True runs of the embeds mask walked in media order,
    each claiming its own row count so adjacent media stay distinct) —
    the prefix-cache key material for multimodal prompts (reference
    mllm_cache.py image-hash keying)."""
    spans = []
    t = 0
    n = len(mask)
    for key, cnt in zip(keys, counts):
        while t < n and not mask[t]:
            t += 1
        if t >= n:
            break
        spans.append((t, t + cnt, key))
        t += cnt
    return spans or None


def _auto_num_blocks(
    cfg: ModelConfig, cache_cfg: CacheConfig, params,
    max_cached_tokens: int = 0,
) -> int:
    """Size the KV pool from free HBM x memory_utilization (the vLLM
    ``gpu_memory_utilization`` pattern; replaces the reference's Metal
    buffer-cache limits, reference engine/batched.py:513-541).

    ``max_cached_tokens``: optional cap on pool capacity in tokens
    (active sequences + prefix-cache headroom) — without it, a tiny
    model on a big chip gets a pool sized at millions of blocks, which
    both wastes HBM and (for toy head_dim/kv_heads) can exceed HBM
    outright because the estimate below is in LOGICAL bytes while the
    device pads the pool's trailing dims to its (sublane, 128-lane)
    tiles."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    itemsize = {
        "bfloat16": 2, "float32": 4,
        "fp8_e4m3": 1, "fp8_e5m2": 1, "int8": 1,
    }.get(cache_cfg.kv_dtype, 2)
    # physical pool layout is [pages, page, 2*kv_heads, head_dim]
    # (core/model_runner.py) — the device tiles the last two dims, so
    # estimate with them padded to (8, 128) multiples
    padded_pair = -(-2 * cfg.num_key_value_heads // 8) * 8
    padded_hd = -(-cfg.head_dim // 128) * 128
    bytes_per_block = (
        cfg.num_hidden_layers
        * cache_cfg.block_size
        * padded_pair
        * padded_hd
        * itemsize
    )
    total = None
    try:
        stats = jax.local_devices()[0].memory_stats()
        total = stats.get("bytes_limit") or stats.get("bytes_reservable_limit")
    except Exception:
        pass
    if not total:
        total = 16 * 1024**3 if jax.default_backend() == "tpu" else 2 * 1024**3
    param_bytes = sum(
        int(np.prod(p.shape)) * p.dtype.itemsize
        for p in jax.tree_util.tree_leaves(params)
    )
    budget = int(total * cache_cfg.memory_utilization) - param_bytes
    num = max(budget // bytes_per_block, 16)
    if max_cached_tokens:
        num = min(num, -(-max_cached_tokens // cache_cfg.block_size))
    logger.info(
        "auto KV pool: %d blocks (%.1f GB of %.1f GB HBM, params %.1f GB)",
        num,
        num * bytes_per_block / 1e9,
        total / 1e9,
        param_bytes / 1e9,
    )
    return int(num)


_UNSET = object()

_SAMPLING_KEYS = {
    "max_tokens", "temperature", "top_p", "top_k", "min_p",
    "presence_penalty", "repetition_penalty", "stop", "stop_token_ids",
    "logprobs", "seed", "logits_processors",
}


class BatchedEngine(BaseEngine):
    def __init__(
        self,
        model_path: str,
        *,
        model_config: Optional[ModelConfig] = None,
        cache_config: Optional[CacheConfig] = None,
        scheduler_config: Optional[SchedulerConfig] = None,
        enable_prefix_cache: bool = True,
        stream_interval: int = 1,
        seed: int = 0,
        params: Any = None,
        quantization: Optional[str] = None,  # None | "int8" | "int4"
        speculative_model: Optional[str] = None,
        num_speculative_tokens: int = 3,
        allow_remote_media: bool = False,
        specprefill_model: Optional[str] = None,
        specprefill_keep_pct: float = 0.3,
        specprefill_min_tokens: int = 512,
        text_only: bool = False,
        device=None,  # DP replica pinning (jax device)
        stt_engine=None,  # audio-in-chat transcription
        tp_size: int = 1,  # tensor-parallel mesh over local devices
        mesh_devices=None,  # DPxTP: this replica's tp-submesh devices
    ) -> None:
        self.text_only = text_only
        self.device = device
        self.tp_size = int(tp_size)
        self.mesh = None
        self.mesh_devices = mesh_devices
        if self.tp_size > 1 and device is not None:
            raise ValueError(
                "tp_size and DP replica pinning are mutually exclusive "
                "(a TP engine owns its own device mesh); use "
                "mesh_devices to give a DPxTP replica its submesh"
            )
        self.stt_engine = stt_engine
        from ..media_fetch import FetchPolicy

        self.media_policy = FetchPolicy(allow_remote=allow_remote_media)
        self.speculative_model = speculative_model
        self.num_speculative_tokens = num_speculative_tokens
        self.specprefill_model = specprefill_model
        self.specprefill_keep_pct = specprefill_keep_pct
        self.specprefill_min_tokens = specprefill_min_tokens
        self._specprefill = None
        self.quantization = quantization
        self.model_path = model_path
        self._model_config = model_config
        self.cache_config = cache_config or CacheConfig()
        self.scheduler_config = scheduler_config or SchedulerConfig()
        self.enable_prefix_cache = enable_prefix_cache
        self.stream_interval = stream_interval
        self._seed = seed
        self._preloaded_params = params

        self._tokenizer = None
        self.core: Optional[AsyncEngineCore] = None
        self.scheduler: Optional[Scheduler] = None
        self.prefix_cache: Optional[PrefixCache] = None
        self._running = False
        # multimodal (set when the checkpoint has a vision tower)
        self.vlm = None
        self.image_processor = None
        self.vision_cache = None

    # ---------------------------------------------------------------- control
    async def start(self) -> None:
        if self._running:
            return
        loop = asyncio.get_running_loop()
        await loop.run_in_executor(None, self._load)
        self.core = AsyncEngineCore(self.scheduler)
        self.core.start()
        self._running = True
        logger.info("BatchedEngine started for %s", self.model_path)

    def _load(self) -> None:
        from ..api.utils import is_mllm_model
        from ..models import loader

        enable_persistent_compilation_cache()
        params = self._preloaded_params
        cfg = self._model_config
        if (
            params is None
            and cfg is None
            and self.text_only
            and is_mllm_model(self.model_path)
        ):
            # serve only the checkpoint's language model (reference
            # text_model_from_vlm.py:38) — vision tower never loaded
            from ..text_model_from_vlm import load_text_model_from_vlm

            cfg, params = load_text_model_from_vlm(self.model_path)
        if (
            params is None
            and cfg is None
            and is_mllm_model(self.model_path)
        ):
            # vision-language checkpoint: vision tower + projector + LM
            import json as _json

            from ..cache.vision_embedding_cache import VisionEmbeddingCache

            with open(os.path.join(self.model_path, "config.json")) as f:
                raw_cfg = _json.load(f)
            if raw_cfg.get("model_type") in ("qwen2_vl", "qwen2_5_vl"):
                # Qwen-VL: dynamic-resolution tower + M-RoPE
                from ..models.qwen_vl import QwenVLModel
                from ..multimodal_processor import QwenVLImageProcessor

                logger.info("loading multimodal checkpoint (Qwen-VL)")
                self.vlm = QwenVLModel(self.model_path).load()
                self.vlm_kind = "qwen_vl"
                self.image_processor = QwenVLImageProcessor.from_pretrained(
                    self.model_path
                )
            elif raw_cfg.get("model_type") in ("qwen3_vl", "qwen3_vl_moe"):
                # Qwen3-VL: deepstack tower + interleaved M-RoPE
                # (reference benchmark VLM, docs/benchmarks/image.md)
                from ..models.qwen3_vl import Qwen3VLModel
                from ..multimodal_processor import QwenVLImageProcessor

                logger.info("loading multimodal checkpoint (Qwen3-VL)")
                self.vlm = Qwen3VLModel(self.model_path).load()
                self.vlm_kind = "qwen3_vl"
                self.image_processor = QwenVLImageProcessor.from_pretrained(
                    self.model_path
                )
            elif raw_cfg.get("model_type") in ("glm4v", "glm4v_moe"):
                # GLM-4V / GLM-4.5V: qwen-vl-shaped dynamic-resolution
                # tower with learned interpolated positions + M-RoPE
                from ..models.glm4v import Glm4vModel
                from ..multimodal_processor import QwenVLImageProcessor

                logger.info("loading multimodal checkpoint (GLM-4V)")
                self.vlm = Glm4vModel(self.model_path).load()
                self.vlm_kind = "glm4v"
                self.image_processor = QwenVLImageProcessor.from_pretrained(
                    self.model_path
                )
            elif raw_cfg.get("model_type") == "gemma3":
                # Gemma 3 VLM: SigLIP tower + avg-pool projector; image
                # soft-token runs attend bidirectionally (served via
                # the bidir-span ragged kernel)
                from ..models.gemma3_mm import Gemma3VLM
                from ..multimodal_processor import ImageProcessor

                logger.info("loading multimodal checkpoint (Gemma3)")
                self.vlm = Gemma3VLM(self.model_path).load()
                self.vlm_kind = "gemma3"
                if os.path.exists(
                    os.path.join(self.model_path, "preprocessor_config.json")
                ):
                    self.image_processor = ImageProcessor.from_pretrained(
                        self.model_path
                    )
                else:
                    self.image_processor = ImageProcessor(
                        image_size=self.vlm.cfg.vision.image_size,
                        mean=(0.5, 0.5, 0.5),
                        std=(0.5, 0.5, 0.5),
                        do_center_crop=False,
                        resample="bilinear",
                    )
            elif raw_cfg.get("model_type") in ("idefics3", "smolvlm"):
                # Idefics3/SmolVLM: tiled SigLIP + pixel-shuffle
                # connector (fully causal)
                from ..models.idefics3 import Idefics3VLM
                from ..multimodal_processor import Idefics3ImageProcessor

                logger.info("loading multimodal checkpoint (Idefics3)")
                self.vlm = Idefics3VLM(self.model_path).load()
                self.vlm_kind = "idefics3"
                self.image_processor = Idefics3ImageProcessor.from_pretrained(
                    self.model_path
                )
            elif raw_cfg.get("model_type") == "idefics2":
                # Idefics2: aspect-preserving SigLIP + perceiver
                # resampler (64 latents per sub-image) over Mistral
                from ..models.idefics2 import Idefics2VLM
                from ..multimodal_processor import Idefics2ImageProcessor

                logger.info("loading multimodal checkpoint (Idefics2)")
                self.vlm = Idefics2VLM(self.model_path).load()
                self.vlm_kind = "idefics2"
                self.image_processor = (
                    Idefics2ImageProcessor.from_pretrained(self.model_path)
                )
            elif raw_cfg.get("model_type") == "internvl":
                # InternVL 3: BEiT-style tower + pixel-shuffle connector
                from ..models.internvl import InternVLModel
                from ..multimodal_processor import InternVLImageProcessor

                logger.info("loading multimodal checkpoint (InternVL)")
                self.vlm = InternVLModel(self.model_path).load()
                self.vlm_kind = "internvl"
                self.image_processor = (
                    InternVLImageProcessor.from_pretrained(self.model_path)
                )
            elif raw_cfg.get("model_type") == "aya_vision":
                # Aya Vision: SigLIP + pixel-shuffle SwiGLU adapter on
                # a Command-R text stack
                from ..models.aya_vision import AyaVisionModel
                from ..multimodal_processor import InternVLImageProcessor

                logger.info("loading multimodal checkpoint (Aya Vision)")
                self.vlm = AyaVisionModel(self.model_path).load()
                self.vlm_kind = "aya_vision"
                self.image_processor = (
                    InternVLImageProcessor.from_pretrained(self.model_path)
                )
            elif raw_cfg.get("model_type") == "llama4":
                # Llama 4 Scout/Maverick multimodal: unfold-embed ViT
                # with 2-D complex rope + pixel-shuffle MLP2 adapter on
                # the llama4_text stack (chunked attention + NoPE
                # temperature tuning served natively)
                from ..models.llama4_mm import Llama4VLM
                from ..multimodal_processor import Llama4ImageProcessor

                logger.info("loading multimodal checkpoint (Llama 4)")
                self.vlm = Llama4VLM(self.model_path).load()
                self.vlm_kind = "llama4"
                self.image_processor = (
                    Llama4ImageProcessor.from_pretrained(self.model_path)
                )
            elif raw_cfg.get("model_type") in (
                "llava_next", "llava_onevision",
            ):
                # LLaVA-NeXT (1.6) / OneVision: anyres tiles +
                # image_newline packing (OneVision adds the
                # anyres_max_N bilinear token cap)
                from ..models.llava_next import (
                    LlavaNextVLM,
                    LlavaOnevisionVLM,
                )
                from ..multimodal_processor import (
                    LlavaNextImageProcessor,
                )

                ov = raw_cfg["model_type"] == "llava_onevision"
                logger.info(
                    "loading multimodal checkpoint (%s)",
                    "LLaVA-OneVision" if ov else "LLaVA-NeXT",
                )
                cls_ = LlavaOnevisionVLM if ov else LlavaNextVLM
                self.vlm = cls_(self.model_path).load()
                self.vlm_kind = "llava_next"
                self.image_processor = (
                    LlavaNextImageProcessor.from_pretrained(self.model_path)
                )
            elif raw_cfg.get("model_type") == "deepseek_vl":
                # DeepSeek-VL: SigLIP tower + 2-layer GELU aligner on
                # the shared LLaVA-style path; pad-to-square preprocess
                from ..models.mllm import MultimodalLM
                from ..multimodal_processor import (
                    DeepseekVLImageProcessor,
                )

                logger.info("loading multimodal checkpoint (DeepSeek-VL)")
                self.vlm = MultimodalLM(self.model_path).load()
                self.vlm_kind = "llava"
                self.image_processor = (
                    DeepseekVLImageProcessor.from_pretrained(self.model_path)
                )
            elif raw_cfg.get("model_type") == "paligemma":
                # PaliGemma: SigLIP + linear projector, prefix-LM (the
                # WHOLE prompt is one bidirectional span)
                from ..models.paligemma import PaliGemmaVLM
                from ..multimodal_processor import ImageProcessor

                logger.info("loading multimodal checkpoint (PaliGemma)")
                self.vlm = PaliGemmaVLM(self.model_path).load()
                self.vlm_kind = "paligemma"
                if os.path.exists(
                    os.path.join(self.model_path, "preprocessor_config.json")
                ):
                    self.image_processor = ImageProcessor.from_pretrained(
                        self.model_path
                    )
                else:
                    self.image_processor = ImageProcessor(
                        image_size=self.vlm.cfg.vision.image_size,
                        mean=(0.5, 0.5, 0.5),
                        std=(0.5, 0.5, 0.5),
                        do_center_crop=False,
                        resample="bilinear",
                    )
            elif raw_cfg.get("model_type") == "qwen2_audio":
                # native sound-encoder model: audio placeholder tokens
                # expand to encoder features (reference
                # models/mllm.py:760-838 audio-capable path)
                from ..models.qwen2_audio import Qwen2AudioModel

                logger.info("loading multimodal checkpoint (Qwen2-Audio)")
                self.vlm = Qwen2AudioModel(self.model_path).load()
                self.vlm_kind = "qwen2_audio"
                self.image_processor = None
            elif (
                raw_cfg.get("model_type") in ("pixtral", "mistral3")
                or raw_cfg.get("vision_config", {}).get("model_type")
                == "pixtral"
            ):
                # Pixtral: variable-resolution 2-D-rope tower under a
                # LLaVA-shaped top-level config (HF pixtral checkpoints
                # are LlavaForConditionalGeneration)
                from ..models.pixtral import PixtralVLM
                from ..multimodal_processor import PixtralImageProcessor

                logger.info("loading multimodal checkpoint (Pixtral)")
                self.vlm = PixtralVLM(self.model_path).load()
                self.vlm_kind = "pixtral"
                self.image_processor = PixtralImageProcessor.from_pretrained(
                    self.model_path
                )
                merge = self.vlm.cfg.spatial_merge_size
                if merge > 1:
                    # Mistral-3: [IMG] tokens are at MERGED granularity;
                    # sizing the processor's patch unit to patch*merge
                    # keeps pixel dims merge-divisible and makes grid()
                    # return token-grid counts directly
                    self.image_processor.patch_size = (
                        self.vlm.cfg.vision.patch_size * merge
                    )
            elif raw_cfg.get("model_type") == "mllama":
                # Llama-3.2-Vision: tiled ViT feeding per-request
                # cross-attention KV (no token expansion); served via
                # the decoder's cross_attention layer type
                from ..models.mllama_mm import MllamaMultimodalLM
                from ..multimodal_processor import MllamaImageProcessor

                logger.info("loading multimodal checkpoint (Mllama)")
                self.vlm = MllamaMultimodalLM(self.model_path).load()
                self.vlm_kind = "mllama"
                self.image_processor = MllamaImageProcessor.from_pretrained(
                    self.model_path
                )
                if not self.scheduler_config.cross_capacity:
                    # default: one image per request (images x tiles x
                    # tokens_per_tile; SchedulerConfig.cross_capacity
                    # raises the cap)
                    self.scheduler_config.cross_capacity = (
                        self.vlm.vision_cfg.max_num_tiles
                        * self.vlm.tokens_per_tile
                    )
            elif raw_cfg.get("model_type") == "gemma3n":
                # Gemma-3n ("Gemma 4", reference docs/reference/
                # models.md:38): AltUp text stack + NATIVE audio via the
                # USM conformer tower; vision serves through the
                # MobileNetV5 reconstruction when the checkpoint's tower
                # layout matches (models/gemma3n_vision.py), else image
                # input fails loud in _make_gemma3n_request
                from ..models.gemma3n_mm import Gemma3nMultimodalLM
                from ..multimodal_processor import ImageProcessor

                logger.info("loading multimodal checkpoint (Gemma-3n)")
                self.vlm = Gemma3nMultimodalLM(self.model_path).load()
                self.vlm_kind = "gemma3n"
                if self.vlm.vision_params is not None:
                    # SiglipImageProcessorFast defaults: square resize
                    # to vision image_size, mean/std 0.5
                    self.image_processor = ImageProcessor(
                        image_size=self.vlm.vision_cfg.image_size,
                        mean=(0.5, 0.5, 0.5),
                        std=(0.5, 0.5, 0.5),
                        do_center_crop=False,
                        resample="bilinear",
                    )
                else:
                    self.image_processor = None
            elif raw_cfg.get("model_type") in (
                "qwen2_5_omni", "qwen2_5_omni_thinker",
            ):
                # Qwen2.5-Omni thinker: audio + vision + video chat with
                # TMRoPE (reference models/mllm.py:964,1304,1578-1618
                # omni handling). Speech output (talker/token2wav) is
                # out of scope — text-only responses.
                from ..models.qwen_omni import QwenOmniModel
                from ..multimodal_processor import QwenVLImageProcessor

                logger.info(
                    "loading multimodal checkpoint (Qwen2.5-Omni thinker)"
                )
                self.vlm = QwenOmniModel(self.model_path).load()
                self.vlm_kind = "qwen_omni"
                self.image_processor = QwenVLImageProcessor.from_pretrained(
                    self.model_path
                )
            elif raw_cfg.get("model_type") == "idefics":
                # v1 perceiver resampler — serving semantics this engine
                # does not implement; fail loud rather than mis-serving
                # through the generic LLaVA path
                raise NotImplementedError(
                    f"multimodal architecture "
                    f"'{raw_cfg.get('model_type')}' is not supported; "
                    "supported VLM families: llava, llava_next, llava_onevision, "
                    "qwen2_vl, qwen2_5_vl, qwen3_vl(_moe), gemma3, "
                    "paligemma, pixtral, mistral3, idefics2, "
                    "idefics3/smolvlm, "
                    "deepseek_vl, glm4v(_moe), internvl, aya_vision, "
                    "llama4, mllama, qwen2_audio, qwen2_5_omni(_thinker)"
                )
            else:
                from ..models.mllm import MultimodalLM
                from ..multimodal_processor import ImageProcessor

                logger.info("loading multimodal checkpoint (LLaVA-style)")
                self.vlm = MultimodalLM(self.model_path).load()
                self.vlm_kind = "llava"
                if os.path.exists(
                    os.path.join(self.model_path, "preprocessor_config.json")
                ):
                    self.image_processor = ImageProcessor.from_pretrained(
                        self.model_path
                    )
                else:
                    self.image_processor = ImageProcessor(
                        image_size=self.vlm.cfg.vision.image_size
                    )
            cfg = self.vlm.text_config
            params = self.vlm.lm_params
            self.vision_cache = VisionEmbeddingCache()
        if cfg is None:
            cfg = ModelConfig.from_pretrained(self.model_path)
        if self.scheduler_config.max_kv_size:
            if cfg.has_recurrent:
                raise ValueError(
                    "--max-kv-size is not supported for hybrid SSM "
                    "models (their memory is already bounded by the "
                    "recurrent state; attention layers keep full KV)"
                )
            # rotating window: every layer attends only the last
            # max_kv_size tokens (reference max_kv_size semantics —
            # lossy beyond the window); the scheduler reclaims KV blocks
            # behind it
            w = self.scheduler_config.max_kv_size
            cfg.sliding_window = min(cfg.sliding_window or w, w)
            cfg.layer_types = None
        if cfg.has_cross and not self.scheduler_config.cross_capacity:
            # text-only serving of an mllama checkpoint: the cross
            # layers still execute (width-0 slots reduce them to
            # identity, matching HF's layer skip) with minimal buffers
            self.scheduler_config.cross_capacity = 8
        self._model_config = cfg
        prequantized = False
        if params is None:
            params = loader.load_params_auto(self.model_path, cfg)
            import json as _json2
            try:
                with open(os.path.join(self.model_path, "config.json")) as f:
                    prequantized = bool(
                        _json2.load(f)
                        .get("vllm_mlx_tpu_quantization", {})
                        .get("quantize")
                    )
            except (OSError, ValueError):
                pass
        if self.quantization in ("int8", "int4", "w8e4"):
            if prequantized:
                logger.info("artifact is pre-quantized; --quantization ignored")
            else:
                from ..ops.quant import quantize_params

                bits = 4 if self.quantization == "int4" else 8
                ebits = 4 if self.quantization == "w8e4" else None
                logger.info(
                    "quantizing weights to int%d%s", bits,
                    " (experts int4)" if ebits else "",
                )
                params = quantize_params(params, bits=bits,
                                         expert_bits=ebits)
                if self.tp_size == 1:
                    # single-chip decode: fuse q/k/v and gate/up into
                    # one kernel launch each (ops/quant.py)
                    from ..ops.quant import fuse_projections

                    params = fuse_projections(params)
        self._tokenizer = load_tokenizer(self.model_path)
        eos = collect_eos_ids(self._tokenizer, self.model_path)
        eos.update(cfg.eos_token_ids)
        if self.cache_config.num_blocks <= 0:
            # cap the pool at 4x the active working set (max_num_seqs
            # full contexts) — the extra 3x is prefix-cache headroom;
            # beyond that more blocks stop paying for their HBM
            self.cache_config.num_blocks = _auto_num_blocks(
                cfg,
                self.cache_config,
                params,
                max_cached_tokens=4
                * self.scheduler_config.max_num_seqs
                * self.scheduler_config.max_model_len,
            )
        if self.tp_size > 1:
            # tensor-parallel serving: Megatron-style param shardings
            # over an ICI mesh; the runner's compiled step runs under
            # GSPMD with the ragged-attention kernel shard_map'd over
            # the tp axis (parallel/mesh.py; SURVEY §2.8 — the
            # reference has no TP at all, vllm_platform.py:324-325)
            from ..parallel.mesh import make_mesh, validate_tp

            validate_tp(cfg, self.tp_size)
            self.mesh = make_mesh(
                dp=1, tp=self.tp_size, devices=self.mesh_devices
            )
            logger.info(
                "tensor parallel: tp=%d over %s",
                self.tp_size,
                [str(d) for d in self.mesh.devices.flat],
            )
        runner = ModelRunner(
            cfg,
            params,
            self.cache_config,
            self.scheduler_config,
            rng_seed=self._seed,
            device=self.device,
            mesh=self.mesh,
        )
        if self.speculative_model:
            # draft model for greedy speculative decoding (the
            # reference's MTP speculation, reference scheduler.py:699)
            dcfg = ModelConfig.from_pretrained(self.speculative_model)
            dcfg.dtype = cfg.dtype
            dparams = loader.load_params(self.speculative_model, dcfg)
            if self.quantization in ("int8", "int4"):
                from ..ops.quant import quantize_params

                dparams = quantize_params(
                    dparams, bits=8 if self.quantization == "int8" else 4
                )
            logger.info(
                "speculative decoding: draft=%s k=%d",
                self.speculative_model,
                self.num_speculative_tokens,
            )
            runner.enable_speculative(
                dparams, dcfg, self.num_speculative_tokens
            )
        elif (
            self._preloaded_params is None
            and not (
                cfg.layer_types and "linear_attention" in cfg.layer_types
            )
            and os.path.isdir(str(self.model_path))
        ):
            # in-checkpoint MTP head (reference patches/qwen3_5_mtp.py):
            # speculation with no separate draft model
            try:
                mtp = loader.load_mtp_params(self.model_path, cfg)
            except (FileNotFoundError, ValueError) as e:
                logger.warning("MTP head load skipped: %s", e)
                mtp = None
            if mtp is not None:
                logger.info(
                    "speculative decoding from in-checkpoint MTP head "
                    "(k=%d)", self.num_speculative_tokens,
                )
                runner.enable_mtp_head(mtp, self.num_speculative_tokens)
        if self.specprefill_model:
            # sparse-prefill draft (reference specprefill.py): scores
            # prompt-token importance; can share a checkpoint with the
            # speculative-decoding draft
            from ..specprefill import SpecPrefillScorer

            spcfg = ModelConfig.from_pretrained(self.specprefill_model)
            spcfg.dtype = cfg.dtype
            spparams = loader.load_params(self.specprefill_model, spcfg)
            logger.info("specprefill draft: %s", self.specprefill_model)
            self._specprefill = SpecPrefillScorer(spparams, spcfg)
        ssm_cache = None
        if cfg.has_recurrent and self.enable_prefix_cache:
            # hybrid SSM: KV blocks alone can't restore the mamba
            # recurrent state, so prefix hits are gated on per-request
            # state snapshots at block boundaries (cache/ssm_cache.py;
            # reference utils/mamba_cache.py:99-201 gates the same way)
            from ..cache.ssm_cache import SsmStateCache

            ssm_cache = SsmStateCache()
            logger.info("hybrid SSM model: snapshot-gated prefix cache")
        if self.enable_prefix_cache:
            host_tier = None
            if self.cache_config.host_cache_bytes > 0:
                from ..cache.host_tier import HostKVTier

                # namespace the disk layer by model identity + KV block
                # geometry so restarting with a different model on the
                # same --kv-disk-cache-dir can never restore foreign KV
                # (reference ssd_cache/{model}/ layout; ADVICE r1).
                ns = (
                    f"{os.path.basename(str(self.model_path))}"
                    f"-L{cfg.num_hidden_layers}"
                    f"-kvh{cfg.num_key_value_heads}-hd{cfg.head_dim}"
                    f"-bs{self.cache_config.block_size}"
                    f"-{self.cache_config.kv_dtype}"
                )
                host_tier = HostKVTier(
                    max_bytes=self.cache_config.host_cache_bytes,
                    disk_dir=self.cache_config.disk_cache_dir,
                    namespace=ns,
                )
            self.prefix_cache = PrefixCache(
                self.cache_config.block_size, host_tier=host_tier
            )
        self.scheduler = Scheduler(
            runner,
            self._tokenizer,
            stop_tokens=eos,
            prefix_cache=self.prefix_cache,
            ssm_cache=ssm_cache,
        )
        self.ssm_cache = ssm_cache

    async def stop(self) -> None:
        if self.core is not None:
            self.core.stop()
        # shutdown persistence: flush idle cached KV to the disk layer so
        # a restart with the same cache dir starts warm (reference
        # server.py:1177-1237 save-on-shutdown)
        if (
            self.prefix_cache is not None
            and self.prefix_cache.host_tier is not None
            and self.prefix_cache.host_tier.disk_dir
            and self.scheduler is not None
        ):
            try:
                n = self.prefix_cache.save_all(self.scheduler.block_mgr)
                logger.info("persisted %d cached KV blocks to disk", n)
            except Exception as e:  # pragma: no cover
                logger.warning("KV shutdown save failed: %s", e)
        self._running = False

    @property
    def is_running(self) -> bool:
        return self._running

    @property
    def tokenizer(self):
        return self._tokenizer

    @property
    def model_config(self) -> Optional[ModelConfig]:
        return self._model_config

    # --------------------------------------------------------------- generate
    def _make_request(
        self, prompt: Any, request_id: Optional[str] = None, **kwargs
    ) -> Request:
        sp = SamplingParams(
            **{k: v for k, v in kwargs.items() if k in _SAMPLING_KEYS}
        )
        req = Request(
            request_id=request_id or f"req-{uuid.uuid4().hex[:16]}",
            prompt=prompt,
            sampling_params=sp,
        )
        schema = kwargs.get("json_schema_enforce", _UNSET)
        if schema is not _UNSET:
            req.enforcer = self._get_enforcer(schema)
            req.fsm_state = req.enforcer.initial_state()
            budget = kwargs.get("thinking_budget") or 0
            if budget > 0:
                # thinking-aware enforcement (reference
                # constrained/thinking_processor.py:60-283): reasoning
                # models think unconstrained, then the FSM engages after
                # </think> (forced once the budget is exhausted). The
                # budget is capped to leave the constrained answer room
                # inside max_tokens — an uncloseable think phase would
                # return no JSON at all.
                end_ids = self._think_end_token_ids()
                max_t = sp.max_tokens or budget
                reserve = 32 + len(end_ids)
                budget = min(budget, max(0, max_t - reserve))
                if end_ids and budget > 0:
                    req.think_phase = "think"
                    req.think_budget = budget
                    req.think_end_ids = end_ids
        self._maybe_specprefill(req)
        return req

    def _think_end_token_ids(self) -> List[int]:
        """Token ids of the reasoning close tag (cached). Empty when the
        tokenizer has no such tag (non-reasoning models -> FSM from
        token 0, matching the reference's non-thinking path)."""
        if not hasattr(self, "_think_end_cache"):
            ids: List[int] = []
            try:
                ids = list(
                    self._tokenizer.encode(
                        "</think>", add_special_tokens=False
                    )
                )
                # the force path emits one token per step, so cap the
                # sequence at a sane length (a single special token on
                # real reasoning models; a few byte-level tokens on
                # test tokenizers)
                if len(ids) > 8:
                    ids = []
            except Exception:
                ids = []
            self._think_end_cache = ids
        return self._think_end_cache

    def _maybe_specprefill(self, req: Request) -> None:
        """Attention-guided sparse prefill for long prompts (reference
        specprefill.py): a draft model scores prompt tokens; only the
        important chunks are prefilled, with ORIGINAL rotary positions
        restored via the rope-position override."""
        if self._specprefill is None:
            return
        ids = req.prompt_token_ids
        if ids is None:
            if isinstance(req.prompt, str):
                ids = self._tokenizer.encode(req.prompt)
            else:
                ids = list(req.prompt)
        if len(ids) < self.specprefill_min_tokens:
            return
        from ..specprefill import prune_prompt

        pruned, positions, delta = prune_prompt(
            ids,
            self._specprefill,
            keep_pct=self.specprefill_keep_pct,
        )
        logger.info(
            "specprefill: %d -> %d prompt tokens (%.0f%% kept)",
            len(ids), len(pruned), 100 * len(pruned) / len(ids),
        )
        req.prompt_token_ids = pruned
        req.num_prompt_tokens = len(pruned)
        req.rope_positions = positions
        req.mrope_delta = delta
        req.media_spans = None  # pruned prompts never share KV prefixes
        req.specprefill_dropped = delta

    def _get_enforcer(self, schema):
        """Cached JsonTokenEnforcer per schema (the token trie is shared
        across schemas via the tokenizer-level cache; reference
        constrained/cache.py:136)."""
        import json as _json

        from ..constrained.fsm import JsonTokenEnforcer

        key = _json.dumps(schema, sort_keys=True) if schema else ""
        if not hasattr(self, "_enforcers"):
            self._enforcers = {}
        enf = self._enforcers.get(key)
        if enf is None:
            eos = sorted(self.scheduler._default_stop_tokens) if (
                self.scheduler is not None
            ) else None
            enf = JsonTokenEnforcer(
                self._tokenizer, schema or None, eos_ids=eos
            )
            self._enforcers[key] = enf
        return enf

    async def _stream(
        self, request: Request
    ) -> AsyncIterator[GenerationOutput]:
        state = RequestStreamState(self.stream_interval)
        pending = GenerationOutput()
        async for out in self.core.stream_outputs(request):
            pending.text += out.new_text
            pending.token_ids.extend(out.new_token_ids)
            if out.new_logprobs:
                if pending.logprobs is None:
                    pending.logprobs = []
                pending.logprobs.extend(out.new_logprobs)
            pending.finished = out.finished
            pending.finish_reason = out.finish_reason
            pending.prompt_tokens = out.prompt_tokens
            pending.completion_tokens = out.completion_tokens
            pending.cached_tokens = out.cached_tokens
            pending.mtp_drafts = out.mtp_drafts
            pending.mtp_accepted = out.mtp_accepted
            if state.should_send(out):
                yield pending
                pending = GenerationOutput()
        if pending.text or pending.token_ids:
            yield pending

    async def stream_generate(
        self, prompt: Any, request_id: Optional[str] = None, **kwargs
    ) -> AsyncIterator[GenerationOutput]:
        if self._specprefill is not None:
            # draft scoring is blocking jax work — keep it off the loop
            loop = asyncio.get_running_loop()
            req = await loop.run_in_executor(
                None, lambda: self._make_request(prompt, request_id, **kwargs)
            )
        else:
            req = self._make_request(prompt, request_id, **kwargs)
        async for chunk in self._stream(req):
            yield chunk

    async def stream_chat(
        self,
        messages: List[Dict[str, Any]],
        request_id: Optional[str] = None,
        tools: Optional[List[Dict[str, Any]]] = None,
        chat_template_kwargs: Optional[Dict[str, Any]] = None,
        **kwargs,
    ) -> AsyncIterator[GenerationOutput]:
        media: List[Dict[str, Any]] = []
        if self.vlm is not None or self.stt_engine is not None:
            from ..multimodal_processor import extract_media_from_messages

            messages, media = extract_media_from_messages(messages)
        if any(m.get("kind") == "audio" for m in media) and not getattr(
            self.vlm, "supports_audio", False
        ):
            # audio-in-chat FALLBACK for models without sound encoders:
            # transcribe with the attached STT engine and inject the
            # transcript where the audio part sat (reference
            # models/mllm.py:877 process_audio_input); sound-encoder
            # models (Qwen2-Audio) take the native path below
            loop = asyncio.get_running_loop()
            messages = await loop.run_in_executor(
                None,
                lambda: self._inject_audio_transcripts(messages, media),
            )
            media = [m for m in media if m.get("kind") != "audio"]
        if media and getattr(self, "vlm_kind", None) == "paligemma":
            # PaliGemma is a raw-prompt task model (caption/vqa/detect),
            # not a chat model: the HF processor frames the prompt as
            # image tokens + BOS + text + "\n" with NO chat markup
            # (processing_paligemma.build_string_from_input), so the
            # text is the messages' concatenated text parts
            parts = []
            for m in messages:
                c = m.get("content")
                if isinstance(c, str):
                    parts.append(c)
                elif isinstance(c, list):
                    parts.extend(
                        p.get("text", "")
                        for p in c
                        if isinstance(p, dict) and p.get("type") == "text"
                    )
            prompt = "".join(parts)
        else:
            prompt = self.apply_chat_template(
                messages,
                tools=tools,
                chat_template_kwargs=chat_template_kwargs,
            )
        if media:
            if self.vlm is None:
                raise ValueError(
                    "this model does not support image/video input"
                )
            req = await asyncio.get_running_loop().run_in_executor(
                None,
                lambda: self._make_multimodal_request(
                    prompt, media, request_id, **kwargs
                ),
            )
        elif self._specprefill is not None:
            # draft scoring is blocking jax work — keep it off the loop
            loop = asyncio.get_running_loop()
            req = await loop.run_in_executor(
                None, lambda: self._make_request(prompt, request_id, **kwargs)
            )
        else:
            req = self._make_request(prompt, request_id, **kwargs)
        async for chunk in self._stream(req):
            yield chunk

    def _inject_audio_transcripts(
        self,
        messages: List[Dict[str, Any]],
        media: List[Dict[str, Any]],
    ) -> List[Dict[str, Any]]:
        """Replace audio placeholders with their transcripts, in order."""
        import base64
        import tempfile

        from ..audio.mel import load_wav
        from ..media_fetch import resolve_media_source

        if self.stt_engine is None:
            raise ValueError(
                "audio content requires an STT model (--stt-model)"
            )
        audio_iter = iter(
            m for m in media if m.get("kind") == "audio"
        )
        out = []
        for msg in messages:
            content = msg.get("content")
            if not isinstance(content, list):
                out.append(msg)
                continue
            parts = []
            for c in content:
                if isinstance(c, dict) and c.get("type") == "audio":
                    m = next(audio_iter)
                    src = resolve_media_source(
                        m.get("src"), self.media_policy
                    )
                    if isinstance(src, str):
                        src = base64.b64decode(src)
                    with tempfile.NamedTemporaryFile(
                        suffix=f".{m.get('format', 'wav')}"
                    ) as f:
                        f.write(src)
                        f.flush()
                        audio = load_wav(f.name)
                    result = self.stt_engine.transcribe(audio)
                    parts.append(
                        {
                            "type": "text",
                            "text": "[Audio transcript: "
                            f"{result['text'].strip()}]",
                        }
                    )
                else:
                    parts.append(c)
            out.append({**msg, "content": parts})
        return out

    def _make_multimodal_request(
        self,
        prompt: str,
        media: List[Dict[str, Any]],
        request_id: Optional[str] = None,
        **kwargs,
    ) -> Request:
        """Encode media (through the vision cache) and expand the prompt
        with feature-carrying rows (reference MLLM preprocess path,
        mllm_batch_generator.py:866-1017)."""
        import numpy as np

        from ..cache.vision_embedding_cache import image_hash
        from ..multimodal_processor import image_bytes_key

        if getattr(self, "vlm_kind", "llava") == "gemma3":
            return self._make_gemma3_request(
                prompt, media, request_id, **kwargs
            )
        if getattr(self, "vlm_kind", "llava") == "paligemma":
            return self._make_paligemma_request(
                prompt, media, request_id, **kwargs
            )
        if getattr(self, "vlm_kind", "llava") == "idefics3":
            return self._make_idefics3_request(
                prompt, media, request_id, **kwargs
            )
        if getattr(self, "vlm_kind", "llava") == "idefics2":
            return self._make_idefics2_request(
                prompt, media, request_id, **kwargs
            )
        if getattr(self, "vlm_kind", "llava") == "internvl":
            return self._make_internvl_request(
                prompt, media, request_id, **kwargs
            )
        if getattr(self, "vlm_kind", "llava") == "aya_vision":
            return self._make_aya_vision_request(
                prompt, media, request_id, **kwargs
            )
        if getattr(self, "vlm_kind", "llava") == "llama4":
            return self._make_llama4_request(
                prompt, media, request_id, **kwargs
            )
        if getattr(self, "vlm_kind", "llava") == "mllama":
            return self._make_mllama_request(
                prompt, media, request_id, **kwargs
            )
        if getattr(self, "vlm_kind", "llava") == "gemma3n":
            return self._make_gemma3n_request(
                prompt, media, request_id, **kwargs
            )
        token_ids = self._tokenizer.encode(prompt)
        if getattr(self, "vlm_kind", "llava") in (
            "qwen_vl", "qwen3_vl", "glm4v",
        ):
            if self.vlm_kind == "glm4v" and any(
                m.get("kind") == "video" for m in media
            ):
                raise ValueError(
                    "GLM-4V video chat (per-frame timestamp prompts) is "
                    "not wired; send images"
                )
            return self._make_qwen_vl_request(
                token_ids, media, request_id, **kwargs
            )
        if getattr(self, "vlm_kind", "llava") == "pixtral":
            return self._make_pixtral_request(
                token_ids, media, request_id, **kwargs
            )
        if getattr(self, "vlm_kind", "llava") == "llava_next":
            return self._make_llava_next_request(
                token_ids, media, request_id, **kwargs
            )
        if getattr(self, "vlm_kind", "llava") == "qwen2_audio":
            return self._make_qwen2_audio_request(
                token_ids, media, request_id, **kwargs
            )
        if getattr(self, "vlm_kind", "llava") == "qwen_omni":
            return self._make_qwen_omni_request(
                token_ids, media, request_id, **kwargs
            )
        from ..media_fetch import resolve_media_source

        images = [
            resolve_media_source(m["src"], self.media_policy)
            for m in media
            if m.get("kind") == "image"
        ]
        if len(images) != len(media):
            raise ValueError(
                "video input requires a Qwen-VL-class model"
            )
        features: List[Any] = []
        to_encode = []
        keys = []
        for im in images:
            key = image_hash(image_bytes_key(im))
            keys.append(key)
            cached = self.vision_cache.get(key)
            features.append(cached)
            if cached is None:
                to_encode.append((len(features) - 1, im))
        if to_encode:
            pixels = self.image_processor.batch([im for _, im in to_encode])
            encoded = self.vlm.encode_images(pixels)
            for j, (idx, _) in enumerate(to_encode):
                features[idx] = encoded[j]
                self.vision_cache.put(keys[idx], encoded[j])
        ids, embeds, mask = self.vlm.build_multimodal_prompt(
            token_ids, features
        )
        req = self._make_request(ids, request_id, **kwargs)
        req.prompt_embeds = embeds
        req.embeds_mask = mask
        req.is_multimodal = True
        req.media_spans = _media_spans(
            ids, mask, keys, [f.shape[0] for f in features]
        )
        return req

    def _make_mllama_request(
        self,
        prompt: str,
        media: List[Dict[str, Any]],
        request_id: Optional[str] = None,
        **kwargs,
    ) -> Request:
        """Mllama: the <|image|> tokens stay single tokens; each image's
        tiles encode to cross-attention states written into the slot's
        cross-KV buffers at admission (models/mllama_mm.py). Because
        text rows BEFORE the first image still cross-attend the vision
        values (HF's zeroed full rows), every prompt block is salted
        with the combined image hash for prefix caching."""
        import numpy as np

        from ..cache.vision_embedding_cache import image_hash
        from ..media_fetch import resolve_media_source
        from ..models.mllama_mm import (
            build_cross_meta,
            cross_attention_token_spans,
        )
        from ..multimodal_processor import image_bytes_key, load_image

        images = [
            resolve_media_source(m["src"], self.media_policy)
            for m in media
            if m.get("kind") == "image"
        ]
        if len(images) != len(media):
            raise ValueError("video input requires a Qwen-VL-class model")
        token_ids = self._tokenizer.encode(prompt)
        states: List[Any] = []  # per image [max_tiles*np1, H] np
        num_tiles: List[int] = []
        keys: List[str] = []
        for im in images:
            key = image_hash(image_bytes_key(im))
            keys.append(key)
            cached = self.vision_cache.get(key)
            if cached is None:
                proc = self.image_processor.batch([im])
                cs = self.vlm.encode_images(
                    proc["pixel_values"],
                    proc["aspect_ratio_ids"],
                    proc["aspect_ratio_mask"],
                )
                cached = {
                    "states": np.asarray(cs, np.float32),
                    "num_tiles": int(proc["num_tiles"][0]),
                }
                self.vision_cache.put(key, cached)
            states.append(cached["states"])
            num_tiles.append(cached["num_tiles"])
        spans = cross_attention_token_spans(
            token_ids, self.vlm.image_token_id, len(images)
        )
        if len(spans) != len(images):
            raise ValueError(
                f"prompt has {len(spans)} <|image|> tokens but "
                f"{len(images)} images were supplied"
            )
        cap = self.scheduler_config.cross_capacity
        tok_lo, tok_hi, width = build_cross_meta(
            spans,
            num_tiles,
            self.vlm.vision_cfg.max_num_tiles,
            self.vlm.tokens_per_tile,
            cap,
        )
        req = self._make_request(token_ids, request_id, **kwargs)
        req.is_multimodal = True
        req.cross_payload = {
            "cross_states": np.concatenate(states, axis=0)
            if states
            else np.zeros((0, self.vlm.text_cfg.hidden_size), np.float32),
            "tok_lo": tok_lo,
            "tok_hi": tok_hi,
            "width": width,
        }
        if images:
            combined = image_hash("|".join(keys).encode())
            req.media_spans = [(0, len(token_ids), combined)]
        return req

    def _make_gemma3_request(
        self,
        prompt: str,
        media: List[Dict[str, Any]],
        request_id: Optional[str] = None,
        **kwargs,
    ) -> Request:
        """Gemma 3: expand <start_of_image> to the HF full image
        sequence, encode through the vision cache, and mark each soft-
        token run as a BIDIRECTIONAL attention span (HF token_type_ids
        mask; served by ops/ragged_bidir_kernel.py)."""
        from ..cache.vision_embedding_cache import image_hash
        from ..media_fetch import resolve_media_source
        from ..multimodal_processor import image_bytes_key

        images = [
            resolve_media_source(m["src"], self.media_policy)
            for m in media
            if m.get("kind") == "image"
        ]
        if len(images) != len(media):
            raise ValueError("video input requires a Qwen-VL-class model")
        ids, runs = self.vlm.expand_image_tokens(self._tokenizer, prompt)
        features: List[Any] = []
        to_encode = []
        keys = []
        for im in images:
            key = image_hash(image_bytes_key(im))
            keys.append(key)
            cached = self.vision_cache.get(key)
            features.append(cached)
            if cached is None:
                to_encode.append((len(features) - 1, im))
        if to_encode:
            pixels = self.image_processor.batch([im for _, im in to_encode])
            encoded = self.vlm.encode_images(pixels)
            for j, (idx, _) in enumerate(to_encode):
                features[idx] = encoded[j]
                self.vision_cache.put(keys[idx], encoded[j])
        ids, embeds, mask = self.vlm.build_multimodal_prompt(ids, features)
        max_span = max((hi - lo for lo, hi in runs), default=0)
        if max_span > self.scheduler_config.max_prefill_tokens:
            raise ValueError(
                f"image span of {max_span} tokens exceeds the per-step "
                f"prefill budget {self.scheduler_config.max_prefill_tokens}"
                " (raise --max-prefill-tokens)"
            )
        req = self._make_request(ids, request_id, **kwargs)
        req.prompt_embeds = embeds
        req.embeds_mask = mask
        req.is_multimodal = True
        req.bidir_spans = runs
        req.media_spans = _media_spans(
            ids, mask, keys, [f.shape[0] for f in features]
        )
        return req

    def _make_internvl_request(
        self,
        prompt: str,
        media: List[Dict[str, Any]],
        request_id: Optional[str] = None,
        **kwargs,
    ) -> Request:
        """InternVL: tile each image (vision cache holds the flattened
        tile features), expand each <image> placeholder to
        <img> + IMG_CONTEXT * rows + </img> (HF
        InternVLProcessor._insert_media_placeholders)."""
        from ..cache.vision_embedding_cache import image_hash
        from ..media_fetch import resolve_media_source
        from ..multimodal_processor import image_bytes_key, load_image

        images = [
            resolve_media_source(m["src"], self.media_policy)
            for m in media
            if m.get("kind") == "image"
        ]
        if len(images) != len(media):
            raise ValueError("video input requires a Qwen-VL-class model")
        features: List[Any] = []
        keys: List[str] = []
        for im in images:
            key = image_hash(image_bytes_key(im))
            keys.append(key)
            cached = self.vision_cache.get(key)
            if cached is None:
                tiles = self.image_processor(load_image(im))
                cached = self.vlm.encode_tiles(tiles)
                self.vision_cache.put(key, cached)
            features.append(cached)
        ctx_tok = self._tokenizer.convert_ids_to_tokens(
            self.vlm.image_token_id
        )
        img_open = (
            "<img>"
            if self._tokenizer.convert_tokens_to_ids("<img>") is not None
            and self._tokenizer.convert_tokens_to_ids("<img>") >= 0
            else ""
        )
        img_close = "</img>" if img_open else ""
        parts = prompt.split("<image>")
        if len(parts) - 1 != len(features):
            raise ValueError(
                f"prompt has {len(parts) - 1} <image> placeholders for "
                f"{len(features)} images"
            )
        out = []
        for i, part in enumerate(parts[:-1]):
            out.append(part)
            out.append(
                img_open + ctx_tok * features[i].shape[0] + img_close
            )
        out.append(parts[-1])
        ids = self._tokenizer.encode("".join(out))
        ids, embeds, mask = self.vlm.build_multimodal_prompt(ids, features)
        req = self._make_request(ids, request_id, **kwargs)
        req.prompt_embeds = embeds
        req.embeds_mask = mask
        req.is_multimodal = True
        req.media_spans = _media_spans(
            ids, mask, keys, [f.shape[0] for f in features]
        )
        return req

    def _make_aya_vision_request(
        self,
        prompt: str,
        media: List[Dict[str, Any]],
        request_id: Optional[str] = None,
        **kwargs,
    ) -> Request:
        """Aya Vision: GotOcr2 tiling; each <image> placeholder becomes
        the structured START_OF_IMG / TILE_i / IMG_PATCH / TILE_GLOBAL /
        END_OF_IMG string (HF _prompt_split_image)."""
        from ..cache.vision_embedding_cache import image_hash
        from ..media_fetch import resolve_media_source
        from ..multimodal_processor import image_bytes_key, load_image

        images = [
            resolve_media_source(m["src"], self.media_policy)
            for m in media
            if m.get("kind") == "image"
        ]
        if len(images) != len(media):
            raise ValueError("video input requires a Qwen-VL-class model")
        features: List[Any] = []
        keys: List[str] = []
        for im in images:
            key = image_hash(image_bytes_key(im))
            keys.append(key)
            cached = self.vision_cache.get(key)
            if cached is None:
                tiles = self.image_processor(load_image(im))
                cached = self.vlm.encode_tiles(tiles)
                self.vision_cache.put(key, cached)
            features.append(cached)
        parts = prompt.split("<image>")
        if len(parts) - 1 != len(features):
            raise ValueError(
                f"prompt has {len(parts) - 1} <image> placeholders for "
                f"{len(features)} images"
            )
        out = []
        for i, part in enumerate(parts[:-1]):
            out.append(part)
            out.append(
                self.vlm.image_prompt_string(
                    features[i].shape[0], features[i].shape[1]
                )
            )
        out.append(parts[-1])
        ids = self._tokenizer.encode("".join(out))
        ids, embeds, mask = self.vlm.build_multimodal_prompt(ids, features)
        req = self._make_request(ids, request_id, **kwargs)
        req.prompt_embeds = embeds
        req.embeds_mask = mask
        req.is_multimodal = True
        import numpy as _np

        img_rows = _np.flatnonzero(mask)
        spans = []
        r = 0
        for key, feats in zip(keys, features):
            cnt = feats.shape[0] * feats.shape[1]
            rows_i = img_rows[r : r + cnt]
            r += cnt
            if len(rows_i):
                spans.append((int(rows_i[0]), int(rows_i[-1]) + 1, key))
        req.media_spans = spans or None
        return req

    def _make_llama4_request(
        self,
        prompt: str,
        media: List[Dict[str, Any]],
        request_id: Optional[str] = None,
        **kwargs,
    ) -> Request:
        """Llama 4: best-fit tiling + global tile; each <image>
        placeholder becomes the structured <|image_start|> / local
        <|patch|> runs with tile separators / <|image|> + global run /
        <|image_end|> string (HF Llama4Processor._prompt_split_image)."""
        from ..cache.vision_embedding_cache import image_hash
        from ..media_fetch import resolve_media_source
        from ..multimodal_processor import image_bytes_key, load_image

        images = [
            resolve_media_source(m["src"], self.media_policy)
            for m in media
            if m.get("kind") == "image"
        ]
        if len(images) != len(media):
            raise ValueError("video input requires a Qwen-VL-class model")
        features: List[Any] = []
        ratios: List[Any] = []
        keys: List[str] = []
        for im in images:
            key = image_hash(image_bytes_key(im))
            keys.append(key)
            cached = self.vision_cache.get(key)
            if cached is None:
                tiles, ratio = self.image_processor(load_image(im))
                cached = (self.vlm.encode_tiles(tiles), ratio)
                self.vision_cache.put(key, cached)
            features.append(cached[0])
            ratios.append(cached[1])
        parts = prompt.split("<image>")
        if len(parts) - 1 != len(features):
            raise ValueError(
                f"prompt has {len(parts) - 1} <image> placeholders for "
                f"{len(features)} images"
            )
        out = []
        for i, part in enumerate(parts[:-1]):
            out.append(part)
            out.append(self.vlm.image_prompt_string(ratios[i]))
        out.append(parts[-1])
        ids = self._tokenizer.encode("".join(out))
        ids, embeds, mask = self.vlm.build_multimodal_prompt(ids, features)
        req = self._make_request(ids, request_id, **kwargs)
        req.prompt_embeds = embeds
        req.embeds_mask = mask
        req.is_multimodal = True
        import numpy as _np

        img_rows = _np.flatnonzero(mask)
        spans = []
        r = 0
        for key, feats in zip(keys, features):
            cnt = feats.shape[0] * feats.shape[1]
            rows_i = img_rows[r : r + cnt]
            r += cnt
            if len(rows_i):
                spans.append((int(rows_i[0]), int(rows_i[-1]) + 1, key))
        req.media_spans = spans or None
        return req

    def _make_llava_next_request(
        self,
        token_ids: List[int],
        media: List[Dict[str, Any]],
        request_id: Optional[str] = None,
        **kwargs,
    ) -> Request:
        """LLaVA-NeXT: per-image anyres tiling (vision cache holds the
        PACKED features per content hash) — the single <image>
        placeholder expands to the variable packed row count."""
        from ..cache.vision_embedding_cache import image_hash
        from ..media_fetch import resolve_media_source
        from ..multimodal_processor import image_bytes_key, load_image

        images = [
            resolve_media_source(m["src"], self.media_policy)
            for m in media
            if m.get("kind") == "image"
        ]
        if len(images) != len(media):
            raise ValueError("video input requires a Qwen-VL-class model")
        features: List[Any] = []
        keys: List[str] = []
        for im in images:
            key = image_hash(image_bytes_key(im))
            keys.append(key)
            cached = self.vision_cache.get(key)
            if cached is None:
                tiles, grid, orig = self.image_processor(load_image(im))
                cached = self.vlm.encode_anyres(tiles, grid, orig)
                self.vision_cache.put(key, cached)
            features.append(cached)
        ids, embeds, mask = self.vlm.build_multimodal_prompt(
            token_ids, features
        )
        req = self._make_request(ids, request_id, **kwargs)
        req.prompt_embeds = embeds
        req.embeds_mask = mask
        req.is_multimodal = True
        req.media_spans = _media_spans(
            ids, mask, keys, [f.shape[0] for f in features]
        )
        return req

    def _make_idefics3_request(
        self,
        prompt: str,
        media: List[Dict[str, Any]],
        request_id: Optional[str] = None,
        **kwargs,
    ) -> Request:
        """Idefics3/SmolVLM: tile each image (vision cache holds
        (tile_features, rows, cols) per content hash) and expand each
        <image> placeholder into the row/col-structured tiled prompt
        (HF get_image_prompt_string). Fully causal."""
        from ..cache.vision_embedding_cache import image_hash
        from ..media_fetch import resolve_media_source
        from ..multimodal_processor import image_bytes_key, load_image

        images = [
            resolve_media_source(m["src"], self.media_policy)
            for m in media
            if m.get("kind") == "image"
        ]
        if len(images) != len(media):
            raise ValueError("video input requires a Qwen-VL-class model")
        features: List[Any] = []
        grids: List[Any] = []
        keys: List[str] = []
        for im in images:
            key = image_hash(image_bytes_key(im))
            keys.append(key)
            cached = self.vision_cache.get(key)
            if cached is None:
                tiles, rows, cols = self.image_processor(load_image(im))
                feats = self.vlm.encode_tiles(tiles)
                cached = (feats, rows, cols)
                self.vision_cache.put(key, cached)
            features.append(cached[0])
            grids.append((cached[1], cached[2]))
        expanded = self.vlm.expand_image_tokens(prompt, grids)
        ids = self._tokenizer.encode(expanded)
        ids, embeds, mask = self.vlm.build_multimodal_prompt(ids, features)
        req = self._make_request(ids, request_id, **kwargs)
        req.prompt_embeds = embeds
        req.embeds_mask = mask
        req.is_multimodal = True
        import numpy as _np

        img_rows = _np.flatnonzero(mask)
        spans = []
        r = 0
        for key, feats in zip(keys, features):
            cnt = feats.shape[0] * feats.shape[1]
            rows_i = img_rows[r : r + cnt]
            r += cnt
            if len(rows_i):
                spans.append((int(rows_i[0]), int(rows_i[-1]) + 1, key))
        req.media_spans = spans or None
        return req

    def _make_idefics2_request(
        self,
        prompt: str,
        media: List[Dict[str, Any]],
        request_id: Optional[str] = None,
        **kwargs,
    ) -> Request:
        """Idefics2: per-image aspect-preserving sub-images (1, or 5
        with do_image_splitting) each resampled to n_latents soft
        tokens; <image> placeholders expand to fake-token-wrapped runs
        with doubled fake tokens collapsed (HF processing_idefics2).
        Fully causal."""
        from ..cache.vision_embedding_cache import image_hash
        from ..media_fetch import resolve_media_source
        from ..multimodal_processor import image_bytes_key, load_image

        images = [
            resolve_media_source(m["src"], self.media_policy)
            for m in media
            if m.get("kind") == "image"
        ]
        if len(images) != len(media):
            raise ValueError("video input requires a Qwen-VL-class model")
        features: List[Any] = []
        n_subs: List[int] = []
        keys: List[str] = []
        for im in images:
            key = image_hash(image_bytes_key(im))
            keys.append(key)
            cached = self.vision_cache.get(key)
            if cached is None:
                subs = self.image_processor(load_image(im))
                feats = self.vlm.encode_tiles(subs)
                cached = (feats, len(subs))
                self.vision_cache.put(key, cached)
            features.append(cached[0])
            n_subs.append(cached[1])
        expanded = self.vlm.expand_image_tokens(prompt, n_subs)
        ids = self._tokenizer.encode(expanded)
        ids, embeds, mask = self.vlm.build_multimodal_prompt(ids, features)
        req = self._make_request(ids, request_id, **kwargs)
        req.prompt_embeds = embeds
        req.embeds_mask = mask
        req.is_multimodal = True
        import numpy as _np

        img_rows = _np.flatnonzero(mask)
        spans = []
        r = 0
        for key, feats in zip(keys, features):
            cnt = feats.shape[0]
            rows_i = img_rows[r : r + cnt]
            r += cnt
            if len(rows_i):
                spans.append((int(rows_i[0]), int(rows_i[-1]) + 1, key))
        req.media_spans = spans or None
        return req

    def _make_pixtral_request(
        self,
        token_ids: List[int],
        media: List[Dict[str, Any]],
        request_id: Optional[str] = None,
        **kwargs,
    ) -> Request:
        """Pixtral: per-image variable-resolution encode (vision cache
        holds (features, grid) per content hash), single [IMG]
        placeholders expanded into [IMG]-row / [IMG_BREAK] / [IMG_END]
        blocks. Fully causal attention."""
        from ..cache.vision_embedding_cache import image_hash
        from ..media_fetch import resolve_media_source
        from ..multimodal_processor import image_bytes_key, load_image

        images = [
            resolve_media_source(m["src"], self.media_policy)
            for m in media
            if m.get("kind") == "image"
        ]
        if len(images) != len(media):
            raise ValueError("video input requires a Qwen-VL-class model")
        features: List[Any] = []
        grids: List[Any] = []
        keys: List[str] = []
        for im in images:
            key = image_hash(image_bytes_key(im))
            keys.append(key)
            cached = self.vision_cache.get(key)
            if cached is None:
                pixel = self.image_processor(load_image(im))
                grid = self.image_processor.grid(pixel)
                feats = self.vlm.encode_image(pixel)
                cached = (feats, grid)
                self.vision_cache.put(key, cached)
            features.append(cached[0])
            grids.append(cached[1])
        ids = self.vlm.expand_image_tokens(token_ids, grids)
        ids, embeds, mask = self.vlm.build_multimodal_prompt(ids, features)
        req = self._make_request(ids, request_id, **kwargs)
        req.prompt_embeds = embeds
        req.embeds_mask = mask
        req.is_multimodal = True
        # feature rows are interleaved with [IMG_BREAK]/[IMG_END], so
        # each image's cache-salt span runs from its first [IMG] row
        # through its closing [IMG_END] (contiguous block per image)
        import numpy as _np

        img_rows = _np.flatnonzero(mask)
        spans = []
        r = 0
        for key, feats in zip(keys, features):
            cnt = feats.shape[0]
            rows = img_rows[r : r + cnt]
            r += cnt
            if len(rows):
                spans.append((int(rows[0]), int(rows[-1]) + 2, key))
        req.media_spans = spans or None
        return req

    def _make_paligemma_request(
        self,
        prompt: str,
        media: List[Dict[str, Any]],
        request_id: Optional[str] = None,
        **kwargs,
    ) -> Request:
        """PaliGemma: leading image rows + BOS + text + newline; the
        WHOLE prompt is one bidirectional span (prefix-LM — HF
        modeling_paligemma.py _update_causal_mask zeroes the prompt
        mask at inference)."""
        from ..cache.vision_embedding_cache import image_hash
        from ..media_fetch import resolve_media_source
        from ..multimodal_processor import image_bytes_key

        images = [
            resolve_media_source(m["src"], self.media_policy)
            for m in media
            if m.get("kind") == "image"
        ]
        if len(images) != len(media):
            raise ValueError("video input requires a Qwen-VL-class model")
        ids = self.vlm.build_prompt_ids(
            self._tokenizer, prompt, len(images)
        )
        if len(ids) > self.scheduler_config.max_prefill_tokens:
            raise ValueError(
                f"PaliGemma prefix-LM prompt of {len(ids)} tokens must fit "
                f"one prefill chunk (budget "
                f"{self.scheduler_config.max_prefill_tokens}; raise "
                "--max-prefill-tokens)"
            )
        features: List[Any] = []
        to_encode = []
        keys = []
        for im in images:
            key = image_hash(image_bytes_key(im))
            keys.append(key)
            cached = self.vision_cache.get(key)
            features.append(cached)
            if cached is None:
                to_encode.append((len(features) - 1, im))
        if to_encode:
            pixels = self.image_processor.batch([im for _, im in to_encode])
            encoded = self.vlm.encode_images(pixels)
            for j, (idx, _) in enumerate(to_encode):
                features[idx] = encoded[j]
                self.vision_cache.put(keys[idx], encoded[j])
        ids, embeds, mask = self.vlm.build_multimodal_prompt(ids, features)
        req = self._make_request(ids, request_id, **kwargs)
        req.prompt_embeds = embeds
        req.embeds_mask = mask
        req.is_multimodal = True
        req.bidir_spans = [(0, len(ids))]
        req.media_spans = _media_spans(
            ids, mask, keys, [f.shape[0] for f in features]
        )
        return req

    def _make_gemma3n_request(
        self,
        prompt: str,
        media: List[Dict[str, Any]],
        request_id: Optional[str] = None,
        **kwargs,
    ) -> Request:
        """Gemma-3n native multimodal chat: expand each audio/image
        placeholder to the processor's fixed sequence (188 audio / 256
        image soft tokens), encode media through the media-hash cache,
        fill the placeholder runs with soft rows (hard multimodal ids
        embed by id inside the text forward). Images fail loud when the
        checkpoint's tower layout doesn't match the MobileNetV5
        reconstruction (self.vlm.vision_error carries the diff)."""
        import base64
        import tempfile

        from ..audio.mel import load_wav
        from ..cache.vision_embedding_cache import image_hash
        from ..media_fetch import resolve_media_source
        from ..multimodal_processor import image_bytes_key, load_image

        kinds = [m.get("kind") for m in media]
        if any(k not in ("audio", "image") for k in kinds):
            raise NotImplementedError(
                "Gemma-3n serves audio and image input; video is not "
                "part of the family's HF processor"
            )
        if "image" in kinds and self.image_processor is None:
            raise NotImplementedError(
                "Gemma-3n image input unavailable for this checkpoint: "
                f"{self.vlm.vision_error}"
            )
        prompt = self.vlm.expand_audio_tokens(self._tokenizer, prompt)
        prompt = self.vlm.expand_image_tokens(self._tokenizer, prompt)
        token_ids = self._tokenizer.encode(prompt)
        features: List[Any] = []
        keys: List[str] = []
        for m in media:
            src = resolve_media_source(m.get("src"), self.media_policy)
            kind = m.get("kind")
            if kind == "image":
                key = image_hash(b"image:" + image_bytes_key(src))
            else:
                if isinstance(src, str):
                    src = base64.b64decode(src)
                key = image_hash(b"audio:" + src)
            keys.append(key)
            cached = self.vision_cache.get(key) if self.vision_cache else None
            if cached is None:
                if kind == "image":
                    cached = self.vlm.encode_image(
                        self.image_processor(load_image(src))
                    )
                else:
                    with tempfile.NamedTemporaryFile(
                        suffix=f".{m.get('format', 'wav')}"
                    ) as f:
                        f.write(src)
                        f.flush()
                        audio = load_wav(f.name)
                    cached = self.vlm.encode_audio(audio)
                if self.vision_cache is not None:
                    self.vision_cache.put(key, cached)
            features.append(cached)
        ids, embeds, mask = self.vlm.build_multimodal_prompt(
            token_ids, features, media_kinds=kinds
        )
        req = self._make_request(ids, request_id, **kwargs)
        req.prompt_embeds = embeds
        req.embeds_mask = mask
        req.is_multimodal = True
        req.media_spans = _media_spans(
            ids, mask, keys, [f.shape[0] for f in features]
        )
        return req

    def _make_qwen2_audio_request(
        self,
        token_ids: List[int],
        media: List[Dict[str, Any]],
        request_id: Optional[str] = None,
        **kwargs,
    ) -> Request:
        """Native audio-in-chat: waveforms -> encoder features (through
        the media-hash cache) -> expanded <|AUDIO|> rows."""
        import base64
        import tempfile

        from ..audio.mel import load_wav
        from ..cache.vision_embedding_cache import image_hash
        from ..media_fetch import resolve_media_source

        features: List[Any] = []
        keys: List[str] = []
        for m in media:
            if m.get("kind") != "audio":
                raise ValueError(
                    "this model accepts audio (not image/video) input"
                )
            src = resolve_media_source(m.get("src"), self.media_policy)
            if isinstance(src, str):
                src = base64.b64decode(src)
            key = image_hash(b"audio:" + src)
            keys.append(key)
            cached = self.vision_cache.get(key) if self.vision_cache else None
            if cached is None:
                with tempfile.NamedTemporaryFile(
                    suffix=f".{m.get('format', 'wav')}"
                ) as f:
                    f.write(src)
                    f.flush()
                    audio = load_wav(f.name)
                cached = self.vlm.encode_audio(audio)
                if self.vision_cache is not None:
                    self.vision_cache.put(key, cached)
            features.append(cached)
        ids, embeds, mask = self.vlm.build_multimodal_prompt(
            token_ids, features
        )
        req = self._make_request(ids, request_id, **kwargs)
        req.prompt_embeds = embeds
        req.embeds_mask = mask
        req.is_multimodal = True
        req.media_spans = _media_spans(
            ids, mask, keys, [f.shape[0] for f in features]
        )
        return req

    def _make_qwen_omni_request(
        self,
        token_ids: List[int],
        media: List[Dict[str, Any]],
        request_id: Optional[str] = None,
        **kwargs,
    ) -> Request:
        """Qwen2.5-Omni thinker: audio, image, and video media through
        their towers (content-hash cached), TMRoPE positions + decode
        delta. A video item carrying ``audio_src`` becomes the
        use_audio_in_video interleave (reference mllm.py:1578-1618
        A/V fusion; container audio demux needs ffmpeg — absent here —
        so the soundtrack arrives as a paired audio source)."""
        from ..cache.vision_embedding_cache import image_hash
        from ..media_fetch import resolve_media_source
        from ..multimodal_processor import (
            extract_video_frames,
            image_bytes_key,
            load_image,
            video_bytes_key,
        )

        def decode_audio(src, fmt):
            import base64
            import tempfile

            from ..audio.mel import load_wav

            if isinstance(src, str):
                src = base64.b64decode(src)
            key = image_hash(b"audio:" + src)
            cached = (
                self.vision_cache.get(key) if self.vision_cache else None
            )
            if cached is None:
                with tempfile.NamedTemporaryFile(
                    suffix=f".{fmt or 'wav'}"
                ) as f:
                    f.write(src)
                    f.flush()
                    wav = load_wav(f.name)
                cached = self.vlm.encode_audio(wav)
                if self.vision_cache is not None:
                    self.vision_cache.put(key, cached)
            return key, cached

        items: List[Dict[str, Any]] = []
        keys: List[str] = []
        for m in media:
            kind = m.get("kind", "image")
            if kind == "audio":
                src = resolve_media_source(m.get("src"), self.media_policy)
                key, feats = decode_audio(src, m.get("format"))
                items.append({"kind": "audio", "features": feats})
                keys.append(key)
                continue
            src = resolve_media_source(m.get("src"), self.media_policy)
            key = image_hash(
                (b"video:" if kind == "video" else b"image:")
                + (
                    video_bytes_key(src)
                    if kind == "video"
                    else image_bytes_key(src)
                )
            )
            cached = self.vision_cache.get(key)
            if cached is None:
                if kind == "video":
                    frames, spg = extract_video_frames(src)
                else:
                    frames, spg = [load_image(src)], 1.0
                flat, grid = self.image_processor.patchify(frames)
                feats = self.vlm.encode_media(flat, grid)
                self.vision_cache.put(key, (feats, grid, spg))
            else:
                feats, grid, spg = cached
            item = {
                "kind": kind,
                "features": feats,
                "grid": grid,
                "second_per_grid": spg,
            }
            if kind == "video" and m.get("audio_src"):
                asrc = resolve_media_source(
                    m["audio_src"], self.media_policy
                )
                akey, afeats = decode_audio(asrc, m.get("audio_format"))
                key = image_hash((key + akey).encode())
                item["kind"] = "video_audio"
                item["audio_features"] = afeats
            items.append(item)
            keys.append(key)
        ids, embeds, mask, positions, delta = (
            self.vlm.build_multimodal_prompt(token_ids, items)
        )
        req = self._make_request(ids, request_id, **kwargs)
        req.prompt_embeds = embeds
        req.embeds_mask = mask
        req.is_multimodal = True
        req.mrope_positions = positions
        req.mrope_delta = delta
        req.media_spans = _media_spans(
            ids,
            mask,
            keys,
            [
                i["features"].shape[0]
                + (
                    i["audio_features"].shape[0]
                    if "audio_features" in i
                    else 0
                )
                for i in items
            ],
        )
        return req

    def _make_qwen_vl_request(
        self,
        token_ids: List[int],
        media: List[Dict[str, Any]],
        request_id: Optional[str] = None,
        **kwargs,
    ) -> Request:
        """Qwen-VL: per-media dynamic-resolution patchify + encode
        (vision cache holds (features, grid, second_per_grid_t) per
        content hash), M-RoPE prompt positions + decode delta. Videos
        are smart-sampled into frame stacks (grid_t > 1)."""
        from ..cache.vision_embedding_cache import image_hash
        from ..media_fetch import resolve_media_source
        from ..multimodal_processor import (
            extract_video_frames,
            image_bytes_key,
            load_image,
            video_bytes_key,
        )

        features: List[Any] = []
        grids: List[Any] = []
        spgs: List[float] = []
        keys: List[str] = []
        for m in media:
            kind = m.get("kind", "image")
            src = resolve_media_source(m.get("src"), self.media_policy)
            key = image_hash(
                (b"video:" if kind == "video" else b"image:")
                + (
                    video_bytes_key(src)
                    if kind == "video"
                    else image_bytes_key(src)
                )
            )
            keys.append(key)
            cached = self.vision_cache.get(key)
            if cached is None:
                if kind == "video":
                    frames, spg = extract_video_frames(src)
                else:
                    frames, spg = [load_image(src)], 1.0
                flat, grid = self.image_processor.patchify(frames)
                feats = self.vlm.encode_media(flat, grid)
                self.vision_cache.put(key, (feats, grid, spg))
            else:
                feats, grid, spg = cached
            features.append(feats)
            grids.append(grid)
            spgs.append(spg)
        if self.vlm_kind == "qwen3_vl":
            ids, embeds, mask, positions, delta, deepstack = (
                self.vlm.build_multimodal_prompt(
                    token_ids, features, grids,
                    second_per_grid_ts=spgs,
                )
            )
        else:
            ids, embeds, mask, positions, delta = (
                self.vlm.build_multimodal_prompt(
                    token_ids, features, grids, second_per_grid_ts=spgs
                )
            )
            deepstack = None
        req = self._make_request(ids, request_id, **kwargs)
        req.prompt_embeds = embeds
        req.embeds_mask = mask
        req.is_multimodal = True
        req.mrope_positions = positions
        req.mrope_delta = delta
        req.deepstack_embeds = deepstack
        req.media_spans = _media_spans(
            ids,
            mask,
            keys,
            [
                (f[0] if isinstance(f, tuple) else f).shape[0]
                for f in features
            ],
        )
        return req

    def apply_chat_template(
        self,
        messages: List[Dict[str, Any]],
        tools: Optional[List[Dict[str, Any]]] = None,
        chat_template_kwargs: Optional[Dict[str, Any]] = None,
    ) -> str:
        from ..api.prompt_canonicalize import canonicalize_messages

        messages = canonicalize_messages(messages)
        if (
            self._model_config is not None
            and self._model_config.model_type == "gpt_oss"
        ):
            # canonical Harmony rendering: byte-stable prompts (pinned
            # date, sorted tool schemas) for the prefix cache + correct
            # channel framing for the harmony parsers (reference
            # utils/harmony_render.py:217)
            from ..utils.harmony_render import render_harmony_prompt

            kw = chat_template_kwargs or {}
            return render_harmony_prompt(
                messages,
                tools,
                reasoning_effort=kw.get("reasoning_effort", "medium"),
            )
        return apply_chat_template(
            self._tokenizer,
            messages,
            tools=tools,
            chat_template_kwargs=chat_template_kwargs,
        )

    # ------------------------------------------------------------------ admin
    def abort_request(self, request_id: str) -> None:
        if self.core is not None:
            self.core.abort_request(request_id)

    def get_stats(self) -> Dict[str, Any]:
        stats: Dict[str, Any] = {
            "engine": "batched",
            "model": self.model_path,
            "running": self._running,
        }
        if self.core is not None:
            stats.update(self.core.get_stats())
        if self.prefix_cache is not None and self.scheduler is not None:
            stats["prefix_cache"] = self.prefix_cache.get_stats(
                self.scheduler.block_mgr
            )
        if self.vision_cache is not None:
            stats["vision_cache"] = self.vision_cache.get_stats()
        if self.scheduler is not None:
            stats["requests"] = self.scheduler.request_status()
        return stats

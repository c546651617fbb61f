# SPDX-License-Identifier: Apache-2.0
"""Model and engine configuration.

Parses HuggingFace ``config.json`` files into a single normalized
:class:`ModelConfig` covering the dense (Llama/Qwen2/Qwen3) and MoE
(Qwen3-MoE) families, plus engine-level knobs (paged-KV geometry,
scheduler limits) in :class:`CacheConfig` / :class:`EngineConfig`.

Reference parity: the reference delegates model config handling to
mlx-lm; here it is first-class because the TPU build owns its model zoo
(see SURVEY.md section 0.1).
"""

from __future__ import annotations

import dataclasses
import json
import os
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional


@dataclass
class ModelConfig:
    """Normalized decoder-LM architecture description (HF-compatible)."""

    model_type: str = "llama"
    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_hidden_layers: int = 32
    num_attention_heads: int = 32
    num_key_value_heads: int = 32
    head_dim: Optional[int] = None
    rms_norm_eps: float = 1e-6
    rope_theta: float = 10000.0
    rope_scaling: Optional[Dict[str, Any]] = None
    max_position_embeddings: int = 131072
    tie_word_embeddings: bool = False
    attention_bias: bool = False
    mlp_bias: bool = False
    # Qwen3: q/k per-head RMSNorm
    use_qk_norm: bool = False
    # Sliding-window attention (None = full attention on every layer)
    sliding_window: Optional[int] = None
    layer_types: Optional[List[str]] = None  # "full_attention" | "sliding_attention"
    # MoE (Qwen3-MoE style)
    num_experts: int = 0
    num_experts_per_tok: int = 0
    moe_intermediate_size: int = 0
    decoder_sparse_step: int = 1
    mlp_only_layers: List[int] = field(default_factory=list)
    norm_topk_prob: bool = True
    # Gemma-family deltas
    embed_scale: Optional[float] = None  # sqrt(hidden) input scaling
    hidden_act: str = "silu"
    rms_add_one: bool = False  # RMSNorm uses (1 + weight)
    sandwich_norms: bool = False  # post-sublayer norms (gemma2/3)
    attn_softcap: Optional[float] = None
    final_softcap: Optional[float] = None
    attn_scale: Optional[float] = None  # overrides head_dim**-0.5
    # Qwen-VL multimodal RoPE: per-(t,h,w)-component channel sections of
    # the rotary half-dim (HF ``rope_scaling.mrope_section``). Text-only
    # requests on an mrope model use equal components == plain RoPE.
    mrope_section: Optional[List[int]] = None
    # Partial rotary (Bamba/Nemotron style): rope applies to the first
    # head_dim * factor channels only
    partial_rotary_factor: float = 1.0
    # Hybrid SSM (Mamba2/Bamba): layer_types entries "mamba" use the
    # SSD mixer instead of attention; mamba_cfg holds its geometry.
    # block_has_mlp=False for pure Mamba2 (block = norm -> mixer only).
    mamba_cfg: Optional[Dict[str, Any]] = None
    block_has_mlp: bool = True
    # Generation defaults
    bos_token_id: Optional[int] = None
    eos_token_ids: List[int] = field(default_factory=list)
    # Compute dtype for activations/weights on device.
    dtype: str = "bfloat16"

    def __post_init__(self) -> None:
        if self.head_dim is None:
            self.head_dim = self.hidden_size // self.num_attention_heads

    @property
    def is_moe(self) -> bool:
        return self.num_experts > 0

    def moe_layer_indices(self) -> List[int]:
        """Layers that use the sparse MoE block (Qwen3-MoE semantics)."""
        if not self.is_moe:
            return []
        out = []
        for i in range(self.num_hidden_layers):
            if i in self.mlp_only_layers:
                continue
            if self.num_experts > 0 and (i + 1) % self.decoder_sparse_step == 0:
                out.append(i)
        return out

    @classmethod
    def from_hf_config(cls, cfg: Dict[str, Any]) -> "ModelConfig":
        """Build from a parsed HF ``config.json`` dict."""
        model_type = cfg.get("model_type", "llama")
        eos = cfg.get("eos_token_id")
        if eos is None:
            eos_ids: List[int] = []
        elif isinstance(eos, int):
            eos_ids = [eos]
        else:
            eos_ids = list(eos)
        kw: Dict[str, Any] = dict(
            model_type=model_type,
            vocab_size=cfg.get("vocab_size", 32000),
            hidden_size=cfg.get("hidden_size", 4096),
            intermediate_size=cfg.get("intermediate_size", 11008),
            num_hidden_layers=cfg.get("num_hidden_layers", 32),
            num_attention_heads=cfg.get("num_attention_heads", 32),
            num_key_value_heads=cfg.get(
                "num_key_value_heads", cfg.get("num_attention_heads", 32)
            ),
            head_dim=cfg.get("head_dim"),
            rms_norm_eps=cfg.get("rms_norm_eps", 1e-6),
            rope_theta=cfg.get("rope_theta", 10000.0),
            rope_scaling=cfg.get("rope_scaling"),
            max_position_embeddings=cfg.get("max_position_embeddings", 131072),
            tie_word_embeddings=cfg.get("tie_word_embeddings", False),
            attention_bias=cfg.get("attention_bias", model_type == "qwen2"),
            mlp_bias=cfg.get("mlp_bias", False),
            bos_token_id=cfg.get("bos_token_id"),
            eos_token_ids=eos_ids,
            sliding_window=cfg.get("sliding_window")
            if cfg.get("use_sliding_window", True)
            else None,
            layer_types=cfg.get("layer_types"),
        )
        if model_type in ("qwen3", "qwen3_moe", "qwen3_vl_text"):
            kw["use_qk_norm"] = True
        if model_type in ("qwen2_vl_text", "qwen2_5_vl_text", "qwen2_vl", "qwen2_5_vl"):
            # Qwen-VL text stacks are Qwen2-style (qkv bias)
            kw["attention_bias"] = True
        rs = cfg.get("rope_scaling") or {}
        if rs.get("mrope_section"):
            kw["mrope_section"] = list(rs["mrope_section"])
        if cfg.get("partial_rotary_factor"):
            kw["partial_rotary_factor"] = float(cfg["partial_rotary_factor"])
        if model_type == "mamba2":
            n_layers = cfg.get("num_hidden_layers", 64)
            kw.update(
                layer_types=["mamba"] * n_layers,
                block_has_mlp=False,
                intermediate_size=0,
                rms_norm_eps=cfg.get("layer_norm_epsilon", 1e-5),
                mamba_cfg=dict(
                    num_heads=cfg.get("num_heads", 128),
                    head_dim=cfg.get("head_dim", 64),
                    state_size=cfg.get("state_size", 128),
                    n_groups=cfg.get("n_groups", 8),
                    conv_kernel=cfg.get("conv_kernel", 4),
                    intermediate_size=int(
                        cfg.get("expand", 2) * cfg.get("hidden_size", 4096)
                    ),
                    use_conv_bias=cfg.get("use_conv_bias", True),
                    use_bias=cfg.get("use_bias", False),
                    norm_eps=cfg.get("layer_norm_epsilon", 1e-5),
                    time_step_limit=tuple(
                        cfg.get("time_step_limit", (0.0, float("inf")))
                    ),
                    chunk_size=cfg.get("chunk_size", 256),
                ),
                tie_word_embeddings=cfg.get("tie_word_embeddings", False),
            )
            kw["head_dim"] = cfg.get("head_dim", 64)
        if model_type == "bamba":
            n_layers = cfg.get("num_hidden_layers", 32)
            attn_idx = set(cfg.get("attn_layer_indices") or [])
            kw.update(
                layer_types=[
                    "full_attention" if i in attn_idx else "mamba"
                    for i in range(n_layers)
                ],
                block_has_mlp=True,
                partial_rotary_factor=float(
                    cfg.get("partial_rotary_factor", 0.5)
                ),
                attention_bias=cfg.get("attention_bias", False),
                mamba_cfg=dict(
                    num_heads=cfg.get("mamba_n_heads", 128),
                    head_dim=(
                        cfg["mamba_d_head"]
                        if isinstance(cfg.get("mamba_d_head"), int)
                        else int(
                            cfg.get("mamba_expand", 2)
                            * cfg.get("hidden_size", 4096)
                        ) // cfg.get("mamba_n_heads", 128)
                    ),
                    state_size=cfg.get("mamba_d_state", 256),
                    n_groups=cfg.get("mamba_n_groups", 1),
                    conv_kernel=cfg.get("mamba_d_conv", 4),
                    intermediate_size=int(
                        cfg.get("mamba_expand", 2)
                        * cfg.get("hidden_size", 4096)
                    ),
                    use_conv_bias=cfg.get("mamba_conv_bias", True),
                    use_bias=cfg.get("mamba_proj_bias", False),
                    norm_eps=cfg.get("rms_norm_eps", 1e-5),
                    time_step_limit=(0.0, float("inf")),
                    chunk_size=cfg.get("mamba_chunk_size", 256),
                ),
            )
        if model_type in ("gemma2", "gemma3_text"):
            qpas = cfg.get("query_pre_attn_scalar")
            kw.update(
                embed_scale=float(cfg.get("hidden_size", 0)) ** 0.5,
                hidden_act=cfg.get(
                    "hidden_activation",
                    cfg.get("hidden_act", "gelu_pytorch_tanh"),
                ),
                rms_add_one=True,
                sandwich_norms=True,
                attn_softcap=cfg.get("attn_logit_softcapping"),
                final_softcap=cfg.get("final_logit_softcapping"),
                attn_scale=(qpas ** -0.5) if qpas else None,
                tie_word_embeddings=cfg.get("tie_word_embeddings", True),
            )
            if model_type == "gemma3_text":
                kw["use_qk_norm"] = True
                kw["attn_softcap"] = None
        if model_type == "qwen2":
            # Qwen2 has bias on qkv only; handled by loader (missing biases -> zeros)
            kw["attention_bias"] = True
        if model_type in ("qwen3_moe",):
            kw.update(
                num_experts=cfg.get("num_experts", 0),
                num_experts_per_tok=cfg.get("num_experts_per_tok", 0),
                moe_intermediate_size=cfg.get("moe_intermediate_size", 0),
                decoder_sparse_step=cfg.get("decoder_sparse_step", 1),
                mlp_only_layers=cfg.get("mlp_only_layers", []) or [],
                norm_topk_prob=cfg.get("norm_topk_prob", True),
            )
        return cls(**kw)

    @classmethod
    def from_pretrained(cls, model_path: str) -> "ModelConfig":
        with open(os.path.join(model_path, "config.json")) as f:
            return cls.from_hf_config(json.load(f))

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)


@dataclass
class CacheConfig:
    """Paged-KV pool geometry.

    The KV pool is a single per-layer-stacked array
    ``[num_layers, num_blocks, block_size, 2, num_kv_heads, head_dim]``
    preallocated at startup (the TPU-native replacement for the
    reference's dynamically grown per-request KVCache objects,
    reference scheduler.py:1984-2138).
    """

    block_size: int = 32
    num_blocks: int = 512
    # KV dtype: "bfloat16" | "float32" | "fp8_e4m3" | "fp8_e5m2" | "int8"
    # (fp8/int8 halve KV memory vs bf16 and double effective HBM
    # bandwidth in decode; int8 stores value/kv_scale, dequantized by
    # the attention kernel — reference memory_cache.py:491-595)
    kv_dtype: str = "bfloat16"
    # int8 KV quantization step (value = stored * kv_scale)
    kv_scale: float = 0.1
    # Fraction of HBM to dedicate to KV when auto-sizing.
    memory_utilization: float = 0.85
    # Host-DRAM spill tier for evicted prefix blocks (0 disables);
    # optional disk layer below it for restart persistence.
    host_cache_bytes: int = 2 * 1024**3
    disk_cache_dir: Optional[str] = None

    @property
    def tokens_capacity(self) -> int:
        return self.block_size * self.num_blocks


@dataclass
class SchedulerConfig:
    """Continuous-batching limits (reference scheduler.py:74-139)."""

    max_num_seqs: int = 64
    max_prefill_tokens: int = 2048  # per-step prefill token budget
    prefill_chunk_sizes: List[int] = field(default_factory=lambda: [128, 512, 2048])
    max_queued_requests: int = 1024
    enable_prefix_cache: bool = True
    prefix_cache_max_entries: int = 512
    # Decode steps to run between prefill chunks when both are pending
    decode_interleave: int = 1
    # MoE expert-reduction override (reference docs/guides/moe-top-k.md)
    moe_top_k: Optional[int] = None
    # Cap on per-sequence context length (block table width)
    max_model_len: int = 4096
    # Rotating attention window (reference max_kv_size,
    # scheduler.py:129,2027-2032): attention reads only the last N
    # tokens on EVERY layer and KV blocks that fall fully behind the
    # window are reclaimed, bounding per-sequence KV memory for long
    # generations (lossy beyond the window, like mlx RotatingKVCache).
    max_kv_size: Optional[int] = None
    # Chained decode steps per dispatch on the fast path (amortizes
    # host-side dispatch/fetch overhead; >1 coarsens streaming
    # granularity and adds up to N-1 zombie tokens after a stop).
    # On this platform one dispatch costs ~1.5 ms and one fetch ~2 ms
    # against a ~1 ms device step, so bundling 16 steps per dispatch
    # roughly triples single-stream decode throughput (measured
    # 8 -> 387 tok/s, 16 -> 603, 32 -> 766 on Qwen3-0.6B int8); 16 is
    # the default balance, 32 the max-throughput setting
    # (`--decode-steps`).
    decode_steps_per_dispatch: int = 16


@dataclass
class EngineConfig:
    model_path: str = ""
    cache: CacheConfig = field(default_factory=CacheConfig)
    scheduler: SchedulerConfig = field(default_factory=SchedulerConfig)
    # Mesh geometry: data-parallel x tensor-parallel
    tp_size: int = 1
    dp_size: int = 1
    seed: int = 0

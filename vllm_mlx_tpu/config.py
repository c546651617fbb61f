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
    # OLMo2: q/k norm over the FULL projection width (before head
    # reshape) instead of per head
    qk_norm_flat: bool = False
    # Hunyuan: per-head qk-norm applied AFTER rope (HF
    # HunYuanDenseV1Attention.forward order)
    qk_norm_after_rope: bool = False
    # Persimmon: per-head qk LayerNorm with weight AND bias
    qk_norm_layernorm: bool = False
    # Llama 4: weightless L2 norm (x * rsqrt(mean(x^2) + eps)) on q/k
    # (HF Llama4TextL2Norm), applied AFTER rope and ONLY on rope layers
    qk_norm_weightless: bool = False
    qk_norm_rope_only: bool = False
    # Llama 4 chunked attention: layer_types "chunked_attention" layers
    # attend only within aligned position chunks of this size (HF
    # create_chunked_causal_mask); NoPE layers stay full-causal
    attn_chunk_size: Optional[int] = None
    # Llama 4 attention temperature tuning (arXiv 2501.19399): on NoPE
    # layers q *= log1p(floor((pos+1)/floor)) * scale + 1
    attn_temp_tuning: bool = False
    attn_temp_floor: float = 8192.0
    attn_temp_scale: float = 0.1
    # OLMo/OLMoE/DBRX: clamp q/k/v projections to [-clip, clip]
    clip_qkv: Optional[float] = None
    # OLMo2 block: attention/MLP read the RAW residual stream; norms
    # apply to the sublayer OUTPUTS before the residual add
    post_norm_blocks: bool = False
    # EXAONE4 hybrids: global (full-attention) layers use NoPE — rope
    # applies only on sliding layers (HF Exaone4Attention.forward)
    nope_full_layers: bool = False
    # Granite 4.0 hybrids: no rotary embeddings at all
    # (position_embedding_type != "rope" — HF GraniteMoeHybridModel)
    use_rope: bool = True
    # SmolLM3: explicit per-layer NoPE (HF no_rope_layers, 0 = no rope)
    nope_layers: Optional[List[int]] = None
    # GPT-BigCode/StarCoder-1: learned absolute position embeddings
    # added to the token embeddings (HF GPTBigCodeModel wpe)
    learned_pos_embed: bool = False
    # Dual rope (Gemma3 rope_local_base_freq / OLMo3 per-layer-type
    # rotary): sliding_attention layers use THIS theta with NO scaling;
    # full layers use rope_theta + rope_scaling
    rope_local_theta: Optional[float] = None
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
    # MoE router/expert style:
    #   "qwen"     — softmax over all experts -> top-k (-> renorm);
    #                separate gate/up/down expert weights (also Mixtral)
    #   "gpt_oss"  — top-k on raw logits -> softmax over selected;
    #                fused gate_up experts with biases + clamped GLU
    #   "deepseek_v2"/"deepseek_v3" — (softmax | sigmoid+bias) scores,
    #                group-limited top-k, shared experts, scaling factor
    moe_style: str = "qwen"
    swiglu_limit: float = 7.0  # gpt_oss activation clamp
    first_k_dense: int = 0  # deepseek: dense MLP on the first k layers
    n_group: int = 1  # deepseek group-limited routing
    topk_group: int = 1
    routed_scaling_factor: float = 1.0
    # deepseek shared experts: dense MLP of this intermediate size added
    # to every MoE layer's routed output (n_shared * moe_intermediate)
    moe_shared_intermediate: int = 0
    moe_topk_method: str = "greedy"  # | "group_limited_greedy" | "noaux_tc"
    # ERNIE MoE renorm clamp floor (HF moe_norm_min)
    moe_norm_min: float = 1e-12
    # PhiMoE sparsemixer: sparsity threshold (HF router_jitter_noise;
    # jitter itself is training-only)
    router_jitter_eps: float = 0.01
    # GPT-OSS: learned per-q-head attention sink logits join the softmax
    has_sinks: bool = False
    # DeepSeek multi-head latent attention geometry (None = MHA/GQA).
    # Serving stores the DECOMPRESSED per-head K (nope|rope) and V
    # (zero-padded to qk head_dim) in the paged pool — correct and
    # kernel-compatible; latent-space absorbed attention is a future
    # memory optimization.
    mla: Optional[Dict[str, Any]] = None
    # Gemma-family deltas
    embed_scale: Optional[float] = None  # sqrt(hidden) input scaling
    hidden_act: str = "silu"
    rms_add_one: bool = False  # RMSNorm uses (1 + weight)
    # Block norm type: "rms" | "layernorm" (Starcoder2/Phi: weight +
    # bias) | "layernorm_nobias" (Cohere: mean-centered, weight only) |
    # "layernorm1p" (Nemotron: (1 + weight) scale and bias)
    norm_type: str = "rms"
    # Parallel residual block (Phi/Cohere): ONE shared input_layernorm;
    # x = x + attn(norm(x)) + mlp(norm(x)) (HF PhiDecoderLayer /
    # CohereDecoderLayer forward)
    parallel_residual: bool = False
    # GPT-NeoX variant: the parallel MLP reads its OWN pre-norm
    # (post_attention_layernorm) of the raw stream:
    # x = x + attn(ln1(x)) + mlp(ln2(x)) (HF GPTNeoXLayer)
    parallel_residual_separate_norms: bool = False
    # Cohere: logits multiplied by logit_scale (HF CohereForCausalLM);
    # Granite folds 1/logits_scaling into this
    logit_scale: Optional[float] = None
    # Granite: sublayer outputs scaled before the residual add
    # (HF GraniteDecoderLayer residual_multiplier)
    residual_multiplier: float = 1.0
    sandwich_norms: bool = False  # post-sublayer norms (gemma2/3)
    attn_softcap: Optional[float] = None
    final_softcap: Optional[float] = None
    attn_scale: Optional[float] = None  # overrides head_dim**-0.5
    # Qwen-VL multimodal RoPE: per-(t,h,w)-component channel sections of
    # the rotary half-dim (HF ``rope_scaling.mrope_section``). Text-only
    # requests on an mrope model use equal components == plain RoPE.
    mrope_section: Optional[List[int]] = None
    # Qwen3-VL: interleaved M-RoPE — channels cycle [T H W T H W ...]
    # instead of chunked sections (HF apply_interleaved_mrope)
    mrope_interleaved: bool = False
    # Qwen3-VL deepstack: visual features from intermediate ViT layers
    # are ADDED to the LM's hidden states after layers 0..n-1 at visual
    # rows (HF Qwen3VLTextModel._deepstack_process)
    num_deepstack_layers: int = 0
    # Partial rotary (Bamba/Nemotron style): rope applies to the first
    # head_dim * factor channels only
    partial_rotary_factor: float = 1.0
    # GLM-4 rotary: adjacent channel PAIRS share an angle (HF glm4
    # repeat_interleaves the half-table) and rotate_half spans the
    # rotary dim — a distinct linear map from standard rope
    rope_glm: bool = False
    # Hybrid SSM (Mamba2/Bamba): layer_types entries "mamba" use the
    # SSD mixer instead of attention; mamba_cfg holds its geometry.
    # block_has_mlp=False for pure Mamba2 (block = norm -> mixer only).
    mamba_cfg: Optional[Dict[str, Any]] = None
    block_has_mlp: bool = True
    # MiniMax lightning attention: layer_types entries
    # "linear_attention" use the decayed linear-attention mixer;
    # linear_cfg holds {"block_size": N} for the prefill formulation.
    linear_cfg: Optional[Dict[str, Any]] = None
    # Qwen3-Next gated DeltaNet: layer_types entries "gdn" use the
    # delta-rule fast-weight mixer; gdn_cfg holds its geometry
    # (models/gated_deltanet.py DeltaNetConfig kwargs).
    gdn_cfg: Optional[Dict[str, Any]] = None
    # LFM2 gated short conv: layer_types entries "short_conv" use the
    # K-tap FIR mixer; conv_cfg = {"kernel": K} (models/short_conv.py)
    conv_cfg: Optional[Dict[str, Any]] = None
    # RecurrentGemma (Griffin): layer_types entries "rg_lru" use the
    # gated linear recurrence mixer; rglru_cfg holds its geometry
    # (models/rg_lru.py)
    rglru_cfg: Optional[Dict[str, Any]] = None
    # Qwen3-Next full-attention layers: q_proj emits [query | gate] per
    # head and the attention output is gated by sigmoid(gate) before
    # o_proj (HF Qwen3NextAttention.forward)
    attn_out_gate: bool = False
    # Qwen3-Next shared expert: dense MLP beside the routed experts,
    # scaled by sigmoid(shared_expert_gate(x)) (HF
    # Qwen3NextSparseMoeBlock; DeepSeek's shared experts are ungated)
    shared_expert_gated: bool = False
    # MiniMax norm-as-residual block: residual = input_layernorm(x)
    # (the un-normed input is DISCARDED) and the combine is
    # residual*alpha + sublayer_out*beta (HF MiniMaxDecoderLayer
    # forward). Keys: full_alpha/full_beta/linear_alpha/linear_beta
    # (attention combine per layer type), mlp_alpha/mlp_beta.
    residual_cfg: Optional[Dict[str, float]] = None
    # Gemma-3n text stack (model_type "gemma3n_text"): AltUp 4-stream
    # residuals, LAuReL, per-layer input embeddings, KV-shared layers
    # (layer_types "*_shared" entries attend the SOURCE layer's pool
    # without writing), activation-sparsity gelu. The dict holds the
    # extra geometry (models/gemma3n_text.py); the layer stack runs
    # through its own forward, not the generic _stack.
    gemma3n_cfg: Optional[Dict[str, Any]] = None
    # Mllama (Llama-3.2-Vision) text stack: layer_types entries
    # "cross_attention" attend per-slot CROSS-KV buffers (vision
    # features) instead of the paged pool — tanh-gated attention/MLP
    # with the full-text-row mask (HF MllamaCrossAttentionDecoderLayer;
    # reference serves this family via mlx-vlm)
    cross_attention_layers: Optional[List[int]] = None
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

    @property
    def has_recurrent(self) -> bool:
        """Any per-slot recurrent mixer layers (Mamba SSD or lightning
        linear attention)."""
        return (
            self.mamba_cfg is not None
            or self.gdn_cfg is not None
            or self.conv_cfg is not None
            or self.rglru_cfg is not None
            or (
                self.layer_types is not None
                and "linear_attention" in self.layer_types
            )
        )

    @property
    def has_cross(self) -> bool:
        """Any cross-attention layers (Mllama)."""
        return bool(self.cross_attention_layers)

    def moe_layer_indices(self) -> List[int]:
        """Layers that use the sparse MoE block (Qwen3-MoE
        decoder_sparse_step / DeepSeek first_k_dense_replace semantics)."""
        if not self.is_moe:
            return []
        out = []
        for i in range(self.num_hidden_layers):
            if i in self.mlp_only_layers or i < self.first_k_dense:
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
        if model_type in (
            "qwen3", "qwen3_moe", "qwen3_vl_text", "qwen3_vl_moe_text",
        ):
            kw["use_qk_norm"] = True
        if model_type in ("qwen3_vl_text", "qwen3_vl_moe_text"):
            kw["mrope_interleaved"] = True
        if model_type in (
            "qwen2_vl_text", "qwen2_5_vl_text", "qwen2_vl", "qwen2_5_vl",
            "qwen2_5_omni_text",
        ):
            # Qwen-VL / Omni-thinker text stacks are Qwen2-style (qkv bias)
            kw["attention_bias"] = True
        rs = cfg.get("rope_scaling") or {}
        if rs.get("mrope_section"):
            kw["mrope_section"] = list(rs["mrope_section"])
        if cfg.get("partial_rotary_factor"):
            kw["partial_rotary_factor"] = float(cfg["partial_rotary_factor"])
        if model_type == "gemma3n_text":
            # Gemma-3n (HF Gemma3nTextModel): AltUp + LAuReL + per-layer
            # embeddings + KV sharing. The last num_kv_shared_layers
            # layers reuse the KV written by the LAST non-shared layer
            # of the SAME attention type — marked "*_shared" here so the
            # runner allocates no pools for them.
            n_layers = cfg.get("num_hidden_layers", 35)
            lt = list(
                cfg.get("layer_types")
                or ["full_attention"] * n_layers
            )
            n_shared = cfg.get("num_kv_shared_layers", 0)
            first_shared = n_layers - n_shared
            marked = [
                t + "_shared" if i >= first_shared and n_shared > 0 else t
                for i, t in enumerate(lt)
            ]
            inter = cfg.get("intermediate_size", 16384)
            if isinstance(inter, list):
                inter_list = list(inter)
                inter = inter[0]
            else:
                inter_list = [inter] * n_layers
            kw.update(
                layer_types=marked,
                intermediate_size=inter,
                use_qk_norm=True,
                hidden_act=cfg.get("hidden_activation",
                                   "gelu_pytorch_tanh"),
                rope_local_theta=cfg.get("rope_local_base_freq", 10000.0),
                attn_scale=1.0,
                final_softcap=cfg.get("final_logit_softcapping"),
                embed_scale=float(cfg.get("hidden_size", 2048)) ** 0.5,
                tie_word_embeddings=True,
                gemma3n_cfg=dict(
                    altup_num_inputs=cfg.get("altup_num_inputs", 4),
                    altup_active_idx=cfg.get("altup_active_idx", 0),
                    altup_correct_scale=cfg.get("altup_correct_scale",
                                                True),
                    laurel_rank=cfg.get("laurel_rank", 64),
                    hidden_size_per_layer_input=cfg.get(
                        "hidden_size_per_layer_input", 256
                    ),
                    vocab_size_per_layer_input=cfg.get(
                        "vocab_size_per_layer_input", 262144
                    ),
                    num_kv_shared_layers=n_shared,
                    activation_sparsity_pattern=list(
                        cfg.get("activation_sparsity_pattern")
                        or [0.0] * n_layers
                    ),
                    intermediate_sizes=inter_list,
                ),
            )
            return cls(**kw)
        if model_type == "mllama_text_model":
            # Llama-3.2-Vision text stack (HF MllamaTextModel): standard
            # Llama self-attention layers with tanh-gated CROSS-attention
            # layers interleaved at cross_attention_layers; the <|image|>
            # token is NOT expanded — vision reaches the LM only through
            # the cross layers' per-request KV (models/mllama_mm.py)
            xl = list(cfg.get("cross_attention_layers") or [])
            n_layers = cfg.get("num_hidden_layers", 40)
            kw.update(
                cross_attention_layers=xl,
                layer_types=[
                    "cross_attention" if i in set(xl) else "full_attention"
                    for i in range(n_layers)
                ],
            )
            return cls(**kw)
        if model_type in ("mamba", "falcon_mamba"):
            # Mamba-1 / Falcon-Mamba (HF Mamba(FalconMamba)ForCausalLM):
            # pure selective-scan stack, block = norm -> mixer
            # (models/mamba1.py); falcon_mamba RMS-normalizes B/C/dt
            n_layers = cfg.get("num_hidden_layers", 64)
            hidden = cfg.get("hidden_size", 768)
            tsr = cfg.get("time_step_rank", "auto")
            if tsr == "auto" or tsr is None:
                tsr = -(-hidden // 16)
            kw.update(
                layer_types=["mamba"] * n_layers,
                block_has_mlp=False,
                intermediate_size=0,
                rms_norm_eps=cfg.get("layer_norm_epsilon", 1e-5),
                tie_word_embeddings=cfg.get("tie_word_embeddings", True),
                mamba_cfg=dict(
                    version=1,
                    d_inner=cfg.get(
                        "intermediate_size",
                        cfg.get("expand", 2) * hidden,
                    ),
                    d_state=cfg.get("state_size", 16),
                    dt_rank=int(tsr),
                    conv_kernel=cfg.get("conv_kernel", 4),
                    use_conv_bias=cfg.get("use_conv_bias", True),
                    use_bias=cfg.get("use_bias", False),
                    mixer_rms_eps=(
                        cfg.get("mixer_rms_eps", 1e-6)
                        if model_type == "falcon_mamba"
                        else None
                    ),
                ),
            )
        if model_type == "jamba":
            # Jamba (HF JambaForCausalLM): NoPE attention / Mamba-1
            # interleave (attn_layer_period/offset), MoE on
            # expert_layer_period/offset layers (presence of expert
            # tensors decides per layer at load), softmax-topk routing
            # WITHOUT renorm, learned dt/B/C RMSNorms in the mixer
            n_layers = cfg.get("num_hidden_layers", 32)
            hidden = cfg.get("hidden_size", 4096)
            ap = cfg.get("attn_layer_period", 8)
            ao = cfg.get("attn_layer_offset", 4)
            tsr = cfg.get("mamba_dt_rank", "auto")
            if tsr == "auto" or tsr is None:
                tsr = -(-hidden // 16)
            kw.update(
                layer_types=[
                    "full_attention" if i % ap == ao else "mamba"
                    for i in range(n_layers)
                ],
                use_rope=False,
                num_experts=cfg.get("num_experts", 0),
                num_experts_per_tok=cfg.get("num_experts_per_tok", 0),
                moe_intermediate_size=cfg.get("intermediate_size", 0),
                norm_topk_prob=False,
                tie_word_embeddings=cfg.get("tie_word_embeddings", True),
                mamba_cfg=dict(
                    version=1,
                    d_inner=cfg.get("mamba_expand", 2) * hidden,
                    d_state=cfg.get("mamba_d_state", 16),
                    dt_rank=int(tsr),
                    conv_kernel=cfg.get("mamba_d_conv", 4),
                    use_conv_bias=cfg.get("mamba_conv_bias", True),
                    use_bias=cfg.get("mamba_proj_bias", False),
                    norm_eps=cfg.get("rms_norm_eps", 1e-6),
                ),
            )
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
        if model_type == "recurrent_gemma":
            # RecurrentGemma / Griffin (HF RecurrentGemmaForCausalLM):
            # block_types tiles ['recurrent','recurrent','attention']
            # across the depth; attention layers are MQA with an
            # attention_window_size sliding window and partial (0.5)
            # rotary; recurrent layers are RG-LRU (models/rg_lru.py).
            # NOTE: HF's prefill mask is pure causal (the window only
            # binds at decode via its rotating cache, so HF prefill and
            # decode disagree for prompts longer than the window); we
            # apply the window uniformly — the paper's semantics, and
            # identical to HF whenever prompt_len <= window.
            # Embeds scale by sqrt(H) ROUNDED TO BF16 (HF stores the
            # normalizer as a bfloat16 tensor), (1+w) RMSNorm, gated
            # gelu-tanh MLP with biases on intermediate_size // 2 (HF
            # RecurrentGemmaMlp halves it), logits softcap 30.
            import ml_dtypes  # jax dependency: bf16 rounding only
            import numpy as _np

            n_layers = cfg.get("num_hidden_layers", 26)
            hidden = cfg.get("hidden_size", 2560)
            bt = cfg.get(
                "block_types", ["recurrent", "recurrent", "attention"]
            )
            kw.update(
                layer_types=[
                    "sliding_attention"
                    if bt[i % len(bt)] == "attention"
                    else "rg_lru"
                    for i in range(n_layers)
                ],
                sliding_window=cfg.get("attention_window_size", 2048),
                head_dim=cfg.get("head_dim", 256),
                intermediate_size=cfg.get("intermediate_size", 7680) // 2,
                hidden_act="gelu_pytorch_tanh",
                partial_rotary_factor=float(
                    cfg.get("partial_rotary_factor", 0.5)
                ),
                embed_scale=float(
                    _np.asarray(float(hidden) ** 0.5, ml_dtypes.bfloat16)
                ),
                rms_add_one=True,
                mlp_bias=True,
                final_softcap=cfg.get("logits_soft_cap", 30.0),
                tie_word_embeddings=cfg.get("tie_word_embeddings", True),
                rglru_cfg=dict(
                    lru_width=cfg.get("lru_width") or hidden,
                    num_blocks=cfg.get("num_attention_heads", 10),
                    conv_kernel=cfg.get("conv1d_width", 4),
                ),
            )
        if model_type == "gemma":
            # Gemma 1 (HF GemmaForCausalLM; PaliGemma's LM): sqrt(H)
            # embed scale + (1+w) RMSNorm, plain pre/post norms (no
            # gemma2 sandwich), gelu-tanh MLP, tied embeddings.
            # hidden_act="gelu" in legacy configs still means tanh-gelu
            # (HF GemmaMLP forces hidden_activation=gelu_pytorch_tanh)
            kw.update(
                embed_scale=float(cfg.get("hidden_size", 0)) ** 0.5,
                hidden_act=cfg.get(
                    "hidden_activation", "gelu_pytorch_tanh"
                ),
                rms_add_one=True,
                tie_word_embeddings=cfg.get("tie_word_embeddings", True),
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
                # sliding layers rotate with the LOCAL base frequency
                # (HF Gemma3TextModel rotary_emb_local)
                if cfg.get("rope_local_base_freq"):
                    kw["rope_local_theta"] = float(
                        cfg["rope_local_base_freq"]
                    )
        if model_type in ("glm4", "glm4v_text"):
            # GLM-4 (HF Glm4ForCausalLM): qkv bias, partial rotary with
            # pair-interleaved angles, gemma-style sandwich norms under
            # GLM names (loader remaps), fused gate_up MLP (loader
            # splits). GLM-4V's text stack is the same block with the
            # rotary over the FULL head dim (no partial_rotary_factor
            # attribute -> HF rope dim defaults to head_dim) + M-RoPE
            # sections (handled generically from rope_scaling)
            kw.update(
                attention_bias=cfg.get("attention_bias", True),
                partial_rotary_factor=float(
                    cfg.get(
                        "partial_rotary_factor",
                        1.0 if model_type == "glm4v_text" else 0.5,
                    )
                ),
                rope_glm=True,
                sandwich_norms=True,  # post_self_attn/post_mlp norms
            )
        if model_type in ("phi3", "phimoe"):
            # Phi-3 (HF Phi3ForCausalLM): llama-shaped with fused
            # qkv/gate_up projections (loader splits). PhiMoE
            # (Phi-3.5-MoE): LayerNorm (weight+bias) norms, mixtral
            # expert layout with SPARSEMIXER top-2 routing, biased
            # lm_head. Both use longrope scaling on the 128k variants:
            # inject the max lengths so ops/layers picks the factor set
            # statically (one self-consistent set per served context).
            rs_p = cfg.get("rope_scaling") or {}
            if rs_p.get("rope_type", rs_p.get("type")) == "longrope":
                rs_p = dict(rs_p)
                rs_p.setdefault(
                    "max_position_embeddings",
                    cfg.get("max_position_embeddings", 4096),
                )
                rs_p.setdefault(
                    "original_max_position_embeddings",
                    cfg.get(
                        "original_max_position_embeddings",
                        rs_p["max_position_embeddings"],
                    ),
                )
                kw["rope_scaling"] = rs_p
            if model_type == "phimoe":
                kw.update(
                    norm_type="layernorm",
                    rms_norm_eps=cfg.get("rms_norm_eps", 1e-5),
                    attention_bias=cfg.get("attention_bias", False),
                    num_experts=cfg.get("num_local_experts", 16),
                    num_experts_per_tok=cfg.get("num_experts_per_tok", 2),
                    moe_intermediate_size=cfg.get("intermediate_size", 0),
                    moe_style="phimoe",
                    router_jitter_eps=float(
                        cfg.get("router_jitter_noise", 0.01)
                    ),
                )
        if model_type == "lfm2":
            # Liquid LFM2 (HF Lfm2ForCausalLM): gated short-conv layers
            # interleaved with full attention (per-head qk RMSNorm,
            # out_proj naming); final norm is "embedding_norm"
            n_layers = cfg.get("num_hidden_layers", 16)
            hf_types = cfg.get("layer_types")
            if hf_types is None:
                attn = set(cfg.get("full_attn_idxs") or [])
                hf_types = [
                    "full_attention" if i in attn else "conv"
                    for i in range(n_layers)
                ]
            kw.update(
                layer_types=[
                    "short_conv" if lt == "conv" else lt
                    for lt in hf_types
                ],
                use_qk_norm=True,
                rms_norm_eps=cfg.get("norm_eps", 1e-5),
                conv_cfg=dict(kernel=cfg.get("conv_L_cache", 3)),
                tie_word_embeddings=cfg.get("tie_word_embeddings", True),
            )
        if model_type in ("hunyuan_v1_dense", "hunyuan"):
            # Tencent Hunyuan dense (HF HunYuanDenseV1ForCausalLM):
            # llama-shaped with per-head qk LayerNorm applied AFTER rope
            kw.update(use_qk_norm=True, qk_norm_after_rope=True)
        if model_type == "exaone4":
            # LG EXAONE 4.0 (HF Exaone4ForCausalLM): post-norm blocks,
            # per-head qk-norm, hybrid sliding pattern with NoPE on
            # global layers
            kw.update(
                post_norm_blocks=True,
                use_qk_norm=True,
                nope_full_layers=True,
            )
        if model_type == "ernie4_5":
            # Baidu ERNIE 4.5 (HF Ernie4_5ForCausalLM): llama-shaped
            # with a single use_bias switch for qkv/o/mlp biases
            kw.update(
                attention_bias=cfg.get("use_bias", False),
                mlp_bias=cfg.get("use_bias", False),
            )
        if model_type == "ernie4_5_moe":
            # ERNIE 4.5 MoE (HF Ernie4_5_MoeForCausalLM): softmax
            # scores with bias-corrected SELECTION, clamp-floored
            # renorm, optional fused shared experts; dense layers
            # outside [start_index, end_index] or off the interval
            n_layers = cfg.get("num_hidden_layers", 28)
            end = cfg.get("moe_layer_end_index", n_layers - 1)
            kw.update(
                attention_bias=cfg.get("use_bias", False),
                mlp_bias=cfg.get("use_bias", False),
                num_experts=cfg.get("moe_num_experts", 64),
                num_experts_per_tok=cfg.get("moe_k", 6),
                moe_intermediate_size=cfg.get("moe_intermediate_size", 0),
                decoder_sparse_step=cfg.get("moe_layer_interval", 1),
                first_k_dense=cfg.get("moe_layer_start_index", 0),
                mlp_only_layers=list(range(end + 1, n_layers)),
                moe_style="ernie",
                moe_norm_min=float(cfg.get("moe_norm_min", 1e-12)),
                moe_shared_intermediate=cfg.get("moe_num_shared_experts", 0)
                * cfg.get("moe_intermediate_size", 0),
            )
        if model_type in ("glm4_moe", "glm4v_moe_text"):
            # GLM-4.5/4.6 (HF Glm4MoeForCausalLM, served by the glm47
            # tool parser): DeepSeek-V3-style sigmoid+bias group-limited
            # routing with shared experts, but standard GQA attention
            # with half-style partial rotary and optional per-head
            # qk-norm (no MLA). GLM-4.5V's text stack (glm4v_moe_text)
            # is the same block + M-RoPE sections (generic handling)
            kw.update(
                num_experts=cfg.get("n_routed_experts", 128),
                num_experts_per_tok=cfg.get("num_experts_per_tok", 8),
                moe_intermediate_size=cfg.get("moe_intermediate_size", 0),
                first_k_dense=cfg.get("first_k_dense_replace", 1),
                n_group=cfg.get("n_group") or 1,
                topk_group=cfg.get("topk_group") or 1,
                routed_scaling_factor=float(
                    cfg.get("routed_scaling_factor", 1.0)
                ),
                norm_topk_prob=cfg.get("norm_topk_prob", True),
                moe_shared_intermediate=(cfg.get("n_shared_experts") or 0)
                * (cfg.get("moe_intermediate_size") or 0),
                moe_style="deepseek_v3",
                moe_topk_method="noaux_tc",
                use_qk_norm=cfg.get("use_qk_norm", False),
                partial_rotary_factor=float(
                    cfg.get("partial_rotary_factor", 0.5)
                ),
            )
        if model_type == "olmo3":
            # OLMo3 (HF Olmo3ForCausalLM): OLMo2's post-norm blocks +
            # full-width qk-norm, plus sliding/full hybrid layers where
            # sliding layers rotate WITHOUT the configured rope scaling
            kw.update(
                use_qk_norm=True,
                qk_norm_flat=True,
                post_norm_blocks=True,
            )
            if cfg.get("rope_scaling"):
                kw["rope_local_theta"] = float(
                    cfg.get("rope_theta", 10000.0)
                )
        if model_type == "olmo2":
            # OLMo2 (HF Olmo2ForCausalLM): post-norm blocks (sublayer
            # outputs normed before the residual add, raw-stream
            # inputs), full-width q/k RMSNorm
            kw.update(
                use_qk_norm=True,
                qk_norm_flat=True,
                post_norm_blocks=True,
            )
        if model_type in ("granite", "granitemoe", "granitemoeshared"):
            # IBM Granite / GraniteMoE (HF Granite(Moe)ForCausalLM):
            # llama-shaped with four mup-style scalar multipliers;
            # the MoE variant adds fused-GLU parallel experts with
            # topk-then-softmax routing; GraniteMoeShared additionally
            # runs a fused-GLU shared MLP on every layer (the Granite
            # 4.0 shared-MLP layout, loaded via the same path)
            kw.update(
                embed_scale=float(cfg.get("embedding_multiplier", 1.0)),
                attn_scale=float(cfg.get("attention_multiplier", 1.0)),
                residual_multiplier=float(
                    cfg.get("residual_multiplier", 1.0)
                ),
                logit_scale=1.0 / float(cfg.get("logits_scaling", 1.0)),
                tie_word_embeddings=cfg.get("tie_word_embeddings", True),
            )
            if model_type in ("granitemoe", "granitemoeshared"):
                kw.update(
                    num_experts=cfg.get("num_local_experts", 8),
                    num_experts_per_tok=cfg.get("num_experts_per_tok", 2),
                    moe_intermediate_size=cfg.get("intermediate_size", 0),
                    moe_style="granite",
                )
        if model_type == "granitemoehybrid":
            # IBM Granite 4.0 (HF GraniteMoeHybridForCausalLM): Granite
            # multipliers + mamba/attention hybrid layers (NoPE unless
            # position_embedding_type == "rope") + GraniteMoE experts
            # with a fused-GLU shared MLP added on every layer
            # transformers serializes layers_block_type as "layer_types"
            blocks = (
                cfg.get("layers_block_type")
                or cfg.get("layer_types")
                or []
            )
            kw.update(
                embed_scale=float(cfg.get("embedding_multiplier", 1.0)),
                attn_scale=float(cfg.get("attention_multiplier", 1.0)),
                residual_multiplier=float(
                    cfg.get("residual_multiplier", 1.0)
                ),
                logit_scale=1.0 / float(cfg.get("logits_scaling", 1.0)),
                use_rope=cfg.get("position_embedding_type") == "rope",
                layer_types=[
                    "mamba" if b == "mamba" else "full_attention"
                    for b in blocks
                ],
                num_experts=cfg.get("num_local_experts", 0),
                num_experts_per_tok=cfg.get("num_experts_per_tok", 0),
                moe_intermediate_size=cfg.get("intermediate_size", 0),
                moe_style="granite",
                moe_shared_intermediate=cfg.get(
                    "shared_intermediate_size", 0
                ),
                mamba_cfg=dict(
                    num_heads=cfg.get("mamba_n_heads", 128),
                    head_dim=cfg.get("mamba_d_head", 64),
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
                    chunk_size=256,
                ),
            )
        if model_type == "phi":
            # Phi-1/2 (HF PhiForCausalLM): parallel residual with one
            # shared LayerNorm, biased projections (o_proj named
            # "dense"), gelu_new fc1/fc2 MLP, partial rotary, biased
            # lm_head
            kw.update(
                norm_type="layernorm",
                parallel_residual=True,
                rms_norm_eps=cfg.get("layer_norm_eps", 1e-5),
                attention_bias=True,
                mlp_bias=True,
                hidden_act=cfg.get("hidden_act", "gelu_new"),
                partial_rotary_factor=float(
                    cfg.get("partial_rotary_factor", 0.5)
                ),
            )
        if model_type in ("cohere", "cohere2"):
            # Cohere Command-R (HF CohereForCausalLM): parallel residual,
            # mean-centered bias-free LayerNorm, INTERLEAVED rotary
            # (adjacent pairs share an angle — the GLM-4 map at full
            # width), logits scaled by logit_scale, tied embeddings;
            # optional per-head qk LayerNorm ([heads, head_dim] weights).
            # Cohere2 (Command R7B) adds sliding/full layer interleave
            # where FULL layers are NoPE (rope only on sliding layers —
            # the EXAONE4 mechanism; layer_types come in generically)
            if model_type == "cohere2":
                kw["nope_full_layers"] = True
            kw.update(
                norm_type="layernorm_nobias",
                parallel_residual=True,
                rms_norm_eps=cfg.get("layer_norm_eps", 1e-5),
                rope_glm=True,
                partial_rotary_factor=1.0,
                logit_scale=float(cfg.get("logit_scale", 1.0)),
                use_qk_norm=cfg.get("use_qk_norm", False),
                tie_word_embeddings=cfg.get("tie_word_embeddings", True),
                attention_bias=cfg.get("attention_bias", False),
            )
        if model_type == "starcoder2":
            # Starcoder2 (HF Starcoder2ForCausalLM): plain LayerNorm
            # norms (with bias), biased qkv/mlp, gateless
            # gelu_pytorch_tanh MLP (c_fc/c_proj), tied embeddings
            kw.update(
                norm_type="layernorm",
                rms_norm_eps=cfg.get("norm_epsilon", 1e-5),
                attention_bias=cfg.get("use_bias", True),
                mlp_bias=cfg.get("use_bias", True),
                hidden_act=cfg.get("hidden_act", "gelu_pytorch_tanh"),
                tie_word_embeddings=cfg.get("tie_word_embeddings", True),
            )
        if model_type == "gpt_bigcode":
            # GPT-BigCode / StarCoder-1 (HF GPTBigCodeForCausalLM):
            # GPT-2 geometry names (n_embd/n_layer/n_head), learned
            # absolute positions (wpe) instead of rope, MQA (1 kv head
            # when multi_query), plain LayerNorms + biased projections,
            # gateless tanh-gelu MLP, tied embeddings
            heads = cfg.get("n_head", cfg.get("num_attention_heads", 12))
            kw.update(
                hidden_size=cfg.get("n_embd", cfg.get("hidden_size", 768)),
                num_hidden_layers=cfg.get(
                    "n_layer", cfg.get("num_hidden_layers", 12)
                ),
                num_attention_heads=heads,
                num_key_value_heads=(
                    1 if cfg.get("multi_query", True) else heads
                ),
                intermediate_size=cfg.get(
                    "n_inner", cfg.get("intermediate_size")
                )
                or 4 * cfg.get("n_embd", 768),
                max_position_embeddings=cfg.get("n_positions", 1024),
                norm_type="layernorm",
                rms_norm_eps=cfg.get("layer_norm_epsilon", 1e-5),
                hidden_act=cfg.get(
                    "activation_function", "gelu_pytorch_tanh"
                ),
                attention_bias=True,
                mlp_bias=True,
                use_rope=False,
                learned_pos_embed=True,
                tie_word_embeddings=cfg.get("tie_word_embeddings", True),
                attn_scale=(
                    None if cfg.get("scale_attn_weights", True) else 1.0
                ),
            )
        if model_type == "falcon":
            # Falcon 7B-class (HF FalconForCausalLM,
            # new_decoder_architecture=False): fused MQA qkv, parallel
            # attention+MLP over ONE input layernorm when parallel_attn,
            # plain LayerNorms, gateless (non-tanh) gelu MLP
            if cfg.get("new_decoder_architecture"):
                raise NotImplementedError(
                    "falcon new_decoder_architecture (40B/180B "
                    "interleaved-GQA layout) is not supported yet"
                )
            if cfg.get("alibi"):
                raise NotImplementedError("falcon alibi is not supported")
            heads = cfg.get("num_attention_heads", 71)
            if not cfg.get("multi_query", True):
                raise NotImplementedError(
                    "falcon multi_query=False (interleaved fused qkv) "
                    "is not supported yet"
                )
            kw.update(
                num_key_value_heads=1,
                norm_type="layernorm",
                rms_norm_eps=cfg.get("layer_norm_epsilon", 1e-5),
                hidden_act=cfg.get("activation", "gelu"),
                attention_bias=cfg.get("bias", False),
                mlp_bias=cfg.get("bias", False),
                parallel_residual=cfg.get("parallel_attn", True),
                tie_word_embeddings=cfg.get("tie_word_embeddings", True),
                intermediate_size=cfg.get("ffn_hidden_size")
                or 4 * cfg.get("hidden_size", 4544),
            )
        if model_type == "apertus":
            # Apertus (HF ApertusForCausalLM): per-head qk RMSNorm
            # before rope + gateless xIELU MLP with per-layer learnable
            # alpha_p/alpha_n (transformers XIELUActivation)
            kw.update(
                use_qk_norm=True,
                hidden_act=cfg.get("hidden_act", "xielu"),
                tie_word_embeddings=cfg.get("tie_word_embeddings", False),
            )
        if model_type == "smollm3":
            # SmolLM3 (HF SmolLM3ForCausalLM): llama stack with
            # explicit per-layer NoPE — no_rope_layers[i] == 0 means
            # layer i skips rope entirely
            nrl = cfg.get("no_rope_layers")
            if nrl:
                kw["nope_layers"] = [
                    i for i, on in enumerate(nrl) if not on
                ]
            kw.update(
                attention_bias=cfg.get("attention_bias", False),
                tie_word_embeddings=cfg.get("tie_word_embeddings", True),
            )
        if model_type == "olmoe":
            # OLMoE (HF OlmoeForCausalLM): full-width flat qk RMSNorm,
            # softmax-then-topk routing WITHOUT renorm, every layer MoE
            kw.update(
                clip_qkv=cfg.get("clip_qkv"),
                use_qk_norm=True,
                qk_norm_flat=True,
                num_experts=cfg.get("num_experts", 64),
                num_experts_per_tok=cfg.get("num_experts_per_tok", 8),
                moe_intermediate_size=cfg.get("intermediate_size", 1024),
                norm_topk_prob=cfg.get("norm_topk_prob", False),
                tie_word_embeddings=cfg.get("tie_word_embeddings", False),
            )
        if model_type == "stablelm":
            # StableLM (HF StableLmForCausalLM): partial rotary,
            # LayerNorm (weight+bias) norms, optional qkv bias and
            # optional parallel-residual blocks
            if cfg.get("use_parallel_residual"):
                kw["parallel_residual"] = True
            kw.update(
                norm_type="layernorm",
                rms_norm_eps=cfg.get("layer_norm_eps", 1e-5),
                partial_rotary_factor=float(
                    cfg.get("partial_rotary_factor", 0.25)
                ),
                attention_bias=cfg.get("use_qkv_bias", False),
                tie_word_embeddings=cfg.get("tie_word_embeddings", False),
            )
        if model_type == "gpt2":
            # GPT-2 (HF GPT2LMHeadModel): the GPT-BigCode layout with
            # full MHA fused c_attn and Conv1D (TRANSPOSED) weights —
            # loader transposes; learned absolute positions, no rope
            heads = cfg.get("n_head", 12)
            kw.update(
                hidden_size=cfg.get("n_embd", 768),
                num_hidden_layers=cfg.get("n_layer", 12),
                num_attention_heads=heads,
                num_key_value_heads=heads,
                intermediate_size=cfg.get("n_inner")
                or 4 * cfg.get("n_embd", 768),
                max_position_embeddings=cfg.get("n_positions", 1024),
                norm_type="layernorm",
                rms_norm_eps=cfg.get("layer_norm_epsilon", 1e-5),
                hidden_act=cfg.get("activation_function", "gelu_new"),
                attention_bias=True,
                mlp_bias=True,
                use_rope=False,
                learned_pos_embed=True,
                tie_word_embeddings=cfg.get("tie_word_embeddings", True),
                attn_scale=(
                    None if cfg.get("scale_attn_weights", True) else 1.0
                ),
            )
        if model_type == "gpt_neox":
            # GPT-NeoX / Pythia (HF GPTNeoXForCausalLM): per-head
            # INTERLEAVED fused qkv (loader de-interleaves), partial
            # rotary (rotary_pct), LayerNorm norms, gateless gelu MLP,
            # parallel residual with SEPARATE pre-MLP norm
            kw.update(
                norm_type="layernorm",
                rms_norm_eps=cfg.get("layer_norm_eps", 1e-5),
                hidden_act=cfg.get("hidden_act", "gelu"),
                attention_bias=cfg.get("attention_bias", True),
                mlp_bias=cfg.get("attention_bias", True),
                partial_rotary_factor=float(cfg.get("rotary_pct", 0.25)),
                rope_theta=cfg.get(
                    "rotary_emb_base", cfg.get("rope_theta", 10000.0)
                ),
                parallel_residual=cfg.get("use_parallel_residual", True),
                parallel_residual_separate_norms=cfg.get(
                    "use_parallel_residual", True
                ),
                tie_word_embeddings=cfg.get("tie_word_embeddings", False),
            )
        if model_type == "arcee":
            # Arcee/AFM (HF ArceeForCausalLM): llama stack with a
            # gateless relu^2 MLP
            kw.update(
                hidden_act=cfg.get("hidden_act", "relu2"),
                mlp_bias=cfg.get("mlp_bias", False),
            )
        if model_type == "dots1":
            # dots.llm1 (HF Dots1ForCausalLM): qwen3-style per-head
            # qk-norm over a DeepSeek-V3-style MoE (sigmoid scores +
            # e_score_correction_bias selection, group-limited top-k,
            # shared experts, routed scaling, first-k dense layers)
            kw.update(
                use_qk_norm=True,
                num_experts=cfg.get("n_routed_experts", 0) or 0,
                num_experts_per_tok=cfg.get("num_experts_per_tok", 0) or 0,
                moe_intermediate_size=cfg.get("moe_intermediate_size", 0),
                first_k_dense=cfg.get("first_k_dense_replace", 0),
                n_group=cfg.get("n_group", 1),
                topk_group=cfg.get("topk_group", 1),
                routed_scaling_factor=float(
                    cfg.get("routed_scaling_factor", 1.0)
                ),
                norm_topk_prob=cfg.get("norm_topk_prob", True),
                moe_shared_intermediate=(
                    (cfg.get("n_shared_experts") or 0)
                    * cfg.get("moe_intermediate_size", 0)
                ),
                moe_style="deepseek_v3",
                moe_topk_method="noaux_tc",
            )
        if model_type == "hunyuan_v1_moe":
            # Hunyuan MoE (HF HunYuanMoEV1Moe): dense-style per-head
            # post-rope qk-norm like hunyuan_v1_dense, plus softmax->
            # top-k renormalized routing and an always-on shared MLP
            nexp = cfg.get("num_experts", 0)
            topk = cfg.get("moe_topk", 1)
            inter = cfg.get("intermediate_size", 0)
            if not isinstance(inter, int):
                inter = inter[0]
            kw.update(
                use_qk_norm=cfg.get("use_qk_norm", True),
                qk_norm_after_rope=True,
                num_experts=nexp if isinstance(nexp, int) else nexp[0],
                num_experts_per_tok=(
                    topk if isinstance(topk, int) else topk[0]
                ),
                # routed experts AND the always-on shared MLP are both
                # intermediate_size wide (HF HunYuanMoEV1MLP)
                moe_intermediate_size=inter,
                intermediate_size=inter,
                norm_topk_prob=True,
                moe_shared_intermediate=inter,
                attention_bias=cfg.get("attention_bias", False),
            )
        if model_type == "olmo":
            # OLMo v1 (HF OlmoForCausalLM): NON-PARAMETRIC LayerNorms
            # (no weights in the checkpoint at all), optional qkv clamp
            kw.update(
                norm_type="layernorm_noparam",
                rms_norm_eps=1e-5,  # F.layer_norm default in OlmoLayerNorm
                clip_qkv=cfg.get("clip_qkv"),
                tie_word_embeddings=cfg.get("tie_word_embeddings", False),
            )
        if model_type == "flex_olmo":
            # FlexOlmo (HF FlexOlmoForCausalLM): OLMo-2 post-norm block
            # + flat qk RMSNorm + OLMoE-style MoE without renorm
            kw.update(
                use_qk_norm=True,
                qk_norm_flat=True,
                post_norm_blocks=True,
                num_experts=cfg.get("num_experts", 0),
                num_experts_per_tok=cfg.get("num_experts_per_tok", 0),
                moe_intermediate_size=cfg.get("intermediate_size", 0),
                norm_topk_prob=cfg.get("norm_topk_prob", False),
                tie_word_embeddings=cfg.get("tie_word_embeddings", False),
            )
        if model_type == "persimmon":
            # Persimmon (HF PersimmonForCausalLM): NeoX-interleaved
            # fused qkv with bias, per-head qk LayerNorm with weight AND
            # bias, partial rotary, gateless relu^2 MLP with biases,
            # LayerNorm block norms
            kw.update(
                norm_type="layernorm",
                rms_norm_eps=cfg.get("layer_norm_eps", 1e-5),
                hidden_act=cfg.get("hidden_act", "relu2"),
                use_qk_norm=cfg.get("qk_layernorm", True),
                qk_norm_layernorm=True,
                partial_rotary_factor=float(
                    cfg.get("partial_rotary_factor", 0.5)
                ),
                attention_bias=True,
                mlp_bias=True,
                tie_word_embeddings=cfg.get("tie_word_embeddings", False),
            )
        if model_type == "nemotron":
            # Nemotron (HF NemotronForCausalLM): LayerNorm1P norms,
            # gateless relu^2 MLP, partial rotary
            kw.update(
                norm_type="layernorm1p",
                hidden_act=cfg.get("hidden_act", "relu2"),
                partial_rotary_factor=float(
                    cfg.get("partial_rotary_factor", 0.5)
                ),
                rms_norm_eps=cfg.get("norm_eps", 1e-5),
                mlp_bias=cfg.get("mlp_bias", False),
            )
        if model_type == "qwen2":
            # Qwen2 has bias on qkv only; handled by loader (missing biases -> zeros)
            kw["attention_bias"] = True
        if model_type in ("qwen3_moe", "qwen3_vl_moe_text"):
            kw.update(
                num_experts=cfg.get("num_experts", 0),
                num_experts_per_tok=cfg.get("num_experts_per_tok", 0),
                moe_intermediate_size=cfg.get("moe_intermediate_size", 0),
                decoder_sparse_step=cfg.get("decoder_sparse_step", 1),
                mlp_only_layers=cfg.get("mlp_only_layers", []) or [],
                norm_topk_prob=cfg.get("norm_topk_prob", True),
            )
        if model_type == "qwen3_next":
            # Qwen3-Next (HF Qwen3NextForCausalLM): 3:1 gated-DeltaNet /
            # gated full attention hybrid, partial rotary (0.25),
            # zero-centered (1+w) RMSNorms, per-head qk-norm, MoE with a
            # sigmoid-gated shared expert. In-checkpoint MTP heads load
            # via loader.load_mtp_params (reference
            # patches/qwen3_next_mtp.py)
            n_layers = cfg.get("num_hidden_layers", 48)
            interval = cfg.get("full_attention_interval", 4)
            hf_types = cfg.get("layer_types") or [
                "linear_attention" if (i + 1) % interval else "full_attention"
                for i in range(n_layers)
            ]
            kw.update(
                # internal name "gdn" keeps MiniMax's lightning
                # "linear_attention" mixer distinct
                layer_types=[
                    "gdn" if lt == "linear_attention" else lt
                    for lt in hf_types
                ],
                head_dim=cfg.get("head_dim", 256),
                use_qk_norm=True,
                rms_add_one=True,
                attn_out_gate=True,
                partial_rotary_factor=float(
                    cfg.get("partial_rotary_factor", 0.25)
                ),
                attention_bias=cfg.get("attention_bias", False),
                num_experts=cfg.get("num_experts", 0),
                num_experts_per_tok=cfg.get("num_experts_per_tok", 0),
                moe_intermediate_size=cfg.get("moe_intermediate_size", 0),
                decoder_sparse_step=cfg.get("decoder_sparse_step", 1),
                mlp_only_layers=cfg.get("mlp_only_layers", []) or [],
                norm_topk_prob=cfg.get("norm_topk_prob", True),
                moe_shared_intermediate=cfg.get(
                    "shared_expert_intermediate_size", 0
                ),
                shared_expert_gated=True,
                gdn_cfg=dict(
                    num_v_heads=cfg.get("linear_num_value_heads", 32),
                    num_k_heads=cfg.get("linear_num_key_heads", 16),
                    head_k_dim=cfg.get("linear_key_head_dim", 128),
                    head_v_dim=cfg.get("linear_value_head_dim", 128),
                    conv_kernel=cfg.get("linear_conv_kernel_dim", 4),
                    norm_eps=cfg.get("rms_norm_eps", 1e-6),
                ),
            )
        if model_type == "minimax":
            # MiniMax-M1 hybrids (HF MiniMaxForCausalLM): Mixtral-style
            # MoE every layer + alternating full/lightning(linear)
            # attention layers with per-head decayed state
            kw.update(
                num_experts=cfg.get("num_local_experts", 8),
                num_experts_per_tok=cfg.get("num_experts_per_tok", 2),
                moe_intermediate_size=cfg.get("intermediate_size", 0),
                norm_topk_prob=True,
                linear_cfg=dict(block_size=cfg.get("block_size", 256)),
                residual_cfg=dict(
                    full_alpha=cfg.get("full_attn_alpha_factor", 1.0),
                    full_beta=cfg.get("full_attn_beta_factor", 1.0),
                    linear_alpha=cfg.get("linear_attn_alpha_factor", 1.0),
                    linear_beta=cfg.get("linear_attn_beta_factor", 1.0),
                    mlp_alpha=cfg.get("mlp_alpha_factor", 1.0),
                    mlp_beta=cfg.get("mlp_beta_factor", 1.0),
                ),
            )
        if model_type == "mixtral":
            # Mixtral-8x7B/8x22B (HF MixtralForCausalLM): llama attention
            # + every-layer MoE, softmax-then-topk router with renorm —
            # the "qwen" style with norm_topk_prob=True
            kw.update(
                num_experts=cfg.get("num_local_experts", 8),
                num_experts_per_tok=cfg.get("num_experts_per_tok", 2),
                moe_intermediate_size=cfg.get("intermediate_size", 14336),
                norm_topk_prob=True,
            )
        if model_type == "llama4_text":
            # Llama 4 Scout/Maverick text stack (HF Llama4ForCausalLM,
            # modeling_llama4.py; reference serves the family via
            # mlx-lm — docs/reference/models.md "Llama 3.x, 4.x"):
            # interleaved-pair complex rope (the GLM map at full width),
            # every-4th-layer NoPE with temperature-tuned queries and
            # FULL attention, rope layers CHUNKED to
            # attention_chunk_size, weightless L2 qk-norm after rope on
            # rope layers only, interleaved dense(intermediate_size_mlp)
            # / MoE layers where sigmoid router scores scale the expert
            # INPUTS and an always-on shared expert rides beside
            n_layers = cfg.get("num_hidden_layers", 48)
            interval = cfg.get("no_rope_layer_interval", 4)
            no_rope = cfg.get("no_rope_layers") or [
                int((i + 1) % interval != 0) for i in range(n_layers)
            ]
            moe_layers = cfg.get("moe_layers")
            if moe_layers is None:
                step = cfg.get("interleave_moe_layer_step", 1)
                moe_layers = list(range(step - 1, n_layers, step))
            kw.update(
                intermediate_size=cfg.get("intermediate_size_mlp", 16384),
                nope_layers=[i for i, v in enumerate(no_rope) if not v],
                layer_types=cfg.get("layer_types")
                or [
                    "chunked_attention" if v else "full_attention"
                    for v in no_rope
                ],
                attn_chunk_size=cfg.get("attention_chunk_size", 8192),
                use_qk_norm=cfg.get("use_qk_norm", True),
                qk_norm_after_rope=True,
                qk_norm_weightless=True,
                qk_norm_rope_only=True,
                attn_temp_tuning=cfg.get("attn_temperature_tuning", True),
                attn_temp_floor=float(cfg.get("floor_scale", 8192)),
                attn_temp_scale=float(cfg.get("attn_scale", 0.1)),
                rope_glm=True,
                moe_style="llama4",
                num_experts=cfg.get("num_local_experts", 16),
                num_experts_per_tok=cfg.get("num_experts_per_tok", 1),
                moe_intermediate_size=cfg.get("intermediate_size", 8192),
                moe_shared_intermediate=cfg.get("intermediate_size", 8192),
                mlp_only_layers=[
                    i for i in range(n_layers) if i not in moe_layers
                ],
                head_dim=cfg.get(
                    "head_dim",
                    cfg.get("hidden_size", 5120)
                    // cfg.get("num_attention_heads", 40),
                ),
            )
        if model_type == "gpt_oss":
            # GPT-OSS 20B/120B (HF GptOssForCausalLM): alternating
            # sliding/full layers, per-head attention sinks, fused
            # clamped-GLU MoE experts, topk-then-softmax router w/ bias,
            # yarn rope (reference serves it via mlx-lm models/llm.py:40
            # + harmony parsers)
            n_layers = cfg.get("num_hidden_layers", 24)
            kw.update(
                num_experts=cfg.get("num_local_experts", 32),
                num_experts_per_tok=cfg.get("num_experts_per_tok", 4),
                moe_intermediate_size=cfg.get("intermediate_size", 2880),
                moe_style="gpt_oss",
                swiglu_limit=float(cfg.get("swiglu_limit", 7.0)),
                has_sinks=True,
                attention_bias=True,
                norm_topk_prob=False,
                layer_types=cfg.get("layer_types")
                or [
                    "sliding_attention" if (i + 1) % 2 else "full_attention"
                    for i in range(n_layers)
                ],
            )
        if model_type in ("deepseek_v2", "deepseek_v3"):
            # DeepSeek V2/V3 (HF DeepseekV2/V3ForCausalLM): multi-head
            # latent attention + shared-expert MoE with group-limited
            # routing (V3: sigmoid scores + e_score_correction_bias;
            # V2: softmax scores, greedy or group-max)
            nope = cfg.get("qk_nope_head_dim", 128)
            rope_d = cfg.get("qk_rope_head_dim", 64)
            kw.update(
                head_dim=nope + rope_d,
                num_key_value_heads=cfg.get("num_attention_heads", 32),
                attention_bias=cfg.get("attention_bias", False),
                num_experts=cfg.get("n_routed_experts") or 0,
                num_experts_per_tok=cfg.get("num_experts_per_tok") or 0,
                moe_intermediate_size=cfg.get("moe_intermediate_size", 0),
                first_k_dense=cfg.get("first_k_dense_replace", 0),
                n_group=cfg.get("n_group") or 1,
                topk_group=cfg.get("topk_group") or 1,
                routed_scaling_factor=float(
                    cfg.get("routed_scaling_factor", 1.0)
                ),
                norm_topk_prob=cfg.get("norm_topk_prob", False),
                moe_shared_intermediate=(cfg.get("n_shared_experts") or 0)
                * (cfg.get("moe_intermediate_size") or 0),
                moe_style=model_type,
                moe_topk_method=(
                    "noaux_tc"
                    if model_type == "deepseek_v3"
                    else cfg.get("topk_method", "greedy")
                ),
                mla=dict(
                    q_lora_rank=cfg.get("q_lora_rank"),
                    kv_lora_rank=cfg.get("kv_lora_rank", 512),
                    qk_nope_head_dim=nope,
                    qk_rope_head_dim=rope_d,
                    v_head_dim=cfg.get("v_head_dim", 128),
                    rope_interleave=cfg.get("rope_interleave", True),
                ),
            )
            # softmax scale: qk_head_dim^-0.5, V3 additionally folds the
            # yarn mscale^2 in (HF modeling_deepseek_v3.py scaling)
            scale = float(nope + rope_d) ** -0.5
            rs = cfg.get("rope_scaling") or {}
            if model_type == "deepseek_v3" and rs.get("mscale_all_dim"):
                import math as _math

                f = rs["factor"]
                m = (
                    1.0
                    if f <= 1
                    else 0.1 * rs["mscale_all_dim"] * _math.log(f) + 1.0
                )
                scale = scale * m * m
            kw["attn_scale"] = scale
        rs2 = kw.get("rope_scaling")
        if (
            rs2
            and rs2.get("rope_type", rs2.get("type")) == "yarn"
            and not rs2.get("original_max_position_embeddings")
        ):
            # HF yarn falls back to max_position_embeddings (rope layer
            # has no separate view of it at cos/sin build time here)
            kw["rope_scaling"] = {
                **rs2,
                "original_max_position_embeddings": kw.get(
                    "max_position_embeddings", 131072
                ),
            }
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
    # Mllama cross-KV capacity per slot (kv positions = images x
    # max_tiles x tokens_per_tile); None = model default (one image)
    cross_capacity: Optional[int] = None
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

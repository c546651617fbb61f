# SPDX-License-Identifier: Apache-2.0
"""In-checkpoint MTP-head speculation (VERDICT r2 #5; reference
patches/qwen3_5_mtp.py:70-340, qwen3_next_mtp.py): a checkpoint that
ships ``mtp.*`` weights speculates with NO separate draft model — the
head combines (token embedding, target hidden) through a fc, runs one
decoder layer against its own 1-layer KV pool, and predicts with the
target's lm_head.

Token identity is the invariant: acceptance only ever emits
target-verified tokens, so greedy output with the MTP head attached is
EXACTLY the no-speculation output — even with random head weights."""

import asyncio

import numpy as np
import pytest

from vllm_mlx_tpu.config import CacheConfig, ModelConfig, SchedulerConfig

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def mtp_model_dir(tmp_path_factory):
    """Tiny Llama checkpoint + a second safetensors file carrying
    qwen3_next-style mtp.* head weights."""
    from safetensors.numpy import save_file
    from tokenizers import (
        Tokenizer,
        decoders,
        models,
        pre_tokenizers,
        trainers,
    )
    from transformers import (
        LlamaConfig,
        LlamaForCausalLM,
        PreTrainedTokenizerFast,
    )

    d = tmp_path_factory.mktemp("mtp_model")
    tok = Tokenizer(models.BPE(unk_token=None))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=300,
        special_tokens=["</s>"],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
    )
    tok.train_from_iterator(
        ["the quick brown fox jumps over the lazy dog"] * 8, trainer
    )
    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok, eos_token="</s>", pad_token="</s>"
    )
    fast.save_pretrained(d)
    torch.manual_seed(0)
    h, inter = 64, 128
    cfg = LlamaConfig(
        vocab_size=tok.get_vocab_size(),
        hidden_size=h,
        intermediate_size=inter,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=512,
        eos_token_id=fast.eos_token_id,
    )
    LlamaForCausalLM(cfg).eval().save_pretrained(d, safe_serialization=True)

    rng = np.random.default_rng(3)

    def w(*shape):
        return (rng.standard_normal(shape) * 0.05).astype(np.float32)

    hd = h // 4
    mtp = {
        "mtp.fc.weight": w(h, 2 * h),
        "mtp.pre_fc_norm_embedding.weight": np.ones(h, np.float32),
        "mtp.pre_fc_norm_hidden.weight": np.ones(h, np.float32),
        "mtp.norm.weight": np.ones(h, np.float32),
        "mtp.layers.0.input_layernorm.weight": np.ones(h, np.float32),
        "mtp.layers.0.post_attention_layernorm.weight": np.ones(
            h, np.float32
        ),
        "mtp.layers.0.self_attn.q_proj.weight": w(4 * hd, h),
        "mtp.layers.0.self_attn.k_proj.weight": w(2 * hd, h),
        "mtp.layers.0.self_attn.v_proj.weight": w(2 * hd, h),
        "mtp.layers.0.self_attn.o_proj.weight": w(h, 4 * hd),
        "mtp.layers.0.mlp.gate_proj.weight": w(inter, h),
        "mtp.layers.0.mlp.up_proj.weight": w(inter, h),
        "mtp.layers.0.mlp.down_proj.weight": w(h, inter),
    }
    save_file(mtp, str(d / "mtp_head.safetensors"))
    return str(d)


def _engine(model_dir, **kw):
    from vllm_mlx_tpu.engine.batched import BatchedEngine

    eng = BatchedEngine(
        model_dir,
        cache_config=CacheConfig(
            block_size=8, num_blocks=64, kv_dtype="float32"
        ),
        scheduler_config=SchedulerConfig(
            max_num_seqs=2,
            max_prefill_tokens=64,
            prefill_chunk_sizes=[16, 64],
            max_model_len=256,
        ),
        **kw,
    )
    mc = ModelConfig.from_pretrained(model_dir)
    mc.dtype = "float32"
    eng._model_config = mc
    return eng


def test_loader_finds_mtp_head(mtp_model_dir):
    from vllm_mlx_tpu.models import loader

    cfg = ModelConfig.from_pretrained(mtp_model_dir)
    cfg.dtype = "float32"
    mtp = loader.load_mtp_params(mtp_model_dir, cfg)
    assert mtp is not None
    assert mtp["fc"].shape == (64, 128)
    assert "q_proj" in mtp["layer"] and "mlp" in mtp["layer"]
    # a checkpoint without mtp weights returns None
    import shutil
    import tempfile

    with tempfile.TemporaryDirectory() as d2:
        for f in __import__("glob").glob(f"{mtp_model_dir}/*"):
            if "mtp_head" not in f:
                shutil.copy(f, d2)
        assert loader.load_mtp_params(d2, cfg) is None


def test_mtp_head_greedy_identity(mtp_model_dir):
    """Engine auto-attaches the MTP head; greedy output is identical to
    serving with speculation disabled (spec_k=0 via a copied dir sans
    mtp file)."""
    import glob
    import shutil
    import tempfile

    async def run(model_dir, expect_mtp):
        eng = _engine(model_dir)
        await eng.start()
        try:
            runner = eng.scheduler.runner
            if expect_mtp:
                assert runner.spec_k > 0
                assert getattr(runner, "mtp_params", None) is not None
                assert runner.state.draft_pages is not None
                assert len(runner.state.draft_pages) == 1  # one MTP layer
                assert runner.state.last_hidden is not None
            else:
                assert runner.spec_k == 0
            outs = {}
            for rid, prompt in (
                ("a", "the quick brown fox"),
                ("b", "jumps over"),
            ):
                toks = []
                async for chunk in eng.stream_generate(
                    prompt, request_id=rid, temperature=0.0, max_tokens=16
                ):
                    toks.extend(chunk.token_ids)
                outs[rid] = toks
            stats = eng.get_stats()
            return outs, stats
        finally:
            await eng.stop()

    with tempfile.TemporaryDirectory() as plain_dir:
        for f in glob.glob(f"{mtp_model_dir}/*"):
            if "mtp_head" not in f:
                shutil.copy(f, plain_dir)
        ref, _ = asyncio.run(run(plain_dir, expect_mtp=False))
    got, stats = asyncio.run(run(mtp_model_dir, expect_mtp=True))
    assert got == ref
    assert len(got["a"]) == 16


def test_mtp_spec_rounds_actually_run(mtp_model_dir):
    """The scheduler takes the speculative path and counts drafts."""
    from vllm_mlx_tpu.core.request import Request, SamplingParams

    async def go():
        eng = _engine(mtp_model_dir)
        await eng.start()
        try:
            out = None
            async for chunk in eng.stream_generate(
                "the quick brown", temperature=0.0, max_tokens=24
            ):
                out = chunk
            assert out is not None
            # spec accounting surfaced on the final output
            assert out.mtp_drafts > 0
        finally:
            await eng.stop()

    asyncio.run(go())


def test_mtp_head_with_tp2(mtp_model_dir):
    """TP x MTP-head: the head's params and 1-layer KV pool shard over
    the mesh; greedy output identical to tp=1."""
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs >=2 virtual devices")

    async def run(tp):
        eng = _engine(mtp_model_dir, **({"tp_size": tp} if tp > 1 else {}))
        await eng.start()
        try:
            toks = []
            async for chunk in eng.stream_generate(
                "the quick brown fox", temperature=0.0, max_tokens=12
            ):
                toks.extend(chunk.token_ids)
            return toks
        finally:
            await eng.stop()

    ref = asyncio.run(run(1))
    got = asyncio.run(run(2))
    assert got == ref and len(ref) == 12


@pytest.fixture(scope="module")
def qwen3_next_mtp_dir(tmp_path_factory):
    """Tiny Qwen3-Next checkpoint (gated-DeltaNet hybrid) + synthetic
    mtp.* head weights shaped like the reference's full decoder layer
    (qwen3_next_mtp.py builds a Qwen3NextDecoderLayer at a
    full-attention index: gated attention + MoE with shared expert)."""
    from safetensors.numpy import save_file
    from tokenizers import (
        Tokenizer,
        decoders,
        models,
        pre_tokenizers,
        trainers,
    )
    from transformers import (
        PreTrainedTokenizerFast,
        Qwen3NextConfig,
        Qwen3NextForCausalLM,
    )

    d = tmp_path_factory.mktemp("qwen3_next_mtp")
    tok = Tokenizer(models.BPE(unk_token=None))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=300,
        special_tokens=["</s>"],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
    )
    tok.train_from_iterator(
        ["the quick brown fox jumps over the lazy dog"] * 8, trainer
    )
    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok, eos_token="</s>", pad_token="</s>"
    )
    fast.save_pretrained(d)
    torch.manual_seed(7)
    h, hd, nh, nkv = 64, 16, 4, 2
    e, mi, si = 4, 32, 48
    cfg = Qwen3NextConfig(
        vocab_size=tok.get_vocab_size(),
        hidden_size=h,
        intermediate_size=96,
        num_hidden_layers=4,
        num_attention_heads=nh,
        num_key_value_heads=nkv,
        head_dim=hd,
        partial_rotary_factor=0.25,
        linear_num_value_heads=4,
        linear_num_key_heads=2,
        linear_key_head_dim=8,
        linear_value_head_dim=8,
        linear_conv_kernel_dim=4,
        full_attention_interval=4,
        num_experts=e,
        num_experts_per_tok=2,
        decoder_sparse_step=1,
        moe_intermediate_size=mi,
        shared_expert_intermediate_size=si,
        norm_topk_prob=True,
        max_position_embeddings=512,
        tie_word_embeddings=False,
        pad_token_id=0,
        eos_token_id=fast.eos_token_id,
        attn_implementation="eager",
    )
    Qwen3NextForCausalLM(cfg).eval().save_pretrained(
        d, safe_serialization=True
    )

    rng = np.random.default_rng(5)

    def w(*shape):
        return (rng.standard_normal(shape) * 0.05).astype(np.float32)

    mtp = {
        "mtp.fc.weight": w(h, 2 * h),
        "mtp.pre_fc_norm_embedding.weight": np.zeros(h, np.float32),
        "mtp.pre_fc_norm_hidden.weight": np.zeros(h, np.float32),
        "mtp.norm.weight": np.zeros(h, np.float32),
        "mtp.layers.0.input_layernorm.weight": np.zeros(h, np.float32),
        "mtp.layers.0.post_attention_layernorm.weight": np.zeros(
            h, np.float32
        ),
        # gated attention: q_proj emits [query | gate] per head
        "mtp.layers.0.self_attn.q_proj.weight": w(nh * hd * 2, h),
        "mtp.layers.0.self_attn.k_proj.weight": w(nkv * hd, h),
        "mtp.layers.0.self_attn.v_proj.weight": w(nkv * hd, h),
        "mtp.layers.0.self_attn.o_proj.weight": w(h, nh * hd),
        "mtp.layers.0.self_attn.q_norm.weight": np.zeros(hd, np.float32),
        "mtp.layers.0.self_attn.k_norm.weight": np.zeros(hd, np.float32),
        "mtp.layers.0.mlp.gate.weight": w(e, h),
        "mtp.layers.0.mlp.shared_expert.gate_proj.weight": w(si, h),
        "mtp.layers.0.mlp.shared_expert.up_proj.weight": w(si, h),
        "mtp.layers.0.mlp.shared_expert.down_proj.weight": w(h, si),
        "mtp.layers.0.mlp.shared_expert_gate.weight": w(1, h),
    }
    for i in range(e):
        mtp[f"mtp.layers.0.mlp.experts.{i}.gate_proj.weight"] = w(mi, h)
        mtp[f"mtp.layers.0.mlp.experts.{i}.up_proj.weight"] = w(mi, h)
        mtp[f"mtp.layers.0.mlp.experts.{i}.down_proj.weight"] = w(h, mi)
    save_file(mtp, str(d / "mtp_head.safetensors"))
    return str(d)


def test_qwen3_next_mtp_loader(qwen3_next_mtp_dir):
    """The shared layer parser handles the MTP layer's gated attention
    and MoE weights."""
    from vllm_mlx_tpu.models import loader

    cfg = ModelConfig.from_pretrained(qwen3_next_mtp_dir)
    cfg.dtype = "float32"
    mtp = loader.load_mtp_params(qwen3_next_mtp_dir, cfg)
    assert mtp is not None
    layer = mtp["layer"]
    assert "attn_gate" in layer  # gated q_proj split
    assert "moe" in layer and "gate_w" in layer["moe"]
    assert "shared_mlp" in layer and "shared_gate" in layer


def test_qwen3_next_mtp_greedy_identity(qwen3_next_mtp_dir):
    """Hybrid target + in-checkpoint MTP head: the two-pass segment
    verify commits DeltaNet state only over accepted rows, so greedy
    output is token-identical to serving without speculation."""
    import glob
    import shutil
    import tempfile

    async def run(model_dir, expect_mtp):
        eng = _engine(model_dir)
        await eng.start()
        try:
            runner = eng.scheduler.runner
            if expect_mtp:
                assert runner.spec_k > 0
                assert getattr(runner, "mtp_params", None) is not None
            else:
                assert runner.spec_k == 0
            outs = {}
            for rid, prompt in (
                ("a", "the quick brown fox"),
                ("b", "jumps over"),
            ):
                toks = []
                async for chunk in eng.stream_generate(
                    prompt, request_id=rid, temperature=0.0, max_tokens=16
                ):
                    toks.extend(chunk.token_ids)
                outs[rid] = toks
            final = None
            async for chunk in eng.stream_generate(
                "lazy dog", request_id="c", temperature=0.0, max_tokens=12
            ):
                final = chunk
            if expect_mtp:
                assert final.mtp_drafts > 0  # spec rounds actually ran
            return outs
        finally:
            await eng.stop()

    with tempfile.TemporaryDirectory() as plain_dir:
        for f in glob.glob(f"{qwen3_next_mtp_dir}/*"):
            if "mtp_head" not in f:
                shutil.copy(f, plain_dir)
        ref = asyncio.run(run(plain_dir, expect_mtp=False))
    got = asyncio.run(run(qwen3_next_mtp_dir, expect_mtp=True))
    assert got == ref
    assert len(got["a"]) == 16

# SPDX-License-Identifier: Apache-2.0
"""Logits parity of the JAX decoder against HuggingFace torch models.

The reference's correctness bar is token-identical greedy outputs at the
API level (BASELINE.md north star); these tests pin the model math
itself against the HF implementations for each supported family, using
tiny random-weight checkpoints saved to disk and loaded through the real
safetensors loader path.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from vllm_mlx_tpu.config import ModelConfig
from vllm_mlx_tpu.models import decoder, loader

torch = pytest.importorskip("torch")


def _save_hf(model, tmp_path):
    d = tmp_path / "ckpt"
    model.save_pretrained(d, safe_serialization=True)
    return str(d)


def _hf_logits(model, token_ids):
    with torch.no_grad():
        out = model(torch.tensor([token_ids], dtype=torch.long))
    return out.logits[0].float().numpy()


def _assert_parity(model, tmp_path, token_ids, atol=2e-2):
    path = _save_hf(model, tmp_path)
    cfg = ModelConfig.from_pretrained(path)
    params = loader.load_params(path, cfg, dtype="float32")
    ours = np.asarray(
        decoder.dense_forward(params, cfg, jnp.asarray(token_ids))
    )
    theirs = _hf_logits(model, token_ids)
    np.testing.assert_allclose(ours, theirs, atol=atol)
    # greedy argmax must match exactly
    np.testing.assert_array_equal(
        np.argmax(ours, axis=-1), np.argmax(theirs, axis=-1)
    )


@pytest.fixture
def token_ids(rng):
    return rng.integers(0, 250, size=24).tolist()


def test_llama_parity(tmp_path, token_ids):
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(0)
    cfg = LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, rope_theta=10000.0, tie_word_embeddings=False,
    )
    model = LlamaForCausalLM(cfg).eval()
    _assert_parity(model, tmp_path, token_ids)


def test_llama3_rope_scaling_parity(tmp_path, token_ids):
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(1)
    cfg = LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=1024, rope_theta=500000.0,
        tie_word_embeddings=True,
        rope_scaling={
            "rope_type": "llama3", "factor": 8.0, "low_freq_factor": 1.0,
            "high_freq_factor": 4.0, "original_max_position_embeddings": 128,
        },
    )
    model = LlamaForCausalLM(cfg).eval()
    _assert_parity(model, tmp_path, token_ids)


def test_qwen3_parity(tmp_path, token_ids):
    from transformers import Qwen3Config, Qwen3ForCausalLM

    torch.manual_seed(2)
    cfg = Qwen3Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=32, max_position_embeddings=512, rope_theta=1000000.0,
        tie_word_embeddings=False,
    )
    model = Qwen3ForCausalLM(cfg).eval()
    _assert_parity(model, tmp_path, token_ids)


def test_qwen2_parity(tmp_path, token_ids):
    from transformers import Qwen2Config, Qwen2ForCausalLM

    torch.manual_seed(3)
    cfg = Qwen2Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, tie_word_embeddings=False,
    )
    model = Qwen2ForCausalLM(cfg).eval()
    _assert_parity(model, tmp_path, token_ids)


def test_qwen3_moe_parity(tmp_path, token_ids):
    from transformers import Qwen3MoeConfig, Qwen3MoeForCausalLM

    torch.manual_seed(4)
    cfg = Qwen3MoeConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=32, max_position_embeddings=512,
        num_experts=8, num_experts_per_tok=2, moe_intermediate_size=64,
        decoder_sparse_step=1, norm_topk_prob=True, tie_word_embeddings=False,
    )
    model = Qwen3MoeForCausalLM(cfg).eval()
    _assert_parity(model, tmp_path, token_ids)


def test_gemma2_parity(tmp_path, token_ids):
    """Gemma2: sandwich norms, (1+w) RMSNorm, GeGLU, embed scaling,
    attention + final logit softcaps, interleaved sliding window."""
    from transformers import Gemma2Config, Gemma2ForCausalLM

    torch.manual_seed(6)
    cfg = Gemma2Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=512, query_pre_attn_scalar=16,
        attn_logit_softcapping=50.0, final_logit_softcapping=30.0,
        sliding_window=8, tie_word_embeddings=True,
    )
    model = Gemma2ForCausalLM(cfg).eval()
    _assert_parity(model, tmp_path, token_ids)


def test_paged_generation_matches_dense(tmp_path, token_ids):
    """Chunked paged prefill + decode produces the same greedy tokens as
    repeated dense forwards (the engine-path equivalence check)."""
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(5)
    hf_cfg = LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512,
    )
    path = _save_hf(LlamaForCausalLM(hf_cfg).eval(), tmp_path)
    cfg = ModelConfig.from_pretrained(path)
    params = loader.load_params(path, cfg, dtype="float32")

    from vllm_mlx_tpu.ops import attention as att

    bs, n_blocks = 8, 16
    pool = att.make_kv_pool(
        cfg.num_hidden_layers, n_blocks, bs, cfg.num_key_value_heads,
        cfg.head_dim, dtype=jnp.float32,
    )
    table = jnp.arange(1, 9)  # block 0 reserved
    prompt = jnp.asarray(token_ids)

    # chunked prefill: 2 chunks of 12
    for c0 in (0, 12):
        pos = jnp.arange(c0, c0 + 12)
        logits_last, pool = decoder.prefill_logits(
            params, cfg, prompt[c0 : c0 + 12], pos, pool, table
        )
    generated = [int(jnp.argmax(logits_last))]

    # decode 8 tokens via the batched path (batch of 2; slot 1 inactive)
    tables = jnp.stack([table, jnp.zeros_like(table)])
    for step in range(8):
        pos = jnp.asarray([len(token_ids) + step, 0])
        toks = jnp.asarray([generated[-1], 0])
        logits, pool = decoder.decode(params, cfg, toks, pos, pool, tables)
        generated.append(int(jnp.argmax(logits[0])))

    # dense re-forward ground truth
    seq = list(token_ids)
    expected = []
    for _ in range(9):
        logits = decoder.dense_forward(params, cfg, jnp.asarray(seq))
        nxt = int(jnp.argmax(logits[-1]))
        expected.append(nxt)
        seq.append(nxt)
    assert generated == expected

# SPDX-License-Identifier: Apache-2.0
"""PaliGemma parity + engine integration.

Pins the SigLIP tower + linear projector against HF
``PaliGemmaForConditionalGeneration.get_image_features`` and served
greedy generation against HF ``generate`` (prompt prefill is FULLY
bidirectional at inference — prefix-LM — then causal decode; HF
modeling_paligemma.py _update_causal_mask). Also covers the Gemma-1 LM
family mapping (sqrt(H) embed scale, (1+w) RMSNorm, tanh-gelu).
"""

import asyncio
import base64
import io

import numpy as np
import pytest

torch = pytest.importorskip("torch")

IMG = 290  # <image> token id in the tiny tokenizer (BPE fills to 290)


@pytest.fixture(scope="module")
def tiny_paligemma(tmp_path_factory):
    from tokenizers import (
        Tokenizer, decoders, models, pre_tokenizers, trainers,
    )
    from transformers import (
        GemmaConfig,
        PaliGemmaConfig,
        PaliGemmaForConditionalGeneration,
        PreTrainedTokenizerFast,
        SiglipVisionConfig,
    )

    d = tmp_path_factory.mktemp("paligemma")
    tok = Tokenizer(models.BPE(unk_token=None))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=290,
        special_tokens=["</s>", "<s>"],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
    )
    tok.train_from_iterator(
        ["caption en", "answer en what is this", "describe the image"] * 8,
        trainer,
    )
    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok, eos_token="</s>", bos_token="<s>",
        pad_token="</s>",
    )
    fast.add_special_tokens({"additional_special_tokens": ["<image>"]})
    assert fast.convert_tokens_to_ids("<image>") == IMG
    fast.save_pretrained(d)

    torch.manual_seed(0)
    vision = SiglipVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, image_size=28, patch_size=14,
        projection_dim=48,  # must equal the LM hidden size
    )
    text = GemmaConfig(
        vocab_size=320, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=512,
        eos_token_id=fast.eos_token_id, bos_token_id=fast.bos_token_id,
    )
    cfg = PaliGemmaConfig(
        vision_config=vision, text_config=text,
        image_token_index=IMG, projection_dim=48,
        # 2x2 = 4 patches per image
        image_seq_length=4,
    )
    model = PaliGemmaForConditionalGeneration(cfg).eval()
    model.save_pretrained(d, safe_serialization=True)
    return model, str(d)


@pytest.fixture(scope="module")
def pg_pixels(rng):
    return rng.standard_normal((1, 3, 28, 28)).astype(np.float32) * 0.5


def test_paligemma_vision_feature_parity(tiny_paligemma, pg_pixels):
    from vllm_mlx_tpu.models.paligemma import PaliGemmaVLM

    model, path = tiny_paligemma
    vlm = PaliGemmaVLM(path, dtype="float32").load()
    ours = vlm.encode_images(pg_pixels)  # [1, 4, 48]
    assert ours.shape == (1, 4, 48)
    with torch.no_grad():
        theirs = model.get_image_features(
            pixel_values=torch.tensor(pg_pixels)
        )
        theirs = (
            theirs[0] if isinstance(theirs, (list, tuple)) else theirs
        ).numpy()
    np.testing.assert_allclose(ours, theirs.reshape(ours.shape), atol=3e-4)


def test_paligemma_engine_matches_hf_generate(tiny_paligemma, rng):
    """Served greedy == HF generate (bidirectional prompt prefill via
    the bidir-span kernel path, then causal decode)."""
    from PIL import Image

    from vllm_mlx_tpu.config import CacheConfig, SchedulerConfig
    from vllm_mlx_tpu.engine.batched import BatchedEngine

    model, path = tiny_paligemma
    arr = rng.integers(0, 255, size=(28, 28, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    uri = "data:image/png;base64," + base64.b64encode(buf.getvalue()).decode()
    messages = [
        {
            "role": "user",
            "content": [
                {"type": "image_url", "image_url": {"url": uri}},
                {"type": "text", "text": "caption en"},
            ],
        }
    ]
    engine = BatchedEngine(
        path,
        cache_config=CacheConfig(
            block_size=8, num_blocks=64, kv_dtype="float32"
        ),
        scheduler_config=SchedulerConfig(
            max_num_seqs=2, max_prefill_tokens=64,
            prefill_chunk_sizes=[64], max_model_len=256,
        ),
    )

    async def go():
        await engine.start()
        try:
            assert engine.vlm_kind == "paligemma"
            out = await engine.chat(messages, max_tokens=6, temperature=0.0)
            ids = engine.vlm.build_prompt_ids(
                engine._tokenizer, "caption en", 1
            )
            assert ids[:4] == [IMG] * 4 and ids[4] == 1  # bos after images
            pix = engine.image_processor.batch([Image.fromarray(arr)])
            with torch.no_grad():
                hf = model.generate(
                    input_ids=torch.tensor([ids]),
                    attention_mask=torch.ones(
                        (1, len(ids)), dtype=torch.long
                    ),
                    pixel_values=torch.tensor(pix.astype(np.float32)),
                    do_sample=False,
                    max_new_tokens=6,
                    output_scores=True,
                    return_dict_in_generate=True,
                )
            theirs = hf.sequences[0].numpy().tolist()[len(ids):]
            import sys as _sys

            _sys.path.insert(0, "tests")
            from vlm_test_utils import assert_tied_greedy, hf_scores_fn

            assert_tied_greedy(
                out.token_ids, theirs, hf_scores_fn(hf.scores),
                exclude_ids={IMG},
            )
        finally:
            await engine.stop()

    asyncio.run(go())


def test_paligemma_prompt_exceeding_budget_rejected(tiny_paligemma, rng):
    """Prefix-LM prompts must fit one prefill chunk — oversize rejected
    at admission, not wedged in the scheduler."""
    from PIL import Image

    from vllm_mlx_tpu.config import CacheConfig, SchedulerConfig
    from vllm_mlx_tpu.engine.batched import BatchedEngine

    model, path = tiny_paligemma
    arr = rng.integers(0, 255, size=(28, 28, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    uri = "data:image/png;base64," + base64.b64encode(buf.getvalue()).decode()
    messages = [
        {
            "role": "user",
            "content": [
                {"type": "image_url", "image_url": {"url": uri}},
                {"type": "text", "text": "caption en " * 40},
            ],
        }
    ]
    engine = BatchedEngine(
        path,
        cache_config=CacheConfig(
            block_size=8, num_blocks=64, kv_dtype="float32"
        ),
        scheduler_config=SchedulerConfig(
            max_num_seqs=2, max_prefill_tokens=16,
            prefill_chunk_sizes=[16], max_model_len=256,
        ),
    )

    async def go():
        await engine.start()
        try:
            with pytest.raises(Exception, match="prefill"):
                await engine.chat(messages, max_tokens=2, temperature=0.0)
        finally:
            await engine.stop()

    asyncio.run(go())

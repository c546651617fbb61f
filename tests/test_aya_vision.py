# SPDX-License-Identifier: Apache-2.0
"""Aya Vision parity + engine integration: SigLIP + pixel-shuffle
SwiGLU adapter on a Command-R stack, GotOcr2 tiling with the
structured TILE prompt."""

import asyncio
import base64
import io

import numpy as np
import pytest

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def tiny_aya(tmp_path_factory):
    from tokenizers import (
        Tokenizer, decoders, models, pre_tokenizers, trainers,
    )
    from transformers import (
        AyaVisionConfig,
        AyaVisionForConditionalGeneration,
        CohereConfig,
        PreTrainedTokenizerFast,
        SiglipVisionConfig,
    )

    d = tmp_path_factory.mktemp("aya_vision")
    tok = Tokenizer(models.BPE(unk_token=None))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=290,
        special_tokens=["</s>", "<|user|>", "<|assistant|>"],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
    )
    tok.train_from_iterator(
        ["what is in this picture TILE_1 TILE_GLOBAL"] * 8, trainer,
    )
    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok, eos_token="</s>", pad_token="</s>",
    )
    fast.add_special_tokens(
        {
            "additional_special_tokens": [
                "<|START_OF_IMG|>", "<|END_OF_IMG|>", "<|IMG_PATCH|>",
                "<image>",
            ]
        }
    )
    ctx = fast.convert_tokens_to_ids("<|IMG_PATCH|>")
    fast.chat_template = (
        "{% for message in messages %}<|{{ message.role }}|>"
        "{% if message.content is string %}{{ message.content }}"
        "{% else %}{% for part in message.content %}"
        "{% if part.type == 'image' %}<image>{% else %}{{ part.text }}"
        "{% endif %}{% endfor %}{% endif %}</s>{% endfor %}"
        "{% if add_generation_prompt %}<|assistant|>{% endif %}"
    )
    fast.save_pretrained(d)

    torch.manual_seed(0)
    vision = SiglipVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, image_size=28, patch_size=7,
        # 4x4 patches -> downsample 2 -> 2x2 = 4 rows per tile
    )
    text = CohereConfig(
        vocab_size=320, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, eos_token_id=fast.eos_token_id,
        logit_scale=0.25,
    )
    cfg = AyaVisionConfig(
        vision_config=vision, text_config=text, image_token_index=ctx,
        downsample_factor=2, vision_feature_layer=-1,
        vision_feature_select_strategy="full",
        alignment_intermediate_size=64,
    )
    model = AyaVisionForConditionalGeneration(cfg).eval()
    model.save_pretrained(d, safe_serialization=True)
    import json as _json

    with open(f"{d}/preprocessor_config.json", "w") as f:
        _json.dump(
            {
                "image_processor_type": "GotOcr2ImageProcessor",
                "size": {"height": 28, "width": 28},
                "min_patches": 1,
                "max_patches": 2,
                "use_thumbnail": True,
                "image_mean": [0.5, 0.5, 0.5],
                "image_std": [0.5, 0.5, 0.5],
            },
            f,
        )
    return model, str(d), ctx


def test_aya_feature_parity(tiny_aya, rng):
    from vllm_mlx_tpu.models.aya_vision import AyaVisionModel

    model, path, _ = tiny_aya
    vlm = AyaVisionModel(path, dtype="float32").load()
    tiles = rng.standard_normal((2, 3, 28, 28)).astype(np.float32) * 0.5
    ours = vlm.encode_tiles(tiles)  # [2, 4, 48]
    assert ours.shape == (2, 4, 48)
    with torch.no_grad():
        theirs = model.get_image_features(
            pixel_values=torch.tensor(tiles),
            vision_feature_layer=-1,
            vision_feature_select_strategy="full",
        ).numpy()
    np.testing.assert_allclose(
        ours.reshape(-1, 48), theirs.reshape(-1, 48), atol=3e-4
    )


def test_aya_engine_matches_hf(tiny_aya, rng):
    from PIL import Image

    from vllm_mlx_tpu.config import CacheConfig, SchedulerConfig
    from vllm_mlx_tpu.engine.batched import BatchedEngine
    from vllm_mlx_tpu.multimodal_processor import (
        InternVLImageProcessor,
        extract_media_from_messages,
    )

    model, path, ctx = tiny_aya
    arr = rng.integers(0, 255, size=(28, 56, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    uri = "data:image/png;base64," + base64.b64encode(buf.getvalue()).decode()
    messages = [
        {
            "role": "user",
            "content": [
                {"type": "text", "text": "describe "},
                {"type": "image_url", "image_url": {"url": uri}},
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
            assert engine.vlm_kind == "aya_vision"
            out = await engine.chat(messages, max_tokens=6, temperature=0.0)
            cleaned, _ = extract_media_from_messages(messages)
            prompt = engine.apply_chat_template(cleaned)
            proc = InternVLImageProcessor.from_pretrained(path)
            tiles = proc(Image.fromarray(arr))
            expanded = prompt.replace(
                "<image>",
                engine.vlm.image_prompt_string(tiles.shape[0], 4),
            )
            ids = engine._tokenizer.encode(expanded)
            with torch.no_grad():
                hf = model.generate(
                    input_ids=torch.tensor([ids]),
                    attention_mask=torch.ones(
                        (1, len(ids)), dtype=torch.long
                    ),
                    pixel_values=torch.tensor(tiles.astype(np.float32)),
                    do_sample=False,
                    max_new_tokens=6,
                    output_scores=True,
                    return_dict_in_generate=True,
                )
            theirs = hf.sequences[0].numpy().tolist()[len(ids):]
            import sys as _sys

            _sys.path.insert(0, "tests")
            from vlm_test_utils import assert_tied_greedy, hf_scores_fn

            img_id = engine._tokenizer.convert_tokens_to_ids("<image>")
            assert_tied_greedy(
                out.token_ids, theirs, hf_scores_fn(hf.scores),
                exclude_ids={img_id},
            )
        finally:
            await engine.stop()

    asyncio.run(go())

# SPDX-License-Identifier: Apache-2.0
"""InternVL parity + engine integration: BEiT-style tower with
layer-scale, pixel-shuffle connector, tiled prompts, served greedy vs
HF generate."""

import asyncio
import base64
import io

import numpy as np
import pytest

torch = pytest.importorskip("torch")

CTX = 292  # <IMG_CONTEXT> in the tiny tokenizer


@pytest.fixture(scope="module")
def tiny_internvl(tmp_path_factory):
    from tokenizers import (
        Tokenizer, decoders, models, pre_tokenizers, trainers,
    )
    from transformers import (
        InternVLConfig,
        InternVLForConditionalGeneration,
        InternVLVisionConfig,
        PreTrainedTokenizerFast,
        Qwen2Config,
    )

    d = tmp_path_factory.mktemp("internvl")
    tok = Tokenizer(models.BPE(unk_token=None))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=290,
        special_tokens=["</s>", "<|user|>", "<|assistant|>"],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
    )
    tok.train_from_iterator(
        ["what is in this picture", "describe the image please"] * 8,
        trainer,
    )
    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok, eos_token="</s>", pad_token="</s>",
    )
    fast.add_special_tokens(
        {
            "additional_special_tokens": [
                "<img>", "</img>", "<IMG_CONTEXT>", "<image>",
            ]
        }
    )
    assert fast.convert_tokens_to_ids("<IMG_CONTEXT>") == CTX
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
    vision = InternVLVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, image_size=28, patch_size=7,
        # 4x4 patches -> pixel shuffle 0.5 -> 2x2 = 4 rows per tile
        use_qk_norm=True, attention_bias=True,
    )
    text = Qwen2Config(
        vocab_size=320, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, eos_token_id=fast.eos_token_id,
    )
    cfg = InternVLConfig(
        vision_config=vision, text_config=text, image_token_id=CTX,
        downsample_ratio=0.5,
    )
    model = InternVLForConditionalGeneration(cfg).eval()
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
    return model, str(d)


def test_internvl_feature_parity(tiny_internvl, rng):
    from vllm_mlx_tpu.models.internvl import InternVLModel

    model, path = tiny_internvl
    vlm = InternVLModel(path, dtype="float32").load()
    tiles = rng.standard_normal((2, 3, 28, 28)).astype(np.float32) * 0.5
    ours = vlm.encode_tiles(tiles)  # [2*4, 48]
    assert ours.shape == (8, 48)
    with torch.no_grad():
        theirs = model.get_image_features(
            pixel_values=torch.tensor(tiles)
        ).numpy()
    np.testing.assert_allclose(
        ours, theirs.reshape(ours.shape), atol=3e-4
    )


def test_internvl_tiling(tiny_internvl, rng):
    from PIL import Image

    from vllm_mlx_tpu.multimodal_processor import InternVLImageProcessor

    _, path = tiny_internvl
    proc = InternVLImageProcessor.from_pretrained(path)
    # wide image -> 2x1 canvas + thumbnail = 3 tiles
    arr = rng.integers(0, 255, size=(28, 56, 3), dtype=np.uint8)
    tiles = proc(Image.fromarray(arr))
    assert tiles.shape == (3, 3, 28, 28)
    # square small image -> single tile, no thumbnail
    arr2 = rng.integers(0, 255, size=(28, 28, 3), dtype=np.uint8)
    assert proc(Image.fromarray(arr2)).shape[0] == 1


def test_internvl_engine_matches_hf(tiny_internvl, rng):
    from PIL import Image

    from vllm_mlx_tpu.config import CacheConfig, SchedulerConfig
    from vllm_mlx_tpu.engine.batched import BatchedEngine
    from vllm_mlx_tpu.multimodal_processor import (
        InternVLImageProcessor,
        extract_media_from_messages,
    )

    model, path = tiny_internvl
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
            assert engine.vlm_kind == "internvl"
            out = await engine.chat(messages, max_tokens=6, temperature=0.0)
            cleaned, _ = extract_media_from_messages(messages)
            prompt = engine.apply_chat_template(cleaned)
            proc = InternVLImageProcessor.from_pretrained(path)
            tiles = proc(Image.fromarray(arr))
            rows = tiles.shape[0] * 4  # 4 soft rows per tile
            expanded = prompt.replace(
                "<image>",
                "<img>" + "<IMG_CONTEXT>" * rows + "</img>",
            )
            ids = engine._tokenizer.encode(expanded)
            with torch.no_grad():
                hf = model.generate(
                    input_ids=torch.tensor([ids]),
                    attention_mask=torch.ones(
                        (1, len(ids)), dtype=torch.long
                    ),
                    pixel_values=torch.tensor(
                        tiles.astype(np.float32)
                    ),
                    do_sample=False,
                    max_new_tokens=6,
                )
            theirs = hf[0].numpy().tolist()[len(ids):]
            import sys as _sys

            _sys.path.insert(0, "tests")
            from vlm_test_utils import assert_tied_greedy

            def hf_logits_at(gen_prefix):
                seq = ids + gen_prefix
                return model(
                    input_ids=torch.tensor([seq]),
                    attention_mask=torch.ones(
                        (1, len(seq)), dtype=torch.long
                    ),
                    pixel_values=torch.tensor(tiles.astype(np.float32)),
                ).logits[0, -1]

            assert_tied_greedy(
                out.token_ids, theirs, hf_logits_at, exclude_ids={CTX}
            )
        finally:
            await engine.stop()

    asyncio.run(go())

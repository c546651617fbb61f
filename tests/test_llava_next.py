# SPDX-License-Identifier: Apache-2.0
"""LLaVA-NeXT (anyres) parity + engine integration: best-resolution
tiling, unpad + image_newline packing, served greedy vs HF generate."""

import asyncio
import base64
import io

import numpy as np
import pytest

torch = pytest.importorskip("torch")

IMG = 259


@pytest.fixture(scope="module")
def tiny_llava_next(tmp_path_factory):
    from tokenizers import (
        Tokenizer, decoders, models, pre_tokenizers, trainers,
    )
    from transformers import (
        CLIPVisionConfig,
        LlamaConfig,
        LlavaNextConfig,
        LlavaNextForConditionalGeneration,
        PreTrainedTokenizerFast,
    )

    d = tmp_path_factory.mktemp("llava_next")
    tok = Tokenizer(models.BPE(unk_token=None))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=250,
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
    fast.add_special_tokens({"additional_special_tokens": ["<image>"]})
    assert fast.convert_tokens_to_ids("<image>") == IMG
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
    vision = CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=4, image_size=28, patch_size=14,
        # 2x2 = 4 patch features per 28px tile
    )
    text = LlamaConfig(
        vocab_size=300, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, eos_token_id=fast.eos_token_id,
    )
    cfg = LlavaNextConfig(
        vision_config=vision, text_config=text, image_token_index=IMG,
        vision_feature_layer=-2,
        vision_feature_select_strategy="default",
        image_grid_pinpoints=[[28, 56], [56, 28], [56, 56]],
    )
    model = LlavaNextForConditionalGeneration(cfg).eval()
    model.save_pretrained(d, safe_serialization=True)
    import json as _json

    with open(f"{d}/preprocessor_config.json", "w") as f:
        _json.dump(
            {
                "image_processor_type": "LlavaNextImageProcessor",
                "size": {"shortest_edge": 28},
                "image_grid_pinpoints": [[28, 56], [56, 28], [56, 56]],
                "image_mean": [0.5, 0.5, 0.5],
                "image_std": [0.5, 0.5, 0.5],
            },
            f,
        )
    return model, str(d)


def test_llava_next_pack_matches_hf(tiny_llava_next, rng):
    """Tiling + packed features == HF get_image_features +
    pack_image_features (incl. unpad and image_newline rows)."""
    from PIL import Image

    from vllm_mlx_tpu.models.llava_next import LlavaNextVLM
    from vllm_mlx_tpu.multimodal_processor import LlavaNextImageProcessor

    model, path = tiny_llava_next
    # 48x36: best fit 56x28? -> exercises unpad asymmetry
    arr = rng.integers(0, 255, size=(36, 48, 3), dtype=np.uint8)
    img = Image.fromarray(arr)
    proc = LlavaNextImageProcessor.from_pretrained(path)
    tiles, grid, orig = proc(img)
    assert orig == (36, 48)
    vlm = LlavaNextVLM(path, dtype="float32").load()
    mine = vlm.encode_anyres(tiles, grid, orig)

    # oracle: the inputs_embeds HF scatters into the LM — capture them
    # with a pre-hook on the language model and slice the image rows
    ids = [5, 6] + [IMG] * mine.shape[0] + [7, 8]
    captured = {}

    def spy(module, args, kwargs):
        emb = kwargs.get("inputs_embeds")
        if emb is None and args:
            emb = args[0]
        captured["emb"] = emb.detach().clone()

    h = model.model.language_model.register_forward_pre_hook(
        spy, with_kwargs=True
    )
    try:
        with torch.no_grad():
            model(
                input_ids=torch.tensor([ids]),
                pixel_values=torch.tensor(tiles[None].astype(np.float32)),
                image_sizes=torch.tensor([list(orig)]),
            )
    finally:
        h.remove()
    ref = captured["emb"][0, 2 : 2 + mine.shape[0]].float().numpy()
    assert mine.shape == ref.shape
    np.testing.assert_allclose(mine, ref, atol=3e-4)


def test_llava_next_engine_matches_hf(tiny_llava_next, rng):
    from PIL import Image

    from vllm_mlx_tpu.config import CacheConfig, SchedulerConfig
    from vllm_mlx_tpu.engine.batched import BatchedEngine
    from vllm_mlx_tpu.multimodal_processor import (
        LlavaNextImageProcessor,
        extract_media_from_messages,
    )

    model, path = tiny_llava_next
    arr = rng.integers(0, 255, size=(36, 48, 3), dtype=np.uint8)
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
            assert engine.vlm_kind == "llava_next"
            out = await engine.chat(messages, max_tokens=6, temperature=0.0)
            cleaned, _ = extract_media_from_messages(messages)
            prompt = engine.apply_chat_template(cleaned)
            base_ids = engine._tokenizer.encode(prompt)
            proc = LlavaNextImageProcessor.from_pretrained(path)
            tiles, grid, orig = proc(Image.fromarray(arr))
            packed = engine.vlm.encode_anyres(tiles, grid, orig)
            ids = []
            for t in base_ids:
                ids.extend(
                    [IMG] * packed.shape[0] if t == IMG else [t]
                )
            with torch.no_grad():
                hf = model.generate(
                    input_ids=torch.tensor([ids]),
                    attention_mask=torch.ones(
                        (1, len(ids)), dtype=torch.long
                    ),
                    pixel_values=torch.tensor(
                        tiles[None].astype(np.float32)
                    ),
                    image_sizes=torch.tensor([list(orig)]),
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
                    pixel_values=torch.tensor(
                        tiles[None].astype(np.float32)
                    ),
                    image_sizes=torch.tensor([list(orig)]),
                ).logits[0, -1]

            assert_tied_greedy(out.token_ids, theirs, hf_logits_at)
        finally:
            await engine.stop()

    asyncio.run(go())


@pytest.fixture(scope="module")
def tiny_onevision(tmp_path_factory):
    """OneVision: SigLIP tower, strategy full, anyres_max_1 so the
    bilinear token cap actually fires on a 2x2 tile grid."""
    from tokenizers import (
        Tokenizer, decoders, models, pre_tokenizers, trainers,
    )
    from transformers import (
        LlamaConfig,
        LlavaOnevisionConfig,
        LlavaOnevisionForConditionalGeneration,
        PreTrainedTokenizerFast,
        SiglipVisionConfig,
    )

    d = tmp_path_factory.mktemp("llava_onevision")
    tok = Tokenizer(models.BPE(unk_token=None))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=250,
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
    fast.add_special_tokens({"additional_special_tokens": ["<image>"]})
    img = fast.convert_tokens_to_ids("<image>")
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
        # 4x4 = 16 patch features per tile
    )
    text = LlamaConfig(
        vocab_size=300, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, eos_token_id=fast.eos_token_id,
    )
    cfg = LlavaOnevisionConfig(
        vision_config=vision, text_config=text, image_token_index=img,
        vision_feature_layer=-1, vision_feature_select_strategy="full",
        image_grid_pinpoints=[[28, 56], [56, 28], [56, 56]],
        vision_aspect_ratio="anyres_max_1",
    )
    model = LlavaOnevisionForConditionalGeneration(cfg).eval()
    model.save_pretrained(d, safe_serialization=True)
    import json as _json

    with open(f"{d}/preprocessor_config.json", "w") as f:
        _json.dump(
            {
                "image_processor_type": "LlavaOnevisionImageProcessor",
                "size": {"shortest_edge": 28},
                "image_grid_pinpoints": [[28, 56], [56, 28], [56, 56]],
                "image_mean": [0.5, 0.5, 0.5],
                "image_std": [0.5, 0.5, 0.5],
            },
            f,
        )
    return model, str(d), img


def test_onevision_engine_matches_hf(tiny_onevision, rng):
    """OneVision served greedy == HF generate, incl. the anyres_max
    bilinear token cap (anyres_max_1 forces the downscale)."""
    from PIL import Image

    from vllm_mlx_tpu.config import CacheConfig, SchedulerConfig
    from vllm_mlx_tpu.engine.batched import BatchedEngine
    from vllm_mlx_tpu.multimodal_processor import (
        LlavaNextImageProcessor,
        extract_media_from_messages,
    )

    model, path, img_id = tiny_onevision
    arr = rng.integers(0, 255, size=(52, 52, 3), dtype=np.uint8)
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
            max_num_seqs=2, max_prefill_tokens=96,
            prefill_chunk_sizes=[96], max_model_len=256,
        ),
    )

    async def go():
        await engine.start()
        try:
            assert engine.vlm_kind == "llava_next"
            assert engine.vlm.max_num_patches == 1
            out = await engine.chat(messages, max_tokens=6, temperature=0.0)
            cleaned, _ = extract_media_from_messages(messages)
            prompt = engine.apply_chat_template(cleaned)
            base_ids = engine._tokenizer.encode(prompt)
            proc = LlavaNextImageProcessor.from_pretrained(path)
            tiles, grid, orig = proc(Image.fromarray(arr))
            packed = engine.vlm.encode_anyres(tiles, grid, orig)
            # the cap fired: 2x2 tiles of 16 rows each would be 64+rows
            # without it; anyres_max_1 caps the spatial part near 16
            assert packed.shape[0] < 16 + 64
            ids = []
            for t in base_ids:
                ids.extend(
                    [img_id] * packed.shape[0] if t == img_id else [t]
                )
            with torch.no_grad():
                hf = model.generate(
                    input_ids=torch.tensor([ids]),
                    attention_mask=torch.ones(
                        (1, len(ids)), dtype=torch.long
                    ),
                    pixel_values=torch.tensor(
                        tiles[None].astype(np.float32)
                    ),
                    image_sizes=torch.tensor([list(orig)]),
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
                    pixel_values=torch.tensor(
                        tiles[None].astype(np.float32)
                    ),
                    image_sizes=torch.tensor([list(orig)]),
                ).logits[0, -1]

            assert_tied_greedy(out.token_ids, theirs, hf_logits_at)
        finally:
            await engine.stop()

    asyncio.run(go())

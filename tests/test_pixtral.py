# SPDX-License-Identifier: Apache-2.0
"""Pixtral parity + engine integration.

Pins the variable-resolution 2-D-rope tower + LLaVA projector against
HF ``LlavaForConditionalGeneration.get_image_features`` (pixtral
vision tower) and served greedy generation against HF ``generate``
with the row-structured [IMG]/[IMG_BREAK]/[IMG_END] prompt layout.
"""

import asyncio
import base64
import io

import numpy as np
import pytest

torch = pytest.importorskip("torch")

IMG, BRK, END = 293, 294, 295


@pytest.fixture(scope="module")
def tiny_pixtral(tmp_path_factory):
    from tokenizers import (
        Tokenizer, decoders, models, pre_tokenizers, trainers,
    )
    from transformers import (
        LlavaConfig,
        LlavaForConditionalGeneration,
        MistralConfig,
        PixtralVisionConfig,
        PreTrainedTokenizerFast,
    )

    d = tmp_path_factory.mktemp("pixtral")
    tok = Tokenizer(models.BPE(unk_token=None))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=296,
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
        {"additional_special_tokens": ["[IMG]", "[IMG_BREAK]", "[IMG_END]"]}
    )
    assert fast.convert_tokens_to_ids("[IMG]") == IMG
    assert fast.convert_tokens_to_ids("[IMG_END]") == END
    fast.chat_template = (
        "{% for message in messages %}<|{{ message.role }}|>"
        "{% if message.content is string %}{{ message.content }}"
        "{% else %}{% for part in message.content %}"
        "{% if part.type == 'image' %}[IMG]{% else %}{{ part.text }}"
        "{% endif %}{% endfor %}{% endif %}</s>{% endfor %}"
        "{% if add_generation_prompt %}<|assistant|>{% endif %}"
    )
    fast.save_pretrained(d)

    torch.manual_seed(0)
    vision = PixtralVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, head_dim=8, image_size=64, patch_size=16,
    )
    text = MistralConfig(
        vocab_size=320, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=12, max_position_embeddings=512,
        eos_token_id=fast.eos_token_id, sliding_window=None,
    )
    cfg = LlavaConfig(
        vision_config=vision, text_config=text, image_token_index=IMG,
        vision_feature_layer=-1, vision_feature_select_strategy="full",
        projector_hidden_act="gelu",
    )
    cfg.image_break_token_id = BRK
    cfg.image_end_token_id = END
    model = LlavaForConditionalGeneration(cfg).eval()
    model.save_pretrained(d, safe_serialization=True)
    return model, str(d)


def test_pixtral_vision_feature_parity(tiny_pixtral, rng):
    from vllm_mlx_tpu.models.pixtral import PixtralVLM

    model, path = tiny_pixtral
    vlm = PixtralVLM(path, dtype="float32").load()
    # 48x32 image -> 3x2 patch grid (non-square exercises 2-D rope)
    pixels = rng.standard_normal((3, 48, 32)).astype(np.float32) * 0.5
    ours = vlm.encode_image(pixels)  # [6, 48]
    assert ours.shape == (6, 48)
    with torch.no_grad():
        theirs = model.get_image_features(
            pixel_values=torch.tensor(pixels[None]),
            image_sizes=torch.tensor([[48, 32]]),
            vision_feature_layer=-1,
            vision_feature_select_strategy="full",
        )
        theirs = (
            theirs[0] if isinstance(theirs, (list, tuple)) else theirs
        ).numpy()
    np.testing.assert_allclose(
        ours, theirs.reshape(ours.shape), atol=3e-4
    )


def test_pixtral_expand_layout(tiny_pixtral):
    from vllm_mlx_tpu.models.pixtral import PixtralVLM

    _, path = tiny_pixtral
    vlm = PixtralVLM(path, dtype="float32").load()
    ids = vlm.expand_image_tokens([5, IMG, 7], [(2, 3)])
    assert ids == [5, IMG, IMG, IMG, BRK, IMG, IMG, IMG, END, 7]


def test_pixtral_engine_matches_hf(tiny_pixtral, rng):
    """Served greedy == HF generate with the expanded [IMG] layout."""
    from PIL import Image

    from vllm_mlx_tpu.config import CacheConfig, SchedulerConfig
    from vllm_mlx_tpu.engine.batched import BatchedEngine

    model, path = tiny_pixtral
    arr = rng.integers(0, 255, size=(48, 32, 3), dtype=np.uint8)
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
            assert engine.vlm_kind == "pixtral"
            out = await engine.chat(messages, max_tokens=6, temperature=0.0)
            # rebuild the ids + pixels the engine used
            from vllm_mlx_tpu.multimodal_processor import (
                extract_media_from_messages,
            )

            cleaned, _ = extract_media_from_messages(messages)
            prompt = engine.apply_chat_template(cleaned)
            base_ids = engine._tokenizer.encode(prompt)
            pixel = engine.image_processor(Image.fromarray(arr))
            grid = engine.image_processor.grid(pixel)
            assert grid == (3, 2)
            ids = engine.vlm.expand_image_tokens(base_ids, [grid])
            with torch.no_grad():
                hf = model.generate(
                    input_ids=torch.tensor([ids]),
                    attention_mask=torch.ones(
                        (1, len(ids)), dtype=torch.long
                    ),
                    pixel_values=torch.tensor(
                        pixel[None].astype(np.float32)
                    ),
                    image_sizes=torch.tensor([[48, 32]]),
                    do_sample=False,
                    max_new_tokens=6,
                )
            theirs = hf[0].numpy().tolist()[len(ids):]
            import sys as _sys

            _sys.path.insert(0, "tests")
            from vlm_test_utils import assert_tied_greedy, hf_logits_fn

            assert_tied_greedy(
                out.token_ids,
                theirs,
                hf_logits_fn(
                    model,
                    ids,
                    pixel_values=torch.tensor(
                        pixel[None].astype(np.float32)
                    ),
                    image_sizes=torch.tensor([[48, 32]]),
                ),
                exclude_ids={IMG, BRK, END},
            )
        finally:
            await engine.stop()

    asyncio.run(go())


@pytest.fixture(scope="module")
def tiny_mistral3(tmp_path_factory):
    """Mistral-Small-3-style: pixtral tower + RMSNorm + 2x2 learned
    patch merge + 2-layer projector, [IMG] tokens at MERGED
    granularity."""
    from tokenizers import (
        Tokenizer, decoders, models, pre_tokenizers, trainers,
    )
    from transformers import (
        Mistral3Config,
        Mistral3ForConditionalGeneration,
        MistralConfig,
        PixtralVisionConfig,
        PreTrainedTokenizerFast,
    )

    d = tmp_path_factory.mktemp("mistral3")
    tok = Tokenizer(models.BPE(unk_token=None))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=296,
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
        {"additional_special_tokens": ["[IMG]", "[IMG_BREAK]", "[IMG_END]"]}
    )
    img = fast.convert_tokens_to_ids("[IMG]")
    brk = fast.convert_tokens_to_ids("[IMG_BREAK]")
    end = fast.convert_tokens_to_ids("[IMG_END]")
    fast.chat_template = (
        "{% for message in messages %}<|{{ message.role }}|>"
        "{% if message.content is string %}{{ message.content }}"
        "{% else %}{% for part in message.content %}"
        "{% if part.type == 'image' %}[IMG]{% else %}{{ part.text }}"
        "{% endif %}{% endfor %}{% endif %}</s>{% endfor %}"
        "{% if add_generation_prompt %}<|assistant|>{% endif %}"
    )
    fast.save_pretrained(d)

    torch.manual_seed(1)
    vision = PixtralVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, head_dim=8, image_size=64, patch_size=16,
    )
    text = MistralConfig(
        vocab_size=320, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=12, max_position_embeddings=512,
        eos_token_id=fast.eos_token_id, sliding_window=None,
    )
    cfg = Mistral3Config(
        vision_config=vision, text_config=text, image_token_index=img,
        spatial_merge_size=2, vision_feature_layer=-1,
        multimodal_projector_bias=False,
    )
    cfg.image_break_token_id = brk
    cfg.image_end_token_id = end
    model = Mistral3ForConditionalGeneration(cfg).eval()
    model.save_pretrained(d, safe_serialization=True)
    return model, str(d), (img, brk, end)


def test_mistral3_feature_parity(tiny_mistral3, rng):
    from vllm_mlx_tpu.models.pixtral import PixtralVLM

    model, path, _ = tiny_mistral3
    vlm = PixtralVLM(path, dtype="float32").load()
    assert vlm.cfg.projector_style == "mistral3"
    # 64x32 -> 4x2 raw patch grid -> 2x1 merged tokens
    pixels = rng.standard_normal((3, 64, 32)).astype(np.float32) * 0.5
    ours = vlm.encode_image(pixels)
    assert ours.shape == (2, 48)
    with torch.no_grad():
        theirs = model.get_image_features(
            pixel_values=torch.tensor(pixels[None]),
            image_sizes=torch.tensor([[64, 32]]),
        )
        theirs = (
            theirs[0] if isinstance(theirs, (list, tuple)) else theirs
        ).numpy()
    np.testing.assert_allclose(
        ours, theirs.reshape(ours.shape), atol=3e-4
    )


def test_mistral3_engine_matches_hf(tiny_mistral3, rng):
    from PIL import Image

    from vllm_mlx_tpu.config import CacheConfig, SchedulerConfig
    from vllm_mlx_tpu.engine.batched import BatchedEngine
    from vllm_mlx_tpu.multimodal_processor import (
        extract_media_from_messages,
    )

    model, path, (img, brk, end) = tiny_mistral3
    arr = rng.integers(0, 255, size=(64, 32, 3), dtype=np.uint8)
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
            assert engine.vlm_kind == "pixtral"
            assert engine.image_processor.patch_size == 32  # 16 * merge
            out = await engine.chat(messages, max_tokens=6, temperature=0.0)
            cleaned, _ = extract_media_from_messages(messages)
            prompt = engine.apply_chat_template(cleaned)
            base_ids = engine._tokenizer.encode(prompt)
            pixel = engine.image_processor(Image.fromarray(arr))
            grid = engine.image_processor.grid(pixel)
            assert grid == (2, 1)  # merged-token grid
            ids = engine.vlm.expand_image_tokens(base_ids, [grid])
            with torch.no_grad():
                hf = model.generate(
                    input_ids=torch.tensor([ids]),
                    attention_mask=torch.ones(
                        (1, len(ids)), dtype=torch.long
                    ),
                    pixel_values=torch.tensor(
                        pixel[None].astype(np.float32)
                    ),
                    image_sizes=torch.tensor([[64, 32]]),
                    do_sample=False,
                    max_new_tokens=6,
                )
            theirs = hf[0].numpy().tolist()[len(ids):]
            import sys as _sys

            _sys.path.insert(0, "tests")
            from vlm_test_utils import assert_tied_greedy, hf_logits_fn

            assert_tied_greedy(
                out.token_ids,
                theirs,
                hf_logits_fn(
                    model,
                    ids,
                    pixel_values=torch.tensor(
                        pixel[None].astype(np.float32)
                    ),
                    image_sizes=torch.tensor([[64, 32]]),
                ),
                exclude_ids={IMG, BRK, END},
            )
        finally:
            await engine.stop()

    asyncio.run(go())

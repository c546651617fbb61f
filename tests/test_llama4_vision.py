# SPDX-License-Identifier: Apache-2.0
"""Llama 4 multimodal parity + engine integration: unfold-embed ViT
with 2-D complex rope, pixel-shuffle MLP2 adapter, best-fit tiling with
the structured <|image_start|>/<|patch|>/<|tile_*_separator|> prompt
(HF Llama4ForConditionalGeneration / Llama4Processor)."""

import asyncio
import base64
import io

import numpy as np
import pytest

torch = pytest.importorskip("torch")

IMG_SPECIALS = [
    "<|image_start|>", "<|image_end|>", "<|patch|>",
    "<|tile_x_separator|>", "<|tile_y_separator|>", "<|image|>",
    "<image>",
]


@pytest.fixture(scope="module")
def tiny_llama4_vlm(tmp_path_factory):
    from tokenizers import (
        Tokenizer, decoders, models, pre_tokenizers, trainers,
    )
    from transformers import (
        Llama4Config,
        Llama4ForConditionalGeneration,
        Llama4TextConfig,
        Llama4VisionConfig,
        PreTrainedTokenizerFast,
    )

    d = tmp_path_factory.mktemp("llama4_vlm")
    tok = Tokenizer(models.BPE(unk_token=None))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=290,
        special_tokens=["</s>", "<|user|>", "<|assistant|>"],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
    )
    tok.train_from_iterator(
        ["what is in this picture describe the image"] * 8, trainer,
    )
    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok, eos_token="</s>", pad_token="</s>",
    )
    fast.add_special_tokens({"additional_special_tokens": IMG_SPECIALS})
    ctx = fast.convert_tokens_to_ids("<|patch|>")
    fast.chat_template = (
        "{% for message in messages %}<|{{ message.role }}|>"
        "{% if message.content is string %}{{ message.content }}"
        "{% else %}{% for part in message.content %}"
        "{% if part.type == 'image' %}<image>{% else %}{{ part.text }}"
        "{% endif %}{% endfor %}{% endif %}</s>{% endfor %}"
        "{% if add_generation_prompt %}<|assistant|>{% endif %}"
    )
    fast.save_pretrained(d)

    torch.manual_seed(7)
    vision = Llama4VisionConfig(
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        # MLP2.fc1 reads the pixel-shuffled channels = hidden/ratio^2
        intermediate_size=128,
        image_size=28,
        patch_size=14,
        pixel_shuffle_ratio=0.5,
        projector_input_dim=64,
        projector_output_dim=64,
        vision_output_dim=64,
        rope_theta=10000,
    )
    text = Llama4TextConfig(
        vocab_size=320, hidden_size=64, intermediate_size=96,
        intermediate_size_mlp=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        num_local_experts=4, num_experts_per_tok=1,
        interleave_moe_layer_step=2, no_rope_layer_interval=2,
        attention_chunk_size=8, use_qk_norm=True,
        attn_temperature_tuning=True, floor_scale=4.0, attn_scale=0.1,
        max_position_embeddings=512, eos_token_id=fast.eos_token_id,
    )
    cfg = Llama4Config(
        vision_config=vision, text_config=text, image_token_index=ctx,
    )
    model = Llama4ForConditionalGeneration(cfg).eval()
    model.config._attn_implementation = "eager"
    model.save_pretrained(d, safe_serialization=True)
    import json as _json

    with open(f"{d}/preprocessor_config.json", "w") as f:
        _json.dump(
            {
                "image_processor_type": "Llama4ImageProcessorFast",
                "size": {"height": 28, "width": 28},
                "max_patches": 4,
                "image_mean": [0.5, 0.5, 0.5],
                "image_std": [0.5, 0.5, 0.5],
            },
            f,
        )
    return model, str(d), ctx


def test_llama4_feature_parity(tiny_llama4_vlm, rng):
    from vllm_mlx_tpu.models.llama4_mm import Llama4VLM

    model, path, _ = tiny_llama4_vlm
    vlm = Llama4VLM(path, dtype="float32").load()
    assert vlm.tokens_per_tile == 1
    tiles = rng.standard_normal((3, 3, 28, 28)).astype(np.float32) * 0.5
    ours = vlm.encode_tiles(tiles)  # [3, 1, 64]
    assert ours.shape == (3, 1, 64)
    with torch.no_grad():
        feats = model.vision_model(
            pixel_values=torch.tensor(tiles)
        ).last_hidden_state
        theirs = model.multi_modal_projector(feats).numpy()
    np.testing.assert_allclose(
        ours.reshape(-1, 64), theirs.reshape(-1, 64), atol=3e-4
    )


def test_llama4_tiling_prompt(tiny_llama4_vlm, rng):
    from PIL import Image

    from vllm_mlx_tpu.models.llama4_mm import Llama4VLM
    from vllm_mlx_tpu.multimodal_processor import Llama4ImageProcessor

    _, path, _ = tiny_llama4_vlm
    proc = Llama4ImageProcessor.from_pretrained(path)
    arr = rng.integers(0, 255, size=(28, 56, 3), dtype=np.uint8)
    tiles, ratio = proc(Image.fromarray(arr))
    assert ratio == (1, 2)
    assert tiles.shape == (3, 3, 28, 28)  # 2 locals + global
    vlm = Llama4VLM(path, dtype="float32").load()
    s = vlm.image_prompt_string(ratio)
    assert s == (
        "<|image_start|><|patch|><|tile_x_separator|><|patch|>"
        "<|tile_y_separator|><|image|><|patch|><|image_end|>"
    )
    # square small image: single tile, no separators, no global
    tiles1, ratio1 = proc(Image.fromarray(arr[:, :28]))
    assert ratio1 == (1, 1) and tiles1.shape[0] == 1
    assert vlm.image_prompt_string(ratio1) == (
        "<|image_start|><|image|><|patch|><|image_end|>"
    )


def test_llama4_engine_matches_hf(tiny_llama4_vlm, rng):
    from PIL import Image

    from vllm_mlx_tpu.config import CacheConfig, SchedulerConfig
    from vllm_mlx_tpu.engine.batched import BatchedEngine
    from vllm_mlx_tpu.multimodal_processor import (
        Llama4ImageProcessor,
        extract_media_from_messages,
    )

    model, path, ctx = tiny_llama4_vlm
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
            assert engine.vlm_kind == "llama4"
            out = await engine.chat(messages, max_tokens=6, temperature=0.0)
            cleaned, _ = extract_media_from_messages(messages)
            prompt = engine.apply_chat_template(cleaned)
            proc = Llama4ImageProcessor.from_pretrained(path)
            tiles, ratio = proc(Image.fromarray(arr))
            expanded = prompt.replace(
                "<image>", engine.vlm.image_prompt_string(ratio)
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

            img_ids = {
                engine._tokenizer.convert_tokens_to_ids(t)
                for t in IMG_SPECIALS
            }
            assert_tied_greedy(
                out.token_ids, theirs, hf_scores_fn(hf.scores),
                exclude_ids=img_ids,
            )
        finally:
            await engine.stop()

    asyncio.run(go())

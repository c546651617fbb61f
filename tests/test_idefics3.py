# SPDX-License-Identifier: Apache-2.0
"""Idefics3/SmolVLM parity + engine integration.

Pins the SigLIP-shaped tower + pixel-shuffle connector against HF
``Idefics3ForConditionalGeneration.get_image_features`` and served
greedy generation against HF ``generate`` with the row/col tiled
prompt layout (HF get_image_prompt_string).
"""

import asyncio
import base64
import io

import numpy as np
import pytest

torch = pytest.importorskip("torch")

IMG = 294  # <image> id in the tiny tokenizer


@pytest.fixture(scope="module")
def tiny_idefics3(tmp_path_factory):
    from tokenizers import (
        Tokenizer, decoders, models, pre_tokenizers, trainers,
    )
    from transformers import (
        Idefics3Config,
        Idefics3ForConditionalGeneration,
        Idefics3VisionConfig,
        LlamaConfig,
        PreTrainedTokenizerFast,
    )

    d = tmp_path_factory.mktemp("idefics3")
    tok = Tokenizer(models.BPE(unk_token=None))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=292,
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
                "<fake_token_around_image>",
                "<global-img>",
                "<image>",
                "<row_1_col_1>",
                "<row_1_col_2>",
                "<row_2_col_1>",
                "<row_2_col_2>",
            ]
        }
    )
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
    vision = Idefics3VisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, image_size=28, patch_size=14,
        # 2x2 patches -> pixel shuffle sf=2 -> 1 soft token per tile
    )
    text = LlamaConfig(
        vocab_size=320, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, eos_token_id=fast.eos_token_id,
    )
    cfg = Idefics3Config(
        vision_config=vision, text_config=text,
        scale_factor=2, image_token_id=IMG,
    )
    model = Idefics3ForConditionalGeneration(cfg).eval()
    model.save_pretrained(d, safe_serialization=True)
    # preprocessor: tiny geometry (tile = 28, longest edge 56 -> up to
    # 2x2 tiles + global)
    import json as _json

    with open(f"{d}/preprocessor_config.json", "w") as f:
        _json.dump(
            {
                "image_processor_type": "Idefics3ImageProcessor",
                "size": {"longest_edge": 56},
                "max_image_size": {"longest_edge": 28},
                "image_mean": [0.5, 0.5, 0.5],
                "image_std": [0.5, 0.5, 0.5],
                "do_image_splitting": True,
            },
            f,
        )
    return model, str(d)


def test_idefics3_tile_feature_parity(tiny_idefics3, rng):
    from vllm_mlx_tpu.models.idefics3 import Idefics3VLM

    model, path = tiny_idefics3
    vlm = Idefics3VLM(path, dtype="float32").load()
    assert vlm.cfg.image_seq_len == 1
    tiles = rng.standard_normal((3, 3, 28, 28)).astype(np.float32) * 0.5
    ours = vlm.encode_tiles(tiles)  # [3, 1, 48]
    assert ours.shape == (3, 1, 48)
    with torch.no_grad():
        theirs = model.get_image_features(
            pixel_values=torch.tensor(tiles[None])  # [1, N, C, H, W]
        )
        theirs = (
            theirs[0] if isinstance(theirs, (list, tuple)) else theirs
        ).numpy()
    np.testing.assert_allclose(
        ours.reshape(-1, 48), theirs.reshape(-1, 48), atol=3e-4
    )


def test_idefics3_prompt_expansion(tiny_idefics3):
    from vllm_mlx_tpu.models.idefics3 import Idefics3VLM

    _, path = tiny_idefics3
    vlm = Idefics3VLM(path, dtype="float32").load()
    s = vlm.image_prompt_string(2, 2)
    assert s.count("<image>") == 5  # 4 tiles + global
    assert "<row_2_col_2>" in s and "<global-img>" in s
    single = vlm.image_prompt_string(0, 0)
    assert single.count("<image>") == 1


def test_idefics3_engine_matches_hf(tiny_idefics3, rng):
    """Served greedy == HF generate with the tiled prompt layout."""
    from PIL import Image

    from vllm_mlx_tpu.config import CacheConfig, SchedulerConfig
    from vllm_mlx_tpu.engine.batched import BatchedEngine

    model, path = tiny_idefics3
    # 56x42 -> rescale long edge 56 -> 56x42 -> encoder multiples
    # (56, 56) -> 2x2 tiles + global
    arr = rng.integers(0, 255, size=(42, 56, 3), dtype=np.uint8)
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
            assert engine.vlm_kind == "idefics3"
            out = await engine.chat(messages, max_tokens=6, temperature=0.0)
            # rebuild ids + pixels the engine used
            from vllm_mlx_tpu.multimodal_processor import (
                Idefics3ImageProcessor,
                extract_media_from_messages,
            )

            cleaned, _ = extract_media_from_messages(messages)
            prompt = engine.apply_chat_template(cleaned)
            proc = Idefics3ImageProcessor.from_pretrained(path)
            tiles, rows, cols = proc(Image.fromarray(arr))
            assert (rows, cols) == (2, 2) and tiles.shape[0] == 5
            expanded = engine.vlm.expand_image_tokens(
                prompt, [(rows, cols)]
            )
            ids = engine._tokenizer.encode(expanded)
            with torch.no_grad():
                hf = model.generate(
                    input_ids=torch.tensor([ids]),
                    attention_mask=torch.ones(
                        (1, len(ids)), dtype=torch.long
                    ),
                    pixel_values=torch.tensor(
                        tiles[None].astype(np.float32)
                    ),
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

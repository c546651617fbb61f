# SPDX-License-Identifier: Apache-2.0
"""DeepSeek-VL parity + engine integration.

DeepSeek-VL rides the shared LLaVA-style path: SigLIP tower read at
last_hidden_state (post-LN), 2-layer GELU aligner, llama LM, single
image token expanded to num_image_tokens rows. Pins features against
HF ``get_image_features`` and served greedy against HF ``generate``.
"""

import asyncio
import base64
import io

import numpy as np
import pytest

torch = pytest.importorskip("torch")

IMG = 290


@pytest.fixture(scope="module")
def tiny_deepseek_vl(tmp_path_factory):
    from tokenizers import (
        Tokenizer, decoders, models, pre_tokenizers, trainers,
    )
    from transformers import (
        DeepseekVLConfig,
        DeepseekVLForConditionalGeneration,
        LlamaConfig,
        PreTrainedTokenizerFast,
        SiglipVisionConfig,
    )

    d = tmp_path_factory.mktemp("deepseek_vl")
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
        {"additional_special_tokens": ["<image_placeholder>"]}
    )
    assert fast.convert_tokens_to_ids("<image_placeholder>") == IMG
    fast.chat_template = (
        "{% for message in messages %}<|{{ message.role }}|>"
        "{% if message.content is string %}{{ message.content }}"
        "{% else %}{% for part in message.content %}"
        "{% if part.type == 'image' %}<image_placeholder>"
        "{% else %}{{ part.text }}"
        "{% endif %}{% endfor %}{% endif %}</s>{% endfor %}"
        "{% if add_generation_prompt %}<|assistant|>{% endif %}"
    )
    fast.save_pretrained(d)

    torch.manual_seed(0)
    vision = SiglipVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, image_size=28, patch_size=14,
        # 2x2 = 4 patches = 4 image-token rows per image
    )
    text = LlamaConfig(
        vocab_size=320, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, eos_token_id=fast.eos_token_id,
    )
    cfg = DeepseekVLConfig(
        vision_config=vision, text_config=text, image_token_id=IMG,
    )
    model = DeepseekVLForConditionalGeneration(cfg).eval()
    model.save_pretrained(d, safe_serialization=True)
    import json as _json

    with open(f"{d}/preprocessor_config.json", "w") as f:
        _json.dump(
            {
                "image_processor_type": "DeepseekVLImageProcessor",
                "size": {"height": 28, "width": 28},
                "image_mean": [0.5, 0.5, 0.5],
                "image_std": [0.5, 0.5, 0.5],
            },
            f,
        )
    return model, str(d)


def test_deepseek_vl_feature_parity(tiny_deepseek_vl, rng):
    from vllm_mlx_tpu.models.mllm import MultimodalLM

    model, path = tiny_deepseek_vl
    vlm = MultimodalLM(path, dtype="float32").load()
    assert vlm.cfg.vision_feature_layer is None
    pixels = rng.standard_normal((1, 3, 28, 28)).astype(np.float32) * 0.5
    ours = vlm.encode_images(pixels)  # [1, 4, 48]
    assert ours.shape == (1, 4, 48)
    with torch.no_grad():
        theirs = model.model.get_image_features(
            pixel_values=torch.tensor(pixels)
        ).numpy()
    np.testing.assert_allclose(
        ours, theirs.reshape(ours.shape), atol=3e-4
    )


def test_deepseek_vl_pad_to_square(tiny_deepseek_vl, rng):
    from PIL import Image

    from vllm_mlx_tpu.multimodal_processor import DeepseekVLImageProcessor

    _, path = tiny_deepseek_vl
    proc = DeepseekVLImageProcessor.from_pretrained(path)
    arr = rng.integers(0, 255, size=(14, 28, 3), dtype=np.uint8)  # wide
    out = proc(Image.fromarray(arr))
    assert out.shape == (3, 28, 28)
    # background = mean*255 = 127 -> normalized ~ -0.0039; the top and
    # bottom pad bands must equal the background value
    bg = (127 / 255.0 - 0.5) / 0.5
    np.testing.assert_allclose(out[:, :7, :], bg, atol=1e-6)
    np.testing.assert_allclose(out[:, 21:, :], bg, atol=1e-6)


def test_deepseek_vl_engine_matches_hf(tiny_deepseek_vl, rng):
    from PIL import Image

    from vllm_mlx_tpu.config import CacheConfig, SchedulerConfig
    from vllm_mlx_tpu.engine.batched import BatchedEngine
    from vllm_mlx_tpu.multimodal_processor import (
        DeepseekVLImageProcessor,
        extract_media_from_messages,
    )

    model, path = tiny_deepseek_vl
    arr = rng.integers(0, 255, size=(28, 28, 3), dtype=np.uint8)
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
            out = await engine.chat(messages, max_tokens=6, temperature=0.0)
            cleaned, _ = extract_media_from_messages(messages)
            prompt = engine.apply_chat_template(cleaned)
            base_ids = engine._tokenizer.encode(prompt)
            # expand the single placeholder to 4 rows like the engine
            ids = []
            for t in base_ids:
                ids.extend([IMG] * 4 if t == IMG else [t])
            proc = DeepseekVLImageProcessor.from_pretrained(path)
            pix = proc.batch([Image.fromarray(arr)])
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

# SPDX-License-Identifier: Apache-2.0
"""Mllama (Llama-3.2-Vision) parity + engine integration.

Pins the tiled gated ViT against HF ``MllamaVisionModel``, the tiling
preprocessor against HF ``MllamaImageProcessor``, the cross-attention
text stack (dense) against HF ``MllamaForConditionalGeneration``
forward — including multi-image token-span windows and the full-row
fixup — and served greedy generation against HF ``generate``.
Reference serves this family via mlx-vlm (models.md multimodal list);
here it is the cross-attention layer type (models/decoder.py
cross_window_attention) + per-slot cross-KV buffers."""

import asyncio
import base64
import io
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "tests")

IMG = 320  # <|image|> id in the tiny tokenizer (== text vocab_size)


@pytest.fixture(scope="module")
def tiny_mllama(tmp_path_factory):
    from tokenizers import (
        Tokenizer, decoders, models, pre_tokenizers, trainers,
    )
    from transformers import (
        MllamaConfig,
        MllamaForConditionalGeneration,
        PreTrainedTokenizerFast,
    )
    from transformers.models.mllama.configuration_mllama import (
        MllamaTextConfig,
        MllamaVisionConfig,
    )

    d = tmp_path_factory.mktemp("mllama")
    tok = Tokenizer(models.BPE(unk_token=None))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=317,
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
    n_base = len(fast)
    fast.add_special_tokens(
        {"additional_special_tokens": ["<|image|>"]}
    )
    global IMG
    IMG = fast.convert_tokens_to_ids("<|image|>")
    assert IMG == n_base
    fast.chat_template = (
        "{% for message in messages %}<|{{ message.role }}|>"
        "{% if message.content is string %}{{ message.content }}"
        "{% else %}{% for part in message.content %}"
        "{% if part.type == 'image' %}<|image|>{% else %}{{ part.text }}"
        "{% endif %}{% endfor %}{% endif %}</s>{% endfor %}"
        "{% if add_generation_prompt %}<|assistant|>{% endif %}"
    )
    fast.save_pretrained(d)

    torch.manual_seed(0)
    vision = MllamaVisionConfig(
        hidden_size=32,
        num_hidden_layers=4,
        num_global_layers=2,
        attention_heads=2,
        intermediate_size=64,
        image_size=28,
        patch_size=7,
        max_num_tiles=4,
        intermediate_layers_indices=[1, 3],
        vision_output_dim=96,  # 32 * (1 + 2 taps)
    )
    text = MllamaTextConfig(
        vocab_size=IMG,  # embed gets vocab+8 rows; image token = row 320
        hidden_size=48,
        intermediate_size=96,
        num_hidden_layers=4,
        num_attention_heads=4,
        num_key_value_heads=2,
        cross_attention_layers=[1, 3],
        max_position_embeddings=512,
        rope_theta=10000.0,
        rope_scaling={"rope_type": "default"},
        eos_token_id=fast.eos_token_id,
        pad_token_id=fast.eos_token_id,
        bos_token_id=None,
    )
    cfg = MllamaConfig(
        vision_config=vision, text_config=text, image_token_index=IMG,
    )
    model = MllamaForConditionalGeneration(cfg).eval()
    # nonzero gates: freshly-initialized tanh gates are 0, which would
    # silence the cross layers entirely and hide mask bugs
    with torch.no_grad():
        for li in (1, 3):
            layer = model.model.language_model.layers[li]
            layer.cross_attn_attn_gate.fill_(0.7)
            layer.cross_attn_mlp_gate.fill_(-0.4)
        model.model.vision_model.gated_positional_embedding.gate.fill_(0.3)
        (
            model.model.vision_model
            .pre_tile_positional_embedding.gate.fill_(0.5)
        )
        (
            model.model.vision_model
            .post_tile_positional_embedding.gate.fill_(-0.6)
        )
    model.save_pretrained(d, safe_serialization=True)
    import json as _json

    with open(f"{d}/preprocessor_config.json", "w") as f:
        _json.dump(
            {
                "image_processor_type": "MllamaImageProcessor",
                "size": {"height": 28, "width": 28},
                "max_image_tiles": 4,
                "image_mean": [0.5, 0.4, 0.6],
                "image_std": [0.25, 0.3, 0.2],
            },
            f,
        )
    return model, str(d)


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(23)


def _hf_proc(path):
    from transformers import MllamaImageProcessor as HFProc

    return HFProc(
        size={"height": 28, "width": 28},
        max_image_tiles=4,
        image_mean=[0.5, 0.4, 0.6],
        image_std=[0.25, 0.3, 0.2],
    )


def test_mllama_processor_matches_hf(tiny_mllama, rng):
    from PIL import Image

    from vllm_mlx_tpu.multimodal_processor import MllamaImageProcessor

    _, path = tiny_mllama
    ours_proc = MllamaImageProcessor.from_pretrained(path)
    hf = _hf_proc(path)
    for h, w in ((30, 61), (20, 20), (95, 33), (28, 57), (13, 100)):
        arr = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
        img = Image.fromarray(arr)
        ours = ours_proc.batch([img])
        theirs = hf(images=img, return_tensors="np")
        np.testing.assert_array_equal(
            ours["aspect_ratio_ids"], theirs["aspect_ratio_ids"][0]
        )
        np.testing.assert_array_equal(
            ours["aspect_ratio_mask"], theirs["aspect_ratio_mask"][0]
        )
        nt = int(ours["num_tiles"][0])
        assert nt == theirs["num_tiles"][0][0]
        np.testing.assert_allclose(
            ours["pixel_values"][0, :nt],
            np.asarray(theirs["pixel_values"])[0, 0, :nt],
            atol=1e-5,
        )


def test_mllama_vision_parity(tiny_mllama, rng):
    """Tiled tower features == HF MllamaVisionModel (multi-tile image
    with padding tiles exercising the aspect-ratio mask)."""
    from PIL import Image

    from vllm_mlx_tpu.models.mllama_mm import (
        MllamaMultimodalLM,
    )

    model, path = tiny_mllama
    vlm = MllamaMultimodalLM(path, dtype="float32").load()
    arr = rng.integers(0, 255, size=(30, 61, 3), dtype=np.uint8)
    proc = vlm_proc = None
    from vllm_mlx_tpu.multimodal_processor import MllamaImageProcessor

    vlm_proc = MllamaImageProcessor.from_pretrained(path)
    batch = vlm_proc.batch([Image.fromarray(arr)])
    assert int(batch["num_tiles"][0]) == 3  # 1x3 canvas + 1 pad tile
    from vllm_mlx_tpu.models.mllama_mm import vision_encode

    import jax.numpy as jnp

    ours = np.asarray(
        vision_encode(
            vlm.vision_params,
            vlm.vision_cfg,
            jnp.asarray(batch["pixel_values"]),
            jnp.asarray(batch["aspect_ratio_ids"], jnp.int32),
            jnp.asarray(batch["aspect_ratio_mask"], jnp.int32),
        )
    )
    with torch.no_grad():
        theirs = model.model.vision_model(
            pixel_values=torch.tensor(batch["pixel_values"][None]),
            aspect_ratio_ids=torch.tensor(batch["aspect_ratio_ids"][None]),
            aspect_ratio_mask=torch.tensor(
                batch["aspect_ratio_mask"][None]
            ),
        ).last_hidden_state.numpy()[0]
    assert ours.shape == theirs.shape  # [1 img, 4 tiles, 17, 96] -> sans B
    np.testing.assert_allclose(ours, theirs, atol=2e-4)


def _prepare_hf_inputs(model, path, fast_tok, prompt_ids, images, rng):
    """Run the real HF processor pipeline for cross mask + pixels."""
    from transformers import MllamaProcessor

    hfp = MllamaProcessor(
        image_processor=_hf_proc(path),
        tokenizer=fast_tok,
    )
    text = fast_tok.decode(prompt_ids)
    return hfp


def test_mllama_dense_parity_multiimage(tiny_mllama, rng):
    """Dense forward with TWO images (one with padding tiles), text
    before the first image (full-row fixup rows), between, and after ==
    HF forward logits."""
    from transformers.models.mllama.processing_mllama import (
        convert_sparse_cross_attention_mask_to_dense,
        get_cross_attention_token_mask,
    )

    from vllm_mlx_tpu.models import decoder
    from vllm_mlx_tpu.models.mllama_mm import (
        MllamaMultimodalLM,
        build_cross_meta,
        build_dense_cross_ctx,
        cross_attention_token_spans,
    )
    from vllm_mlx_tpu.multimodal_processor import MllamaImageProcessor
    from PIL import Image

    import jax.numpy as jnp

    model, path = tiny_mllama
    vlm = MllamaMultimodalLM(path, dtype="float32").load()
    proc = MllamaImageProcessor.from_pretrained(path)
    imgs = [
        Image.fromarray(
            rng.integers(0, 255, size=(30, 61, 3), dtype=np.uint8)
        ),
        Image.fromarray(
            rng.integers(0, 255, size=(20, 20, 3), dtype=np.uint8)
        ),
    ]
    batch = proc.batch(imgs)
    # prompt: text BEFORE the first image, between, after
    ids = [5, 6, 7, IMG, 8, 9, IMG, 10, 11, 12]
    spans = cross_attention_token_spans(ids, IMG, 2)
    tpt = vlm.tokens_per_tile
    cap = 2 * 4 * tpt
    tok_lo, tok_hi, width = build_cross_meta(
        spans, list(batch["num_tiles"]), 4, tpt, cap
    )
    cs = vlm.encode_images(
        batch["pixel_values"],
        batch["aspect_ratio_ids"],
        batch["aspect_ratio_mask"],
    )
    ctx = build_dense_cross_ctx(
        vlm.lm_params, vlm.text_cfg, cs, tok_lo, tok_hi, width, len(ids)
    )
    ours = np.asarray(
        decoder.dense_forward(
            vlm.lm_params,
            vlm.text_cfg,
            jnp.asarray(ids, jnp.int32),
            cross_ctx=ctx,
        )
    )
    # HF: dense cross mask from the real processor helpers
    sparse = get_cross_attention_token_mask(ids, IMG)
    dense = convert_sparse_cross_attention_mask_to_dense(
        [sparse],
        num_tiles=[[int(n) for n in batch["num_tiles"]]],
        max_num_tiles=4,
        length=len(ids),
    )
    with torch.no_grad():
        theirs = model(
            input_ids=torch.tensor([ids]),
            attention_mask=torch.ones((1, len(ids)), dtype=torch.long),
            pixel_values=torch.tensor(batch["pixel_values"][None]),
            aspect_ratio_ids=torch.tensor(batch["aspect_ratio_ids"][None]),
            aspect_ratio_mask=torch.tensor(
                batch["aspect_ratio_mask"][None]
            ),
            cross_attention_mask=torch.tensor(dense),
        ).logits.numpy()[0]
    np.testing.assert_allclose(ours, theirs, atol=2e-3)


def test_mllama_span_semantics():
    """Span builder == HF get_cross_attention_token_mask, including the
    consecutive-group fixup and open trailing spans."""
    from transformers.models.mllama.processing_mllama import (
        get_cross_attention_token_mask,
    )

    from vllm_mlx_tpu.models.mllama_mm import (
        OPEN_END,
        cross_attention_token_spans,
    )

    cases = [
        [1, 2, IMG, 3, 4],
        [IMG, 1, 2],
        [IMG, IMG, 1, 2, IMG, 3],
        [1, IMG, 2, IMG, IMG, 3],
        [1, 2, 3],
    ]
    for ids in cases:
        ours = cross_attention_token_spans(ids, IMG, ids.count(IMG))
        theirs = get_cross_attention_token_mask(ids, IMG)
        assert len(ours) == len(theirs)
        for (a, b), (ta, tb) in zip(ours, theirs):
            assert a == ta
            if tb == -1 or tb >= len(ids):
                assert b == int(OPEN_END)
            else:
                assert b == tb


def test_mllama_engine_matches_hf(tiny_mllama, rng):
    """Served greedy (image mid-prompt) == HF generate."""
    from PIL import Image

    from vllm_mlx_tpu.config import CacheConfig, SchedulerConfig
    from vllm_mlx_tpu.engine.batched import BatchedEngine
    from vllm_mlx_tpu.multimodal_processor import (
        MllamaImageProcessor,
        extract_media_from_messages,
    )
    from vlm_test_utils import assert_tied_greedy

    model, path = tiny_mllama
    arr = rng.integers(0, 255, size=(30, 61, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    uri = "data:image/png;base64," + base64.b64encode(buf.getvalue()).decode()
    messages = [
        {
            "role": "user",
            "content": [
                {"type": "text", "text": "describe "},
                {"type": "image_url", "image_url": {"url": uri}},
                {"type": "text", "text": " please"},
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
            assert engine.vlm_kind == "mllama"
            out = await engine.chat(messages, max_tokens=8, temperature=0.0)
            text_out = await engine.chat(
                [{"role": "user", "content": "describe please"}],
                max_tokens=8,
                temperature=0.0,
            )
            cleaned, _ = extract_media_from_messages(messages)
            prompt = engine.apply_chat_template(cleaned)
            ids = engine._tokenizer.encode(prompt)
            proc = MllamaImageProcessor.from_pretrained(path)
            batch = proc.batch([Image.fromarray(arr)])
            from transformers.models.mllama.processing_mllama import (
                convert_sparse_cross_attention_mask_to_dense,
                get_cross_attention_token_mask,
            )

            def hf_inputs(seq):
                sparse = get_cross_attention_token_mask(seq, IMG)
                dense = convert_sparse_cross_attention_mask_to_dense(
                    [sparse],
                    num_tiles=[[int(batch["num_tiles"][0])]],
                    max_num_tiles=4,
                    length=len(seq),
                )
                return dict(
                    input_ids=torch.tensor([seq]),
                    attention_mask=torch.ones(
                        (1, len(seq)), dtype=torch.long
                    ),
                    pixel_values=torch.tensor(batch["pixel_values"][None]),
                    aspect_ratio_ids=torch.tensor(
                        batch["aspect_ratio_ids"][None]
                    ),
                    aspect_ratio_mask=torch.tensor(
                        batch["aspect_ratio_mask"][None]
                    ),
                    cross_attention_mask=torch.tensor(dense),
                )

            with torch.no_grad():
                hf = model.generate(
                    **hf_inputs(ids), do_sample=False, max_new_tokens=8
                )
            theirs = hf[0].numpy().tolist()[len(ids):]

            def hf_logits_at(gen_prefix):
                seq = ids + gen_prefix
                with torch.no_grad():
                    return model(**hf_inputs(seq)).logits[0, -1]

            assert_tied_greedy(
                out.token_ids, theirs, hf_logits_at, exclude_ids={IMG}
            )

            # text-only request on the same engine == HF text-only
            # generate (cross layers skipped via width-0 slots)
            tids = engine._tokenizer.encode(
                engine.apply_chat_template(
                    [{"role": "user", "content": "describe please"}]
                )
            )
            with torch.no_grad():
                hf_t = model.generate(
                    input_ids=torch.tensor([tids]),
                    attention_mask=torch.ones(
                        (1, len(tids)), dtype=torch.long
                    ),
                    do_sample=False,
                    max_new_tokens=8,
                )
            theirs_t = hf_t[0].numpy().tolist()[len(tids):]

            def hf_logits_at_t(gen_prefix):
                seq = tids + gen_prefix
                with torch.no_grad():
                    return model(
                        input_ids=torch.tensor([seq]),
                        attention_mask=torch.ones(
                            (1, len(seq)), dtype=torch.long
                        ),
                    ).logits[0, -1]

            assert_tied_greedy(
                text_out.token_ids, theirs_t, hf_logits_at_t,
                exclude_ids={IMG},
            )
        finally:
            await engine.stop()

    asyncio.run(go())

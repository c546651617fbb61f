# SPDX-License-Identifier: Apache-2.0
"""Gemma 3 VLM parity + engine integration.

Pins the SigLIP tower + avg-pool projector against HF
``Gemma3ForConditionalGeneration.get_image_features`` and the full
multimodal greedy generation — including the BIDIRECTIONAL image-span
attention (HF token_type_ids or-mask) — against a manual HF forward
loop. Then the same prompt through the serving engine (bidir spans via
ops/ragged_bidir_kernel.py's XLA reference on CPU), including chunked
prefill where the span-snapping logic engages.
"""

import asyncio
import base64
import io

import numpy as np
import pytest

torch = pytest.importorskip("torch")

BOI, SOFT, EOI = 288, 290, 289


@pytest.fixture(scope="module")
def tiny_gemma3(tmp_path_factory):
    from tokenizers import (
        Tokenizer, decoders, models, pre_tokenizers, trainers,
    )
    from transformers import (
        Gemma3Config,
        Gemma3ForConditionalGeneration,
        Gemma3TextConfig,
        PreTrainedTokenizerFast,
        SiglipVisionConfig,
    )

    d = tmp_path_factory.mktemp("gemma3_mm")
    tok = Tokenizer(models.BPE(unk_token=None))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=288,
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
    # ids land at 288/289/290 (vocab_size=288 before additions)
    fast.add_special_tokens(
        {
            "additional_special_tokens": [
                "<start_of_image>",
                "<end_of_image>",
                "<image_soft_token>",
            ]
        }
    )
    assert fast.convert_tokens_to_ids("<start_of_image>") == BOI
    assert fast.convert_tokens_to_ids("<image_soft_token>") == SOFT
    fast.chat_template = (
        "{% for message in messages %}<|{{ message.role }}|>"
        "{% if message.content is string %}{{ message.content }}"
        "{% else %}{% for part in message.content %}"
        "{% if part.type == 'image' %}<start_of_image>"
        "{% else %}{{ part.text }}"
        "{% endif %}{% endfor %}{% endif %}</s>{% endfor %}"
        "{% if add_generation_prompt %}<|assistant|>{% endif %}"
    )
    fast.save_pretrained(d)

    torch.manual_seed(0)
    vision = SiglipVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, image_size=56, patch_size=14,
        # 4x4 = 16 patches -> avg-pooled to 2x2 = 4 soft tokens
    )
    text = Gemma3TextConfig(
        vocab_size=320, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=512,
        sliding_window=16,  # tiny window: exercises window x bidir
        eos_token_id=fast.eos_token_id,
    )
    cfg = Gemma3Config(
        vision_config=vision, text_config=text,
        image_token_index=SOFT, boi_token_index=BOI, eoi_token_index=EOI,
        mm_tokens_per_image=4,
    )
    model = Gemma3ForConditionalGeneration(cfg).eval()
    model.save_pretrained(d, safe_serialization=True)
    return model, str(d)


@pytest.fixture(scope="module")
def pixels(rng):
    return rng.standard_normal((1, 3, 56, 56)).astype(np.float32) * 0.5


def _hf_greedy(model, ids, pixels, steps):
    """Manual HF greedy loop: full re-forward each step with prompt
    token_type_ids (generated tokens are type 0) — the ground truth for
    the bidirectional image-span mask."""
    seq = list(ids)
    out = []
    scores = []
    with torch.no_grad():
        for _ in range(steps):
            tt = [1 if t == SOFT else 0 for t in seq]
            logits = model(
                input_ids=torch.tensor([seq]),
                pixel_values=torch.tensor(pixels),
                token_type_ids=torch.tensor([tt]),
                attention_mask=torch.ones((1, len(seq)), dtype=torch.long),
            ).logits
            nxt = int(torch.argmax(logits[0, -1]))
            out.append(nxt)
            scores.append(logits[:, -1])
            seq.append(nxt)
    return out, scores


def test_gemma3_vision_feature_parity(tiny_gemma3, pixels):
    from vllm_mlx_tpu.models.gemma3_mm import Gemma3VLM

    model, path = tiny_gemma3
    vlm = Gemma3VLM(path, dtype="float32").load()
    ours = vlm.encode_images(pixels)  # [1, 4, H_lm]
    assert ours.shape == (1, 4, 48)
    with torch.no_grad():
        theirs = model.get_image_features(
            pixel_values=torch.tensor(pixels)
        ).numpy()
    np.testing.assert_allclose(ours, theirs, atol=3e-4)


def _engine_for(path, chunk_sizes=(64,), max_prefill=64):
    from vllm_mlx_tpu.config import CacheConfig, SchedulerConfig
    from vllm_mlx_tpu.engine.batched import BatchedEngine

    return BatchedEngine(
        path,
        cache_config=CacheConfig(
            block_size=8, num_blocks=64, kv_dtype="float32"
        ),
        scheduler_config=SchedulerConfig(
            max_num_seqs=2,
            max_prefill_tokens=max_prefill,
            prefill_chunk_sizes=list(chunk_sizes),
            max_model_len=256,
        ),
    )


def _image_uri(rng):
    from PIL import Image

    arr = rng.integers(0, 255, size=(56, 56, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return (
        "data:image/png;base64," + base64.b64encode(buf.getvalue()).decode(),
        arr,
    )


def test_gemma3_engine_matches_hf(tiny_gemma3, rng):
    """Served greedy output == HF with the token_type_ids bidirectional
    mask, through the real chat path (template + processor + engine)."""
    model, path = tiny_gemma3
    uri, arr = _image_uri(rng)
    messages = [
        {
            "role": "user",
            "content": [
                {"type": "text", "text": "what is this? "},
                {"type": "image_url", "image_url": {"url": uri}},
            ],
        }
    ]
    engine = _engine_for(path)

    async def go():
        await engine.start()
        try:
            assert engine.vlm_kind == "gemma3"
            out = await engine.chat(messages, max_tokens=6, temperature=0.0)
            # rebuild the same ids + pixels the engine used (the engine
            # extracts media parts into {"type": "image"} placeholders
            # before templating)
            from vllm_mlx_tpu.multimodal_processor import (
                extract_media_from_messages,
            )

            cleaned, _ = extract_media_from_messages(messages)
            prompt = engine.apply_chat_template(cleaned)
            ids, runs = engine.vlm.expand_image_tokens(
                engine._tokenizer, prompt
            )
            assert runs and runs[0][1] - runs[0][0] == 4
            from PIL import Image

            pix = engine.image_processor.batch([Image.fromarray(arr)])
            theirs, hf_scores = _hf_greedy(
                model, ids, pix.astype(np.float32), 6
            )
            import sys as _sys

            _sys.path.insert(0, "tests")
            from vlm_test_utils import assert_tied_greedy, hf_scores_fn

            assert_tied_greedy(
                out.token_ids, theirs, hf_scores_fn(hf_scores),
                exclude_ids={SOFT, BOI, EOI},
            )
        finally:
            await engine.stop()

    asyncio.run(go())


def test_gemma3_chunked_prefill_spans(tiny_gemma3, rng):
    """Tiny chunks force the scheduler to snap chunk boundaries around
    the image span; output must be identical to one-shot prefill."""
    model, path = tiny_gemma3
    uri, arr = _image_uri(rng)
    messages = [
        {
            "role": "user",
            "content": [
                {"type": "text", "text": "tell me about this image "},
                {"type": "image_url", "image_url": {"url": uri}},
                {"type": "text", "text": " thanks a lot friend"},
            ],
        }
    ]

    async def run_engine(chunks, max_prefill):
        engine = _engine_for(path, chunks, max_prefill)
        await engine.start()
        try:
            out = await engine.chat(messages, max_tokens=6, temperature=0.0)
            return out.token_ids
        finally:
            await engine.stop()

    async def go():
        # chunk budget of 6 tokens: several chunks, span must not split
        small = await run_engine((8, 64), 6)
        big = await run_engine((64,), 64)
        assert small == big

    asyncio.run(go())


def test_gemma3_tp2_token_identical(tiny_gemma3, rng):
    """TP x bidirectional spans: serving Gemma3 with --tp-size 2
    (heads + KV pool sharded over the CPU mesh, bidir attention under
    shard_map) produces the exact tp=1 token stream."""
    _, path = tiny_gemma3
    uri, arr = _image_uri(rng)
    messages = [
        {
            "role": "user",
            "content": [
                {"type": "text", "text": "what is this? "},
                {"type": "image_url", "image_url": {"url": uri}},
            ],
        }
    ]

    async def run_engine(**kw):
        from vllm_mlx_tpu.config import CacheConfig, SchedulerConfig
        from vllm_mlx_tpu.engine.batched import BatchedEngine

        engine = BatchedEngine(
            path,
            cache_config=CacheConfig(
                block_size=8, num_blocks=64, kv_dtype="float32"
            ),
            scheduler_config=SchedulerConfig(
                max_num_seqs=2, max_prefill_tokens=64,
                prefill_chunk_sizes=[64], max_model_len=256,
            ),
            **kw,
        )
        await engine.start()
        try:
            out = await engine.chat(messages, max_tokens=6, temperature=0.0)
            return out.token_ids
        finally:
            await engine.stop()

    async def go():
        ref = await run_engine()
        got = await run_engine(tp_size=2)
        assert got == ref

    asyncio.run(go())


def test_gemma3_two_images_one_chunk(tiny_gemma3, rng):
    """Two images in one prompt: one span per chunk is enforced, spans
    stay distinct (different images -> different KV), output matches HF."""
    model, path = tiny_gemma3
    uri1, arr1 = _image_uri(rng)
    uri2, arr2 = _image_uri(rng)
    messages = [
        {
            "role": "user",
            "content": [
                {"type": "text", "text": "compare "},
                {"type": "image_url", "image_url": {"url": uri1}},
                {"type": "text", "text": " with "},
                {"type": "image_url", "image_url": {"url": uri2}},
            ],
        }
    ]
    engine = _engine_for(path)

    async def go():
        await engine.start()
        try:
            out = await engine.chat(messages, max_tokens=5, temperature=0.0)
            from vllm_mlx_tpu.multimodal_processor import (
                extract_media_from_messages,
            )

            cleaned, _ = extract_media_from_messages(messages)
            prompt = engine.apply_chat_template(cleaned)
            ids, runs = engine.vlm.expand_image_tokens(
                engine._tokenizer, prompt
            )
            assert len(runs) == 2
            from PIL import Image

            pix = engine.image_processor.batch(
                [Image.fromarray(arr1), Image.fromarray(arr2)]
            )
            theirs, hf_scores = _hf_greedy(
                model, ids, pix.astype(np.float32), 5
            )
            import sys as _sys

            _sys.path.insert(0, "tests")
            from vlm_test_utils import assert_tied_greedy, hf_scores_fn

            assert_tied_greedy(
                out.token_ids, theirs, hf_scores_fn(hf_scores),
                exclude_ids={SOFT, BOI, EOI},
            )
        finally:
            await engine.stop()

    asyncio.run(go())

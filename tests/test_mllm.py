# SPDX-License-Identifier: Apache-2.0
"""Multimodal (LLaVA-style) parity + engine integration.

Pins the full VLM path against HF torch: ViT features, projector,
image-token expansion, and greedy generation — then the same multimodal
prompt served through the continuous-batching engine via the embedding-
override rows."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

IMG_TOKEN = 250


@pytest.fixture(scope="module")
def tiny_llava(tmp_path_factory):
    from transformers import (
        CLIPVisionConfig,
        LlamaConfig,
        LlavaConfig,
        LlavaForConditionalGeneration,
    )

    torch.manual_seed(0)
    vision = CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=4, image_size=28, patch_size=14,
        # 28/14 -> 2x2 = 4 patches per image
    )
    text = LlamaConfig(
        vocab_size=256, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512,
    )
    cfg = LlavaConfig(
        vision_config=vision,
        text_config=text,
        image_token_index=IMG_TOKEN,
        vision_feature_layer=-2,
        vision_feature_select_strategy="default",
        projector_hidden_act="gelu",
    )
    model = LlavaForConditionalGeneration(cfg).eval()
    d = tmp_path_factory.mktemp("llava")
    model.save_pretrained(d, safe_serialization=True)
    return model, str(d)


@pytest.fixture(scope="module")
def pixels(rng):
    return rng.standard_normal((1, 3, 28, 28)).astype(np.float32) * 0.5


def test_vision_feature_parity(tiny_llava, pixels):
    from vllm_mlx_tpu.models.mllm import MultimodalLM

    model, path = tiny_llava
    vlm = MultimodalLM(path, dtype="float32").load()
    ours = vlm.encode_images(pixels)  # [1, 4, H_lm]
    assert ours.shape[1] == vlm.cfg.tokens_per_image == 4
    with torch.no_grad():
        theirs = model.get_image_features(
            pixel_values=torch.tensor(pixels),
            vision_feature_layer=-2,
            vision_feature_select_strategy="default",
        )
    theirs = (
        theirs[0] if isinstance(theirs, (list, tuple)) else theirs
    ).numpy()
    theirs = theirs.reshape(ours.shape)
    np.testing.assert_allclose(ours, theirs, atol=3e-4)


def test_multimodal_generate_matches_hf(tiny_llava, pixels, rng):
    from vllm_mlx_tpu.models import decoder
    from vllm_mlx_tpu.models.mllm import MultimodalLM

    model, path = tiny_llava
    vlm = MultimodalLM(path, dtype="float32").load()
    prompt = [5, 6, IMG_TOKEN, 7, 8, 9]
    feats = vlm.encode_images(pixels)
    ids, embeds, mask = vlm.build_multimodal_prompt(prompt, [feats[0]])
    assert len(ids) == len(prompt) - 1 + 4

    # our greedy loop on dense_forward with embed overrides
    seq = list(ids)
    emb = embeds.copy()
    msk = mask.copy()
    ours = []
    for _ in range(6):
        logits = decoder.dense_forward(
            vlm.lm_params, vlm.text_config, jnp.asarray(seq),
            token_embeds=jnp.asarray(emb), embeds_mask=jnp.asarray(msk),
        )
        nxt = int(jnp.argmax(logits[-1]))
        ours.append(nxt)
        seq.append(nxt)
        emb = np.concatenate([emb, np.zeros((1, emb.shape[1]), np.float32)])
        msk = np.concatenate([msk, [False]])

    with torch.no_grad():
        # HF expects the image token already expanded to tokens_per_image
        # entries (the processor normally does this)
        out = model.generate(
            input_ids=torch.tensor([ids]),
            attention_mask=torch.ones((1, len(ids)), dtype=torch.long),
            pixel_values=torch.tensor(pixels),
            do_sample=False,
            max_new_tokens=6,
            output_scores=True,
            return_dict_in_generate=True,
        )
    theirs = out.sequences[0].numpy().tolist()[len(ids):]
    import sys as _sys

    _sys.path.insert(0, "tests")
    from vlm_test_utils import assert_tied_greedy, hf_scores_fn

    assert_tied_greedy(
        ours, theirs, hf_scores_fn(out.scores), exclude_ids={IMG_TOKEN}
    )


@pytest.fixture(scope="module")
def llava_served_dir(tmp_path_factory):
    """Tiny LLaVA checkpoint + tokenizer with <image> token + VLM chat
    template — loadable by BatchedEngine's multimodal path."""
    from tokenizers import Tokenizer, models, pre_tokenizers, decoders, trainers
    from transformers import (
        CLIPVisionConfig,
        LlamaConfig,
        LlavaConfig,
        LlavaForConditionalGeneration,
        PreTrainedTokenizerFast,
    )

    d = tmp_path_factory.mktemp("llava_served")
    tok = Tokenizer(models.BPE(unk_token=None))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=320,
        special_tokens=["</s>", "<|user|>", "<|assistant|>", "<image>"],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
    )
    tok.train_from_iterator(
        ["what is in this picture", "describe the image please"] * 8, trainer
    )
    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok, eos_token="</s>", pad_token="</s>",
    )
    fast.chat_template = (
        "{% for message in messages %}<|{{ message.role }}|>"
        "{% if message.content is string %}{{ message.content }}"
        "{% else %}{% for part in message.content %}"
        "{% if part.type == 'image' %}<image>{% else %}{{ part.text }}"
        "{% endif %}{% endfor %}{% endif %}</s>{% endfor %}"
        "{% if add_generation_prompt %}<|assistant|>{% endif %}"
    )
    fast.save_pretrained(d)
    img_id = fast.convert_tokens_to_ids("<image>")

    torch.manual_seed(1)
    vision = CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, image_size=28, patch_size=14,
    )
    text = LlamaConfig(
        vocab_size=tok.get_vocab_size(), hidden_size=48,
        intermediate_size=96, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=512,
        eos_token_id=fast.eos_token_id,
    )
    cfg = LlavaConfig(
        vision_config=vision, text_config=text, image_token_index=img_id,
        vision_feature_layer=-2,
        vision_feature_select_strategy="default",
    )
    LlavaForConditionalGeneration(cfg).eval().save_pretrained(
        d, safe_serialization=True
    )
    return str(d)


def test_multimodal_engine_end_to_end(llava_served_dir, rng):
    """Full serving path: BatchedEngine auto-detects the VLM, extracts
    the image from chat messages, encodes through the vision cache, and
    generates deterministically."""
    import asyncio
    import base64
    import io

    from PIL import Image

    from vllm_mlx_tpu.config import CacheConfig, SchedulerConfig
    from vllm_mlx_tpu.engine.batched import BatchedEngine

    arr = rng.integers(0, 255, size=(40, 40, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    uri = "data:image/png;base64," + base64.b64encode(buf.getvalue()).decode()
    messages = [
        {
            "role": "user",
            "content": [
                {"type": "text", "text": "what is this? "},
                {"type": "image_url", "image_url": {"url": uri}},
            ],
        }
    ]

    engine = BatchedEngine(
        llava_served_dir,
        cache_config=CacheConfig(
            block_size=8, num_blocks=64, kv_dtype="float32"
        ),
        scheduler_config=SchedulerConfig(
            max_num_seqs=2, max_prefill_tokens=64,
            prefill_chunk_sizes=[32, 64], max_model_len=256,
        ),
    )

    async def go():
        await engine.start()
        try:
            assert engine.vlm is not None  # multimodal auto-detected
            # fp32 for CPU determinism
            out1 = await engine.chat(messages, max_tokens=6, temperature=0.0)
            out2 = await engine.chat(messages, max_tokens=6, temperature=0.0)
            assert out1.token_ids == out2.token_ids
            assert out1.completion_tokens > 0
            stats = engine.get_stats()
            assert stats["vision_cache"]["hits"] >= 1  # second call cached
            # text-only chat still works on the same engine
            out3 = await engine.chat(
                [{"role": "user", "content": "hello"}],
                max_tokens=4,
                temperature=0.0,
            )
            assert out3.completion_tokens > 0
        finally:
            await engine.stop()

    asyncio.run(go())


def test_multimodal_over_http(llava_served_dir, rng):
    """Image chat through the OpenAI endpoint (data-URI image_url)."""
    import asyncio
    import base64
    import io

    from aiohttp.test_utils import TestClient, TestServer
    from PIL import Image

    from vllm_mlx_tpu.api.server import build_app
    from vllm_mlx_tpu.config import CacheConfig, SchedulerConfig
    from vllm_mlx_tpu.engine.batched import BatchedEngine

    arr = rng.integers(0, 255, size=(32, 32, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    uri = "data:image/png;base64," + base64.b64encode(buf.getvalue()).decode()

    engine = BatchedEngine(
        llava_served_dir,
        cache_config=CacheConfig(
            block_size=8, num_blocks=64, kv_dtype="float32"
        ),
        scheduler_config=SchedulerConfig(
            max_num_seqs=2, max_prefill_tokens=64,
            prefill_chunk_sizes=[32, 64], max_model_len=256,
        ),
    )

    async def go():
        await engine.start()
        app = build_app(engine, served_models=["tiny-llava-vlm"])
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            resp = await client.post(
                "/v1/chat/completions",
                json={
                    "model": "tiny-llava-vlm",
                    "max_tokens": 5,
                    "temperature": 0,
                    "messages": [
                        {
                            "role": "user",
                            "content": [
                                {"type": "text", "text": "describe "},
                                {
                                    "type": "image_url",
                                    "image_url": {"url": uri},
                                },
                            ],
                        }
                    ],
                },
            )
            assert resp.status == 200
            data = await resp.json()
            assert data["usage"]["completion_tokens"] > 0
            # image tokens were expanded into the prompt
            assert data["usage"]["prompt_tokens"] > 4
        finally:
            await client.close()
            await engine.stop()

    asyncio.run(go())


def test_multimodal_through_engine(tiny_llava, pixels, rng):
    """The same multimodal prompt served by the continuous-batching
    scheduler (embedding-override rows in the unified step)."""
    from vllm_mlx_tpu.config import CacheConfig, SchedulerConfig
    from vllm_mlx_tpu.core.model_runner import ModelRunner
    from vllm_mlx_tpu.core.request import Request, SamplingParams
    from vllm_mlx_tpu.core.scheduler import Scheduler
    from vllm_mlx_tpu.models import decoder
    from vllm_mlx_tpu.models.mllm import MultimodalLM

    model, path = tiny_llava
    vlm = MultimodalLM(path, dtype="float32").load()
    cfg = vlm.text_config
    cfg.dtype = "float32"
    runner = ModelRunner(
        cfg,
        vlm.lm_params,
        CacheConfig(block_size=8, num_blocks=64, kv_dtype="float32"),
        SchedulerConfig(
            max_num_seqs=2, max_prefill_tokens=64,
            prefill_chunk_sizes=[16, 64], max_model_len=256,
        ),
    )
    sched = Scheduler(runner, tokenizer=None, stop_tokens=set())

    prompt = [5, 6, IMG_TOKEN, 7, 8, 9]
    feats = vlm.encode_images(pixels)
    ids, embeds, mask = vlm.build_multimodal_prompt(prompt, [feats[0]])
    req = Request(
        request_id="vlm",
        prompt=ids,
        sampling_params=SamplingParams(temperature=0.0, max_tokens=6),
        prompt_embeds=embeds,
        embeds_mask=mask,
        is_multimodal=True,
    )
    sched.add_request(req)
    outs = {}
    steps = 0
    while sched.has_unfinished():
        for out in sched.step():
            if out.finished:
                outs[out.request_id] = out
        steps += 1
        assert steps < 200

    # reference greedy via dense forward with overrides
    seq = list(ids)
    emb = embeds.copy()
    msk = mask.copy()
    expected = []
    for _ in range(6):
        logits = decoder.dense_forward(
            vlm.lm_params, cfg, jnp.asarray(seq),
            token_embeds=jnp.asarray(emb), embeds_mask=jnp.asarray(msk),
        )
        nxt = int(jnp.argmax(logits[-1]))
        expected.append(nxt)
        seq.append(nxt)
        emb = np.concatenate([emb, np.zeros((1, emb.shape[1]), np.float32)])
        msk = np.concatenate([msk, [False]])
    assert outs["vlm"].output_token_ids == expected

# SPDX-License-Identifier: Apache-2.0
"""Idefics2 parity + engine integration.

Pins the aspect-preserving SigLIP tower (bucketized patch positions)
+ perceiver resampler against HF ``Idefics2Model.get_image_features``,
the preprocessor against HF ``Idefics2ImageProcessor``, and served
greedy generation against HF ``generate`` (processing_idefics2 prompt
expansion with collapsed fake tokens)."""

import asyncio
import base64
import io

import numpy as np
import pytest

torch = pytest.importorskip("torch")

IMG = 294  # <image> id in the tiny tokenizer


@pytest.fixture(scope="module")
def tiny_idefics2(tmp_path_factory):
    from tokenizers import (
        Tokenizer, decoders, models, pre_tokenizers, trainers,
    )
    from transformers import (
        Idefics2Config,
        Idefics2ForConditionalGeneration,
        MistralConfig,
        PreTrainedTokenizerFast,
    )
    from transformers.models.idefics2.configuration_idefics2 import (
        Idefics2PerceiverConfig,
        Idefics2VisionConfig,
    )

    d = tmp_path_factory.mktemp("idefics2")
    tok = Tokenizer(models.BPE(unk_token=None))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=293,
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
                "<fake_token_around_image>", "<image>",
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
    vision = Idefics2VisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, image_size=28, patch_size=7,
    )
    text = MistralConfig(
        vocab_size=320, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, eos_token_id=fast.eos_token_id,
        sliding_window=None,
    )
    perceiver = Idefics2PerceiverConfig(
        resampler_n_latents=4, resampler_depth=2, resampler_n_heads=2,
        resampler_head_dim=16, num_key_value_heads=1, hidden_size=48,
    )
    cfg = Idefics2Config(
        vision_config=vision, text_config=text,
        perceiver_config=perceiver, image_token_id=IMG,
    )
    model = Idefics2ForConditionalGeneration(cfg).eval()
    model.save_pretrained(d, safe_serialization=True)
    import json as _json

    with open(f"{d}/preprocessor_config.json", "w") as f:
        _json.dump(
            {
                "image_processor_type": "Idefics2ImageProcessor",
                "size": {"shortest_edge": 14, "longest_edge": 28},
                "image_mean": [0.5, 0.5, 0.5],
                "image_std": [0.5, 0.5, 0.5],
                "do_image_splitting": False,
            },
            f,
        )
    return model, str(d)


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(17)


def test_idefics2_processor_matches_hf(tiny_idefics2, rng):
    from PIL import Image

    from transformers import Idefics2ImageProcessor as HFProc

    from vllm_mlx_tpu.multimodal_processor import Idefics2ImageProcessor

    _, path = tiny_idefics2
    arr = rng.integers(0, 255, size=(21, 42, 3), dtype=np.uint8)
    for split in (False, True):
        ours_proc = Idefics2ImageProcessor.from_pretrained(path)
        ours_proc.do_image_splitting = split
        hf = HFProc(
            size={"shortest_edge": 14, "longest_edge": 28},
            image_mean=[0.5, 0.5, 0.5], image_std=[0.5, 0.5, 0.5],
            do_image_splitting=split, do_pad=False,
        )
        ours = ours_proc(Image.fromarray(arr))
        theirs = hf(images=Image.fromarray(arr), return_tensors=None)[
            "pixel_values"
        ][0]
        assert len(ours) == len(theirs) == (5 if split else 1)
        for o, t in zip(ours, theirs):
            np.testing.assert_allclose(o, np.asarray(t), atol=1e-5)


def test_idefics2_feature_parity(tiny_idefics2, rng):
    """Per-sub-image resampled features == HF get_image_features,
    including a non-square grid (bucketized positions)."""
    from vllm_mlx_tpu.models.idefics2 import Idefics2VLM

    model, path = tiny_idefics2
    vlm = Idefics2VLM(path, dtype="float32").load()
    assert vlm.cfg.perceiver.n_latents == 4
    # 28x21 -> grid 3x4 (non-square, smaller than the 4x4 table)
    img = rng.standard_normal((3, 21, 28)).astype(np.float32) * 0.5
    ours = vlm.encode_image(img)
    assert ours.shape == (4, 48)
    with torch.no_grad():
        theirs = model.model.get_image_features(
            pixel_values=torch.tensor(img[None, None])
        ).numpy()
    np.testing.assert_allclose(ours, theirs.reshape(4, 48), atol=3e-4)
    # square full-table grid too
    img2 = rng.standard_normal((3, 28, 28)).astype(np.float32) * 0.5
    ours2 = vlm.encode_image(img2)
    with torch.no_grad():
        theirs2 = model.model.get_image_features(
            pixel_values=torch.tensor(img2[None, None])
        ).numpy()
    np.testing.assert_allclose(ours2, theirs2.reshape(4, 48), atol=3e-4)


def test_idefics2_prompt_expansion(tiny_idefics2):
    from vllm_mlx_tpu.models.idefics2 import Idefics2VLM

    _, path = tiny_idefics2
    vlm = Idefics2VLM(path, dtype="float32").load()
    fake = "<fake_token_around_image>"
    one = vlm.expand_image_tokens("a<image>b", [1])
    assert one == f"a{fake}{'<image>' * 4}{fake}b"
    # adjacent images collapse the doubled fake token (HF
    # processing_idefics2.__call__)
    two = vlm.expand_image_tokens("<image><image>x", [1, 1])
    assert two.count(fake * 2) == 0
    assert two.count("<image>") == 8
    five = vlm.expand_image_tokens("<image>", [5])
    assert five.count("<image>") == 20
    assert five.count(fake) == 6  # collapsed between sub-images


def test_idefics2_engine_matches_hf(tiny_idefics2, rng):
    """Served greedy == HF generate (single image, no splitting)."""
    from PIL import Image

    from vllm_mlx_tpu.config import CacheConfig, SchedulerConfig
    from vllm_mlx_tpu.engine.batched import BatchedEngine
    from vllm_mlx_tpu.multimodal_processor import (
        Idefics2ImageProcessor,
        extract_media_from_messages,
    )

    model, path = tiny_idefics2
    arr = rng.integers(0, 255, size=(21, 42, 3), dtype=np.uint8)
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
            assert engine.vlm_kind == "idefics2"
            out = await engine.chat(messages, max_tokens=6, temperature=0.0)
            cleaned, _ = extract_media_from_messages(messages)
            prompt = engine.apply_chat_template(cleaned)
            proc = Idefics2ImageProcessor.from_pretrained(path)
            subs = proc(Image.fromarray(arr))
            assert len(subs) == 1
            expanded = engine.vlm.expand_image_tokens(prompt, [1])
            ids = engine._tokenizer.encode(expanded)
            with torch.no_grad():
                hf = model.generate(
                    input_ids=torch.tensor([ids]),
                    attention_mask=torch.ones(
                        (1, len(ids)), dtype=torch.long
                    ),
                    pixel_values=torch.tensor(
                        np.stack(subs)[None].astype(np.float32)
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
                    pixel_values=torch.tensor(
                        np.stack(subs)[None].astype(np.float32)
                    ),
                ).logits[0, -1]

            assert_tied_greedy(
                out.token_ids, theirs, hf_logits_at, exclude_ids={IMG}
            )
        finally:
            await engine.stop()

    asyncio.run(go())


def test_idefics2_engine_split_matches_hf(tiny_idefics2, rng):
    """Served greedy == HF generate with do_image_splitting (5
    variable-size sub-images; HF gets them padded + masked)."""
    import json as _json

    import shutil

    from PIL import Image

    from vllm_mlx_tpu.config import CacheConfig, SchedulerConfig
    from vllm_mlx_tpu.engine.batched import BatchedEngine
    from vllm_mlx_tpu.multimodal_processor import (
        Idefics2ImageProcessor,
        extract_media_from_messages,
    )

    model, path = tiny_idefics2
    import tempfile

    d2 = tempfile.mkdtemp(prefix="idefics2_split")
    shutil.copytree(path, d2, dirs_exist_ok=True)
    with open(f"{d2}/preprocessor_config.json", "w") as f:
        _json.dump(
            {
                "image_processor_type": "Idefics2ImageProcessor",
                "size": {"shortest_edge": 14, "longest_edge": 28},
                "image_mean": [0.5, 0.5, 0.5],
                "image_std": [0.5, 0.5, 0.5],
                "do_image_splitting": True,
            },
            f,
        )
    arr = rng.integers(0, 255, size=(28, 42, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    uri = "data:image/png;base64," + base64.b64encode(buf.getvalue()).decode()
    messages = [
        {
            "role": "user",
            "content": [
                {"type": "image_url", "image_url": {"url": uri}},
                {"type": "text", "text": " what"},
            ],
        }
    ]
    engine = BatchedEngine(
        d2,
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
            out = await engine.chat(messages, max_tokens=5, temperature=0.0)
            cleaned, _ = extract_media_from_messages(messages)
            prompt = engine.apply_chat_template(cleaned)
            proc = Idefics2ImageProcessor.from_pretrained(d2)
            subs = proc(Image.fromarray(arr))
            assert len(subs) == 5
            expanded = engine.vlm.expand_image_tokens(prompt, [5])
            ids = engine._tokenizer.encode(expanded)
            # pad sub-images to the max size + pixel attention mask
            mh = max(s.shape[1] for s in subs)
            mw = max(s.shape[2] for s in subs)
            pv = np.zeros((1, 5, 3, mh, mw), np.float32)
            pm = np.zeros((1, 5, mh, mw), np.int64)
            for i, s in enumerate(subs):
                pv[0, i, :, : s.shape[1], : s.shape[2]] = s
                pm[0, i, : s.shape[1], : s.shape[2]] = 1
            with torch.no_grad():
                hf = model.generate(
                    input_ids=torch.tensor([ids]),
                    attention_mask=torch.ones(
                        (1, len(ids)), dtype=torch.long
                    ),
                    pixel_values=torch.tensor(pv),
                    pixel_attention_mask=torch.tensor(pm),
                    do_sample=False,
                    max_new_tokens=5,
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
                    pixel_values=torch.tensor(pv),
                    pixel_attention_mask=torch.tensor(pm),
                ).logits[0, -1]

            assert_tied_greedy(
                out.token_ids, theirs, hf_logits_at, exclude_ids={IMG}
            )
        finally:
            await engine.stop()

    asyncio.run(go())

# SPDX-License-Identifier: Apache-2.0
"""GLM-4V parity vs HuggingFace: learned-position interpolation, vision
tower, M-RoPE positions, and served multimodal greedy generation
(reference serves GLM-4V via mlx-vlm, models/mllm.py:1207)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

VOCAB = 512
IMG_TOK = 500
VID_TOK = 501
VID_START = 502
VID_END = 503


@pytest.fixture(scope="module")
def tiny_glm4v(tmp_path_factory):
    from transformers import Glm4vForConditionalGeneration
    from transformers.models.glm4v.configuration_glm4v import Glm4vConfig

    torch.manual_seed(0)
    cfg = Glm4vConfig(
        text_config=dict(
            vocab_size=VOCAB,
            hidden_size=32,
            intermediate_size=64,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=2,
            rope_theta=10000.0,
            rope_scaling={"rope_type": "default", "mrope_section": [1, 1, 2]},
            max_position_embeddings=512,
            tie_word_embeddings=False,
        ),
        vision_config=dict(
            depth=2,
            hidden_size=32,
            intermediate_size=64,
            out_hidden_size=32,
            num_heads=2,
            patch_size=4,
            temporal_patch_size=2,
            spatial_merge_size=2,
            image_size=16,  # native pos grid 4x4 -> interpolation real
            in_channels=3,
        ),
        image_token_id=IMG_TOK,
        video_token_id=VID_TOK,
        image_start_token_id=498,
        image_end_token_id=499,
        video_start_token_id=VID_START,
        video_end_token_id=VID_END,
    )
    model = Glm4vForConditionalGeneration(cfg).eval()
    d = tmp_path_factory.mktemp("glm4v")
    model.save_pretrained(d, safe_serialization=True)
    return model, str(d)


@pytest.fixture(scope="module")
def pixels(tmp_path_factory):
    """A 24x16 RGB image -> 6x4 patch grid at patch=4 (6 merged rows)."""
    from PIL import Image

    rng = np.random.default_rng(7)
    arr = rng.integers(0, 255, size=(24, 16, 3), dtype=np.uint8)
    return Image.fromarray(arr)


def _hf_patches(model_dir, image):
    from transformers.models.glm4v.image_processing_glm4v import (
        Glm4vImageProcessor,
    )

    proc = Glm4vImageProcessor(
        patch_size=4, temporal_patch_size=2, merge_size=2,
        size={"shortest_edge": 112 * 112, "longest_edge": 28 * 28 * 128},
    )
    out = proc(images=[image], return_tensors="np")
    return out["pixel_values"], out["image_grid_thw"]


def test_bicubic_interpolation_matches_torch():
    """Our host bicubic == torch F.interpolate(mode='bicubic',
    align_corners=False) — the HF position-embedding resample."""
    from vllm_mlx_tpu.models.glm4v import interpolate_pos_embed

    rng = np.random.default_rng(3)
    table = rng.standard_normal((16, 8)).astype(np.float32)  # 4x4 grid
    mine = interpolate_pos_embed(table, 4, 6, 4)
    ref = (
        torch.nn.functional.interpolate(
            torch.tensor(table).view(4, 4, 8).permute(2, 0, 1)[None],
            size=(6, 4),
            mode="bicubic",
            align_corners=False,
        )[0]
        .permute(1, 2, 0)
        .reshape(24, 8)
        .numpy()
    )
    np.testing.assert_allclose(mine, ref, rtol=1e-5, atol=1e-5)


def test_vision_features_match_hf(tiny_glm4v, pixels):
    from vllm_mlx_tpu.models.glm4v import Glm4vModel

    hf_model, model_dir = tiny_glm4v
    flat, grid = _hf_patches(model_dir, pixels)
    with torch.no_grad():
        ref = hf_model.model.visual(
            torch.from_numpy(flat).float(),
            grid_thw=torch.tensor(grid),
        ).numpy()
    vlm = Glm4vModel(model_dir, dtype="float32").load()
    mine = vlm.encode_media(flat, tuple(int(x) for x in grid[0]))
    assert mine.shape == ref.shape
    np.testing.assert_allclose(mine, ref, rtol=2e-4, atol=2e-4)


def test_positions_match_hf_get_rope_index(tiny_glm4v, pixels):
    from vllm_mlx_tpu.models.qwen_vl import compute_mrope_positions

    hf_model, model_dir = tiny_glm4v
    _, grid = _hf_patches(model_dir, pixels)
    t, h, w = (int(x) for x in grid[0])
    n_img = t * (h // 2) * (w // 2)
    ids = [1, 2, 3] + [IMG_TOK] * n_img + [7, 8, 9, 10]
    ref_pos, ref_delta = hf_model.model.get_rope_index(
        torch.tensor([ids]), image_grid_thw=torch.tensor(grid)
    )
    mine, delta = compute_mrope_positions(
        ids, [{"grid": (t, h, w)}], IMG_TOK, VID_TOK, merge=2,
        tokens_per_second=0.0,  # GLM images: raw-t rule
    )
    np.testing.assert_array_equal(mine, ref_pos[:, 0].numpy())
    assert delta == int(ref_delta[0, 0])


def test_glm4v_served_matches_hf(tiny_glm4v, pixels):
    """Image chat through the scheduler (M-RoPE rows + per-slot delta),
    token-identical to HF generate; a text request batches along."""
    from vllm_mlx_tpu.config import CacheConfig, SchedulerConfig
    from vllm_mlx_tpu.core.model_runner import ModelRunner
    from vllm_mlx_tpu.core.request import Request, SamplingParams
    from vllm_mlx_tpu.core.scheduler import Scheduler
    from vllm_mlx_tpu.models.glm4v import Glm4vModel

    hf_model, model_dir = tiny_glm4v
    flat, grid = _hf_patches(model_dir, pixels)
    t, h, w = (int(x) for x in grid[0])
    n_img = t * (h // 2) * (w // 2)
    prompt = [1, 2] + [IMG_TOK] * n_img + [9, 11]
    text_prompt = [3, 4, 5, 6, 7]

    with torch.no_grad():
        hf_out = hf_model.generate(
            input_ids=torch.tensor([prompt]),
            pixel_values=torch.from_numpy(flat).float(),
            image_grid_thw=torch.tensor(grid),
            max_new_tokens=12,
            do_sample=False,
            output_scores=True,
            return_dict_in_generate=True,
        )
        ref_mm = hf_out.sequences[0][len(prompt):].tolist()
        ref_txt = hf_model.generate(
            input_ids=torch.tensor([text_prompt]),
            max_new_tokens=12,
            do_sample=False,
        )[0, len(text_prompt):].tolist()

    vlm = Glm4vModel(model_dir, dtype="float32").load()
    cfg = vlm.text_config
    cfg.dtype = "float32"
    assert cfg.mrope_section == [1, 1, 2]
    assert cfg.rope_glm and cfg.partial_rotary_factor == 1.0
    runner = ModelRunner(
        cfg, vlm.lm_params,
        CacheConfig(block_size=8, num_blocks=64, kv_dtype="float32"),
        SchedulerConfig(
            max_num_seqs=2, max_prefill_tokens=64,
            prefill_chunk_sizes=[16, 64], max_model_len=256,
        ),
    )
    sched = Scheduler(runner, tokenizer=None, stop_tokens=set())
    feats = vlm.encode_media(flat, (t, h, w))
    ids, embeds, mask, positions, delta = vlm.build_multimodal_prompt(
        [1, 2, IMG_TOK, 9, 11], [feats], [(t, h, w)]
    )
    assert ids == prompt
    sched.add_request(Request(
        request_id="mm", prompt=ids,
        sampling_params=SamplingParams(temperature=0.0, max_tokens=12),
        prompt_embeds=embeds, embeds_mask=mask, is_multimodal=True,
        mrope_positions=positions, mrope_delta=delta,
    ))
    sched.add_request(Request(
        request_id="txt", prompt=list(text_prompt),
        sampling_params=SamplingParams(temperature=0.0, max_tokens=12),
    ))
    outs = {}
    steps = 0
    while sched.has_unfinished():
        for out in sched.step():
            if out.finished:
                outs[out.request_id] = out
        steps += 1
        assert steps < 300
    import sys as _sys

    _sys.path.insert(0, "tests")
    from vlm_test_utils import (
        assert_tied_greedy,
        assert_tied_greedy_text,
        hf_scores_fn,
    )

    assert_tied_greedy(
        outs["mm"].output_token_ids, ref_mm, hf_scores_fn(hf_out.scores),
        exclude_ids={IMG_TOK},
    )
    assert_tied_greedy_text(
        outs["txt"].output_token_ids, ref_txt, hf_model, text_prompt
    )

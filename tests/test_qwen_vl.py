# SPDX-License-Identifier: Apache-2.0
"""Qwen2.5-VL parity vs HuggingFace: vision tower, preprocessing,
M-RoPE position computation, and full multimodal greedy generation
(reference serves Qwen-VL via mlx-vlm, models/mllm.py:1207)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

VOCAB = 512
IMG_TOK = 500
VID_TOK = 501
VSTART = 502


@pytest.fixture(scope="module")
def tiny_qwen25_vl(tmp_path_factory):
    from transformers import Qwen2_5_VLForConditionalGeneration
    from transformers.models.qwen2_5_vl.configuration_qwen2_5_vl import (
        Qwen2_5_VLConfig,
    )

    torch.manual_seed(0)
    cfg = Qwen2_5_VLConfig(
        text_config=dict(
            vocab_size=VOCAB,
            hidden_size=32,
            intermediate_size=64,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=2,
            rope_theta=10000.0,
            rope_scaling={"type": "mrope", "mrope_section": [1, 1, 2]},
            max_position_embeddings=512,
            tie_word_embeddings=False,
        ),
        vision_config=dict(
            depth=4,
            hidden_size=32,
            intermediate_size=64,
            num_heads=2,
            patch_size=4,
            temporal_patch_size=2,
            spatial_merge_size=2,
            window_size=16,
            fullatt_block_indexes=[2],
            out_hidden_size=32,
            in_channels=3,
            tokens_per_second=2,
        ),
        image_token_id=IMG_TOK,
        video_token_id=VID_TOK,
        vision_start_token_id=VSTART,
        vision_end_token_id=VSTART + 1,
    )
    model = Qwen2_5_VLForConditionalGeneration(cfg).eval()
    d = tmp_path_factory.mktemp("qwen25vl")
    model.save_pretrained(d, safe_serialization=True)
    return model, str(d)


@pytest.fixture(scope="module")
def pixels(tmp_path_factory):
    """A 24x16 RGB image -> 4x6 patch grid at patch=4 (6 merged rows)."""
    from PIL import Image

    rng = np.random.default_rng(7)
    arr = rng.integers(0, 255, size=(24, 16, 3), dtype=np.uint8)
    return Image.fromarray(arr)


def _hf_patches(model_dir, image):
    """Preprocess with the real HF Qwen2VL image processor."""
    from transformers.models.qwen2_vl.image_processing_qwen2_vl import (
        Qwen2VLImageProcessor,
    )

    proc = Qwen2VLImageProcessor(
        patch_size=4,
        merge_size=2,
        temporal_patch_size=2,
        min_pixels=4 * 4 * 4,
        max_pixels=4 * 4 * 4 * 1280,
    )
    out = proc(images=[image], return_tensors="np")
    return out["pixel_values"], out["image_grid_thw"]


class TestVisionTower:
    def test_processor_matches_hf(self, tiny_qwen25_vl, pixels):
        from vllm_mlx_tpu.multimodal_processor import QwenVLImageProcessor

        _, model_dir = tiny_qwen25_vl
        hf_flat, hf_grid = _hf_patches(model_dir, pixels)
        mine = QwenVLImageProcessor(
            patch_size=4,
            merge_size=2,
            temporal_patch_size=2,
            min_pixels=4 * 4 * 4,
            max_pixels=4 * 4 * 4 * 1280,
        )
        flat, grid = mine(pixels)
        assert tuple(grid) == tuple(hf_grid[0])
        np.testing.assert_allclose(flat, hf_flat, rtol=0, atol=2e-3)

    def test_vision_features_match_hf(self, tiny_qwen25_vl, pixels):
        from vllm_mlx_tpu.models.qwen_vl import QwenVLModel

        hf_model, model_dir = tiny_qwen25_vl
        flat, grid = _hf_patches(model_dir, pixels)
        with torch.no_grad():
            ref = hf_model.model.visual(
                torch.from_numpy(flat).float(),
                grid_thw=torch.tensor(grid),
            ).numpy()
        vlm = QwenVLModel(model_dir, dtype="float32").load()
        mine = vlm.encode_media(flat, tuple(int(x) for x in grid[0]))
        assert mine.shape == ref.shape
        np.testing.assert_allclose(mine, ref, rtol=1e-4, atol=1e-4)

    def test_window_attention_exercised(self, tiny_qwen25_vl, pixels):
        """The tiny config has 4 windows over a 4x6 grid — window layers
        must differ from full-attention layers."""
        from vllm_mlx_tpu.models.qwen_vl import (
            QwenVLModel,
            prepare_vision_inputs,
        )

        _, model_dir = tiny_qwen25_vl
        flat, grid = _hf_patches(model_dir, pixels)
        vlm = QwenVLModel(model_dir, dtype="float32").load()
        prep = prepare_vision_inputs(
            vlm.vision_cfg, flat, [tuple(int(x) for x in grid[0])]
        )
        assert len(np.unique(prep["win_seg"])) > len(
            np.unique(prep["full_seg"])
        )


class TestMRoPE:
    def test_positions_match_hf_get_rope_index(self, tiny_qwen25_vl, pixels):
        from vllm_mlx_tpu.models.qwen_vl import compute_mrope_positions

        hf_model, model_dir = tiny_qwen25_vl
        _, grid = _hf_patches(model_dir, pixels)
        t, h, w = (int(x) for x in grid[0])
        n_img = t * (h // 2) * (w // 2)
        ids = (
            [1, 2, 3, VSTART]
            + [IMG_TOK] * n_img
            + [VSTART + 1, 7, 8, 9, 10]
        )
        input_ids = torch.tensor([ids])
        ref_pos, ref_delta = hf_model.model.get_rope_index(
            input_ids, image_grid_thw=torch.tensor(grid)
        )
        mine, delta = compute_mrope_positions(
            ids,
            [{"grid": (t, h, w)}],
            IMG_TOK,
            VID_TOK,
            merge=2,
            tokens_per_second=2,
        )
        np.testing.assert_array_equal(mine, ref_pos[:, 0].numpy())
        assert delta == int(ref_delta[0, 0])

    def test_video_positions_match_hf(self, tiny_qwen25_vl):
        from vllm_mlx_tpu.models.qwen_vl import compute_mrope_positions

        hf_model, _ = tiny_qwen25_vl
        grid = [[2, 4, 4]]  # 2 temporal patches
        n_vid = 2 * 2 * 2
        ids = [1, VSTART] + [VID_TOK] * n_vid + [5, 6]
        ref_pos, ref_delta = hf_model.model.get_rope_index(
            torch.tensor([ids]),
            video_grid_thw=torch.tensor(grid),
            second_per_grid_ts=torch.tensor([1.5]),
        )
        mine, delta = compute_mrope_positions(
            ids,
            [{"grid": (2, 4, 4), "second_per_grid_t": 1.5}],
            IMG_TOK,
            VID_TOK,
            merge=2,
            tokens_per_second=2,
        )
        np.testing.assert_array_equal(mine, ref_pos[:, 0].numpy())
        assert delta == int(ref_delta[0, 0])


class TestGenerateParity:
    def test_multimodal_greedy_matches_hf(self, tiny_qwen25_vl, pixels):
        """Dense greedy decode with image embeds + M-RoPE positions is
        token-identical to HF generate."""
        import jax.numpy as jnp

        from vllm_mlx_tpu.models import decoder
        from vllm_mlx_tpu.models.qwen_vl import QwenVLModel

        hf_model, model_dir = tiny_qwen25_vl
        flat, grid = _hf_patches(model_dir, pixels)
        t, h, w = (int(x) for x in grid[0])
        n_img = t * (h // 2) * (w // 2)
        prompt = [1, 2, VSTART] + [IMG_TOK] * n_img + [VSTART + 1, 9, 11]

        with torch.no_grad():
            out = hf_model.generate(
                input_ids=torch.tensor([prompt]),
                pixel_values=torch.from_numpy(flat).float(),
                image_grid_thw=torch.tensor(grid),
                max_new_tokens=8,
                do_sample=False,
            )
        ref_tokens = out[0, len(prompt):].tolist()

        vlm = QwenVLModel(model_dir, dtype="float32").load()
        feats = vlm.encode_media(flat, (t, h, w))
        # prompt already expanded (placeholders repeated n_img times)
        collapsed = [1, 2, VSTART, IMG_TOK, VSTART + 1, 9, 11]
        ids, embeds, mask, positions, delta = vlm.build_multimodal_prompt(
            collapsed, [feats], [(t, h, w)]
        )
        assert ids == prompt
        cur = list(ids)
        cur_emb = embeds
        cur_mask = mask
        got = []
        for _ in range(8):
            pos, _ = __import__(
                "vllm_mlx_tpu.models.qwen_vl", fromlist=["x"]
            ).compute_mrope_positions(
                cur,
                [{"grid": (t, h, w)}],
                IMG_TOK,
                VID_TOK,
                merge=2,
                tokens_per_second=2,
            )
            logits = decoder.dense_forward(
                vlm.lm_params,
                vlm.cfg,
                jnp.asarray(cur, jnp.int32),
                token_embeds=jnp.asarray(cur_emb),
                embeds_mask=jnp.asarray(cur_mask),
                positions=jnp.asarray(pos),
            )
            nxt = int(np.argmax(np.asarray(logits[-1])))
            got.append(nxt)
            cur.append(nxt)
            cur_emb = np.concatenate(
                [cur_emb, np.zeros((1, cur_emb.shape[1]), np.float32)]
            )
            cur_mask = np.concatenate([cur_mask, [False]])
        assert got == ref_tokens


class TestEngine:
    def test_qwen_vl_through_engine(self, tiny_qwen25_vl, pixels):
        """Image chat through the continuous-batching scheduler: M-RoPE
        prefill positions travel as explicit rope rows, decode runs the
        device-resident fast path with the per-slot rope delta — output
        is token-identical to HF generate. A concurrent text request
        batches into the same compiled steps."""
        from vllm_mlx_tpu.config import CacheConfig, SchedulerConfig
        from vllm_mlx_tpu.core.model_runner import ModelRunner
        from vllm_mlx_tpu.core.request import Request, SamplingParams
        from vllm_mlx_tpu.core.scheduler import Scheduler
        from vllm_mlx_tpu.models.qwen_vl import QwenVLModel

        hf_model, model_dir = tiny_qwen25_vl
        flat, grid = _hf_patches(model_dir, pixels)
        t, h, w = (int(x) for x in grid[0])
        n_img = t * (h // 2) * (w // 2)
        prompt = [1, 2, VSTART] + [IMG_TOK] * n_img + [VSTART + 1, 9, 11]
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

        vlm = QwenVLModel(model_dir, dtype="float32").load()
        cfg = vlm.text_config
        cfg.dtype = "float32"
        assert cfg.mrope_section == [1, 1, 2]
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
        feats = vlm.encode_media(flat, (t, h, w))
        ids, embeds, mask, positions, delta = vlm.build_multimodal_prompt(
            [1, 2, VSTART, IMG_TOK, VSTART + 1, 9, 11], [feats], [(t, h, w)]
        )
        assert ids == prompt and delta < 0
        sched.add_request(
            Request(
                request_id="mm",
                prompt=ids,
                sampling_params=SamplingParams(temperature=0.0, max_tokens=12),
                prompt_embeds=embeds,
                embeds_mask=mask,
                is_multimodal=True,
                mrope_positions=positions,
                mrope_delta=delta,
            )
        )
        sched.add_request(
            Request(
                request_id="txt",
                prompt=list(text_prompt),
                sampling_params=SamplingParams(temperature=0.0, max_tokens=12),
            )
        )
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
            outs["mm"].output_token_ids, ref_mm,
            hf_scores_fn(hf_out.scores), exclude_ids={IMG_TOK},
        )
        assert_tied_greedy_text(
            outs["txt"].output_token_ids, ref_txt, hf_model, text_prompt
        )

    def test_qwen_vl_video_through_engine(self, tiny_qwen25_vl):
        """A smart-sampled video clip (grid_t > 1, absolute-time M-RoPE)
        through the scheduler matches HF generate fed the same patches."""
        from PIL import Image

        from vllm_mlx_tpu.config import CacheConfig, SchedulerConfig
        from vllm_mlx_tpu.core.model_runner import ModelRunner
        from vllm_mlx_tpu.core.request import Request, SamplingParams
        from vllm_mlx_tpu.core.scheduler import Scheduler
        from vllm_mlx_tpu.models.qwen_vl import QwenVLModel
        from vllm_mlx_tpu.multimodal_processor import QwenVLImageProcessor

        hf_model, model_dir = tiny_qwen25_vl
        rng = np.random.default_rng(11)
        frames = [
            Image.fromarray(
                rng.integers(0, 255, size=(16, 16, 3), dtype=np.uint8)
            )
            for _ in range(4)
        ]
        proc = QwenVLImageProcessor(
            patch_size=4, merge_size=2, temporal_patch_size=2,
            min_pixels=4 * 4 * 4, max_pixels=4 * 4 * 4 * 1280,
        )
        flat, grid = proc.patchify(frames)
        t, h, w = grid
        assert t == 2
        n_vid = t * (h // 2) * (w // 2)
        spg = 2.0
        prompt = [1, VSTART] + [VID_TOK] * n_vid + [VSTART + 1, 9]
        with torch.no_grad():
            hf_out = hf_model.generate(
                input_ids=torch.tensor([prompt]),
                pixel_values_videos=torch.from_numpy(flat).float(),
                video_grid_thw=torch.tensor([list(grid)]),
                second_per_grid_ts=torch.tensor([spg]),
                max_new_tokens=8,
                do_sample=False,
                output_scores=True,
                return_dict_in_generate=True,
            )
            ref = hf_out.sequences[0][len(prompt):].tolist()

        vlm = QwenVLModel(model_dir, dtype="float32").load()
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
        feats = vlm.encode_media(flat, grid)
        ids, embeds, mask, positions, delta = vlm.build_multimodal_prompt(
            [1, VSTART, VID_TOK, VSTART + 1, 9],
            [feats],
            [grid],
            second_per_grid_ts=[spg],
        )
        assert ids == prompt
        sched.add_request(
            Request(
                request_id="vid",
                prompt=ids,
                sampling_params=SamplingParams(temperature=0.0, max_tokens=8),
                prompt_embeds=embeds,
                embeds_mask=mask,
                is_multimodal=True,
                mrope_positions=positions,
                mrope_delta=delta,
            )
        )
        outs = {}
        steps = 0
        while sched.has_unfinished():
            for out in sched.step():
                if out.finished:
                    outs[out.request_id] = out
            steps += 1
            assert steps < 200
        import sys as _sys

        _sys.path.insert(0, "tests")
        from vlm_test_utils import assert_tied_greedy, hf_scores_fn

        assert_tied_greedy(
            outs["vid"].output_token_ids, ref,
            hf_scores_fn(hf_out.scores), exclude_ids={VID_TOK},
        )


class TestMLLMPrefixCache:
    def test_image_hash_keyed_reuse(self, tiny_qwen25_vl, pixels):
        """Same image -> KV prefix reuse with identical output; a
        different image under the SAME token ids must not hit beyond the
        shared text prefix (media rows are salted by content hash,
        reference mllm_cache.py:134-344)."""
        from vllm_mlx_tpu.cache.prefix_cache import PrefixCache
        from vllm_mlx_tpu.config import CacheConfig, SchedulerConfig
        from vllm_mlx_tpu.core.model_runner import ModelRunner
        from vllm_mlx_tpu.core.request import Request, SamplingParams
        from vllm_mlx_tpu.core.scheduler import Scheduler
        from vllm_mlx_tpu.models.qwen_vl import QwenVLModel

        _, model_dir = tiny_qwen25_vl
        flat, grid = _hf_patches(model_dir, pixels)
        t, h, w = (int(x) for x in grid[0])

        vlm = QwenVLModel(model_dir, dtype="float32").load()
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
        pc = PrefixCache(8)
        sched = Scheduler(
            runner, tokenizer=None, stop_tokens=set(), prefix_cache=pc
        )
        feats1 = vlm.encode_media(flat, (t, h, w))
        feats2 = feats1 + 0.37  # "different image", same grid/token ids
        sysprefix = list(range(10, 26))  # 2 full text blocks
        collapsed = sysprefix + [VSTART, IMG_TOK, VSTART + 1, 9]

        def make(rid, feats, mhash):
            ids, embeds, mask, pos, delta = vlm.build_multimodal_prompt(
                collapsed, [feats], [(t, h, w)]
            )
            spans = []
            s0 = int(np.argmax(mask))
            spans.append((s0, s0 + feats.shape[0], mhash))
            return Request(
                request_id=rid,
                prompt=ids,
                sampling_params=SamplingParams(temperature=0.0, max_tokens=4),
                prompt_embeds=embeds,
                embeds_mask=mask,
                is_multimodal=True,
                mrope_positions=pos,
                mrope_delta=delta,
                media_spans=spans,
            )

        def run(req):
            sched.add_request(req)
            out = None
            steps = 0
            while sched.has_unfinished():
                for o in sched.step():
                    if o.finished and o.request_id == req.request_id:
                        out = o
                steps += 1
                assert steps < 200
            return out

        out_a = run(make("a", feats1, "img1"))
        out_b = run(make("b", feats1, "img1"))
        assert out_b.cached_tokens > len(sysprefix)  # image rows reused
        assert out_b.output_token_ids == out_a.output_token_ids
        out_c = run(make("c", feats2, "img2"))
        # only the text prefix blocks may hit — never the media rows
        assert out_c.cached_tokens <= len(sysprefix)


def test_extra_placeholders_position_as_text():
    """A literal placeholder token beyond the supplied media must not
    crash M-RoPE position computation (r2 review finding #3)."""
    from vllm_mlx_tpu.models.qwen_vl import compute_mrope_positions

    ids = [1, IMG_TOK, 2, 3]  # no media supplied at all
    pos, delta = compute_mrope_positions(
        ids, [], IMG_TOK, VID_TOK, merge=2, tokens_per_second=2
    )
    np.testing.assert_array_equal(pos, np.tile(np.arange(4), (3, 1)))
    assert delta == 0
    # one media, two placeholder runs: second run is text
    ids = [VSTART] + [IMG_TOK] * 4 + [5, IMG_TOK, 6]
    pos, delta = compute_mrope_positions(
        ids, [{"grid": (1, 4, 4)}], IMG_TOK, VID_TOK, merge=2,
        tokens_per_second=2,
    )
    assert pos.shape == (3, len(ids))

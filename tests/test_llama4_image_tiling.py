# SPDX-License-Identifier: Apache-2.0
"""Llama 4 image-preprocessing tiling parity vs HF's own math
(ADVICE r3 #3: the engine parity test fed the repo's tiles into HF
generate, so the best-fit tiling decisions were only self-tested).

HF's Llama4ImageProcessorFast class needs torchvision (absent in this
image), but its tiling DECISIONS — supported resolutions, best-fit
canvas, upscale cap, aspect-preserving inner size — are pure
module-level functions. We stub torchvision just enough to import the
module and pin our Llama4ImageProcessor against them across many
non-square sizes. The resize KERNEL itself (torchvision bilinear
antialias vs PIL BILINEAR) has no runnable oracle here; decisions are
the part where silent drift changes token layouts.
"""

import importlib
import math
import sys
import types

import numpy as np
import pytest

from vllm_mlx_tpu.multimodal_processor import Llama4ImageProcessor


@pytest.fixture(scope="module")
def hf_tiling():
    """Import HF's llama4 fast-processor module with torchvision
    stubbed (only `F` is imported at module level; the tiling helpers
    never touch it)."""
    if "transformers.models.llama4.image_processing_llama4_fast" in sys.modules:
        return sys.modules[
            "transformers.models.llama4.image_processing_llama4_fast"
        ]
    added = []
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        transforms = types.ModuleType("torchvision.transforms")
        v2 = types.ModuleType("torchvision.transforms.v2")
        functional = types.ModuleType("torchvision.transforms.v2.functional")
        io_mod = types.ModuleType("torchvision.io")
        tv.transforms = transforms
        transforms.v2 = v2
        v2.functional = functional
        for name, mod in [
            ("torchvision", tv),
            ("torchvision.transforms", transforms),
            ("torchvision.transforms.v2", v2),
            ("torchvision.transforms.v2.functional", functional),
            ("torchvision.io", io_mod),
        ]:
            mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
            sys.modules[name] = mod
            added.append(name)
    try:
        m = importlib.import_module(
            "transformers.models.llama4.image_processing_llama4_fast"
        )
    except Exception as e:  # pragma: no cover
        for name in added:
            sys.modules.pop(name, None)
        pytest.skip(f"HF llama4 tiling module unimportable: {e}")
    return m


SIZES = [
    (50, 70), (70, 50), (336, 336), (100, 900), (900, 100),
    (337, 335), (1, 5000), (5000, 1), (672, 1344), (123, 456),
    (2048, 640), (640, 2048), (336, 3360), (17, 31), (1000, 1001),
]


def _rand_sizes(n=60, seed=0):
    rng = np.random.default_rng(seed)
    return [
        (int(rng.integers(1, 4000)), int(rng.integers(1, 4000)))
        for _ in range(n)
    ]


class TestLlama4TilingParity:
    def test_supported_resolutions_match(self, hf_tiling):
        import torch

        for image_size, max_patches in [(336, 16), (336, 4), (448, 8)]:
            proc = Llama4ImageProcessor(
                image_size=image_size, max_patches=max_patches
            )
            import collections

            size = collections.namedtuple("S", "height width")(
                image_size, image_size
            )
            theirs = {
                tuple(map(int, r))
                for r in torch.tensor(
                    hf_tiling.find_supported_resolutions(
                        max_num_chunks=max_patches, patch_size=size
                    )
                )
            }
            ours = set(proc._possible_resolutions())
            assert ours == theirs, (image_size, max_patches)

    def test_best_fit_canvas_matches(self, hf_tiling):
        import torch

        proc = Llama4ImageProcessor(image_size=336, max_patches=16)
        res = torch.tensor(proc._possible_resolutions())
        for h, w in SIZES + _rand_sizes():
            theirs = tuple(
                int(x)
                for x in hf_tiling.get_best_fit(
                    (h, w), res, resize_to_max_canvas=False
                )
            )
            assert proc._best_fit(h, w) == theirs, (h, w)

    def test_inner_resize_target_matches(self, hf_tiling):
        """Full decision chain: canvas -> upscale cap -> inner size
        (HF _preprocess lines: max_upscaling_size clamp followed by
        get_max_res_without_distortion)."""
        import torch

        s, mp = 336, 16
        proc = Llama4ImageProcessor(image_size=s, max_patches=mp)
        res = torch.tensor(proc._possible_resolutions())
        for h, w in SIZES + _rand_sizes(seed=1):
            target = tuple(
                int(x)
                for x in hf_tiling.get_best_fit(
                    (h, w), res, resize_to_max_canvas=False
                )
            )
            th = min(max(h, s), target[0])
            tw = min(max(w, s), target[1])
            nh, nw = hf_tiling.get_max_res_without_distortion(
                (h, w), (th, tw)
            )
            nh, nw = max(nh, 1), max(nw, 1)

            # reproduce our __call__'s inner-size computation
            oth, otw = proc._best_fit(h, w)
            oth = min(max(h, s), oth)
            otw = min(max(w, s), otw)
            scale_w, scale_h = otw / w, oth / h
            if scale_w < scale_h:
                onw, onh = otw, min(math.floor(h * scale_w), oth)
            else:
                onh, onw = oth, min(math.floor(w * scale_h), otw)
            onh, onw = max(onh, 1), max(onw, 1)
            assert (onh, onw) == (nh, nw), (h, w)

    def test_tile_grid_and_shapes(self, hf_tiling):
        """End-to-end through our processor: the tile grid (aspect
        ratio) must equal HF's canvas//tile computation, and the tile
        split must be row-major (HF split_to_tiles permutation) with a
        global tile appended when tiled."""
        from PIL import Image

        proc = Llama4ImageProcessor(image_size=112, max_patches=4)
        rng = np.random.default_rng(3)
        for h, w in [(50, 300), (300, 50), (112, 112), (250, 250)]:
            img = Image.fromarray(
                rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
            )
            tiles, (rh, rw) = proc(img)
            canvas = proc._best_fit(h, w)
            assert (rh, rw) == (canvas[0] // 112, canvas[1] // 112)
            expect_n = rh * rw + (1 if rh * rw > 1 else 0)
            assert tiles.shape == (expect_n, 3, 112, 112)

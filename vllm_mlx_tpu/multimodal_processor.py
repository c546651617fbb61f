# SPDX-License-Identifier: Apache-2.0
"""Multimodal input processing (reference multimodal_processor.py:52 +
the media plumbing of models/mllm.py:431-838): image decoding (path /
bytes / base64 data-URI), CLIP-style resize-crop-normalize, and message
media extraction."""

from __future__ import annotations

import base64
import io
import json
import logging
import os
import re
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)

_DATA_URI_RE = re.compile(r"^data:image/[\w.+-]+;base64,(.*)$", re.DOTALL)


def load_image(source: Any):
    """Accepts a PIL image, path, raw bytes, base64 string, or data URI.
    Remote URLs are rejected here (network fetch is a server-level
    concern with SSRF policy, reference models/mllm.py:483)."""
    from PIL import Image

    if hasattr(source, "convert"):
        return source.convert("RGB")
    if isinstance(source, bytes):
        return Image.open(io.BytesIO(source)).convert("RGB")
    if isinstance(source, str):
        m = _DATA_URI_RE.match(source)
        if m:
            return Image.open(
                io.BytesIO(base64.b64decode(m.group(1)))
            ).convert("RGB")
        if source.startswith(("http://", "https://")):
            raise ValueError(
                "remote image URLs must be fetched by the server layer"
            )
        if os.path.exists(source):
            return Image.open(source).convert("RGB")
        # maybe bare base64
        try:
            return Image.open(
                io.BytesIO(base64.b64decode(source))
            ).convert("RGB")
        except Exception:
            raise ValueError("unrecognized image source")
    raise TypeError(f"unsupported image source type {type(source)}")


def image_bytes_key(source: Any) -> bytes:
    """Stable content bytes for hashing (vision cache key,
    reference vision_embedding_cache.py:99-127)."""
    if isinstance(source, bytes):
        return source
    if isinstance(source, str):
        m = _DATA_URI_RE.match(source)
        if m:
            return base64.b64decode(m.group(1))
        if os.path.exists(source):
            with open(source, "rb") as f:
                return f.read()
        return source.encode()
    # PIL image: serialize deterministically
    buf = io.BytesIO()
    source.convert("RGB").save(buf, format="PNG")
    return buf.getvalue()


class ImageProcessor:
    """CLIP/SigLIP-style preprocessing from preprocessor_config.json."""

    def __init__(
        self,
        image_size: int = 224,
        mean: Tuple[float, ...] = CLIP_MEAN,
        std: Tuple[float, ...] = CLIP_STD,
        do_center_crop: bool = True,
        resample: str = "bicubic",
    ) -> None:
        self.image_size = image_size
        self.mean = np.asarray(mean, np.float32).reshape(3, 1, 1)
        self.std = np.asarray(std, np.float32).reshape(3, 1, 1)
        self.do_center_crop = do_center_crop
        self.resample = resample

    @classmethod
    def from_pretrained(cls, model_path: str) -> "ImageProcessor":
        path = os.path.join(model_path, "preprocessor_config.json")
        kw: Dict[str, Any] = {}
        if os.path.exists(path):
            with open(path) as f:
                cfg = json.load(f)
            size = cfg.get("size", {})
            if isinstance(size, dict):
                kw["image_size"] = size.get(
                    "shortest_edge", size.get("height", 224)
                )
            elif isinstance(size, int):
                kw["image_size"] = size
            if cfg.get("image_mean"):
                kw["mean"] = tuple(cfg["image_mean"])
            if cfg.get("image_std"):
                kw["std"] = tuple(cfg["image_std"])
            ptype = cfg.get("image_processor_type", "")
            # SigLIP/Gemma3 processors resize straight to the square
            # with BILINEAR (HF Gemma3ImageProcessor/SiglipImageProcessor
            # defaults); CLIP shortest-edge + center-crop with BICUBIC
            siglip_like = "Siglip" in ptype or "Gemma3" in ptype
            kw["do_center_crop"] = cfg.get(
                "do_center_crop", not siglip_like
            )
            if siglip_like:
                kw["resample"] = "bilinear"
        return cls(**kw)

    def __call__(self, image) -> np.ndarray:
        """PIL image -> pixel_values [3, S, S] float32."""
        from PIL import Image

        s = self.image_size
        w, h = image.size
        interp = (
            Image.BILINEAR if self.resample == "bilinear" else Image.BICUBIC
        )
        if self.do_center_crop:
            scale = s / min(w, h)
            nw, nh = round(w * scale), round(h * scale)
            image = image.resize((nw, nh), interp)
            left = (nw - s) // 2
            top = (nh - s) // 2
            image = image.crop((left, top, left + s, top + s))
        else:
            image = image.resize((s, s), interp)
        arr = np.asarray(image, np.float32) / 255.0  # [S, S, 3]
        arr = arr.transpose(2, 0, 1)
        return (arr - self.mean) / self.std

    def batch(self, images: List[Any]) -> np.ndarray:
        return np.stack([self(load_image(im)) for im in images])


class InternVLImageProcessor:
    """InternVL tiling (HF GotOcr2ImageProcessor.crop_image_to_patches):
    aspect-closest (cols x rows) canvas within [min, max] tiles, resize
    BICUBIC, crop row-major, append a thumbnail when tiled; imagenet
    normalize. Returns tiles [N, 3, S, S]."""

    def __init__(
        self,
        image_size: int = 448,
        min_patches: int = 1,
        max_patches: int = 12,
        mean: Tuple[float, ...] = (0.485, 0.456, 0.406),
        std: Tuple[float, ...] = (0.229, 0.224, 0.225),
        use_thumbnail: bool = True,
    ) -> None:
        self.image_size = image_size
        self.min_patches = min_patches
        self.max_patches = max_patches
        self.mean = np.asarray(mean, np.float32).reshape(3, 1, 1)
        self.std = np.asarray(std, np.float32).reshape(3, 1, 1)
        self.use_thumbnail = use_thumbnail

    @classmethod
    def from_pretrained(cls, model_path: str) -> "InternVLImageProcessor":
        kw: Dict[str, Any] = {}
        path = os.path.join(model_path, "preprocessor_config.json")
        if os.path.exists(path):
            with open(path) as f:
                cfg = json.load(f)
            size = cfg.get("size", {})
            if isinstance(size, dict):
                kw["image_size"] = size.get("height", 448)
            if cfg.get("min_patches"):
                kw["min_patches"] = cfg["min_patches"]
            if cfg.get("max_patches"):
                kw["max_patches"] = cfg["max_patches"]
            if cfg.get("image_mean"):
                kw["mean"] = tuple(cfg["image_mean"])
            if cfg.get("image_std"):
                kw["std"] = tuple(cfg["image_std"])
            if "use_thumbnail" in cfg:
                kw["use_thumbnail"] = cfg["use_thumbnail"]
        return cls(**kw)

    def _norm(self, image) -> np.ndarray:
        arr = np.asarray(image, np.float32) / 255.0
        return (arr.transpose(2, 0, 1) - self.mean) / self.std

    def __call__(self, image) -> np.ndarray:
        from PIL import Image
        from transformers.models.got_ocr2.image_processing_got_ocr2 import (
            get_optimal_tiled_canvas,
        )

        s = self.image_size
        w, h = image.size
        cols, rows = get_optimal_tiled_canvas(
            (h, w), (s, s), self.min_patches, self.max_patches
        )
        resized = image.resize((cols * s, rows * s), Image.BICUBIC)
        tiles = []
        for i in range(cols * rows):
            c, r = i % cols, i // cols
            tiles.append(
                self._norm(
                    resized.crop((c * s, r * s, (c + 1) * s, (r + 1) * s))
                )
            )
        if self.use_thumbnail and len(tiles) != 1:
            tiles.append(self._norm(image.resize((s, s), Image.BICUBIC)))
        return np.stack(tiles)


class LlavaNextImageProcessor:
    """LLaVA-NeXT anyres preprocessing (HF
    image_processing_llava_next.py): pick the best grid resolution from
    ``image_grid_pinpoints``, aspect-fit resize + zero-pad there,
    divide into CLIP-size tiles, and prepend the square-resized
    original as the base tile. Returns (tiles [1+n, 3, S, S],
    (num_patch_h, num_patch_w), (orig_h, orig_w))."""

    def __init__(
        self,
        image_size: int = 336,
        grid_pinpoints: Optional[List[List[int]]] = None,
        mean: Tuple[float, ...] = CLIP_MEAN,
        std: Tuple[float, ...] = CLIP_STD,
    ) -> None:
        self.image_size = image_size
        self.grid_pinpoints = grid_pinpoints or [
            [336, 672], [672, 336], [672, 672], [1008, 336], [336, 1008],
        ]
        self.mean = np.asarray(mean, np.float32).reshape(3, 1, 1)
        self.std = np.asarray(std, np.float32).reshape(3, 1, 1)

    @classmethod
    def from_pretrained(cls, model_path: str) -> "LlavaNextImageProcessor":
        kw: Dict[str, Any] = {}
        path = os.path.join(model_path, "preprocessor_config.json")
        if os.path.exists(path):
            with open(path) as f:
                cfg = json.load(f)
            size = cfg.get("size", {})
            if isinstance(size, dict):
                kw["image_size"] = size.get(
                    "shortest_edge", size.get("height", 336)
                )
            if cfg.get("image_grid_pinpoints"):
                kw["grid_pinpoints"] = cfg["image_grid_pinpoints"]
            if cfg.get("image_mean"):
                kw["mean"] = tuple(cfg["image_mean"])
            if cfg.get("image_std"):
                kw["std"] = tuple(cfg["image_std"])
        cfg_path = os.path.join(model_path, "config.json")
        if "grid_pinpoints" not in kw and os.path.exists(cfg_path):
            with open(cfg_path) as f:
                mc = json.load(f)
            if mc.get("image_grid_pinpoints"):
                kw["grid_pinpoints"] = mc["image_grid_pinpoints"]
        return cls(**kw)

    def _norm(self, image) -> np.ndarray:
        arr = np.asarray(image, np.float32) / 255.0
        return (arr.transpose(2, 0, 1) - self.mean) / self.std

    def __call__(self, image):
        import math

        from PIL import Image

        from .models.llava_next import (
            patch_output_size,
            select_best_resolution,
        )

        s = self.image_size
        ow, oh = image.size
        th, tw = select_best_resolution((oh, ow), self.grid_pinpoints)
        nh, nw = patch_output_size(oh, ow, th, tw)
        resized = image.resize((nw, nh), Image.BICUBIC)
        canvas = Image.new("RGB", (tw, th), (0, 0, 0))
        canvas.paste(resized, ((tw - nw) // 2, (th - nh) // 2))
        nph, npw = th // s, tw // s
        tiles = [self._norm(image.resize((s, s), Image.BICUBIC))]
        for r in range(nph):
            for c in range(npw):
                tiles.append(
                    self._norm(
                        canvas.crop(
                            (c * s, r * s, (c + 1) * s, (r + 1) * s)
                        )
                    )
                )
        return np.stack(tiles), (nph, npw), (oh, ow)


class DeepseekVLImageProcessor:
    """DeepSeek-VL preprocessing (HF image_processing_deepseek_vl.py):
    aspect-preserving long-edge resize (min side 14, BICUBIC), CENTER
    pad to square with the background color ``image_mean * 255``, then
    rescale + normalize."""

    def __init__(
        self,
        image_size: int = 384,
        mean: Tuple[float, ...] = (0.48145466, 0.4578275, 0.40821073),
        std: Tuple[float, ...] = (0.26862954, 0.26130258, 0.27577711),
        min_size: int = 14,
    ) -> None:
        self.image_size = image_size
        self.mean = np.asarray(mean, np.float32).reshape(3, 1, 1)
        self.std = np.asarray(std, np.float32).reshape(3, 1, 1)
        self.min_size = min_size
        self.background = tuple(
            int(x * 255) for x in np.asarray(mean).reshape(-1)
        )

    @classmethod
    def from_pretrained(cls, model_path: str) -> "DeepseekVLImageProcessor":
        path = os.path.join(model_path, "preprocessor_config.json")
        kw: Dict[str, Any] = {}
        if os.path.exists(path):
            with open(path) as f:
                cfg = json.load(f)
            size = cfg.get("size", {})
            if isinstance(size, dict):
                kw["image_size"] = size.get("height", 384)
            elif isinstance(size, int):
                kw["image_size"] = size
            if cfg.get("image_mean"):
                kw["mean"] = tuple(cfg["image_mean"])
            if cfg.get("image_std"):
                kw["std"] = tuple(cfg["image_std"])
            if cfg.get("min_size"):
                kw["min_size"] = cfg["min_size"]
        return cls(**kw)

    def __call__(self, image) -> np.ndarray:
        from PIL import Image

        s = self.image_size
        w, h = image.size
        delta = s / max(w, h)
        nw = max(int(w * delta), self.min_size)
        nh = max(int(h * delta), self.min_size)
        image = image.resize((nw, nh), Image.BICUBIC)
        canvas = Image.new("RGB", (s, s), self.background)
        canvas.paste(image, ((s - nw) // 2 if nh > nw else 0,
                             (s - nh) // 2 if nw > nh else 0))
        arr = np.asarray(canvas, np.float32) / 255.0
        arr = arr.transpose(2, 0, 1)
        return (arr - self.mean) / self.std

    def batch(self, images: List[Any]) -> np.ndarray:
        return np.stack([self(load_image(im)) for im in images])


class Idefics3ImageProcessor:
    """Idefics3/SmolVLM tiling preprocessor (HF
    image_processing_idefics3.py): resize the longest edge to
    ``longest_edge`` (short side made even), then — when splitting —
    resize both dims UP to multiples of ``max_image_size`` and cut
    exact max_image_size tiles plus a global downscale. Returns
    (tiles [N, 3, S, S], rows, cols); rows == cols == 0 means the
    single global image only."""

    def __init__(
        self,
        longest_edge: int = 4 * 364,
        max_image_size: int = 364,
        mean: Tuple[float, ...] = (0.5, 0.5, 0.5),
        std: Tuple[float, ...] = (0.5, 0.5, 0.5),
        do_image_splitting: bool = True,
    ) -> None:
        self.longest_edge = longest_edge
        self.max_image_size = max_image_size
        self.mean = np.asarray(mean, np.float32).reshape(3, 1, 1)
        self.std = np.asarray(std, np.float32).reshape(3, 1, 1)
        self.do_image_splitting = do_image_splitting

    @classmethod
    def from_pretrained(cls, model_path: str) -> "Idefics3ImageProcessor":
        path = os.path.join(model_path, "preprocessor_config.json")
        kw: Dict[str, Any] = {}
        if os.path.exists(path):
            with open(path) as f:
                cfg = json.load(f)
            size = cfg.get("size", {})
            if isinstance(size, dict) and "longest_edge" in size:
                kw["longest_edge"] = size["longest_edge"]
            mis = cfg.get("max_image_size", {})
            if isinstance(mis, dict) and "longest_edge" in mis:
                kw["max_image_size"] = mis["longest_edge"]
            if cfg.get("image_mean"):
                kw["mean"] = tuple(cfg["image_mean"])
            if cfg.get("image_std"):
                kw["std"] = tuple(cfg["image_std"])
            kw["do_image_splitting"] = cfg.get("do_image_splitting", True)
        return cls(**kw)

    @staticmethod
    def _rescale_to_max(w: int, h: int, max_len: int) -> Tuple[int, int]:
        """HF _resize_output_size_rescale_to_max_len (even short side)."""
        ar = w / h
        if w >= h:
            w = max_len
            h = int(w / ar)
            if h % 2 != 0:
                h += 1
        else:
            h = max_len
            w = int(h * ar)
            if w % 2 != 0:
                w += 1
        return max(w, 1), max(h, 1)

    def _encoder_multiple(self, w: int, h: int) -> Tuple[int, int]:
        """HF resize_for_vision_encoder: both dims UP to tile multiples."""
        import math

        s = self.max_image_size
        ar = w / h
        if w >= h:
            w2 = math.ceil(w / s) * s
            h2 = int(w2 / ar)
            h2 = math.ceil(h2 / s) * s
        else:
            h2 = math.ceil(h / s) * s
            w2 = int(h2 * ar)
            w2 = math.ceil(w2 / s) * s
        return w2, h2

    def _norm(self, image) -> np.ndarray:
        arr = np.asarray(image, np.float32) / 255.0
        return (arr.transpose(2, 0, 1) - self.mean) / self.std

    def __call__(self, image) -> Tuple[np.ndarray, int, int]:
        from PIL import Image

        s = self.max_image_size
        w, h = image.size
        if not self.do_image_splitting:
            tile = image.resize((s, s), Image.LANCZOS)
            return self._norm(tile)[None], 0, 0
        nw, nh = self._rescale_to_max(w, h, self.longest_edge)
        image = image.resize((nw, nh), Image.LANCZOS)
        nw, nh = self._encoder_multiple(nw, nh)
        image = image.resize((nw, nh), Image.LANCZOS)
        if nw <= s and nh <= s:
            return self._norm(image)[None], 0, 0
        rows = nh // s
        cols = nw // s
        tiles = []
        for r in range(rows):
            for c in range(cols):
                tiles.append(
                    self._norm(
                        image.crop((c * s, r * s, (c + 1) * s, (r + 1) * s))
                    )
                )
        tiles.append(self._norm(image.resize((s, s), Image.LANCZOS)))
        return np.stack(tiles), rows, cols


class Idefics2ImageProcessor:
    """Idefics2 preprocessing (HF image_processing_idefics2.py):
    optional 2x2 split of the ORIGINAL + the original (5 sub-images),
    then each resized aspect-preserving with longest edge capped at
    ``longest_edge`` and both dims floored at ``shortest_edge``
    (get_resize_output_image_size), rescale + normalize. Returns a
    LIST of [3, H, W] float32 arrays (variable sizes)."""

    def __init__(
        self,
        shortest_edge: int = 378,
        longest_edge: int = 980,
        mean: Tuple[float, ...] = (0.5, 0.5, 0.5),
        std: Tuple[float, ...] = (0.5, 0.5, 0.5),
        do_image_splitting: bool = False,
    ) -> None:
        self.shortest_edge = shortest_edge
        self.longest_edge = longest_edge
        self.mean = np.asarray(mean, np.float32).reshape(3, 1, 1)
        self.std = np.asarray(std, np.float32).reshape(3, 1, 1)
        self.do_image_splitting = do_image_splitting

    @classmethod
    def from_pretrained(cls, model_path: str) -> "Idefics2ImageProcessor":
        path = os.path.join(model_path, "preprocessor_config.json")
        kw: Dict[str, Any] = {}
        if os.path.exists(path):
            with open(path) as f:
                cfg = json.load(f)
            size = cfg.get("size", {})
            if isinstance(size, dict):
                if "shortest_edge" in size:
                    kw["shortest_edge"] = size["shortest_edge"]
                if "longest_edge" in size:
                    kw["longest_edge"] = size["longest_edge"]
            if cfg.get("image_mean"):
                kw["mean"] = tuple(cfg["image_mean"])
            if cfg.get("image_std"):
                kw["std"] = tuple(cfg["image_std"])
            kw["do_image_splitting"] = cfg.get("do_image_splitting", False)
        return cls(**kw)

    def _target(self, w: int, h: int) -> Tuple[int, int]:
        """HF get_resize_output_image_size (width, height)."""
        ar = w / h
        if w >= h and w > self.longest_edge:
            w = self.longest_edge
            h = int(w / ar)
        elif h > w and h > self.longest_edge:
            h = self.longest_edge
            w = int(h * ar)
        return max(w, self.shortest_edge), max(h, self.shortest_edge)

    def _one(self, image) -> np.ndarray:
        from PIL import Image

        w, h = self._target(*image.size)
        arr = np.asarray(
            image.resize((w, h), Image.BILINEAR), np.float32
        ) / 255.0
        return (arr.transpose(2, 0, 1) - self.mean) / self.std

    def __call__(self, image) -> List[np.ndarray]:
        if not self.do_image_splitting:
            return [self._one(image)]
        w, h = image.size
        mw, mh = w // 2, h // 2
        crops = [
            image.crop((0, 0, mw, mh)),
            image.crop((mw, 0, w, mh)),
            image.crop((0, mh, mw, h)),
            image.crop((mw, mh, w, h)),
            image,
        ]
        return [self._one(c) for c in crops]


class Llama4ImageProcessor:
    """Llama 4 tiling (HF Llama4ImageProcessorFast._preprocess):
    best-fit canvas from all (h_tiles x w_tiles) factorizations with
    h*w <= max_patches (smallest upscaling factor if any >= 1 — capped
    at one tile side — else least downscaling; ties broken by minimum
    area), aspect-preserving BILINEAR resize, zero-pad to the canvas,
    normalize (mean/std 0.5), split row-major; a GLOBAL tile (whole
    image resized to one tile) is appended when tiled. Returns
    (tiles [N, 3, S, S], (ratio_h, ratio_w))."""

    def __init__(
        self,
        image_size: int = 336,
        max_patches: int = 16,
        mean: Tuple[float, ...] = (0.5, 0.5, 0.5),
        std: Tuple[float, ...] = (0.5, 0.5, 0.5),
    ) -> None:
        self.image_size = image_size
        self.max_patches = max_patches
        self.mean = np.asarray(mean, np.float32).reshape(3, 1, 1)
        self.std = np.asarray(std, np.float32).reshape(3, 1, 1)

    @classmethod
    def from_pretrained(cls, model_path: str) -> "Llama4ImageProcessor":
        kw: Dict[str, Any] = {}
        path = os.path.join(model_path, "preprocessor_config.json")
        if os.path.exists(path):
            with open(path) as f:
                cfg = json.load(f)
            size = cfg.get("size", {})
            if isinstance(size, dict) and size.get("height"):
                kw["image_size"] = size["height"]
            if cfg.get("max_patches"):
                kw["max_patches"] = cfg["max_patches"]
            if cfg.get("image_mean"):
                kw["mean"] = tuple(cfg["image_mean"])
            if cfg.get("image_std"):
                kw["std"] = tuple(cfg["image_std"])
        return cls(**kw)

    def _possible_resolutions(self) -> List[Tuple[int, int]]:
        s = self.image_size
        out = []
        for chunks in range(self.max_patches, 0, -1):
            for f in range(1, chunks + 1):
                if chunks % f == 0:
                    out.append((f * s, (chunks // f) * s))
        return out

    def _best_fit(self, h: int, w: int) -> Tuple[int, int]:
        res = self._possible_resolutions()
        scales = [min(th / h, tw / w) for th, tw in res]
        ups = [sc for sc in scales if sc >= 1]
        sel = min(ups) if ups else max(sc for sc in scales if sc < 1)
        cands = [r for r, sc in zip(res, scales) if sc == sel]
        return min(cands, key=lambda r: r[0] * r[1])

    def _norm(self, arr: np.ndarray) -> np.ndarray:
        return (arr.transpose(2, 0, 1) / 255.0 - self.mean) / self.std

    def __call__(self, image) -> Tuple[np.ndarray, Tuple[int, int]]:
        import math as _math

        from PIL import Image

        s = self.image_size
        w, h = image.size
        th, tw = self._best_fit(h, w)
        # cap upscaling at one tile side (HF max_upscaling_size)
        th = min(max(h, s), th)
        tw = min(max(w, s), tw)
        # aspect-preserving inner size (get_max_res_without_distortion)
        scale_w, scale_h = tw / w, th / h
        if scale_w < scale_h:
            nw, nh = tw, min(_math.floor(h * scale_w), th)
        else:
            nh, nw = th, min(_math.floor(w * scale_h), tw)
        canvas_h, canvas_w = self._best_fit(h, w)
        resized = image.resize((max(nw, 1), max(nh, 1)), Image.BILINEAR)
        arr = np.asarray(resized.convert("RGB"), np.float32)
        padded = np.zeros((canvas_h, canvas_w, 3), np.float32)
        padded[: arr.shape[0], : arr.shape[1]] = arr
        norm = self._norm(padded)  # [3, H, W]
        rh, rw = canvas_h // s, canvas_w // s
        tiles = (
            norm.reshape(3, rh, s, rw, s)
            .transpose(1, 3, 0, 2, 4)
            .reshape(rh * rw, 3, s, s)
        )
        if rh * rw > 1:
            g = image.convert("RGB").resize((s, s), Image.BILINEAR)
            gt = self._norm(np.asarray(g, np.float32))[None]
            tiles = np.concatenate([tiles, gt], axis=0)
        return tiles.astype(np.float32), (rh, rw)


class MllamaImageProcessor:
    """Mllama (Llama-3.2-Vision) tiling (HF image_processing_mllama.py):
    pick the optimal tiled canvas (scale-then-min-area selection over
    all (w, h) arrangements with w*h <= max_tiles), resize BILINEAR
    preserving aspect ratio, pad bottom/right to the canvas, normalize,
    split row-major into tiles, pad the tile axis to max_tiles.

    Returns per batch: pixel_values [N, max_tiles, 3, S, S] f32,
    aspect_ratio_ids [N] (index into the (w,h)-ordered supported list
    of the (h,w) tuple + 1 — HF's exact lookup), aspect_ratio_mask
    [N, max_tiles], num_tiles [N]."""

    def __init__(
        self,
        tile_size: int = 448,
        max_tiles: int = 4,
        mean: Tuple[float, ...] = CLIP_MEAN,
        std: Tuple[float, ...] = CLIP_STD,
    ) -> None:
        self.tile_size = tile_size
        self.max_tiles = max_tiles
        self.mean = np.asarray(mean, np.float32).reshape(3, 1, 1)
        self.std = np.asarray(std, np.float32).reshape(3, 1, 1)
        # HF get_all_supported_aspect_ratios order: width-major
        self.supported = [
            (w, h)
            for w in range(1, max_tiles + 1)
            for h in range(1, max_tiles + 1)
            if w * h <= max_tiles
        ]

    @classmethod
    def from_pretrained(cls, model_path: str) -> "MllamaImageProcessor":
        path = os.path.join(model_path, "preprocessor_config.json")
        kw: Dict[str, Any] = {}
        if os.path.exists(path):
            with open(path) as f:
                cfg = json.load(f)
            size = cfg.get("size", {})
            if isinstance(size, dict) and "height" in size:
                kw["tile_size"] = size["height"]
            if cfg.get("max_image_tiles"):
                kw["max_tiles"] = cfg["max_image_tiles"]
            if cfg.get("image_mean"):
                kw["mean"] = tuple(cfg["image_mean"])
            if cfg.get("image_std"):
                kw["std"] = tuple(cfg["image_std"])
        return cls(**kw)

    def _optimal_canvas(self, h: int, w: int) -> Tuple[int, int]:
        """HF get_optimal_tiled_canvas verbatim (incl. its use of
        arrangement[0] as the canvas HEIGHT over the (w, h)-ordered
        list — both orientations are present so the set is the same,
        but tie-breaks must match)."""
        sizes = np.array(self.supported) * self.tile_size
        th, tw = sizes.T
        scale_h = th / h
        scale_w = tw / w
        scales = np.where(scale_w > scale_h, scale_h, scale_w)
        up = scales[scales >= 1]
        sel = np.min(up) if len(up) > 0 else np.max(scales[scales < 1])
        chosen = sizes[scales == sel]
        if len(chosen) > 1:
            chosen = chosen[np.argmin(chosen[:, 0] * chosen[:, 1])][None]
        return int(chosen[0][0]), int(chosen[0][1])

    def __call__(self, image) -> Tuple[np.ndarray, Tuple[int, int]]:
        """PIL image -> (tiles [num_tiles, 3, S, S] f32 normalized,
        (tiles_h, tiles_w))."""
        import math

        from PIL import Image

        image = image.convert("RGB")
        w, h = image.size
        s = self.tile_size
        ch, cw = self._optimal_canvas(h, w)
        th, tw = ch // s, cw // s
        # get_image_size_fit_to_canvas
        target_w = min(max(w, s), cw)
        target_h = min(max(h, s), ch)
        scale_h = target_h / h
        scale_w = target_w / w
        if scale_w < scale_h:
            nw = target_w
            nh = min(math.floor(h * scale_w) or 1, target_h)
        else:
            nh = target_h
            nw = min(math.floor(w * scale_h) or 1, target_w)
        image = image.resize((nw, nh), Image.BILINEAR)
        arr = np.asarray(image, np.float32).transpose(2, 0, 1)  # [3,nh,nw]
        canvas = np.zeros((3, ch, cw), np.float32)
        canvas[:, :nh, :nw] = arr
        canvas = (canvas / 255.0 - self.mean) / self.std
        # split_to_tiles (row-major)
        tiles = canvas.reshape(3, th, s, tw, s).transpose(1, 3, 0, 2, 4)
        return tiles.reshape(th * tw, 3, s, s), (th, tw)

    def batch(self, images: List[Any]) -> Dict[str, np.ndarray]:
        n = len(images)
        mt = self.max_tiles
        s = self.tile_size
        pixel_values = np.zeros((n, mt, 3, s, s), np.float32)
        ar_ids = np.zeros(n, np.int64)
        ar_mask = np.zeros((n, mt), np.int64)
        ar_mask[:, 0] = 1  # HF build_aspect_ratio_mask quirk
        num_tiles = np.zeros(n, np.int64)
        for i, im in enumerate(images):
            tiles, (th, tw) = self(load_image(im))
            k = tiles.shape[0]
            pixel_values[i, :k] = tiles
            # HF convert_aspect_ratios_to_ids looks up the (h, w) tuple
            # in the (w, h)-ordered supported list
            ar_ids[i] = self.supported.index((th, tw)) + 1
            ar_mask[i, :k] = 1
            num_tiles[i] = k
        return {
            "pixel_values": pixel_values,
            "aspect_ratio_ids": ar_ids,
            "aspect_ratio_mask": ar_mask,
            "num_tiles": num_tiles,
        }


class PixtralImageProcessor:
    """Pixtral preprocessing: keep aspect ratio, long edge capped at
    ``longest_edge``, dims rounded UP to patch multiples (HF
    image_processing_pixtral.get_resize_output_image_size), CLIP
    normalize. Returns variable-size pixel arrays per image."""

    def __init__(
        self,
        longest_edge: int = 1024,
        patch_size: int = 16,
        mean: Tuple[float, ...] = CLIP_MEAN,
        std: Tuple[float, ...] = CLIP_STD,
    ) -> None:
        self.longest_edge = longest_edge
        self.patch_size = patch_size
        self.mean = np.asarray(mean, np.float32).reshape(3, 1, 1)
        self.std = np.asarray(std, np.float32).reshape(3, 1, 1)

    @classmethod
    def from_pretrained(cls, model_path: str) -> "PixtralImageProcessor":
        path = os.path.join(model_path, "preprocessor_config.json")
        kw: Dict[str, Any] = {}
        if os.path.exists(path):
            with open(path) as f:
                cfg = json.load(f)
            size = cfg.get("size", {})
            if isinstance(size, dict) and "longest_edge" in size:
                kw["longest_edge"] = size["longest_edge"]
            ps = cfg.get("patch_size", {})
            if isinstance(ps, dict):
                kw["patch_size"] = ps.get("height", 16)
            elif isinstance(ps, int):
                kw["patch_size"] = ps
            if cfg.get("image_mean"):
                kw["mean"] = tuple(cfg["image_mean"])
            if cfg.get("image_std"):
                kw["std"] = tuple(cfg["image_std"])
        return cls(**kw)

    def target_size(self, w: int, h: int) -> Tuple[int, int]:
        """(w, h) -> resized (w, h), patch multiples (HF floor-then-
        ceil-to-patch rule)."""
        import math

        ratio = max(h / self.longest_edge, w / self.longest_edge)
        if ratio > 1:
            h = int(math.floor(h / ratio))
            w = int(math.floor(w / ratio))
        gh = -(-h // self.patch_size)
        gw = -(-w // self.patch_size)
        return gw * self.patch_size, gh * self.patch_size

    def __call__(self, image) -> np.ndarray:
        """PIL image -> pixel_values [3, H, W] f32 (patch-multiple)."""
        from PIL import Image

        w, h = image.size
        nw, nh = self.target_size(w, h)
        image = image.resize((nw, nh), Image.BICUBIC)
        arr = np.asarray(image, np.float32) / 255.0
        arr = arr.transpose(2, 0, 1)
        return (arr - self.mean) / self.std

    def grid(self, pixel: np.ndarray) -> Tuple[int, int]:
        return (
            pixel.shape[1] // self.patch_size,
            pixel.shape[2] // self.patch_size,
        )


def smart_resize(
    height: int,
    width: int,
    factor: int = 28,
    min_pixels: int = 56 * 56,
    max_pixels: int = 14 * 14 * 4 * 1280,
) -> Tuple[int, int]:
    """Qwen-VL naive-dynamic-resolution target size: dimensions rounded
    to ``factor`` with total pixels in [min_pixels, max_pixels] keeping
    aspect ratio (HF image_processing_qwen2_vl.smart_resize parity)."""
    import math

    if max(height, width) / min(height, width) > 200:
        raise ValueError("absolute aspect ratio must be smaller than 200")
    h_bar = round(height / factor) * factor
    w_bar = round(width / factor) * factor
    if h_bar * w_bar > max_pixels:
        beta = math.sqrt((height * width) / max_pixels)
        h_bar = max(factor, math.floor(height / beta / factor) * factor)
        w_bar = max(factor, math.floor(width / beta / factor) * factor)
    elif h_bar * w_bar < min_pixels:
        beta = math.sqrt(min_pixels / (height * width))
        h_bar = math.ceil(height * beta / factor) * factor
        w_bar = math.ceil(width * beta / factor) * factor
    return h_bar, w_bar


class QwenVLImageProcessor:
    """Qwen2-VL-family preprocessing: smart resize + normalize + flatten
    into ``[grid_t*grid_h*grid_w, C*temporal*patch*patch]`` patch rows
    (HF Qwen2VLImageProcessor._preprocess parity)."""

    def __init__(
        self,
        patch_size: int = 14,
        merge_size: int = 2,
        temporal_patch_size: int = 2,
        min_pixels: int = 56 * 56,
        max_pixels: int = 14 * 14 * 4 * 1280,
        mean: Tuple[float, ...] = CLIP_MEAN,
        std: Tuple[float, ...] = CLIP_STD,
    ) -> None:
        self.patch_size = patch_size
        self.merge_size = merge_size
        self.temporal_patch_size = temporal_patch_size
        self.min_pixels = min_pixels
        self.max_pixels = max_pixels
        self.mean = np.asarray(mean, np.float32).reshape(3, 1, 1)
        self.std = np.asarray(std, np.float32).reshape(3, 1, 1)

    @classmethod
    def from_pretrained(cls, model_path: str) -> "QwenVLImageProcessor":
        path = os.path.join(model_path, "preprocessor_config.json")
        kw: Dict[str, Any] = {}
        if os.path.exists(path):
            with open(path) as f:
                cfg = json.load(f)
            for k in (
                "patch_size",
                "merge_size",
                "temporal_patch_size",
                "min_pixels",
                "max_pixels",
            ):
                if cfg.get(k) is not None:
                    kw[k] = cfg[k]
            size = cfg.get("size") or {}
            if isinstance(size, dict):
                if size.get("shortest_edge"):
                    kw["min_pixels"] = size["shortest_edge"]
                if size.get("longest_edge"):
                    kw["max_pixels"] = size["longest_edge"]
            if cfg.get("image_mean"):
                kw["mean"] = tuple(cfg["image_mean"])
            if cfg.get("image_std"):
                kw["std"] = tuple(cfg["image_std"])
        return cls(**kw)

    def _normalize_frames(self, frames: List[Any]) -> np.ndarray:
        """PIL frames -> [T, C, H, W] float32 at the smart-resized size."""
        from PIL import Image

        w, h = frames[0].size
        factor = self.patch_size * self.merge_size
        rh, rw = smart_resize(
            h, w, factor, self.min_pixels, self.max_pixels
        )
        out = []
        for fr in frames:
            fr = fr.resize((rw, rh), Image.BICUBIC)
            arr = np.asarray(fr, np.float32).transpose(2, 0, 1) / 255.0
            out.append((arr - self.mean) / self.std)
        return np.stack(out)

    def patchify(
        self, frames: List[Any]
    ) -> Tuple[np.ndarray, Tuple[int, int, int]]:
        """Frames (1 for an image) -> (flatten_patches, grid (t, h, w))."""
        patches = self._normalize_frames(frames)
        tp = self.temporal_patch_size
        if patches.shape[0] % tp != 0:
            reps = np.repeat(
                patches[-1:], tp - (patches.shape[0] % tp), axis=0
            )
            patches = np.concatenate([patches, reps], axis=0)
        t, c, hh, ww = patches.shape
        p, m = self.patch_size, self.merge_size
        grid_t = t // tp
        grid_h, grid_w = hh // p, ww // p
        patches = patches.reshape(
            grid_t, tp, c, grid_h // m, m, p, grid_w // m, m, p
        )
        patches = patches.transpose(0, 3, 6, 4, 7, 2, 1, 5, 8)
        flat = patches.reshape(grid_t * grid_h * grid_w, c * tp * p * p)
        return np.ascontiguousarray(flat), (grid_t, grid_h, grid_w)

    def __call__(self, image) -> Tuple[np.ndarray, Tuple[int, int, int]]:
        return self.patchify([load_image(image)])


# ---------------------------------------------------------------------- video
FRAME_FACTOR = 2  # frames per temporal patch
DEFAULT_VIDEO_FPS = 2.0
MIN_FRAMES = 4
MAX_FRAMES = 768

_VIDEO_DATA_URI_RE = re.compile(
    r"^data:video/[\w.+-]+;base64,(.*)$", re.DOTALL
)


def smart_nframes(
    total_frames: int,
    video_fps: float,
    target_fps: float = DEFAULT_VIDEO_FPS,
    min_frames: int = MIN_FRAMES,
    max_frames: int = MAX_FRAMES,
    factor: int = FRAME_FACTOR,
) -> int:
    """Frame count for smart video sampling: duration x target fps,
    clamped to [min, max, total] and floored to the temporal patch
    factor (reference models/mllm.py:1098 ``smart_nframes``)."""
    import math

    duration = total_frames / video_fps if video_fps > 0 else 0.0
    n = max(min_frames, min(duration * target_fps, max_frames, total_frames))
    return int(max(factor, math.floor(n / factor) * factor))


def extract_video_frames(
    source: Any,
    target_fps: float = DEFAULT_VIDEO_FPS,
    max_frames: int = MAX_FRAMES,
) -> Tuple[List[Any], float]:
    """Decode a video (path / bytes / base64 data URI / GIF) into
    smart-sampled RGB PIL frames.

    Returns (frames, second_per_grid_t): seconds spanned by one temporal
    patch of the sampled clip — the Qwen2.5-VL M-RoPE time scale.
    """
    from PIL import Image

    data: Optional[bytes] = None
    path: Optional[str] = None
    if isinstance(source, bytes):
        data = source
    elif isinstance(source, str):
        m = _VIDEO_DATA_URI_RE.match(source)
        if m:
            data = base64.b64decode(m.group(1))
        elif os.path.exists(source):
            path = source
        else:
            try:
                data = base64.b64decode(source, validate=True)
            except Exception:
                raise ValueError("unrecognized video source")
    else:
        raise TypeError(f"unsupported video source type {type(source)}")

    tmp = None
    try:
        if path is None:
            import tempfile

            # GIF/animated images decode via PIL without a temp file
            try:
                im = Image.open(io.BytesIO(data))
                if getattr(im, "n_frames", 1) > 1:
                    return _frames_from_pil_anim(
                        im, target_fps, max_frames
                    )
            except Exception:
                pass
            fd, tmp = tempfile.mkstemp(suffix=".mp4")
            with os.fdopen(fd, "wb") as f:
                f.write(data)
            path = tmp
        else:
            try:
                im = Image.open(path)
                if getattr(im, "n_frames", 1) > 1:
                    return _frames_from_pil_anim(im, target_fps, max_frames)
            except Exception:
                pass
        return _frames_from_cv2(path, target_fps, max_frames)
    finally:
        if tmp is not None:
            try:
                os.unlink(tmp)
            except OSError:
                pass


def _frames_from_pil_anim(im, target_fps: float, max_frames: int):
    from PIL import ImageSequence

    raw = [f.convert("RGB") for f in ImageSequence.Iterator(im)]
    dur_ms = im.info.get("duration", 100) or 100
    video_fps = 1000.0 / float(dur_ms)
    n = smart_nframes(len(raw), video_fps, target_fps, max_frames=max_frames)
    idx = np.linspace(0, len(raw) - 1, n).round().astype(int)
    frames = [raw[i] for i in idx]
    duration_s = len(raw) / video_fps
    spg = FRAME_FACTOR * duration_s / max(1, len(frames))
    return frames, spg


def _frames_from_cv2(path: str, target_fps: float, max_frames: int):
    import cv2
    from PIL import Image

    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise ValueError("cannot open video")
    try:
        total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        video_fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
        n = smart_nframes(total, video_fps, target_fps, max_frames=max_frames)
        idx = np.linspace(0, max(0, total - 1), n).round().astype(int)
        frames = []
        for i in idx:
            cap.set(cv2.CAP_PROP_POS_FRAMES, int(i))
            ok, frame = cap.read()
            if not ok:
                continue
            frames.append(
                Image.fromarray(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
            )
        if not frames:
            raise ValueError("no frames decoded")
        duration_s = total / video_fps if video_fps > 0 else len(frames)
        spg = FRAME_FACTOR * duration_s / max(1, len(frames))
        return frames, spg
    finally:
        cap.release()


def video_bytes_key(source: Any) -> bytes:
    """Stable content bytes for hashing a video source."""
    if isinstance(source, bytes):
        return source
    if isinstance(source, str):
        m = _VIDEO_DATA_URI_RE.match(source)
        if m:
            return base64.b64decode(m.group(1))
        if os.path.exists(source):
            with open(source, "rb") as f:
                return f.read()
        return source.encode()
    raise TypeError(f"unsupported video source type {type(source)}")


def _attach_video_audio(item: Dict[str, Any], part: Dict[str, Any]) -> None:
    """Pair a video part's soundtrack (``"audio": {"data", "format"}``)
    for Qwen2.5-Omni use_audio_in_video (container demux needs ffmpeg —
    absent — so the audio track is supplied alongside the frames)."""
    audio = part.get("audio")
    if isinstance(audio, dict) and audio.get("data"):
        item["audio_src"] = audio["data"]
        item["audio_format"] = audio.get("format", "wav")


def extract_media_from_messages(
    messages: List[Dict[str, Any]],
) -> Tuple[List[Dict[str, Any]], List[Dict[str, Any]]]:
    """Pull image/video content parts out of chat messages, replacing
    them with the model's placeholders handled by the chat template
    (reference engine/batched.py:66-137 media extraction). Returns
    (cleaned_messages, media) where each media item is
    {"kind": "image" | "video", "src": <source>}."""
    media: List[Dict[str, Any]] = []
    cleaned: List[Dict[str, Any]] = []
    for m in messages:
        content = m.get("content")
        if not isinstance(content, list):
            cleaned.append(m)
            continue
        parts = []
        for c in content:
            if not isinstance(c, dict):
                continue
            ctype = c.get("type")
            if ctype == "image_url":
                url = c.get("image_url")
                if isinstance(url, dict):
                    url = url.get("url", "")
                media.append({"kind": "image", "src": url})
                parts.append({"type": "image"})
            elif ctype == "image":
                if "image" in c:
                    media.append({"kind": "image", "src": c["image"]})
                parts.append({"type": "image"})
            elif ctype == "video_url":
                url = c.get("video_url")
                if isinstance(url, dict):
                    url = url.get("url", "")
                item = {"kind": "video", "src": url}
                _attach_video_audio(item, c)
                media.append(item)
                parts.append({"type": "video"})
            elif ctype == "video":
                if "video" in c:
                    item = {"kind": "video", "src": c["video"]}
                    _attach_video_audio(item, c)
                    media.append(item)
                parts.append({"type": "video"})
            elif ctype == "input_audio":
                ia = c.get("input_audio") or {}
                media.append(
                    {
                        "kind": "audio",
                        "src": ia.get("data", ""),
                        "format": ia.get("format", "wav"),
                    }
                )
                parts.append({"type": "audio"})
            elif ctype == "audio_url":
                url = c.get("audio_url")
                if isinstance(url, dict):
                    url = url.get("url", "")
                media.append({"kind": "audio", "src": url, "format": "wav"})
                parts.append({"type": "audio"})
            else:
                parts.append(c)
        cleaned.append({**m, "content": parts})
    return cleaned, media

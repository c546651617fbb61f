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
    ) -> None:
        self.image_size = image_size
        self.mean = np.asarray(mean, np.float32).reshape(3, 1, 1)
        self.std = np.asarray(std, np.float32).reshape(3, 1, 1)
        self.do_center_crop = do_center_crop

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
            kw["do_center_crop"] = cfg.get("do_center_crop", True)
        return cls(**kw)

    def __call__(self, image) -> np.ndarray:
        """PIL image -> pixel_values [3, S, S] float32."""
        from PIL import Image

        s = self.image_size
        w, h = image.size
        if self.do_center_crop:
            scale = s / min(w, h)
            nw, nh = round(w * scale), round(h * scale)
            image = image.resize((nw, nh), Image.BICUBIC)
            left = (nw - s) // 2
            top = (nh - s) // 2
            image = image.crop((left, top, left + s, top + s))
        else:
            image = image.resize((s, s), Image.BICUBIC)
        arr = np.asarray(image, np.float32) / 255.0  # [S, S, 3]
        arr = arr.transpose(2, 0, 1)
        return (arr - self.mean) / self.std

    def batch(self, images: List[Any]) -> np.ndarray:
        return np.stack([self(load_image(im)) for im in images])


def extract_media_from_messages(
    messages: List[Dict[str, Any]],
) -> Tuple[List[Dict[str, Any]], List[Any]]:
    """Pull image content parts out of chat messages, replacing them with
    the model's image placeholder handled by the chat template
    (reference engine/batched.py:66-137 media extraction)."""
    images: List[Any] = []
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
            if c.get("type") == "image_url":
                url = c.get("image_url")
                if isinstance(url, dict):
                    url = url.get("url", "")
                images.append(url)
                parts.append({"type": "image"})
            elif c.get("type") == "image":
                if "image" in c:
                    images.append(c["image"])
                parts.append({"type": "image"})
            else:
                parts.append(c)
        cleaned.append({**m, "content": parts})
    return cleaned, images

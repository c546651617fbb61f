# SPDX-License-Identifier: Apache-2.0
"""Image preprocessing + media extraction + vision embedding cache."""

import base64
import io

import numpy as np
import pytest

from vllm_mlx_tpu.cache.vision_embedding_cache import (
    VisionEmbeddingCache,
    image_hash,
)
from vllm_mlx_tpu.multimodal_processor import (
    ImageProcessor,
    extract_media_from_messages,
    image_bytes_key,
    load_image,
)

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402


@pytest.fixture
def img():
    rng = np.random.default_rng(0)
    return Image.fromarray(
        rng.integers(0, 255, size=(60, 80, 3), dtype=np.uint8)
    )


def _to_data_uri(image) -> str:
    buf = io.BytesIO()
    image.save(buf, format="PNG")
    return "data:image/png;base64," + base64.b64encode(buf.getvalue()).decode()


class TestLoadImage:
    def test_pil_passthrough(self, img):
        assert load_image(img).size == (80, 60)

    def test_bytes(self, img):
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        assert load_image(buf.getvalue()).size == (80, 60)

    def test_data_uri(self, img):
        assert load_image(_to_data_uri(img)).size == (80, 60)

    def test_remote_url_rejected(self):
        with pytest.raises(ValueError):
            load_image("https://example.com/cat.png")


class TestProcessor:
    def test_shapes_and_normalization(self, img):
        proc = ImageProcessor(image_size=28)
        out = proc(img)
        assert out.shape == (3, 28, 28)
        assert out.dtype == np.float32
        # normalized: roughly zero-centered
        assert abs(out.mean()) < 3.0

    def test_batch(self, img):
        proc = ImageProcessor(image_size=28)
        out = proc.batch([img, img])
        assert out.shape == (2, 3, 28, 28)

    def test_matches_hf_clip_processor(self, img):
        from transformers import CLIPImageProcessor

        hf = CLIPImageProcessor(
            size={"shortest_edge": 28},
            crop_size={"height": 28, "width": 28},
        )
        theirs = hf(img, return_tensors="np").pixel_values[0]
        ours = ImageProcessor(image_size=28)(img)
        np.testing.assert_allclose(ours, theirs, atol=2e-2)


class TestMediaExtraction:
    def test_image_url_parts(self, img):
        uri = _to_data_uri(img)
        messages = [
            {"role": "user", "content": [
                {"type": "text", "text": "what is this?"},
                {"type": "image_url", "image_url": {"url": uri}},
            ]},
        ]
        cleaned, images = extract_media_from_messages(messages)
        assert len(images) == 1
        assert {"type": "image"} in cleaned[0]["content"]

    def test_plain_text_untouched(self):
        messages = [{"role": "user", "content": "hi"}]
        cleaned, images = extract_media_from_messages(messages)
        assert cleaned == messages and images == []


class TestVisionCache:
    def test_hit_miss_lru(self):
        cache = VisionEmbeddingCache(max_bytes=10_000)
        feats = np.ones((4, 48), np.float32)
        key = image_hash(b"img-a")
        assert cache.get(key) is None
        cache.put(key, feats)
        np.testing.assert_array_equal(cache.get(key), feats)
        assert cache.get_stats()["hits"] == 1

    def test_eviction(self):
        one = np.ones((10, 100), np.float32)  # 4000 bytes
        cache = VisionEmbeddingCache(max_bytes=9000)
        cache.put("a", one)
        cache.put("b", one.copy())
        cache.put("c", one.copy())  # evicts a
        assert cache.get("a") is None
        assert cache.get("b") is not None

    def test_bytes_key_stable(self, img):
        uri = _to_data_uri(img)
        assert image_bytes_key(uri) == image_bytes_key(uri)
        assert image_hash(image_bytes_key(uri)) == image_hash(
            image_bytes_key(uri)
        )

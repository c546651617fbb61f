# SPDX-License-Identifier: Apache-2.0
"""Embedding engine (reference embedding.py:17 ``EmbeddingEngine`` over
mlx-embeddings; here a first-class JAX BERT encoder with masked mean
pooling + L2 normalization)."""

from __future__ import annotations

import logging
from typing import Any, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


class EmbeddingEngine:
    def __init__(
        self,
        model_path: str,
        *,
        normalize: bool = True,
        max_length: int = 512,
        pooling: str = "mean",  # mean | cls
    ) -> None:
        self.model_path = model_path
        self.normalize = normalize
        self.max_length = max_length
        self.pooling = pooling
        self._loaded = False
        self.tokenizer = None
        self.cfg = None
        self.params = None
        self._encode_jit = None

    def load(self) -> "EmbeddingEngine":
        if self._loaded:
            return self
        from .models.bert import (
            BertConfig,
            cls_pool,
            encode,
            load_bert_params,
            mean_pool,
        )
        from .utils.tokenizer import load_tokenizer

        self.cfg = BertConfig.from_pretrained(self.model_path)
        self.params = load_bert_params(self.model_path, self.cfg)
        self.tokenizer = load_tokenizer(self.model_path)
        pooling = self.pooling

        def _fwd(params, input_ids, attention_mask):
            hidden = encode(params, self.cfg, input_ids, attention_mask)
            if pooling == "cls":
                pooled = cls_pool(hidden).astype(jnp.float32)
            else:
                pooled = mean_pool(hidden, attention_mask)
            if self.normalize:
                pooled = pooled / jnp.maximum(
                    jnp.linalg.norm(pooled, axis=-1, keepdims=True), 1e-9
                )
            return pooled

        self._encode_jit = jax.jit(_fwd)
        self._loaded = True
        logger.info("embedding model loaded: %s", self.model_path)
        return self

    @property
    def is_loaded(self) -> bool:
        return self._loaded

    def _batch(self, texts: Sequence[str]):
        enc = self.tokenizer(
            list(texts),
            padding=True,
            truncation=True,
            max_length=self.max_length,
            return_tensors="np",
        )
        # pad length to a bucket to bound recompiles
        ids = enc["input_ids"]
        mask = enc["attention_mask"]
        l = ids.shape[1]
        bucket = 16
        while bucket < l:
            bucket *= 2
        bucket = min(bucket, self.max_length)
        if bucket > l:
            pad = bucket - l
            ids = np.pad(
                ids, ((0, 0), (0, pad)),
                constant_values=self.tokenizer.pad_token_id or 0,
            )
            mask = np.pad(mask, ((0, 0), (0, pad)))
        return jnp.asarray(ids), jnp.asarray(mask)

    def embed(
        self, inputs: Union[str, Sequence[str]]
    ) -> List[List[float]]:
        if not self._loaded:
            self.load()
        texts = [inputs] if isinstance(inputs, str) else list(inputs)
        ids, mask = self._batch(texts)
        out = self._encode_jit(self.params, ids, mask)
        return np.asarray(out, dtype=np.float32).tolist()

    def count_tokens(self, inputs: Union[str, Sequence[str]]) -> int:
        texts = [inputs] if isinstance(inputs, str) else list(inputs)
        return sum(len(self.tokenizer.encode(t)) for t in texts)

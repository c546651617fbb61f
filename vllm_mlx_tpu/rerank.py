# SPDX-License-Identifier: Apache-2.0
"""Cross-encoder reranker (reference rerank.py:129 ``RerankEngine`` +
rerank_forward.py classifier forward; here the JAX BERT encoder +
sequence-classification head with sigmoid scores)."""

from __future__ import annotations

import logging
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


class RerankEngine:
    def __init__(self, model_path: str, *, max_length: int = 512) -> None:
        self.model_path = model_path
        self.max_length = max_length
        self._loaded = False
        self.tokenizer = None
        self.cfg = None
        self.params = None
        self._score_jit = None

    def load(self) -> "RerankEngine":
        if self._loaded:
            return self
        from .models.bert import (
            BertConfig,
            classify,
            encode,
            load_bert_params,
        )
        from .utils.tokenizer import load_tokenizer

        self.cfg = BertConfig.from_pretrained(self.model_path)
        self.params = load_bert_params(self.model_path, self.cfg)
        self.tokenizer = load_tokenizer(self.model_path)

        def _score(params, input_ids, attention_mask, token_type_ids):
            hidden = encode(
                params, self.cfg, input_ids, attention_mask, token_type_ids
            )
            logits = classify(params, self.cfg, hidden)
            # single-label head -> sigmoid relevance (reference rerank.py:78)
            if logits.shape[-1] == 1:
                return jax.nn.sigmoid(logits[:, 0])
            return jax.nn.softmax(logits, axis=-1)[:, -1]

        self._score_jit = jax.jit(_score)
        self._loaded = True
        logger.info("rerank model loaded: %s", self.model_path)
        return self

    @property
    def is_loaded(self) -> bool:
        return self._loaded

    def score(self, query: str, documents: Sequence[str]) -> List[float]:
        if not self._loaded:
            self.load()
        enc = self.tokenizer(
            [query] * len(documents),
            list(documents),
            padding=True,
            truncation=True,
            max_length=self.max_length,
            return_tensors="np",
        )
        ids = enc["input_ids"]
        mask = enc["attention_mask"]
        tt = enc.get("token_type_ids")
        l = ids.shape[1]
        bucket = 16
        while bucket < l:
            bucket *= 2
        bucket = min(bucket, self.max_length)
        if bucket > l:
            pad = bucket - l
            pad_id = self.tokenizer.pad_token_id or 0
            ids = np.pad(ids, ((0, 0), (0, pad)), constant_values=pad_id)
            mask = np.pad(mask, ((0, 0), (0, pad)))
            if tt is not None:
                tt = np.pad(tt, ((0, 0), (0, pad)))
        scores = self._score_jit(
            self.params,
            jnp.asarray(ids),
            jnp.asarray(mask),
            jnp.asarray(tt) if tt is not None else jnp.zeros_like(jnp.asarray(ids)),
        )
        return np.asarray(scores, dtype=np.float32).tolist()

    def rerank(
        self,
        query: str,
        documents: Sequence[str],
        top_n: Optional[int] = None,
        return_documents: bool = True,
    ) -> List[Dict]:
        scores = self.score(query, documents)
        order = sorted(range(len(scores)), key=lambda i: -scores[i])
        if top_n:
            order = order[:top_n]
        out = []
        for i in order:
            item = {"index": i, "relevance_score": float(scores[i])}
            if return_documents:
                item["document"] = documents[i]
            out.append(item)
        return out

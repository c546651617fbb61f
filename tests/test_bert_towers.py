# SPDX-License-Identifier: Apache-2.0
"""BERT encoder parity vs HF torch + embedding/rerank engine behavior."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")


def _save(model, tokenizer_src, d):
    model.save_pretrained(d, safe_serialization=True)


def _mk_bert(tmp_path, cls_head=False):
    from transformers import (
        BertConfig as HFBertConfig,
        BertForSequenceClassification,
        BertModel,
    )

    torch.manual_seed(0)
    cfg = HFBertConfig(
        vocab_size=120,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        max_position_embeddings=64,
        type_vocab_size=2,
    )
    model = (
        BertForSequenceClassification(cfg) if cls_head else BertModel(cfg)
    ).eval()
    d = tmp_path / "bert"
    model.save_pretrained(d, safe_serialization=True)
    return model, str(d)


def test_bert_hidden_parity(tmp_path, rng):
    from vllm_mlx_tpu.models.bert import BertConfig, encode, load_bert_params

    model, path = _mk_bert(tmp_path)
    cfg = BertConfig.from_pretrained(path)
    params = load_bert_params(path, cfg)
    ids = rng.integers(1, 120, size=(2, 10))
    mask = np.ones((2, 10), np.int32)
    mask[1, 6:] = 0
    ours = np.asarray(
        encode(params, cfg, jnp.asarray(ids), jnp.asarray(mask))
    )
    with torch.no_grad():
        theirs = (
            model(
                torch.tensor(ids), attention_mask=torch.tensor(mask)
            ).last_hidden_state.numpy()
        )
    # only compare unmasked positions
    np.testing.assert_allclose(ours[0], theirs[0], atol=2e-4)
    np.testing.assert_allclose(ours[1, :6], theirs[1, :6], atol=2e-4)


def test_xlmr_classifier_parity(tmp_path, rng):
    from transformers import (
        XLMRobertaConfig,
        XLMRobertaForSequenceClassification,
    )

    from vllm_mlx_tpu.models.bert import (
        BertConfig,
        classify,
        encode,
        load_bert_params,
    )

    torch.manual_seed(1)
    cfg_hf = XLMRobertaConfig(
        vocab_size=130,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        max_position_embeddings=72,
        num_labels=1,
        pad_token_id=1,
    )
    model = XLMRobertaForSequenceClassification(cfg_hf).eval()
    d = tmp_path / "xlmr"
    model.save_pretrained(d, safe_serialization=True)
    cfg = BertConfig.from_pretrained(str(d))
    assert cfg.position_offset == 2
    params = load_bert_params(str(d), cfg)
    ids = rng.integers(2, 130, size=(3, 8))
    mask = np.ones((3, 8), np.int32)
    hidden = encode(params, cfg, jnp.asarray(ids), jnp.asarray(mask))
    ours = np.asarray(classify(params, cfg, hidden))
    with torch.no_grad():
        theirs = model(
            torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).logits.numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-4)


@pytest.fixture(scope="module")
def bert_dir_with_tokenizer(tmp_path_factory):
    from tokenizers import Tokenizer, models, pre_tokenizers, decoders, trainers
    from transformers import (
        BertConfig as HFBertConfig,
        BertForSequenceClassification,
        PreTrainedTokenizerFast,
    )

    d = tmp_path_factory.mktemp("bert_tok")
    tok = Tokenizer(models.BPE(unk_token=None))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=300,
        special_tokens=["[PAD]", "[CLS]", "[SEP]"],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
    )
    tok.train_from_iterator(
        ["the cat sat on the mat", "dogs chase cats", "hello world"] * 5,
        trainer,
    )
    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok, pad_token="[PAD]", cls_token="[CLS]",
        sep_token="[SEP]",
    )
    fast.save_pretrained(d)
    torch.manual_seed(2)
    cfg = HFBertConfig(
        vocab_size=tok.get_vocab_size(),
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        max_position_embeddings=128,
        num_labels=1,
    )
    BertForSequenceClassification(cfg).eval().save_pretrained(
        d, safe_serialization=True
    )
    return str(d)


def test_embedding_engine(bert_dir_with_tokenizer):
    from vllm_mlx_tpu.embedding import EmbeddingEngine

    eng = EmbeddingEngine(bert_dir_with_tokenizer).load()
    vecs = eng.embed(["hello world", "the cat sat"])
    assert len(vecs) == 2
    assert len(vecs[0]) == 32
    n = np.linalg.norm(vecs[0])
    assert abs(n - 1.0) < 1e-5  # normalized
    # deterministic
    vecs2 = eng.embed(["hello world", "the cat sat"])
    np.testing.assert_allclose(vecs, vecs2, atol=1e-6)


def test_rerank_engine(bert_dir_with_tokenizer):
    from vllm_mlx_tpu.rerank import RerankEngine

    eng = RerankEngine(bert_dir_with_tokenizer).load()
    results = eng.rerank(
        "cats", ["the cat sat on the mat", "hello world", "dogs chase cats"],
        top_n=2,
    )
    assert len(results) == 2
    assert all(0.0 <= r["relevance_score"] <= 1.0 for r in results)
    assert (
        results[0]["relevance_score"] >= results[1]["relevance_score"]
    )
    assert "document" in results[0]

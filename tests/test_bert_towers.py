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


def test_modernbert_hidden_parity(tmp_path, rng):
    """ModernBERT (reference models.md embedding table): rotary
    positions, alternating global/local window attention, GeGLU MLP,
    bias-free norms — hidden-state parity vs HF ModernBertModel with
    sequences long enough that the local window (8) binds."""
    from transformers import ModernBertConfig, ModernBertModel

    from vllm_mlx_tpu.models.bert import BertConfig, encode, load_bert_params

    torch.manual_seed(2)
    cfg_hf = ModernBertConfig(
        vocab_size=130,
        hidden_size=32,
        num_hidden_layers=4,
        num_attention_heads=2,
        intermediate_size=48,
        global_attn_every_n_layers=3,
        local_attention=8,
        max_position_embeddings=64,
        pad_token_id=0,
        attn_implementation="sdpa",
        reference_compile=False,
    )
    model = ModernBertModel(cfg_hf).eval()
    d = tmp_path / "modernbert"
    model.save_pretrained(d, safe_serialization=True)
    cfg = BertConfig.from_pretrained(str(d))
    assert cfg.model_type == "modernbert"
    assert cfg.local_attention == 8
    params = load_bert_params(str(d), cfg)
    assert "qkv_w" in params["layers"][1]
    assert "attn_ln_w" not in params["layers"][0]  # layer-0 Identity
    ids = rng.integers(1, 130, size=(2, 20))
    mask = np.ones((2, 20), np.int32)
    mask[1, 14:] = 0
    ours = np.asarray(
        encode(params, cfg, jnp.asarray(ids), jnp.asarray(mask))
    )
    with torch.no_grad():
        theirs = model(
            torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).last_hidden_state.numpy()
    np.testing.assert_allclose(ours[0], theirs[0], atol=3e-4)
    np.testing.assert_allclose(ours[1, :14], theirs[1, :14], atol=3e-4)


def test_modernbert_embedding_engine(tmp_path, rng):
    """EmbeddingEngine serves ModernBERT checkpoints end-to-end (mean
    pooling + L2 norm, matching HF masked mean over last_hidden)."""
    from tokenizers import (
        Tokenizer, decoders, models, pre_tokenizers, trainers,
    )
    from transformers import (
        ModernBertConfig,
        ModernBertModel,
        PreTrainedTokenizerFast,
    )

    from vllm_mlx_tpu.embedding import EmbeddingEngine

    d = tmp_path / "mb_tok"
    tok = Tokenizer(models.BPE(unk_token=None))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=300,
        special_tokens=["[PAD]"],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
    )
    tok.train_from_iterator(
        ["the cat sat on the mat", "dogs chase cats"] * 5, trainer
    )
    fast = PreTrainedTokenizerFast(tokenizer_object=tok, pad_token="[PAD]")
    fast.save_pretrained(d)
    torch.manual_seed(3)
    cfg = ModernBertConfig(
        vocab_size=tok.get_vocab_size(),
        hidden_size=32,
        num_hidden_layers=3,
        num_attention_heads=2,
        intermediate_size=48,
        global_attn_every_n_layers=3,
        local_attention=8,
        pad_token_id=0,
        attn_implementation="sdpa",
        reference_compile=False,
    )
    model = ModernBertModel(cfg).eval()
    model.save_pretrained(d, safe_serialization=True)

    eng = EmbeddingEngine(str(d)).load()
    texts = ["the cat sat on the mat", "dogs chase cats"]
    vecs = np.asarray(eng.embed(texts))
    assert vecs.shape == (2, 32)
    np.testing.assert_allclose(np.linalg.norm(vecs, axis=1), 1.0, atol=1e-5)
    enc = fast(texts, padding=True, return_tensors="pt")
    with torch.no_grad():
        hid = model(
            input_ids=enc["input_ids"],
            attention_mask=enc["attention_mask"],
        ).last_hidden_state
    m = enc["attention_mask"][..., None].float()
    ref = (hid * m).sum(1) / m.sum(1)
    ref = torch.nn.functional.normalize(ref, dim=-1).numpy()
    np.testing.assert_allclose(vecs, ref, atol=3e-4)

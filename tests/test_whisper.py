# SPDX-License-Identifier: Apache-2.0
"""Whisper parity tests: mel frontend vs HF feature extractor, encoder/
decoder logits vs HF torch, batched greedy decode vs HF generate."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def tiny_whisper(tmp_path_factory):
    from transformers import WhisperConfig as HFWhisperConfig
    from transformers import WhisperForConditionalGeneration

    torch.manual_seed(0)
    cfg = HFWhisperConfig(
        vocab_size=200,
        num_mel_bins=80,
        d_model=64,
        encoder_layers=2,
        encoder_attention_heads=4,
        decoder_layers=2,
        decoder_attention_heads=4,
        encoder_ffn_dim=128,
        decoder_ffn_dim=128,
        max_source_positions=1500,
        max_target_positions=448,
        decoder_start_token_id=180,
        eos_token_id=181,
        pad_token_id=181,
        bos_token_id=180,
        suppress_tokens=[],
        begin_suppress_tokens=[],
        forced_decoder_ids=None,
    )
    model = WhisperForConditionalGeneration(cfg).eval()
    d = tmp_path_factory.mktemp("whisper")
    model.generation_config.forced_decoder_ids = None
    model.generation_config.suppress_tokens = None
    model.generation_config.begin_suppress_tokens = None
    model.save_pretrained(d, safe_serialization=True)
    return model, str(d)


def test_mel_matches_hf_feature_extractor(rng):
    from transformers import WhisperFeatureExtractor

    from vllm_mlx_tpu.audio.mel import log_mel_spectrogram

    audio = rng.standard_normal(16000 * 3, dtype=np.float32) * 0.1
    fe = WhisperFeatureExtractor()
    theirs = fe(
        audio, sampling_rate=16000, return_tensors="np"
    ).input_features[0]
    padded = np.zeros(480000, np.float32)
    padded[: len(audio)] = audio
    ours = np.asarray(log_mel_spectrogram(jnp.asarray(padded[None])))[0]
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, atol=2e-4)


def test_encoder_decoder_logits_parity(tiny_whisper, rng):
    from vllm_mlx_tpu.models.whisper import (
        WhisperConfig,
        decode_step,
        decoder_cross_kv,
        encode,
        init_self_kv,
        load_whisper_params,
    )

    model, path = tiny_whisper
    cfg = WhisperConfig.from_pretrained(path)
    params = load_whisper_params(path, cfg)
    mel = rng.standard_normal((2, 80, 3000), dtype=np.float32) * 0.5

    enc_ours = np.asarray(encode(params, cfg, jnp.asarray(mel)))
    with torch.no_grad():
        enc_theirs = model.model.encoder(
            torch.tensor(mel)
        ).last_hidden_state.numpy()
    np.testing.assert_allclose(enc_ours, enc_theirs, atol=3e-4)

    dec_in = rng.integers(0, 180, size=(2, 5))
    cross = decoder_cross_kv(params, cfg, jnp.asarray(enc_ours))
    kv = init_self_kv(cfg, 2)
    logits_ours, kv = decode_step(
        params, cfg, jnp.asarray(dec_in), jnp.int32(0), kv, cross,
        jnp.int32(0),
    )
    with torch.no_grad():
        logits_theirs = model(
            input_features=torch.tensor(mel),
            decoder_input_ids=torch.tensor(dec_in),
        ).logits.numpy()
    np.testing.assert_allclose(
        np.asarray(logits_ours), logits_theirs, atol=3e-3
    )
    # incremental step must match position-5 logits of a len-6 forward
    nxt = np.argmax(logits_theirs[:, -1], axis=-1)
    logits_inc, kv = decode_step(
        params, cfg, jnp.asarray(nxt[:, None]), jnp.int32(5), kv, cross,
        jnp.int32(5),
    )
    with torch.no_grad():
        full6 = model(
            input_features=torch.tensor(mel),
            decoder_input_ids=torch.tensor(
                np.concatenate([dec_in, nxt[:, None]], axis=1)
            ),
        ).logits.numpy()
    np.testing.assert_allclose(
        np.asarray(logits_inc)[:, 0], full6[:, -1], atol=3e-3
    )


class _FakeTokenizer:
    def convert_tokens_to_ids(self, tok):
        return None

    def decode(self, ids, skip_special_tokens=True):
        return " ".join(map(str, ids))


def test_transcribe_matches_hf_generate(tiny_whisper, rng):
    from vllm_mlx_tpu.audio.stt import STTEngine
    from vllm_mlx_tpu.models.whisper import WhisperConfig, load_whisper_params

    model, path = tiny_whisper
    eng = STTEngine(path)
    eng.cfg = WhisperConfig.from_pretrained(path)
    eng.params = load_whisper_params(path, eng.cfg)
    eng.tokenizer = _FakeTokenizer()
    eng._build_jits()
    eng._loaded = True

    audio = (rng.standard_normal(16000 * 2, dtype=np.float32) * 0.1)
    result = eng.transcribe(audio, max_new_tokens=12)
    ours = [int(x) for x in result["text"].split()] if result["text"] else []

    from transformers import WhisperFeatureExtractor

    fe = WhisperFeatureExtractor()
    feats = fe(
        np.pad(audio, (0, 480000 - len(audio))),
        sampling_rate=16000,
        return_tensors="pt",
        padding="max_length",
    ).input_features
    with torch.no_grad():
        seq = model.generate(
            input_features=feats,
            do_sample=False,
            max_new_tokens=12,
            num_beams=1,
        )[0].numpy().tolist()
    # strip decoder_start + trailing eos
    start = eng.cfg.decoder_start_token_id
    eos = eng.cfg.eos_token_id
    theirs = [t for t in seq if t not in (start, eos)]
    ours_clean = [t for t in ours if t not in (start, eos)]
    assert ours_clean == theirs
    assert result["rtf"] > 0

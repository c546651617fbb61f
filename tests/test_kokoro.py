# SPDX-License-Identifier: Apache-2.0
"""Kokoro-class TTS (StyleTTS2-lite + iSTFTNet): loading a Kokoro-82M
state-dict layout, bucketed synthesis, engine family detection
(reference audio/tts.py:82-98 serves Kokoro via mlx-audio; here the
pipeline is a from-scratch JAX implementation, models/kokoro.py)."""

import json

import numpy as np
import pytest


def _wn(rng, *shape, scale=0.05):
    """Split a random conv weight into weight_norm g/v pairs."""
    w = (rng.standard_normal(shape) * scale).astype(np.float32)
    norm = np.sqrt(
        np.sum(w * w, axis=tuple(range(1, w.ndim)), keepdims=True)
    )
    return {"weight_g": norm.astype(np.float32), "weight_v": w}


def _build_checkpoint(tmp_path):
    """Tiny random Kokoro-layout checkpoint + one voice pack."""
    from safetensors.numpy import save_file

    rng = np.random.default_rng(11)

    def w(*shape, scale=0.05):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    def zeros(*shape):
        return np.zeros(shape, np.float32)

    def ones(*shape):
        return np.ones(shape, np.float32)

    t = {}

    # --- PL-BERT (ALBERT: emb 16, hidden 32, heads 4, shared layer x2)
    t["bert.embeddings.word_embeddings.weight"] = w(40, 16)
    t["bert.embeddings.position_embeddings.weight"] = w(128, 16)
    t["bert.embeddings.token_type_embeddings.weight"] = w(2, 16)
    t["bert.embeddings.LayerNorm.weight"] = ones(16)
    t["bert.embeddings.LayerNorm.bias"] = zeros(16)
    t["bert.encoder.embedding_hidden_mapping_in.weight"] = w(32, 16)
    t["bert.encoder.embedding_hidden_mapping_in.bias"] = zeros(32)
    a = "bert.encoder.albert_layer_groups.0.albert_layers.0"
    for proj in ("query", "key", "value", "dense"):
        t[f"{a}.attention.{proj}.weight"] = w(32, 32)
        t[f"{a}.attention.{proj}.bias"] = zeros(32)
    t[f"{a}.attention.LayerNorm.weight"] = ones(32)
    t[f"{a}.attention.LayerNorm.bias"] = zeros(32)
    t[f"{a}.ffn.weight"] = w(64, 32)
    t[f"{a}.ffn.bias"] = zeros(64)
    t[f"{a}.ffn_output.weight"] = w(32, 64)
    t[f"{a}.ffn_output.bias"] = zeros(32)
    t[f"{a}.full_layer_layer_norm.weight"] = ones(32)
    t[f"{a}.full_layer_layer_norm.bias"] = zeros(32)

    t["bert_encoder.weight"] = w(64, 32)
    t["bert_encoder.bias"] = zeros(64)

    def lstm(prefix, in_dim, hidden=32):
        for sfx in ("", "_reverse"):
            t[f"{prefix}.weight_ih_l0{sfx}"] = w(4 * hidden, in_dim)
            t[f"{prefix}.weight_hh_l0{sfx}"] = w(4 * hidden, hidden)
            t[f"{prefix}.bias_ih_l0{sfx}"] = zeros(4 * hidden)
            t[f"{prefix}.bias_hh_l0{sfx}"] = zeros(4 * hidden)

    # --- DurationEncoder (n_layer=2) + predictor lstm/proj
    for i in range(2):
        lstm(f"predictor.text_encoder.lstms.{2 * i}", 80)
        t[f"predictor.text_encoder.lstms.{2 * i + 1}.fc.weight"] = w(128, 16)
        t[f"predictor.text_encoder.lstms.{2 * i + 1}.fc.bias"] = zeros(128)
    lstm("predictor.lstm", 80)
    t["predictor.duration_proj.linear_layer.weight"] = w(10, 64)
    t["predictor.duration_proj.linear_layer.bias"] = zeros(10)
    lstm("predictor.shared", 80)

    def adain_blk(prefix, din, dout, upsample=False):
        t[f"{prefix}.conv1.weight"] = w(dout, din, 3)
        t[f"{prefix}.conv1.bias"] = zeros(dout)
        t[f"{prefix}.conv2.weight"] = w(dout, dout, 3)
        t[f"{prefix}.conv2.bias"] = zeros(dout)
        t[f"{prefix}.norm1.fc.weight"] = w(2 * din, 16)
        t[f"{prefix}.norm1.fc.bias"] = zeros(2 * din)
        t[f"{prefix}.norm2.fc.weight"] = w(2 * dout, 16)
        t[f"{prefix}.norm2.fc.bias"] = zeros(2 * dout)
        if din != dout:
            t[f"{prefix}.conv1x1.weight"] = w(dout, din, 1)
        if upsample:
            t[f"{prefix}.pool.weight"] = w(din, 1, 3)
            t[f"{prefix}.pool.bias"] = zeros(din)

    adain_blk("predictor.F0.0", 64, 64, upsample=True)
    adain_blk("predictor.F0.1", 64, 32)
    adain_blk("predictor.F0.2", 32, 32)
    t["predictor.F0_proj.weight"] = w(1, 32, 1)
    t["predictor.F0_proj.bias"] = zeros(1)
    adain_blk("predictor.N.0", 64, 64, upsample=True)
    adain_blk("predictor.N.1", 64, 32)
    adain_blk("predictor.N.2", 32, 32)
    t["predictor.N_proj.weight"] = w(1, 32, 1)
    t["predictor.N_proj.bias"] = zeros(1)

    # --- TextEncoder (weight-normed convs exercise the g/v fusion)
    t["text_encoder.embedding.weight"] = w(40, 64)
    for i in range(3):
        t.update(
            {
                f"text_encoder.cnn.{i}.0.{k}": v
                for k, v in _wn(rng, 64, 64, 5).items()
            }
        )
        t[f"text_encoder.cnn.{i}.0.bias"] = zeros(64)
        t[f"text_encoder.cnn.{i}.1.gamma"] = ones(64)
        t[f"text_encoder.cnn.{i}.1.beta"] = zeros(64)
    lstm("text_encoder.lstm", 64)

    # --- Decoder trunk (hidden 64, trunk 48, asr_res 8, gen init 32)
    adain_blk("decoder.encode", 66, 48)
    for i in range(3):
        adain_blk(f"decoder.decode.{i}", 58, 48)
    adain_blk("decoder.decode.3", 58, 32, upsample=True)
    t["decoder.F0_conv.weight"] = w(1, 1, 3)
    t["decoder.F0_conv.bias"] = zeros(1)
    t["decoder.N_conv.weight"] = w(1, 1, 3)
    t["decoder.N_conv.bias"] = zeros(1)
    t["decoder.asr_res.0.weight"] = w(8, 64, 1)
    t["decoder.asr_res.0.bias"] = zeros(8)

    # --- generator: rates [4, 3], n_fft 8, hop 2
    t["decoder.generator.m_source.l_linear.weight"] = w(1, 9)
    t["decoder.generator.m_source.l_linear.bias"] = zeros(1)
    t["decoder.generator.ups.0.weight"] = w(32, 16, 8)
    t["decoder.generator.ups.0.bias"] = zeros(16)
    t["decoder.generator.ups.1.weight"] = w(16, 8, 6)
    t["decoder.generator.ups.1.bias"] = zeros(8)
    t["decoder.generator.noise_convs.0.weight"] = w(16, 10, 6)
    t["decoder.generator.noise_convs.0.bias"] = zeros(16)
    t["decoder.generator.noise_convs.1.weight"] = w(8, 10, 1)
    t["decoder.generator.noise_convs.1.bias"] = zeros(8)

    def res1(prefix, ch, dil):
        for j in range(len(dil)):
            for cc in ("convs1", "convs2"):
                t[f"{prefix}.{cc}.{j}.weight"] = w(ch, ch, 7 if "noise" in prefix else 3)
                t[f"{prefix}.{cc}.{j}.bias"] = zeros(ch)
            for ad in ("adain1", "adain2"):
                t[f"{prefix}.{ad}.{j}.fc.weight"] = w(2 * ch, 16)
                t[f"{prefix}.{ad}.{j}.fc.bias"] = zeros(2 * ch)
            for al in ("alpha1", "alpha2"):
                t[f"{prefix}.{al}.{j}"] = ones(1, ch, 1)

    res1("decoder.generator.noise_res.0", 16, [1, 3, 5])
    res1("decoder.generator.noise_res.1", 8, [1, 3, 5])
    res1("decoder.generator.resblocks.0", 16, [1, 3])
    res1("decoder.generator.resblocks.1", 8, [1, 3])
    t["decoder.generator.conv_post.weight"] = w(10, 8, 7)
    t["decoder.generator.conv_post.bias"] = zeros(10)

    d = tmp_path / "kokoro_tiny"
    d.mkdir()
    save_file(t, str(d / "model.safetensors"))
    vocab = {ch: i + 1 for i, ch in enumerate("abcdefghij ʊəɹθˈː")}
    (d / "config.json").write_text(
        json.dumps(
            {
                "model_type": "kokoro",
                "n_token": 40,
                "hidden_dim": 64,
                "style_dim": 16,
                "max_dur": 10,
                "n_layer": 2,
                "text_encoder_kernel_size": 5,
                "sample_rate": 24000,
                "plbert": {
                    "hidden_size": 32,
                    "num_attention_heads": 4,
                    "num_hidden_layers": 2,
                },
                "istftnet": {
                    "upsample_rates": [4, 3],
                    "upsample_kernel_sizes": [8, 6],
                    "upsample_initial_channel": 32,
                    "resblock_kernel_sizes": [3],
                    "resblock_dilation_sizes": [[1, 3]],
                    "gen_istft_n_fft": 8,
                    "gen_istft_hop_size": 2,
                },
                "vocab": vocab,
            }
        )
    )
    vdir = d / "voices"
    vdir.mkdir()
    save_file(
        {"af_test": (rng.standard_normal((510, 1, 32)) * 0.1).astype(
            np.float32
        )},
        str(vdir / "af_test.safetensors"),
    )
    return str(d)


@pytest.fixture(scope="module")
def kokoro_dir(tmp_path_factory):
    return _build_checkpoint(tmp_path_factory.mktemp("kokoro"))


def test_kokoro_synthesis_shapes(kokoro_dir):
    from vllm_mlx_tpu.models.kokoro import KokoroTTS

    m = KokoroTTS(kokoro_dir)
    assert m.cfg.samples_per_frame == 2 * 12 * 2
    assert "af_test" in m.voices
    ids = [1, 2, 3, 4, 5, 6, 7, 8]
    wave = m.synthesize(ids, voice=m.voices["af_test"])
    assert wave.ndim == 1 and wave.dtype == np.float32
    assert len(wave) % m.cfg.samples_per_frame == 0
    assert len(wave) > 0 and np.all(np.isfinite(wave))
    # faster speech -> fewer frames -> shorter waveform
    fast = m.synthesize(ids, voice=m.voices["af_test"], speed=2.0)
    assert len(fast) < len(wave)
    # deterministic per seed
    again = m.synthesize(ids, voice=m.voices["af_test"])
    np.testing.assert_array_equal(wave, again)


def test_kokoro_bucketing_is_exact(kokoro_dir):
    """A longer (different-bucket) input reuses the same compiled shape
    family; padding must not change the valid prefix: synthesizing the
    same ids with extra EXPLICIT pad produces the same leading audio."""
    from vllm_mlx_tpu.models.kokoro import KokoroTTS, TOKEN_BUCKET

    m = KokoroTTS(kokoro_dir)
    ids = [1, 2, 3, 4, 5]
    w1 = m.synthesize(ids, voice=m.voices["af_test"])
    # same input again — bucketed shapes, identical result
    w2 = m.synthesize(list(ids), voice=m.voices["af_test"])
    np.testing.assert_allclose(w1, w2, atol=0)
    # crossing the token bucket boundary still works
    long_ids = (list(range(1, 11)) * 8)[: TOKEN_BUCKET + 5]
    w3 = m.synthesize(long_ids, voice=m.voices["af_test"])
    assert np.all(np.isfinite(w3)) and len(w3) > len(w1)


def test_tts_engine_kokoro_family(kokoro_dir):
    from vllm_mlx_tpu.audio.tts import TTSEngine

    eng = TTSEngine(kokoro_dir).load()
    assert eng.family == "kokoro"
    assert eng.sample_rate == 24000
    voices = eng.voices()
    assert voices and voices[0]["id"] == "af_test"
    wav = eng.synthesize_wav("abba cadd", voice="af_test")
    assert wav[:4] == b"RIFF"
    stats = eng.get_stats()
    assert stats["requests"] == 1 and stats["audio_seconds"] > 0
    with pytest.raises(ValueError):
        eng.synthesize("abc", voice="nope")
    with pytest.raises(ValueError):
        eng.synthesize("壊")  # no vocab coverage -> clear error


def test_tts_engine_vits_still_detected(tmp_path):
    """VITS checkpoints keep loading through the VITS path."""
    from vllm_mlx_tpu.audio.tts import TTSEngine

    d = tmp_path / "vits"
    d.mkdir()
    (d / "config.json").write_text(json.dumps({"model_type": "vits"}))
    assert TTSEngine._detect_family(str(d)) == "vits"

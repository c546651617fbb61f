# SPDX-License-Identifier: Apache-2.0
"""VITS / MMS-TTS parity vs HuggingFace ``VitsModel`` (reference
audio/tts.py — the TTS tower). With noise scales at 0 the synthesis is
fully deterministic, so waveforms must match to float tolerance."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _make_cfg(**kw):
    from transformers import VitsConfig

    base = dict(
        vocab_size=40,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=2,
        window_size=4,
        ffn_dim=64,
        ffn_kernel_size=3,
        flow_size=8,
        spectrogram_bins=9,
        duration_predictor_filter_channels=32,
        duration_predictor_flow_bins=4,
        duration_predictor_kernel_size=3,
        duration_predictor_num_flows=2,
        depth_separable_channels=2,
        depth_separable_num_layers=2,
        prior_encoder_num_flows=2,
        prior_encoder_num_wavenet_layers=2,
        posterior_encoder_num_wavenet_layers=2,
        wavenet_kernel_size=3,
        upsample_initial_channel=16,
        upsample_rates=[2, 2],
        upsample_kernel_sizes=[4, 4],
        resblock_kernel_sizes=[3],
        resblock_dilation_sizes=[[1, 3]],
        num_speakers=1,
        speaker_embedding_size=0,
    )
    base.update(kw)
    return VitsConfig(**base)


def _save(cfg, tmp, seed=0):
    from transformers import VitsModel

    torch.manual_seed(seed)
    model = VitsModel(cfg).eval()
    model.noise_scale = 0.0
    model.noise_scale_duration = 0.0
    model.save_pretrained(tmp, safe_serialization=True)
    return model


def _hf_wave(model, ids, speaker_id=None):
    with torch.no_grad():
        out = model(
            input_ids=torch.tensor([ids]),
            speaker_id=speaker_id,
        )
    n = int(out.sequence_lengths[0])
    return out.waveform[0, :n].numpy()


IDS = [4, 9, 2, 17, 25, 3, 30, 8, 1, 12, 6]


class TestVitsParity:
    def test_stochastic_duration_path(self, tmp_path):
        from vllm_mlx_tpu.models.vits import VitsTTS

        cfg = _make_cfg(use_stochastic_duration_prediction=True)
        model = _save(cfg, tmp_path)
        ref = _hf_wave(model, IDS)
        tts = VitsTTS(str(tmp_path))
        mine = tts.synthesize(
            IDS, noise_scale=0.0, noise_scale_duration=0.0
        )
        assert mine.shape == ref.shape
        np.testing.assert_allclose(mine, ref, rtol=1e-3, atol=2e-4)

    def test_deterministic_duration_path(self, tmp_path):
        from vllm_mlx_tpu.models.vits import VitsTTS

        cfg = _make_cfg(use_stochastic_duration_prediction=False)
        model = _save(cfg, tmp_path, seed=1)
        ref = _hf_wave(model, IDS)
        tts = VitsTTS(str(tmp_path))
        mine = tts.synthesize(
            IDS, noise_scale=0.0, noise_scale_duration=0.0
        )
        assert mine.shape == ref.shape
        np.testing.assert_allclose(mine, ref, rtol=1e-3, atol=2e-4)

    def test_multispeaker(self, tmp_path):
        from vllm_mlx_tpu.models.vits import VitsTTS

        cfg = _make_cfg(
            use_stochastic_duration_prediction=False,
            num_speakers=3,
            speaker_embedding_size=6,
        )
        model = _save(cfg, tmp_path, seed=2)
        tts = VitsTTS(str(tmp_path))
        for spk in (0, 2):
            ref = _hf_wave(model, IDS, speaker_id=spk)
            mine = tts.synthesize(
                IDS, noise_scale=0.0, noise_scale_duration=0.0,
                speaker_id=spk,
            )
            assert mine.shape == ref.shape
            np.testing.assert_allclose(mine, ref, rtol=1e-3, atol=2e-4)

    def test_speaking_rate_scales_length(self, tmp_path):
        from vllm_mlx_tpu.models.vits import VitsTTS

        cfg = _make_cfg(use_stochastic_duration_prediction=False)
        _save(cfg, tmp_path, seed=3)
        tts = VitsTTS(str(tmp_path))
        slow = tts.synthesize(IDS, speaking_rate=0.5, noise_scale=0.0,
                              noise_scale_duration=0.0)
        fast = tts.synthesize(IDS, speaking_rate=2.0, noise_scale=0.0,
                              noise_scale_duration=0.0)
        assert len(slow) > len(fast)

    def test_tts_engine_and_speech_endpoint(self, tmp_path):
        """TTSEngine over a complete tiny checkpoint (model + Vits
        tokenizer), served through POST /v1/audio/speech."""
        import asyncio
        import json
        import struct

        from vllm_mlx_tpu.audio.tts import TTSEngine, encode_wav

        cfg = _make_cfg(use_stochastic_duration_prediction=False)
        _save(cfg, tmp_path, seed=5)
        # character-level Vits tokenizer (MMS style, no phonemizer)
        vocab = {c: i for i, c in enumerate("abcdefghijklmnop ")}
        vf = tmp_path / "vocab.json"
        vf.write_text(json.dumps(vocab))
        from transformers import VitsTokenizer

        tok = VitsTokenizer(
            str(vf), phonemize=False, add_blank=True, normalize=True
        )
        tok.save_pretrained(tmp_path)

        eng = TTSEngine(str(tmp_path)).load()
        wave = eng.synthesize("abba dead beef")
        assert wave.ndim == 1 and len(wave) > 0
        assert np.abs(wave).max() <= 1.0
        # speed control changes duration
        fast = eng.synthesize("abba dead beef", speed=2.0)
        assert len(fast) < len(wave)
        # WAV container sanity
        wav = encode_wav(wave, eng.sample_rate)
        assert wav[:4] == b"RIFF" and wav[8:12] == b"WAVE"
        rate = struct.unpack("<I", wav[24:28])[0]
        assert rate == eng.sample_rate
        stats = eng.get_stats()
        assert stats["requests"] == 2 and stats["rtf"] > 0

        async def go():
            from aiohttp.test_utils import TestClient, TestServer

            from vllm_mlx_tpu.api.server import build_app

            class _Noop:
                async def start(self):
                    pass

                async def stop(self):
                    pass

                def get_stats(self):
                    return {}

            app = build_app(
                _Noop(), served_models=["m"], tts_engine=eng
            )
            client = TestClient(TestServer(app))
            await client.start_server()
            try:
                r = await client.post(
                    "/v1/audio/speech",
                    json={"input": "cafe babe", "voice": "0",
                          "response_format": "wav"},
                )
                assert r.status == 200
                body = await r.read()
                assert body[:4] == b"RIFF"
                r = await client.get("/v1/audio/voices")
                voices = (await r.json())["voices"]
                assert voices and voices[0]["id"] == "0"
                r = await client.post(
                    "/v1/audio/speech",
                    json={"input": "x", "response_format": "mp3"},
                )
                assert r.status == 400
                r = await client.post("/v1/audio/speech", json={})
                assert r.status == 400
            finally:
                await client.close()

        asyncio.run(go())

    def test_noise_is_seeded(self, tmp_path):
        from vllm_mlx_tpu.models.vits import VitsTTS

        cfg = _make_cfg(use_stochastic_duration_prediction=True)
        _save(cfg, tmp_path, seed=4)
        tts = VitsTTS(str(tmp_path))
        a = tts.synthesize(IDS, noise_scale=0.5, seed=7)
        b = tts.synthesize(IDS, noise_scale=0.5, seed=7)
        c = tts.synthesize(IDS, noise_scale=0.5, seed=8)
        np.testing.assert_array_equal(a, b)
        assert a.shape != c.shape or not np.allclose(a, c)

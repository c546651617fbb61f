# SPDX-License-Identifier: Apache-2.0
"""Media plumbing: smart video frame extraction, message media
extraction (image + video parts), and the SSRF-guarded remote fetch
(reference models/mllm.py:483-838)."""

import base64
import io

import numpy as np
import pytest

from vllm_mlx_tpu.media_fetch import (
    FetchPolicy,
    UnsafeRemoteURLError,
    fetch_url,
    validate_url_safety,
)
from vllm_mlx_tpu.multimodal_processor import (
    extract_media_from_messages,
    extract_video_frames,
    smart_nframes,
)


def _gif_bytes(n_frames=10, size=16, seed=3):
    from PIL import Image

    rng = np.random.default_rng(seed)
    frames = [
        Image.fromarray(
            rng.integers(0, 255, size=(size, size, 3), dtype=np.uint8)
        )
        for _ in range(n_frames)
    ]
    buf = io.BytesIO()
    frames[0].save(
        buf, format="GIF", save_all=True, append_images=frames[1:],
        duration=100, loop=0,
    )
    return buf.getvalue()


class TestVideoExtraction:
    def test_smart_nframes_clamps_and_rounds(self):
        # 100 frames @ 10fps = 10s @ 2fps target -> 20 frames
        assert smart_nframes(100, 10.0) == 20
        # short clip clamps to min then factor
        assert smart_nframes(3, 30.0) % 2 == 0
        # cap respected
        assert smart_nframes(10**6, 30.0, max_frames=64) == 64

    def test_gif_frames(self):
        frames, spg = extract_video_frames(_gif_bytes(10))
        assert len(frames) >= 2 and len(frames) % 2 == 0
        assert frames[0].mode == "RGB"
        assert spg > 0

    def test_data_uri_and_path(self, tmp_path):
        data = _gif_bytes(6)
        uri = "data:video/gif;base64," + base64.b64encode(data).decode()
        frames1, _ = extract_video_frames(uri)
        p = tmp_path / "clip.gif"
        p.write_bytes(data)
        frames2, _ = extract_video_frames(str(p))
        assert len(frames1) == len(frames2)

    def test_unrecognized_raises(self):
        with pytest.raises(ValueError):
            extract_video_frames("not-a-video")


class TestMessageExtraction:
    def test_mixed_image_and_video_parts(self):
        messages = [
            {
                "role": "user",
                "content": [
                    {"type": "text", "text": "what happens?"},
                    {"type": "image_url", "image_url": {"url": "data:image/png;base64,AA"}},
                    {"type": "video_url", "video_url": {"url": "data:video/mp4;base64,BB"}},
                    {"type": "video", "video": "clip.gif"},
                ],
            }
        ]
        cleaned, media = extract_media_from_messages(messages)
        kinds = [m["kind"] for m in media]
        assert kinds == ["image", "video", "video"]
        types = [c["type"] for c in cleaned[0]["content"]]
        assert types == ["text", "image", "video", "video"]


class TestSSRFPolicy:
    def test_scheme_rejected(self):
        for url in ("ftp://host/x", "file:///etc/passwd", "gopher://x"):
            with pytest.raises(UnsafeRemoteURLError):
                validate_url_safety(url)

    def test_blocked_hostnames(self):
        with pytest.raises(UnsafeRemoteURLError):
            validate_url_safety("http://localhost/x")
        with pytest.raises(UnsafeRemoteURLError):
            validate_url_safety("http://metadata.google.internal/computeMetadata")

    def test_private_resolution_rejected(self, monkeypatch):
        import socket as sock

        for ip in ("127.0.0.1", "10.0.0.5", "192.168.1.2", "169.254.169.254",
                   "100.64.1.1", "0.0.0.0", "::1", "fe80::1"):
            monkeypatch.setattr(
                sock, "getaddrinfo",
                lambda *a, _ip=ip, **k: [(2, 1, 6, "", (_ip, 80))],
            )
            with pytest.raises(UnsafeRemoteURLError):
                validate_url_safety("http://evil.example/x")

    def test_public_resolution_ok(self, monkeypatch):
        import socket as sock

        monkeypatch.setattr(
            sock, "getaddrinfo",
            lambda *a, **k: [(2, 1, 6, "", ("93.184.216.34", 80))],
        )
        validate_url_safety("https://example.com/cat.png")

    def test_fetch_disabled_by_default(self):
        with pytest.raises(UnsafeRemoteURLError, match="disabled"):
            fetch_url("https://example.com/x")

    def test_redirect_to_private_rejected(self, monkeypatch):
        """First hop is public; its redirect target resolves private —
        the per-hop re-validation must reject it."""
        import socket as sock

        from vllm_mlx_tpu import media_fetch

        resolutions = {"good.example": "93.184.216.34",
                       "internal.example": "10.0.0.9"}
        monkeypatch.setattr(
            sock, "getaddrinfo",
            lambda host, *a, **k: [(2, 1, 6, "", (resolutions[host], 80))],
        )

        class Resp:
            status = 302

            def getheader(self, k):
                return ("http://internal.example/loot"
                        if k == "Location" else None)

            def close(self):
                pass

        monkeypatch.setattr(
            media_fetch, "_fetch_once", lambda url, ip, policy: Resp()
        )
        with pytest.raises(UnsafeRemoteURLError, match="non-public"):
            fetch_url(
                "http://good.example/x", FetchPolicy(allow_remote=True)
            )

    def test_connection_pins_validated_ip(self, monkeypatch):
        """The connect target is the IP returned by validation — a
        rebinding DNS name cannot swap in a private address between
        validation and connect."""
        import socket as sock

        from vllm_mlx_tpu import media_fetch

        seen = {}
        monkeypatch.setattr(
            sock, "getaddrinfo",
            lambda *a, **k: [(2, 1, 6, "", ("93.184.216.34", 80))],
        )

        class Resp:
            status = 200

            def __init__(self):
                self._data = io.BytesIO(b"ok")

            def getheader(self, k):
                return "2" if k == "Content-Length" else None

            def read(self, n):
                return self._data.read(n)

            def close(self):
                pass

        real = media_fetch._fetch_once

        def spy(url, ip, policy):
            seen["ip"] = ip
            return Resp()

        monkeypatch.setattr(media_fetch, "_fetch_once", spy)
        assert fetch_url(
            "http://rebinder.example/x", FetchPolicy(allow_remote=True)
        ) == b"ok"
        assert seen["ip"] == "93.184.216.34"
        assert real is not spy

    def test_size_cap_enforced(self, monkeypatch):
        import socket as sock

        from vllm_mlx_tpu import media_fetch

        monkeypatch.setattr(
            sock, "getaddrinfo",
            lambda *a, **k: [(2, 1, 6, "", ("93.184.216.34", 80))],
        )

        class Resp:
            status = 200

            def getheader(self, k):
                return None

            def read(self, n):
                return b"x" * n  # endless stream

            def close(self):
                pass

        monkeypatch.setattr(
            media_fetch, "_fetch_once", lambda url, ip, policy: Resp()
        )
        with pytest.raises(ValueError, match="exceeds"):
            fetch_url(
                "http://good.example/big",
                FetchPolicy(allow_remote=True, max_bytes=1 << 20),
            )

    def test_successful_fetch(self, monkeypatch):
        import socket as sock

        from vllm_mlx_tpu import media_fetch

        monkeypatch.setattr(
            sock, "getaddrinfo",
            lambda *a, **k: [(2, 1, 6, "", ("93.184.216.34", 80))],
        )

        class Resp:
            status = 200

            def __init__(self):
                self._data = io.BytesIO(b"hello")

            def getheader(self, k):
                return "5" if k == "Content-Length" else None

            def read(self, n):
                return self._data.read(n)

            def close(self):
                pass

        monkeypatch.setattr(
            media_fetch, "_fetch_once", lambda url, ip, policy: Resp()
        )
        assert fetch_url(
            "http://good.example/x", FetchPolicy(allow_remote=True)
        ) == b"hello"


def test_audio_in_chat_transcription_injection(tmp_path):
    """Audio content parts in chat messages are transcribed by the
    attached STT engine and injected as text before templating
    (reference models/mllm.py:877 audio-in-chat)."""
    import asyncio
    import base64
    import struct

    import torch
    from tokenizers import Tokenizer, decoders, models as tmodels, \
        pre_tokenizers, trainers
    from transformers import (
        LlamaConfig,
        LlamaForCausalLM,
        PreTrainedTokenizerFast,
        WhisperConfig,
        WhisperForConditionalGeneration,
    )

    # tiny LM + tokenizer
    lm_dir = tmp_path / "lm"
    tok = Tokenizer(tmodels.BPE(unk_token=None))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=300, special_tokens=["</s>"],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
    )
    tok.train_from_iterator(["audio transcript hello world"] * 8, trainer)
    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok, eos_token="</s>", pad_token="</s>"
    )
    fast.chat_template = (
        "{% for m in messages %}{{ m['role'] }}: "
        "{% if m['content'] is string %}{{ m['content'] }}"
        "{% else %}{% for c in m['content'] %}"
        "{% if c['type'] == 'text' %}{{ c['text'] }}{% endif %}"
        "{% endfor %}{% endif %}\n{% endfor %}"
    )
    fast.save_pretrained(lm_dir)
    torch.manual_seed(0)
    LlamaForCausalLM(LlamaConfig(
        vocab_size=tok.get_vocab_size(), hidden_size=64,
        intermediate_size=128, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=512,
        eos_token_id=fast.eos_token_id,
    )).eval().save_pretrained(lm_dir, safe_serialization=True)

    # tiny whisper STT
    stt_dir = tmp_path / "stt"
    m = WhisperForConditionalGeneration(WhisperConfig(
        vocab_size=200, num_mel_bins=80, d_model=64, encoder_layers=2,
        encoder_attention_heads=4, decoder_layers=2,
        decoder_attention_heads=4, encoder_ffn_dim=128,
        decoder_ffn_dim=128, max_source_positions=1500,
        max_target_positions=448, decoder_start_token_id=180,
        eos_token_id=181, pad_token_id=181, bos_token_id=180,
        suppress_tokens=[], begin_suppress_tokens=[],
        forced_decoder_ids=None,
    )).eval()
    m.generation_config.forced_decoder_ids = None
    m.generation_config.suppress_tokens = None
    m.generation_config.begin_suppress_tokens = None
    m.save_pretrained(stt_dir, safe_serialization=True)

    # 0.5 s of 16 kHz noise as a WAV
    rng = np.random.default_rng(3)
    pcm = (rng.standard_normal(8000) * 3000).astype("<i2").tobytes()
    wav = (b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
           + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 16000, 32000, 2, 16)
           + b"data" + struct.pack("<I", len(pcm)) + pcm)
    b64 = base64.b64encode(wav).decode()

    async def go():
        from vllm_mlx_tpu.audio.stt import STTEngine
        from vllm_mlx_tpu.config import CacheConfig, SchedulerConfig
        from vllm_mlx_tpu.engine.batched import BatchedEngine

        stt = STTEngine(str(stt_dir)).load()
        eng = BatchedEngine(
            str(lm_dir),
            cache_config=CacheConfig(
                block_size=8, num_blocks=32, kv_dtype="float32"
            ),
            scheduler_config=SchedulerConfig(
                max_num_seqs=2, max_prefill_tokens=64,
                prefill_chunk_sizes=[16, 64], max_model_len=256,
            ),
            stt_engine=stt,
        )
        await eng.start()
        try:
            messages = [{
                "role": "user",
                "content": [
                    {"type": "text", "text": "what was said?"},
                    {"type": "input_audio",
                     "input_audio": {"data": b64, "format": "wav"}},
                ],
            }]
            out = None
            async for chunk in eng.stream_chat(
                messages, temperature=0.0, max_tokens=4
            ):
                out = chunk
            assert out is not None and out.finish_reason
            # transcript injected before templating
            injected = eng._inject_audio_transcripts(
                *__import__("vllm_mlx_tpu.multimodal_processor",
                            fromlist=["x"]).extract_media_from_messages(
                    messages
                )
            )
            text = injected[0]["content"][1]["text"]
            assert text.startswith("[Audio transcript:")
        finally:
            await eng.stop()

    asyncio.run(go())


class TestAudioProcessor:
    """audio/processor.py separation surface (reference :33-193)."""

    def test_band_separation_and_wav_save(self, tmp_path):
        import numpy as np

        from vllm_mlx_tpu.audio.processor import AudioProcessor

        p = AudioProcessor()
        p.load()  # fallback mode
        t = np.arange(16000) / 16000.0
        x = np.sin(2 * np.pi * 440 * t) + 0.5 * np.sin(2 * np.pi * 6000 * t)
        r = p.separate(x, 16000, "speech")

        def power_at(sig, f):
            s = np.fft.rfft(sig)
            fr = np.fft.rfftfreq(len(sig), 1 / 16000.0)
            return abs(s[np.argmin(abs(fr - f))])

        assert power_at(r.target, 440) > 5 * power_at(r.target, 6000)
        assert power_at(r.residual, 6000) > 5 * power_at(r.residual, 440)
        out = tmp_path / "t.wav"
        p.save(r.target, str(out))
        assert out.stat().st_size > 1000

# SPDX-License-Identifier: Apache-2.0
"""Gemma-3n native audio (HF modeling_gemma3n.py audio stack): mel
front-end parity vs Gemma3nAudioFeatureExtractor, USM conformer encoder
parity vs Gemma3nAudioEncoder, multimodal embedder parity, and
audio-in-chat served greedy identity vs a composed HF
Gemma3nForConditionalGeneration (vision tower stubbed — timm is absent
from this image, so MobileNetV5 has no oracle; audio+text do)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

# tiny vocabulary layout mirroring the real model's id map:
# [0, 96) text+per-layer ids, [96, 112) vision ids, [112, 128) audio ids
VOCAB = 128
PL_VOCAB = 96
VIS_OFF, VIS_SIZE = 96, 16
AUD_OFF, AUD_SIZE = 112, 16
AUDIO_TOKEN = 113  # audio_token_id (= offset + 1, as in the real map)
BOA, EOA = 90, 112
AUDIO_SEQ = 16


def _audio_cfg_dict():
    return dict(
        input_feat_size=12,
        hidden_size=32,
        conf_num_attention_heads=2,
        conf_num_hidden_layers=2,
        conf_attention_chunk_size=4,
        conf_attention_context_left=3,
        conf_attention_context_right=1,
        conf_conv_kernel_size=3,
        conf_reduction_factor=2,
        sscp_conv_channel_size=(8, 4),
        vocab_size=AUD_SIZE,
        vocab_offset=AUD_OFF,
    )


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(48)


class TestMelParity:
    def test_mel_matches_hf_extractor(self, rng):
        from transformers.models.gemma3n.feature_extraction_gemma3n import (
            Gemma3nAudioFeatureExtractor,
        )

        from vllm_mlx_tpu.models.gemma3n_audio import gemma3n_mel

        wav = (rng.standard_normal(16000 * 2 + 531) * 0.1).astype(np.float32)
        fe = Gemma3nAudioFeatureExtractor()
        ref = fe([wav], return_tensors="np")
        mel, valid = gemma3n_mel(wav)
        assert mel.shape == ref["input_features"][0].shape
        np.testing.assert_allclose(
            mel, ref["input_features"][0], rtol=1e-4, atol=1e-4
        )
        np.testing.assert_array_equal(
            valid, ref["input_features_mask"][0].astype(bool)
        )


class TestEncoderParity:
    def test_encoder_matches_hf(self, rng):
        from transformers.models.gemma3n.configuration_gemma3n import (
            Gemma3nAudioConfig,
        )
        from transformers.models.gemma3n.modeling_gemma3n import (
            Gemma3nAudioEncoder,
        )

        from vllm_mlx_tpu.models.gemma3n_audio import (
            Gemma3nAudioCfg,
            encode,
            load_audio_params,
        )

        torch.manual_seed(11)
        hf_cfg = Gemma3nAudioConfig(**_audio_cfg_dict())
        enc = Gemma3nAudioEncoder(hf_cfg).eval()
        # T=38: not a multiple of the chunk (4) nor the sscp stride,
        # with the last 9 frames padded
        t, t_valid = 38, 29
        mel = (rng.standard_normal((1, t, 12)) * 0.5).astype(np.float32)
        pad_mask = np.zeros((1, t), bool)
        pad_mask[0, t_valid:] = True
        with torch.no_grad():
            ref, ref_mask = enc(
                torch.tensor(mel), torch.tensor(pad_mask)
            )
        tensors = {k: v.numpy() for k, v in enc.state_dict().items()}
        cfg = Gemma3nAudioCfg.from_hf(_audio_cfg_dict())
        params = load_audio_params(tensors, cfg, jnp.float32)
        mine, mine_valid = encode(
            params, cfg, jnp.asarray(mel), jnp.asarray(~pad_mask)
        )
        np.testing.assert_array_equal(
            np.asarray(mine_valid[0]), ~ref_mask[0].numpy()
        )
        np.testing.assert_allclose(
            np.asarray(mine[0]), ref[0].numpy(), rtol=2e-3, atol=2e-3
        )


class TestEmbedderParity:
    def test_soft_and_hard_match_hf(self, rng):
        from transformers.models.gemma3n.configuration_gemma3n import (
            Gemma3nAudioConfig,
            Gemma3nTextConfig,
        )
        from transformers.models.gemma3n.modeling_gemma3n import (
            Gemma3nMultimodalEmbedder,
        )

        from vllm_mlx_tpu.models.gemma3n_audio import (
            embed_hard,
            embed_soft,
            load_embedder_params,
        )

        torch.manual_seed(5)
        acfg = Gemma3nAudioConfig(**_audio_cfg_dict())
        tcfg = Gemma3nTextConfig(
            vocab_size=VOCAB, hidden_size=24, num_hidden_layers=1,
            num_attention_heads=2, num_key_value_heads=1, head_dim=8,
            intermediate_size=32,
        )
        emb = Gemma3nMultimodalEmbedder(acfg, tcfg).eval()
        tensors = {k: v.numpy() for k, v in emb.state_dict().items()}
        params = load_embedder_params(tensors, jnp.float32)
        soft = (rng.standard_normal((5, 32))).astype(np.float32)
        ids = np.array([112, 120, 127], np.int64)
        with torch.no_grad():
            ref_soft = emb(inputs_embeds=torch.tensor(soft)).numpy()
            ref_hard = emb(input_ids=torch.tensor(ids)).numpy()
        np.testing.assert_allclose(
            np.asarray(embed_soft(params, jnp.asarray(soft), 1e-6)),
            ref_soft, rtol=1e-4, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(embed_hard(params, jnp.asarray(ids), AUD_OFF, 1e-6)),
            ref_hard, rtol=1e-4, atol=1e-5,
        )


def _make_full_checkpoint(tmp_path_factory, monkeypatch_cls):
    """Tiny Gemma3nForConditionalGeneration with the (timm) vision tower
    stubbed out; saved with the real HF tensor names."""
    from transformers import Gemma3nConfig, Gemma3nForConditionalGeneration
    from transformers.models.gemma3n import modeling_gemma3n as mg

    class _StubVision(torch.nn.Module):
        def __init__(self):
            super().__init__()

    real_from_config = mg.AutoModel.from_config

    class _AutoShim:
        @staticmethod
        def from_config(config=None, **kw):
            if getattr(config, "model_type", "") == "gemma3n_vision":
                return _StubVision()
            return real_from_config(config=config, **kw)

    monkeypatch_cls.setattr(mg, "AutoModel", _AutoShim)

    torch.manual_seed(21)
    cfg = Gemma3nConfig(
        text_config=dict(
            model_type="gemma3n_text",
            vocab_size=VOCAB,
            vocab_size_per_layer_input=PL_VOCAB,
            hidden_size=24,
            hidden_size_per_layer_input=8,
            intermediate_size=48,
            num_hidden_layers=4,
            num_attention_heads=2,
            num_key_value_heads=1,
            head_dim=8,
            sliding_window=8,
            layer_types=[
                "sliding_attention", "full_attention",
                "sliding_attention", "full_attention",
            ],
            num_kv_shared_layers=2,
            laurel_rank=4,
            activation_sparsity_pattern=[0.95, 0.0, 0.0, 0.0],
        ),
        audio_config=_audio_cfg_dict(),
        vision_config=dict(
            model_type="gemma3n_vision",
            hidden_size=16,
            vocab_size=VIS_SIZE,
            vocab_offset=VIS_OFF,
        ),
        audio_token_id=AUDIO_TOKEN,
        image_token_id=VIS_OFF + 1,
        boa_token_id=BOA,
        eoa_token_id=EOA,
        audio_soft_tokens_per_image=AUDIO_SEQ,
        pad_token_id=0,
        eos_token_id=1,
        bos_token_id=2,
    )
    model = Gemma3nForConditionalGeneration(cfg).eval()
    d = tmp_path_factory.mktemp("g3n_mm")
    model.save_pretrained(d, safe_serialization=True)
    return model, str(d)


@pytest.fixture(scope="module")
def tiny_mm(tmp_path_factory):
    mp = pytest.MonkeyPatch()
    try:
        yield _make_full_checkpoint(tmp_path_factory, mp)
    finally:
        mp.undo()


@pytest.fixture(scope="module")
def audio(rng):
    # ~1.2 s: 13 encoder rows < AUDIO_SEQ=16, so padding rows exercise
    # the pad-embedding path
    return (rng.standard_normal(19_200) * 0.1).astype(np.float32)


class TestServedAudioChat:
    def _hf_generate(self, model, prompt_ids, mel, valid, max_new):
        with torch.no_grad():
            out = model.generate(
                input_ids=torch.tensor([prompt_ids]),
                input_features=torch.tensor(mel[None]),
                input_features_mask=torch.tensor(valid[None]),
                attention_mask=torch.ones(
                    (1, len(prompt_ids)), dtype=torch.long
                ),
                max_new_tokens=max_new,
                do_sample=False,
            )
        return out[0, len(prompt_ids):].tolist()

    def test_served_matches_hf_generate(self, tiny_mm, audio, rng):
        from vllm_mlx_tpu.config import CacheConfig, SchedulerConfig
        from vllm_mlx_tpu.core.model_runner import ModelRunner
        from vllm_mlx_tpu.core.request import Request, SamplingParams
        from vllm_mlx_tpu.core.scheduler import Scheduler
        from vllm_mlx_tpu.models.gemma3n_audio import gemma3n_mel
        from vllm_mlx_tpu.models.gemma3n_mm import Gemma3nMultimodalLM

        hf_model, path = tiny_mm
        m = Gemma3nMultimodalLM(path, dtype="float32").load()
        feats = m.encode_audio(audio)
        assert feats.shape == (AUDIO_SEQ, 24)

        # prompt mirrors the processor's full_audio_sequence framing
        prompt = (
            [2, 5, 9, BOA]
            + [AUDIO_TOKEN] * AUDIO_SEQ
            + [EOA, 17, 23]
        )
        mel, valid = gemma3n_mel(audio, n_mels=12)
        max_new = 10
        ref = self._hf_generate(hf_model, prompt, mel, valid, max_new)

        ids, embeds, mask = m.build_multimodal_prompt(prompt, [feats])
        assert mask.sum() == AUDIO_SEQ
        runner = ModelRunner(
            m.text_config, m.lm_params,
            CacheConfig(block_size=8, num_blocks=64, kv_dtype="float32"),
            SchedulerConfig(max_num_seqs=2, max_prefill_tokens=64,
                            prefill_chunk_sizes=[64],
                            max_model_len=256),
        )
        sched = Scheduler(runner, tokenizer=None, stop_tokens=set())
        req = Request(
            request_id="a", prompt=ids,
            sampling_params=SamplingParams(
                temperature=0.0, max_tokens=max_new
            ),
        )
        req.prompt_embeds = embeds
        req.embeds_mask = mask
        req.is_multimodal = True
        sched.add_request(req)
        out = None
        steps = 0
        while sched.has_unfinished():
            for o in sched.step():
                if o.finished:
                    out = o
            steps += 1
            assert steps < 200
        import sys as _sys

        _sys.path.insert(0, "tests")
        from vlm_test_utils import assert_tied_greedy, hf_logits_fn

        assert_tied_greedy(
            out.output_token_ids, ref,
            hf_logits_fn(
                hf_model, prompt,
                input_features=torch.tensor(mel[None]),
                input_features_mask=torch.tensor(valid[None]),
            ),
            exclude_ids=(AUDIO_TOKEN,),
        )

    def test_audio_chat_through_engine(self, tiny_mm, audio):
        """WAV bytes through BatchedEngine.stream_chat: the gemma3n
        route (NOT the STT-transcript fallback), processor-style
        placeholder expansion to 188 soft tokens, token-identity to HF
        generate."""
        import asyncio
        import base64
        import io

        from scipy.io import wavfile
        from tokenizers import Tokenizer
        from tokenizers import models as tok_models
        from tokenizers import pre_tokenizers
        from transformers import PreTrainedTokenizerFast

        from vllm_mlx_tpu.config import CacheConfig, SchedulerConfig
        from vllm_mlx_tpu.engine.batched import BatchedEngine
        from vllm_mlx_tpu.models.gemma3n_audio import gemma3n_mel

        hf_model, model_dir = tiny_mm
        vocab = {
            "<unk>": 0, "hello": 5, "there": 7,
            "<start_of_audio>": BOA, "<end_of_audio>": EOA,
            "<audio_soft_token>": AUDIO_TOKEN,
        }
        tok = Tokenizer(tok_models.WordLevel(vocab, unk_token="<unk>"))
        tok.pre_tokenizer = pre_tokenizers.Whitespace()
        fast = PreTrainedTokenizerFast(tokenizer_object=tok)
        fast.add_special_tokens(
            {
                "additional_special_tokens": [
                    "<audio_soft_token>", "<start_of_audio>",
                    "<end_of_audio>",
                ],
                "eos_token": "<unk>",
            }
        )
        assert fast.convert_tokens_to_ids("<audio_soft_token>") == AUDIO_TOKEN
        fast.chat_template = (
            "{% for m in messages %}{% for c in m.content %}"
            "{% if c.type == 'audio' %}<audio_soft_token>"
            "{% else %}{{ c.text }} {% endif %}"
            "{% endfor %}{% endfor %}"
        )
        fast.save_pretrained(model_dir)

        buf = io.BytesIO()
        wavfile.write(buf, 16000, (audio * 32767).astype(np.int16))
        b64 = base64.b64encode(buf.getvalue()).decode()

        async def go():
            eng = BatchedEngine(
                model_dir,
                cache_config=CacheConfig(
                    block_size=8, num_blocks=64, kv_dtype="float32"
                ),
                scheduler_config=SchedulerConfig(
                    max_num_seqs=2,
                    max_prefill_tokens=64,
                    prefill_chunk_sizes=[64],
                    max_model_len=256,
                ),
            )
            await eng.start()
            try:
                assert eng.vlm_kind == "gemma3n"
                toks = []
                async for chunk in eng.stream_chat(
                    [
                        {
                            "role": "user",
                            "content": [
                                {"type": "text", "text": "hello"},
                                {
                                    "type": "input_audio",
                                    "input_audio": {
                                        "data": b64,
                                        "format": "wav",
                                    },
                                },
                            ],
                        }
                    ],
                    temperature=0.0,
                    max_tokens=6,
                ):
                    toks.extend(chunk.token_ids)
                return toks
            finally:
                await eng.stop()

        got = asyncio.run(go())

        # HF reference over the same expanded ids + SAME decoded wav
        import tempfile

        from vllm_mlx_tpu.audio.mel import load_wav

        with tempfile.NamedTemporaryFile(suffix=".wav") as f:
            f.write(buf.getvalue())
            f.flush()
            wav_decoded = load_wav(f.name)
        prompt = (
            [5, BOA] + [AUDIO_TOKEN] * AUDIO_SEQ + [EOA]
        )
        mel, valid = gemma3n_mel(wav_decoded, n_mels=12)
        ref = self._hf_generate(hf_model, prompt, mel, valid, 6)
        assert got == ref

    def test_decode_time_special_ids_embed_like_hf(self, tiny_mm, rng):
        """Hard multimodal ids (>= vision/audio vocab offsets) inside a
        TEXT-ONLY prompt embed through the multimodal embedders by id —
        dense logits must match HF with no soft features at all."""
        from vllm_mlx_tpu.models import decoder
        from vllm_mlx_tpu.models.gemma3n_mm import Gemma3nMultimodalLM

        hf_model, path = tiny_mm
        m = Gemma3nMultimodalLM(path, dtype="float32").load()
        ids = [2, 7, VIS_OFF, VIS_OFF + 3, AUD_OFF, AUD_OFF + 9, 31, 64]
        with torch.no_grad():
            ref = hf_model(
                input_ids=torch.tensor([ids]),
                attention_mask=torch.ones((1, len(ids)), dtype=torch.long),
            ).logits[0].numpy()
        mine = np.asarray(
            decoder.dense_forward(
                m.lm_params, m.text_config, jnp.asarray(ids, jnp.int32)
            )
        )
        np.testing.assert_allclose(mine, ref, rtol=2e-3, atol=2e-3)



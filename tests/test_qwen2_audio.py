# SPDX-License-Identifier: Apache-2.0
"""Qwen2-Audio native sound-encoder serving (VERDICT r2 missing #8;
reference models/mllm.py:760-838): whisper-style encoder + avg-pool +
projector parity vs HF, full multimodal greedy generate parity, and the
scheduler-served path."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

VOCAB = 300
AUDIO_TOK = 290


@pytest.fixture(scope="module")
def tiny_qwen2_audio(tmp_path_factory):
    from transformers import Qwen2AudioForConditionalGeneration
    from transformers.models.qwen2_audio.configuration_qwen2_audio import (
        Qwen2AudioConfig,
    )

    torch.manual_seed(0)
    cfg = Qwen2AudioConfig(
        text_config=dict(
            model_type="qwen2",
            vocab_size=VOCAB,
            hidden_size=64,
            intermediate_size=128,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=2,
            max_position_embeddings=1024,
            tie_word_embeddings=False,
        ),
        audio_config=dict(
            num_mel_bins=32,
            d_model=48,
            encoder_layers=2,
            encoder_attention_heads=4,
            encoder_ffn_dim=96,
            max_source_positions=1500,
        ),
        audio_token_index=AUDIO_TOK,
    )
    model = Qwen2AudioForConditionalGeneration(cfg).eval()
    d = tmp_path_factory.mktemp("qwen2audio")
    model.save_pretrained(d, safe_serialization=True)
    return model, str(d)


@pytest.fixture(scope="module")
def audio(rng):
    return (rng.standard_normal(16000 * 2) * 0.1).astype(np.float32)


def _hf_mel(audio, n_mels):
    from transformers import WhisperFeatureExtractor

    fe = WhisperFeatureExtractor(feature_size=n_mels)
    out = fe(audio, sampling_rate=16000, return_tensors="pt", padding="max_length")
    return out.input_features


class TestEncoder:
    def test_features_match_hf(self, tiny_qwen2_audio, audio):
        from vllm_mlx_tpu.models.qwen2_audio import Qwen2AudioModel, feat_lengths

        hf_model, model_dir = tiny_qwen2_audio
        mel_t = _hf_mel(audio, 32)
        # HF's model path masks padded-silence frames out of encoder
        # self-attention (modeling_qwen2_audio.py:783-806); replicate it
        mel_len = -(-len(audio) // 160)
        valid = (mel_len - 1) // 2 + 1
        max_seq = (mel_t.shape[-1] - 2) // 2 + 1
        pad = torch.arange(max_seq)[None] >= valid
        amask = torch.zeros(1, 1, max_seq, max_seq)
        amask[pad.view(1, 1, 1, max_seq).expand(1, 1, max_seq, max_seq)] = (
            float("-inf")
        )
        with torch.no_grad():
            enc = hf_model.audio_tower(
                mel_t, attention_mask=amask
            ).last_hidden_state
            ref = hf_model.multi_modal_projector(enc)[0].numpy()
        m = Qwen2AudioModel(model_dir, dtype="float32").load()
        feats = m.encode_audio(audio)
        n = feat_lengths(-(-len(audio) // 160))
        assert feats.shape[0] == n
        np.testing.assert_allclose(feats, ref[:n], atol=2e-3, rtol=1e-3)


class TestGenerate:
    def test_multimodal_greedy_matches_hf(self, tiny_qwen2_audio, audio, rng):
        """Audio placeholder rows through the scheduler: token-identical
        to HF generate with input_features."""
        from vllm_mlx_tpu.config import CacheConfig, SchedulerConfig
        from vllm_mlx_tpu.core.model_runner import ModelRunner
        from vllm_mlx_tpu.core.request import Request, SamplingParams
        from vllm_mlx_tpu.core.scheduler import Scheduler
        from vllm_mlx_tpu.models.qwen2_audio import Qwen2AudioModel

        hf_model, model_dir = tiny_qwen2_audio
        m = Qwen2AudioModel(model_dir, dtype="float32").load()
        feats = m.encode_audio(audio)
        n_rows = feats.shape[0]
        prompt = [1, 2] + [AUDIO_TOK] * n_rows + [5, 7]
        mel_t = _hf_mel(audio, 32)
        # HF consumes the real feature length via the attention mask
        fam = torch.zeros(1, mel_t.shape[-1], dtype=torch.long)
        fam[0, : -(-len(audio) // 160)] = 1
        with torch.no_grad():
            out = hf_model.generate(
                input_ids=torch.tensor([prompt]),
                input_features=mel_t,
                feature_attention_mask=fam,
                max_new_tokens=8,
                do_sample=False,
                output_scores=True,
                return_dict_in_generate=True,
            )
        ref = out.sequences[0][len(prompt):].tolist()

        cfg = m.text_config
        cfg.dtype = "float32"
        runner = ModelRunner(
            cfg,
            m.lm_params,
            CacheConfig(block_size=8, num_blocks=64, kv_dtype="float32"),
            SchedulerConfig(
                max_num_seqs=2,
                max_prefill_tokens=32,
                prefill_chunk_sizes=[16, 64],
                max_model_len=256,
            ),
        )
        sched = Scheduler(runner, tokenizer=None, stop_tokens=set())
        ids, embeds, mask = m.build_multimodal_prompt(
            [1, 2, AUDIO_TOK, 5, 7], [feats]
        )
        assert ids == prompt
        req = Request(
            request_id="a",
            prompt=list(ids),
            sampling_params=SamplingParams(temperature=0.0, max_tokens=8),
        )
        req.prompt_embeds = embeds
        req.embeds_mask = mask
        req.is_multimodal = True
        sched.add_request(req)
        outs = {}
        steps = 0
        while sched.has_unfinished():
            for o in sched.step():
                if o.finished:
                    outs[o.request_id] = o
            steps += 1
            assert steps < 300
        import sys as _sys

        _sys.path.insert(0, "tests")
        from vlm_test_utils import assert_tied_greedy, hf_scores_fn

        assert_tied_greedy(
            outs["a"].output_token_ids, ref, hf_scores_fn(out.scores),
            exclude_ids={AUDIO_TOK},
        )


class TestEngine:
    def test_audio_chat_through_engine(self, tiny_qwen2_audio, audio):
        """WAV bytes through BatchedEngine.stream_chat: native audio
        routing (no STT transcribe), placeholder expansion, and
        token-identity to HF generate."""
        import asyncio
        import base64
        import io

        from scipy.io import wavfile
        from tokenizers import Tokenizer
        from tokenizers import models as tok_models
        from tokenizers import pre_tokenizers
        from transformers import PreTrainedTokenizerFast

        from vllm_mlx_tpu.config import (
            CacheConfig,
            ModelConfig,
            SchedulerConfig,
        )
        from vllm_mlx_tpu.engine.batched import BatchedEngine
        from vllm_mlx_tpu.models.qwen2_audio import Qwen2AudioModel

        hf_model, model_dir = tiny_qwen2_audio
        vocab = {"hello": 5, "there": 7, "<unk>": 0}
        tok = Tokenizer(tok_models.WordLevel(vocab, unk_token="<unk>"))
        tok.pre_tokenizer = pre_tokenizers.Whitespace()
        fast = PreTrainedTokenizerFast(tokenizer_object=tok)
        fast.add_special_tokens(
            {"additional_special_tokens": ["<|AUDIO|>"], "eos_token": "<unk>"}
        )
        aud_id = fast.convert_tokens_to_ids("<|AUDIO|>")
        fast.chat_template = (
            "{% for m in messages %}{% for c in m.content %}"
            "{% if c.type == 'audio' %}<|AUDIO|>"
            "{% else %}{{ c.text }} {% endif %}"
            "{% endfor %}{% endfor %}"
        )
        fast.save_pretrained(model_dir)
        # point the checkpoint's audio token at the tokenizer's id
        import json as _json

        cfg_path = f"{model_dir}/config.json"
        raw = _json.load(open(cfg_path))
        raw["audio_token_index"] = aud_id
        _json.dump(raw, open(cfg_path, "w"))

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
                    max_prefill_tokens=32,
                    prefill_chunk_sizes=[16, 64],
                    max_model_len=256,
                ),
            )
            mc = ModelConfig.from_hf_config(raw["text_config"])
            mc.dtype = "float32"
            eng._model_config = None  # force the VLM branch
            await eng.start()
            try:
                assert eng.vlm_kind == "qwen2_audio"
                eng.scheduler.runner.cfg.dtype = "float32"
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
        # (16-bit quantization changes the waveform slightly)
        m = Qwen2AudioModel(model_dir, dtype="float32").load()
        from vllm_mlx_tpu.audio.mel import load_wav
        import tempfile

        with tempfile.NamedTemporaryFile(suffix=".wav") as f:
            f.write(buf.getvalue())
            f.flush()
            wav_decoded = load_wav(f.name)
        n_rows = m.encode_audio(wav_decoded).shape[0]
        prompt = [5] + [aud_id] * n_rows
        mel_t = _hf_mel(wav_decoded, 32)
        fam = torch.zeros(1, mel_t.shape[-1], dtype=torch.long)
        fam[0, : -(-len(wav_decoded) // 160)] = 1
        old_tok = hf_model.config.audio_token_index
        try:
            # the engine re-pointed the checkpoint's audio token at the
            # tokenizer's id; mirror it on the in-memory HF model
            hf_model.config.audio_token_index = aud_id
            with torch.no_grad():
                out = hf_model.generate(
                    input_ids=torch.tensor([prompt]),
                    input_features=mel_t,
                    feature_attention_mask=fam,
                    max_new_tokens=6,
                    do_sample=False,
                )
        finally:
            hf_model.config.audio_token_index = old_tok
        assert got == out[0, len(prompt):].tolist()

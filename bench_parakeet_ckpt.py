# SPDX-License-Identifier: Apache-2.0
"""Build a random-weight parakeet-tdt-0.6b-v2-geometry checkpoint and
measure STT RTF on the chip (reference docs/benchmarks/audio.md:36:
RTF 52.7x through mlx-audio on M4 Max).

Geometry: FastConformer-XL (24 layers, d_model 1024, 8 heads, ffn 4096,
conv kernel 9, 8x depthwise-striding subsampling, 128 mel bins) + TDT
head (LSTM predictor 640, joint 640, durations 0-4, vocab 1024) —
NVIDIA parakeet-tdt-0.6b-v2 card / NeMo config values.

Usage: python bench_parakeet_ckpt.py [audio_seconds] (default 120)
"""

import json
import os
import sys

import numpy as np


def build(d: str) -> None:
    from safetensors.numpy import save_file

    enc = dict(
        hidden_size=1024,
        num_hidden_layers=24,
        num_attention_heads=8,
        num_key_value_heads=8,
        intermediate_size=4096,
        conv_kernel_size=9,
        subsampling_conv_kernel_size=3,
        subsampling_conv_stride=2,
        subsampling_factor=8,
        subsampling_conv_channels=256,
        num_mel_bins=128,
        scale_input=True,
        attention_bias=True,
        max_position_embeddings=5000,
    )
    vocab, pred_hidden, joint, ndur = 1024, 640, 640, 5
    g = np.random.default_rng(0)

    def r(*s):
        return (g.standard_normal(s) * 0.05).astype(np.float32)

    h, ff = enc["hidden_size"], enc["intermediate_size"]
    ch = enc["subsampling_conv_channels"]
    k = enc["conv_kernel_size"]
    mel = enc["num_mel_bins"]
    nh = enc["num_attention_heads"]
    t = {}
    # subsampling (HF ParakeetEncoder dw_striding layer indices:
    # conv0, relu, then [dw, pw, relu] per extra stride-2 stage)
    t["encoder.subsampling.layers.0.weight"] = r(ch, 1, 3, 3)
    t["encoder.subsampling.layers.0.bias"] = r(ch)
    for gi, li in enumerate((2, 5)):  # 2 extra stages -> 8x total
        t[f"encoder.subsampling.layers.{li}.weight"] = r(ch, 1, 3, 3)
        t[f"encoder.subsampling.layers.{li}.bias"] = r(ch)
        t[f"encoder.subsampling.layers.{li+1}.weight"] = r(ch, ch, 1, 1)
        t[f"encoder.subsampling.layers.{li+1}.bias"] = r(ch)
    f_out = mel
    for _ in range(3):
        f_out = (f_out + 2 * 1 - 3) // 2 + 1  # pad 1, k 3, stride 2
    t["encoder.subsampling.linear.weight"] = r(h, ch * f_out)
    t["encoder.subsampling.linear.bias"] = r(h)
    for i in range(enc["num_hidden_layers"]):
        p = f"encoder.layers.{i}."
        for ffn in ("feed_forward1", "feed_forward2"):
            t[p + ffn + ".linear1.weight"] = r(ff, h)
            t[p + ffn + ".linear1.bias"] = r(ff)
            t[p + ffn + ".linear2.weight"] = r(h, ff)
            t[p + ffn + ".linear2.bias"] = r(h)
        for nrm in (
            "norm_feed_forward1", "norm_feed_forward2",
            "norm_self_att", "norm_conv", "norm_out",
        ):
            t[p + nrm + ".weight"] = np.ones(h, np.float32)
            t[p + nrm + ".bias"] = np.zeros(h, np.float32)
        a = p + "self_attn."
        for proj in ("q_proj", "k_proj", "v_proj", "o_proj"):
            t[a + proj + ".weight"] = r(h, h)
            t[a + proj + ".bias"] = r(h)
        t[a + "relative_k_proj.weight"] = r(h, h)
        t[a + "bias_u"] = r(nh, h // nh)
        t[a + "bias_v"] = r(nh, h // nh)
        c = p + "conv."
        t[c + "pointwise_conv1.weight"] = r(2 * h, h, 1)
        t[c + "pointwise_conv1.bias"] = r(2 * h)
        t[c + "depthwise_conv.weight"] = r(h, 1, k)
        t[c + "depthwise_conv.bias"] = r(h)
        t[c + "norm.weight"] = np.ones(h, np.float32)
        t[c + "norm.bias"] = np.zeros(h, np.float32)
        t[c + "norm.running_mean"] = np.zeros(h, np.float32)
        t[c + "norm.running_var"] = np.ones(h, np.float32)
        t[c + "pointwise_conv2.weight"] = r(h, h, 1)
        t[c + "pointwise_conv2.bias"] = r(h)
    t.update(
        {
            "decoder.embed.weight": r(vocab, pred_hidden),
            "decoder.lstm.0.weight_ih": r(4 * pred_hidden, pred_hidden),
            "decoder.lstm.0.weight_hh": r(4 * pred_hidden, pred_hidden),
            "decoder.lstm.0.bias_ih": r(4 * pred_hidden),
            "decoder.lstm.0.bias_hh": r(4 * pred_hidden),
            "joint.enc.weight": r(joint, h),
            "joint.enc.bias": r(joint),
            "joint.pred.weight": r(joint, pred_hidden),
            "joint.pred.bias": r(joint),
            "joint.out.weight": r(vocab + 1 + ndur, joint),
            "joint.out.bias": r(vocab + 1 + ndur),
        }
    )
    os.makedirs(d, exist_ok=True)
    save_file(t, os.path.join(d, "model.safetensors"))
    json.dump(
        {
            "model_type": "parakeet_tdt",
            "encoder_config": enc,
            "vocab_size": vocab,
            "durations": [0, 1, 2, 3, 4],
            "pred_hidden": pred_hidden,
            "pred_rnn_layers": 1,
            "joint_hidden": joint,
        },
        open(os.path.join(d, "config.json"), "w"),
    )


if __name__ == "__main__":
    secs = float(sys.argv[1]) if len(sys.argv) > 1 else 120.0
    d = "/tmp/parakeet_tdt_06b"
    if not os.path.exists(os.path.join(d, "model.safetensors")):
        build(d)
        print("checkpoint built:", d, file=sys.stderr)
    from vllm_mlx_tpu.benchmark import bench_stt

    row = bench_stt(d, audio_seconds=secs)
    print(json.dumps(row))

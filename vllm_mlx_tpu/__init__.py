# SPDX-License-Identifier: Apache-2.0
"""vllm-mlx-tpu: TPU-native multimodal inference server.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the reference
vllm-mlx project (continuous batching, paged/trie/tiered KV caching,
OpenAI + Anthropic APIs, tool calling, structured output, speculative
decoding, audio/vision/embedding/rerank endpoints) designed for TPU:
SPMD over device meshes, one precompiled fixed-slot decode step, paged
HBM KV pools, and Pallas kernels on the hot paths.
"""

__version__ = "0.1.0"

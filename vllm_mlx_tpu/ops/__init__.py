# SPDX-License-Identifier: Apache-2.0
"""TPU compute ops: layers, paged attention, sampling, quantization."""

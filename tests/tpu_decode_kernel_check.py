# SPDX-License-Identifier: Apache-2.0
"""On-chip decode-attention kernel check + chained micro-timing.

Run on the real TPU (no conftest; fresh process on the axon platform):
    python tests/tpu_decode_kernel_check.py [bpc] [block_size]

Correctness: kernel vs the XLA reference at 8B-geometry decode shapes
(bf16 + int8 pools). Timing: 36 CHAINED kernel calls (out feeds the
next q) ≈ one decode step's attention side; chained on-device
dependencies + one final fetch is the only trustworthy timing shape on
this tunneled platform (NOTES_TPU_ENV.md).
"""

import functools
import os
import sys
import time

import numpy as np

if len(sys.argv) > 1:
    os.environ["VLLM_MLX_TPU_DECODE_BPC"] = sys.argv[1]

import jax
import jax.numpy as jnp

from vllm_mlx_tpu.core.model_runner import (
    enable_persistent_compilation_cache,
)

enable_persistent_compilation_cache()

PS = int(sys.argv[2]) if len(sys.argv) > 2 else 32


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    from vllm_mlx_tpu.ops.decode_attention_pallas import (
        decode_paged_attention,
    )
    from vllm_mlx_tpu.ops.ragged_attention import ragged_attention_xla

    rng = np.random.default_rng(0)
    S, QH, KVH, HD = 32, 32, 8, 128
    P = 4096 // PS  # 4096 pooled tokens
    W = 2048 // PS // 4  # table width: max ctx 512
    scale = HD ** -0.5

    q = jnp.asarray(
        rng.standard_normal((S, QH, HD), dtype=np.float32), jnp.bfloat16
    )
    pages_f = rng.standard_normal((P, PS, 2 * KVH, HD), dtype=np.float32)
    kv_lens = jnp.asarray(
        rng.integers(1, W * PS, size=(S,)), jnp.int32
    )
    tables = jnp.asarray(
        rng.integers(0, P, size=(S, W)), jnp.int32
    )
    cu = jnp.asarray(np.arange(S + 1), jnp.int32)
    ns = jnp.asarray([S], jnp.int32)

    for name, pages, ks, vs in [
        ("bf16", jnp.asarray(pages_f, jnp.bfloat16), None, None),
        (
            "int8",
            jnp.clip(jnp.round(jnp.asarray(pages_f) / 0.05), -127, 127
                     ).astype(jnp.int8),
            0.05,
            0.05,
        ),
    ]:
        ours = decode_paged_attention(
            q, pages, kv_lens, tables, scale, k_scale=ks, v_scale=vs
        )
        ref = ragged_attention_xla(
            q, pages, kv_lens, tables, cu, ns, scale,
            k_scale=ks, v_scale=vs,
        )
        err = float(
            jnp.max(jnp.abs(ours.astype(jnp.float32) - ref.astype(jnp.float32)))
        )
        log(f"{name}: max abs err {err:.4g}")
        assert err < (1e-2 if name == "bf16" else 2e-2), (name, err)

    # chained timing: 36 dependent calls (one step's worth of layers)
    pages_i8 = jnp.clip(
        jnp.round(jnp.asarray(pages_f) / 0.05), -127, 127
    ).astype(jnp.int8)

    @jax.jit
    def chain(q0):
        x = q0
        for _ in range(36):
            x = decode_paged_attention(
                x, pages_i8, kv_lens, tables, scale,
                k_scale=0.05, v_scale=0.05,
            )
        return x

    r = chain(q)
    r.block_until_ready()
    best = 1e9
    for _ in range(6):
        t0 = time.perf_counter()
        out = chain(q)
        np.asarray(out)  # real fetch = real sync
        best = min(best, time.perf_counter() - t0)
    from vllm_mlx_tpu.ops import decode_attention_pallas as dap

    log(
        f"36 chained calls: {1e3*best:.2f} ms total, "
        f"{1e6*best/36:.1f} us/call (sb={dap.SEQ_BLOCK}, "
        f"bpc={dap.PAGES_PER_CHUNK}, batched={dap.BATCHED_HEADS}, ps={PS})"
    )


if __name__ == "__main__":
    main()

"""On-chip parity: fused decode attention+write vs scatter-then-attend."""
import numpy as np
import jax, jax.numpy as jnp
import sys
sys.path.insert(0, "/root/repo")
from vllm_mlx_tpu.ops.decode_attention_pallas import (
    decode_paged_attention, decode_paged_attention_write)
from vllm_mlx_tpu.ops.ragged_attention import write_kv_pages

rng = np.random.default_rng(0)
for kv_scale, tag in ((None, "bf16"), (0.05, "int8")):
    S, qh, kvh, hd, ps, P, B = 32, 32, 8, 128, 32, 128, 4
    q = jnp.asarray(rng.standard_normal((S, qh, hd)), jnp.bfloat16)
    pages = jnp.asarray(rng.standard_normal((P, ps, 2*kvh, hd)) * 0.5, jnp.bfloat16)
    if kv_scale is not None:
        pages = jnp.clip(jnp.round(pages.astype(jnp.float32)/kv_scale), -127, 127).astype(jnp.int8)
    lens = jnp.asarray(rng.integers(1, B*ps, S), jnp.int32).at[3].set(0)
    tables = jnp.asarray(rng.permutation(P)[:S*B].reshape(S, B), jnp.int32)
    kv_new = jnp.asarray(rng.standard_normal((S, 2*kvh, hd)), jnp.bfloat16)
    pos = jnp.maximum(lens-1, 0)
    dest = tables[jnp.arange(S), pos//ps]*ps + pos%ps
    kv_dest = jnp.where(lens > 0, dest, P*ps)
    ref_pages = write_kv_pages(pages, kv_new, kv_dest, kv_scale)
    ref_out = decode_paged_attention(q, ref_pages, lens, tables, 0.125,
                                     k_scale=kv_scale, v_scale=kv_scale)
    got_out, got_pages = decode_paged_attention_write(
        q, pages, kv_new, lens, tables, 0.125, k_scale=kv_scale, v_scale=kv_scale)
    mask = np.asarray(lens) > 0
    d_out = np.max(np.abs(np.asarray(got_out, np.float32)[mask] - np.asarray(ref_out, np.float32)[mask]))
    d_pages = np.max(np.abs(np.asarray(got_pages, np.float32) - np.asarray(ref_pages, np.float32)))
    print(f"{tag}: max|out diff|={d_out:.2e} max|pages diff|={d_pages:.2e}")
    assert d_pages == 0.0, "pool rows differ"
    assert d_out < (2e-2 if kv_scale is None else 5e-2), "attention differs"
print("ON-CHIP PARITY OK")

"""Packed-mask attention perf: windowed_attention over a packed (1-bit
S01 mask, unpacked in-kernel) vs unpacked (bf16 mask stream) diag graph.

    GWEN_ATTN_MP_LEVELS=7,8 python benchmarks/probe_attn_mp.py
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from gwen_tpu.graph import build_graph, to_diag_window
    from gwen_tpu.ops.attention_pallas import windowed_attention
    from gwen_tpu.profiling import scan_timeit

    levels = [int(v) for v in os.environ.get(
        "GWEN_ATTN_MP_LEVELS", "7").split(",")]
    feats = int(os.environ.get("GWEN_ATTN_MP_FEATURES", "256"))
    iters = int(os.environ.get("GWEN_ATTN_MP_ITERS", "20"))

    for lv in levels:
        cache = f"/tmp/gwen_bench_mesh_kd_L{lv}.npz"
        if os.path.exists(cache):
            z = np.load(cache)
            s, r, n = z["s"], z["r"], int(z["n"])
        else:
            from gwen_tpu.graph import (apply_order, icosphere_edges,
                                        kd_patch_order)

            verts, s, r = icosphere_edges(lv)
            n = verts.shape[0]
            perm = kd_patch_order(verts, s, r, n)
            s, r, _ = apply_order(perm, s, r)
            np.savez(cache, s=s, r=r, n=n)
        g = build_graph(s, r, n)
        x = jax.random.normal(jax.random.key(0), (n, feats), jnp.bfloat16)
        for packed in (False, True):
            dw = jax.device_put(to_diag_window(
                g, window_size=384, dtype=jnp.bfloat16, device_build=True,
                packed=packed, transpose_tables=True))

            def fwd(xx, gr):
                return windowed_attention(gr, xx, xx, xx).astype(xx.dtype)

            def vjp(xx, gr):
                return jax.grad(lambda q: jnp.sum(
                    windowed_attention(gr, q, q, q).astype(jnp.float32) ** 2
                ))(xx)

            t_f = scan_timeit(fwd, x, dw, iters=iters)["mean_s"]
            t_b = scan_timeit(vjp, x, dw, iters=max(iters // 2, 5))["mean_s"]
            print(json.dumps({
                "probe": "attn_mp", "levels": lv, "feats": feats,
                "mask_packed": packed,
                "edges": g.num_edges,
                "fwd_ms": round(t_f * 1e3, 3),
                "vjp_ms": round(t_b * 1e3, 3),
            }), flush=True)


if __name__ == "__main__":
    main()

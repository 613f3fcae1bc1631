"""TPU golden + perf probe for lane-packed attention heads.

Golden: packed windowed_attention (fwd + q/k/v grads) vs the same
sub-heads run unpacked through the production kernels, at pinned matmul
precision, on a small mesh. Perf: graph_attention_apply layer fwd + vjp
at L7 for heads ∈ {2, 4} with pack on/off (scan harness).

    GWEN_PACK_LEVELS=7 GWEN_PACK_PERF=1 python benchmarks/probe_pack.py
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _mesh(levels: int):
    cache = f"/tmp/gwen_bench_mesh_kd_L{levels}.npz"
    if os.path.exists(cache):
        z = np.load(cache)
        return z["s"], z["r"], int(z["n"])
    from gwen_tpu.graph import apply_order, icosphere_edges, kd_patch_order

    verts, s, r = icosphere_edges(levels)
    n = verts.shape[0]
    perm = kd_patch_order(verts, s, r, n)
    s, r, _ = apply_order(perm, s, r)
    np.savez(cache, s=s, r=r, n=n)
    return s, r, n


def golden(levels: int = 5) -> None:
    import jax
    import jax.numpy as jnp

    from gwen_tpu.graph import build_graph, to_diag_window
    from gwen_tpu.ops.attention_pallas import windowed_attention

    s, r, n = _mesh(levels)
    g = build_graph(s, r, n)
    dw = jax.device_put(to_diag_window(g, window_size=384, dtype=jnp.bfloat16,
                                       device_build=True,
                                       transpose_tables=True))
    rng = np.random.default_rng(0)
    dh = 64
    scale = 1.0 / np.sqrt(dh)
    parts = [jnp.asarray(rng.normal(size=(n, dh)).astype(np.float32))
             for _ in range(6)]
    pads = [jnp.concatenate([p0, p1], axis=-1)
            for p0, p1 in zip(parts[:3], parts[3:])]  # (n, 128) packed

    with jax.default_matmul_precision("highest"):
        def f_packed(q, k, v):
            return windowed_attention(dw, q, k, v, scale=scale, pack=True)

        def f_ref(q0, k0, v0, q1, k1, v1):
            o0 = windowed_attention(dw, q0, k0, v0, scale=scale)
            o1 = windowed_attention(dw, q1, k1, v1, scale=scale)
            return jnp.concatenate([o0, o1], axis=-1)

        out_p = jax.jit(f_packed)(*pads)
        out_r = jax.jit(f_ref)(*parts[:3], *parts[3:])
        err_fwd = float(jnp.max(jnp.abs(out_p - out_r)))

        def loss_p(q, k, v):
            return jnp.sum(jnp.sin(f_packed(q, k, v)))

        def loss_r(q0, k0, v0, q1, k1, v1):
            return jnp.sum(jnp.sin(f_ref(q0, k0, v0, q1, k1, v1)))

        gp = jax.jit(jax.grad(loss_p, argnums=(0, 1, 2)))(*pads)
        gr = jax.jit(jax.grad(loss_r, argnums=tuple(range(6))))(
            *parts[:3], *parts[3:])
        errs = {}
        for i, name in enumerate("qkv"):
            ref = jnp.concatenate([gr[i], gr[i + 3]], axis=-1)
            errs[name] = float(jnp.max(jnp.abs(gp[i] - ref)))
    print(json.dumps({"probe": "pack_golden", "levels": levels,
                      "err_fwd": err_fwd, **{f"err_d{k}": v
                                             for k, v in errs.items()},
                      "backend": jax.default_backend()}), flush=True)


def perf(levels: int = 7, latent: int = 256) -> None:
    import jax
    import jax.numpy as jnp

    from gwen_tpu.graph import build_graph, to_diag_window
    from gwen_tpu.nn.attention import (graph_attention_apply,
                                       graph_attention_init)
    from gwen_tpu.profiling import scan_timeit

    s, r, n = _mesh(levels)
    g = build_graph(s, r, n)
    dw = jax.device_put(to_diag_window(g, window_size=384, dtype=jnp.bfloat16,
                                       device_build=True,
                                       transpose_tables=True))
    x = jax.random.normal(jax.random.key(0), (n, latent), jnp.bfloat16)
    for heads in (2, 4, 8):
        for pack in ((False, True) if heads > 2 else (False,)):
            params = graph_attention_init(jax.random.key(1), latent,
                                          heads=heads)
            params = jax.tree.map(
                lambda a: jnp.asarray(a, jnp.bfloat16), params)

            def layer(xx, p, dw=dw, heads=heads, pack=pack):
                return graph_attention_apply(p, dw, xx, heads=heads,
                                             pack=pack)

            def vjp_layer(xx, p, dw=dw, heads=heads, pack=pack):
                return jax.grad(lambda q: jnp.sum(
                    graph_attention_apply(p, dw, q, heads=heads,
                                          pack=pack).astype(jnp.float32) ** 2
                ))(xx)

            t_f = scan_timeit(layer, x, params, iters=30)["mean_s"]
            t_b = scan_timeit(vjp_layer, x, params, iters=20)["mean_s"]
            print(json.dumps({
                "probe": "pack_perf", "levels": levels, "latent": latent,
                "heads": heads, "pack": bool(pack),
                "layer_fwd_ms": round(t_f * 1e3, 3),
                "layer_vjp_ms": round(t_b * 1e3, 3),
                "ts": time.time(),
            }), flush=True)


def main() -> None:
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    golden(int(os.environ.get("GWEN_PACK_GOLDEN_LEVELS", "5")))
    if os.environ.get("GWEN_PACK_PERF"):
        perf(int(os.environ.get("GWEN_PACK_LEVELS", "7")))


if __name__ == "__main__":
    main()

"""Single-aggregation layout shootout on the real TPU (one JSON line per run).

Compares the production layouts at one mesh level — sliding-ring (v4.1,
full RCM band), bit-packed (v5), and the diagonal-window superblock layout
(v6, narrow KD-patch windows + escape fixup) across window/superblock
choices — using the honest scan-chain timer (``gwen_tpu.profiling
.scan_timeit``; see CLAUDE.md "Benchmark timing").

    GWEN_CMP_LEVELS=7 GWEN_CMP_LAYOUTS=sliding,diag:384:8 python \
        benchmarks/kernel_compare.py

Layout specs: ``sliding`` | ``packed`` | ``sdense`` | ``ell`` |
``diag:<window>:<superblock>`` | ``sliding_esc:<window>`` (escape-window
sliding). Diag/escape variants use the KD-patch ordering; the rest use RCM.
Each run also reports the escape edge count and the fixup-only cost (the
composite minus the core kernel) where applicable.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _mesh(levels: int, ordering: str):
    """Edge list under the requested ordering, cached in /tmp (mesh builds
    are minutes at L9 host-side)."""
    cache = (
        f"/tmp/gwen_bench_mesh_L{levels}.npz"
        if ordering == "rcm"
        else f"/tmp/gwen_bench_mesh_{ordering}_L{levels}.npz"
    )
    if os.path.exists(cache):
        z = np.load(cache)
        return z["s"], z["r"], int(z["n"])
    from gwen_tpu.graph import apply_order, icosphere_edges, kd_patch_order, rcm_order

    verts, s, r = icosphere_edges(levels)
    n = verts.shape[0]
    if ordering == "rcm":
        perm = rcm_order(s, r, n)
    else:  # kd
        perm = kd_patch_order(verts, s, r, n)
    s, r, _ = apply_order(perm, s, r)
    np.savez(cache, s=s, r=r, n=n)
    return s, r, n


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    levels = int(os.environ.get("GWEN_CMP_LEVELS", "7"))
    feats = int(os.environ.get("GWEN_CMP_FEATURES", "256"))
    iters = int(os.environ.get("GWEN_CMP_ITERS", "50"))
    dtype = (
        jnp.bfloat16
        if os.environ.get("GWEN_CMP_DTYPE", "bf16") == "bf16"
        else jnp.float32
    )
    specs = os.environ.get("GWEN_CMP_LAYOUTS", "sliding,diag:384:8").split(",")

    from gwen_tpu.graph import (
        build_graph,
        to_block_ell,
        to_diag_window,
        to_sliding_dense,
        to_sliding_packed,
        to_windowed_dense,
    )
    from gwen_tpu.ops.spmm_pallas import (
        _spmm_diag_window_core,
        _spmm_sliding_dense_core,
        spmm_block_ell,
        spmm_diag_window,
        spmm_sliding_dense,
        spmm_sliding_packed,
        spmm_windowed_dense,
    )
    from gwen_tpu.profiling import scan_timeit

    key = jax.random.key(0)

    for spec in specs:
        parts = spec.strip().split(":")
        name = parts[0]
        ordering = ("kd" if name in ("diag", "diag_packed", "sliding_esc",
                                     "attn") else "rcm")
        s, r, n = _mesh(levels, ordering)
        g = build_graph(s, r, n)
        edges = g.num_edges
        x = jax.random.normal(key, (n, feats), jnp.float32).astype(dtype)

        core = None
        escapes = 0
        if name == "sliding":
            pg = to_sliding_dense(g, dtype=dtype, device_build=True)
            agg = spmm_sliding_dense
            window = pg.window_size
            s_bytes = int(np.prod(pg.s_mat.shape)) * jnp.dtype(dtype).itemsize
        elif name == "sliding_esc":
            w = int(parts[1])
            pg = to_sliding_dense(
                g, dtype=dtype, device_build=True, window_size=w
            )
            agg = spmm_sliding_dense
            core = _spmm_sliding_dense_core
            window = pg.window_size
            escapes = pg.escape.num_edges if pg.escape is not None else 0
            s_bytes = int(np.prod(pg.s_mat.shape)) * jnp.dtype(dtype).itemsize
        elif name in ("diag", "diag_packed"):
            w, sb = int(parts[1]), int(parts[2])
            pg = to_diag_window(
                g, window_size=w, superblock=sb, dtype=dtype,
                device_build=True, packed=(name == "diag_packed"),
            )
            agg = spmm_diag_window
            core = _spmm_diag_window_core
            window = pg.window_size
            escapes = pg.escape.num_edges if pg.escape is not None else 0
            s_bytes = (int(np.prod(pg.s_pack.shape))
                       if name == "diag_packed"
                       else int(np.prod(pg.s_mat.shape))
                       * jnp.dtype(dtype).itemsize)
        elif name == "packed":
            pg = to_sliding_packed(g, device_build=True)
            agg = spmm_sliding_packed
            window = pg.window_size
            s_bytes = int(np.prod(pg.packed.shape))
        elif name == "sdense":
            pg = to_windowed_dense(g, dtype=dtype, device_build=True)
            agg = spmm_windowed_dense
            window = pg.window_size
            s_bytes = int(np.prod(pg.s_mat.shape)) * jnp.dtype(dtype).itemsize
        elif name == "ell":
            pg = to_block_ell(g)
            agg = spmm_block_ell
            window = pg.window_size
            s_bytes = int(pg.nbr.size * (4 + 4))
        elif name == "attn":
            # Fused windowed attention (q = k = v = the carried state) —
            # not an aggregation layout, but the shootout's honest timer
            # and mesh cache make this the right home for its number.
            from gwen_tpu.graph import diag_transpose_tables
            from gwen_tpu.ops.attention_pallas import windowed_attention

            w, sb = (int(parts[1]), int(parts[2])) if len(parts) > 2 else (384, 8)
            pg = to_diag_window(
                g, window_size=w, superblock=sb, dtype=dtype,
                device_build=True,
            )
            pg = diag_transpose_tables(pg)

            def agg(graph, c):
                return windowed_attention(graph, c, c, c)

            window = pg.window_size
            escapes = pg.escape.num_edges if pg.escape is not None else 0
            s_bytes = int(np.prod(pg.s_mat.shape)) * jnp.dtype(dtype).itemsize
        else:
            raise SystemExit(f"unknown layout spec {spec!r}")

        pg = jax.device_put(pg)
        t = scan_timeit(lambda c, gg: agg(gg, c), x, pg, iters=iters)["mean_s"]
        t_core = (
            scan_timeit(lambda c, gg: core(gg, c), x, pg, iters=iters)["mean_s"]
            if core is not None and escapes
            else None
        )
        print(
            json.dumps(
                {
                    "layout": spec.strip(),
                    "level": levels,
                    "nodes": n,
                    "edges": edges,
                    "feats": feats,
                    "dtype": jnp.dtype(dtype).name,
                    "window": int(window),
                    "escapes": int(escapes),
                    "esc_frac": round(escapes / edges, 4),
                    "s_mbytes": round(s_bytes / 2**20, 1),
                    "ms": round(t * 1e3, 3),
                    "core_ms": (round(t_core * 1e3, 3) if t_core else None),
                    "gedges_per_s": round(edges / t / 1e9, 3),
                    "ts": round(time.time(), 1),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()

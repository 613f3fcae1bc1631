"""Isolate the in-kernel S01 unpack cost of the packed diag kernel.

The packed layout cut the S stream 16x (786 → 49 KB/step) but L9 agg only
improved 18.7 → 16.5 ms — far short of the bytes-ratio projection. This
probe times the SAME production core three ways in fresh jit traces:

* ``base``     — unpacked diag (bf16 S stream), the reference point
* ``packed``   — production packed path (S01 stream + in-kernel unpack)
* ``nounpack`` — packed path with ``_unpack_s01`` stubbed to a constant
  (S01 still streams; the ~4-pass VPU unpack per tile is removed) —
  ``packed − nounpack`` = pure unpack cost on the critical path.

Numerics of ``nounpack`` are garbage by design; only the timing matters.

    GWEN_UNPACK_LEVELS=9 GWEN_UNPACK_MODE=nounpack python \
        benchmarks/probe_unpack.py
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
    from gwen_tpu.ops import spmm_pallas as sp
    from gwen_tpu.profiling import scan_timeit

    levels = int(os.environ.get("GWEN_UNPACK_LEVELS", "7"))
    mode = os.environ.get("GWEN_UNPACK_MODE", "packed")
    feats = int(os.environ.get("GWEN_UNPACK_FEATURES", "256"))
    iters = int(os.environ.get("GWEN_UNPACK_ITERS", "20"))

    cache = f"/tmp/gwen_bench_mesh_kd_L{levels}.npz"
    if os.path.exists(cache):
        z = np.load(cache)
        s, r, n = z["s"], z["r"], int(z["n"])
    else:
        from gwen_tpu.graph import apply_order, icosphere_edges, kd_patch_order

        verts, s, r = icosphere_edges(levels)
        n = verts.shape[0]
        perm = kd_patch_order(verts, s, r, n)
        s, r, _ = apply_order(perm, s, r)
        np.savez(cache, s=s, r=r, n=n)
    g = build_graph(s, r, n)

    if mode == "nounpack":
        def _stub(packed, block, ring_rows, out_dtype):
            del packed
            return jnp.full((block, ring_rows), 0.01, out_dtype)
        sp._unpack_s01 = _stub

    pg = to_diag_window(g, window_size=384, dtype=jnp.bfloat16, device_build=True,
                        packed=(mode not in ("base", "noesc")))
    if mode.startswith("noesc"):
        # Strip the escape machinery entirely (numerically wrong — ~2% of
        # edges dropped; timing-only): isolates the windowed core from the
        # esc2 contraction + fix DMA + in-kernel placement.
        pg = pg.replace(escape=None, esc_start=None, esc_lrow=None,
                        esc_cnt_pad=0, esc2_graph=None, esc2_src=None,
                        esc2_back=None)
    pg = jax.device_put(pg)
    rows = pg.num_src_rows if os.environ.get("GWEN_UNPACK_PREPAD") else n
    x = jax.random.normal(jax.random.key(0), (rows, feats), jnp.bfloat16)

    t = scan_timeit(lambda xx, gr: sp._spmm_diag_window_core(gr, xx),
                    x, pg, iters=iters)["mean_s"]
    print(json.dumps({
        "probe": "unpack", "mode": mode, "levels": levels, "nodes": n,
        "edges": g.num_edges, "feats": feats,
        "ms": round(t * 1e3, 3),
        "backend": jax.default_backend(),
    }), flush=True)


if __name__ == "__main__":
    main()

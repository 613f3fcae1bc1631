"""Partitioned (shard_map + halo) EPD train-step benchmark on real TPU.

Round-2 target (round-1 verdict #1): the flagship sliding-ring kernel must
ride the partitioned path at near-global speed. On the single available chip
this runs ``Mesh(data=1, graph=1)`` — the halo exchange degenerates but the
Pallas kernel compiles and executes INSIDE shard_map, exactly the multi-chip
compute path — and compares against the global (non-partitioned) step.

Usage: python benchmarks/partitioned_bench.py [level]   (default 7)
Env: GWEN_PB_LAYOUT (sliding|dense|ell|diag), GWEN_PB_ITERS,
GWEN_PB_BATCH (leading batch per device; exercises the batched halo
kernels), GWEN_PB_PROCESSOR (gcn|interaction|attention).

Prints one JSON line: {"partitioned_step_ms", "global_step_ms", "ratio", ...}.
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
    import optax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache"))
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass

    from gwen_tpu.graph import (
        apply_order, build_graph, icosphere_edges, rcm_order, to_sliding_dense,
    )
    from gwen_tpu.nn import EncodeProcessDecode
    from gwen_tpu.parallel import make_partitioned_apply, partition_graph
    from gwen_tpu.profiling import scan_timeit
    from gwen_tpu.train import TrainState, make_mesh

    level = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    layout = os.environ.get("GWEN_PB_LAYOUT", "diag")
    iters = int(os.environ.get("GWEN_PB_ITERS", "20"))
    batch = int(os.environ.get("GWEN_PB_BATCH", "1"))
    processor = os.environ.get("GWEN_PB_PROCESSOR", "gcn")
    feats, latent, steps = 256, 256, 4

    ordering = "kd" if layout == "diag" else "rcm"
    cache = (
        f"/tmp/gwen_bench_mesh_L{level}.npz"
        if ordering == "rcm"
        else f"/tmp/gwen_bench_mesh_{ordering}_L{level}.npz"
    )
    if os.path.exists(cache):
        z = np.load(cache)
        s, r, n = z["s"], z["r"], int(z["n"])
    else:
        from gwen_tpu.graph import kd_patch_order

        verts, s, r = icosphere_edges(level)
        n = verts.shape[0]
        perm = (kd_patch_order(verts, s, r, n) if ordering == "kd"
                else rcm_order(s, r, n))
        s, r, _ = apply_order(perm, s, r)
        np.savez(cache, s=s, r=r, n=n)

    n_dev = len(jax.devices())
    on_tpu = jax.default_backend() == "tpu"
    mesh = make_mesh(data=1, graph=n_dev)
    pg = partition_graph(
        s, r, n, num_parts=n_dev, reorder=False, layout=layout,
        s_dtype=jnp.bfloat16,
        device_build=(on_tpu and layout in ("sliding", "diag")),
    )

    model = EncodeProcessDecode(
        channels_in=feats, channels_out=feats, latent_size=latent,
        process_steps=steps, compute_dtype=jnp.bfloat16,
        processor=processor,
    )
    params = model.init(jax.random.key(0))
    opt = optax.adam(1e-4)

    apply_fn = make_partitioned_apply(model, pg, mesh)
    tables = apply_fn.tables

    shape = ((batch, pg.padded_nodes, feats) if batch > 1
             else (pg.padded_nodes, feats))
    xp = jax.random.normal(jax.random.key(1), shape, jnp.float32)
    yp = xp * 0.9

    def part_step(st, tabs, xx, yy):
        def loss(p):
            pred = apply_fn(p, xx, tabs)
            return jnp.mean((pred - yy) ** 2)

        lval, grads = jax.value_and_grad(loss)(st.params)
        updates, opt_state = opt.update(grads, st.opt_state, st.params)
        return TrainState(params=optax.apply_updates(st.params, updates),
                          opt_state=opt_state, step=st.step + 1)

    t_part = scan_timeit(part_step, TrainState.create(params, opt),
                         tables, xp, yp, iters=iters)["mean_s"]

    # Global (non-partitioned) reference step with the same kernel family.
    g = build_graph(s, r, n)
    if not on_tpu:
        graph = g
    elif layout == "diag":
        from gwen_tpu.graph import to_diag_window

        graph = to_diag_window(g, window_size=384, dtype=jnp.bfloat16,
                               device_build=True,
                               transpose_tables=(processor == "attention"),
                               n_pad=pg.num_parts * pg.n_local)
    else:
        graph = to_sliding_dense(g, dtype=jnp.bfloat16, device_build=True)
    graph = jax.device_put(graph)
    xg = xp[..., :n, :]
    yg = yp[..., :n, :]

    def glob_step(st, gr, xx, yy):
        def loss(p):
            pred = model.apply(p, gr, xx)
            return jnp.mean((pred - yy) ** 2)

        lval, grads = jax.value_and_grad(loss)(st.params)
        updates, opt_state = opt.update(grads, st.opt_state, st.params)
        return TrainState(params=optax.apply_updates(st.params, updates),
                          opt_state=opt_state, step=st.step + 1)

    t_glob = scan_timeit(glob_step, TrainState.create(params, opt),
                         graph, xg, yg, iters=iters)["mean_s"]

    edges = g.num_edges
    print(json.dumps({
        "metric": "partitioned_train_step_ms",
        "level": level, "nodes": n, "edges": edges, "layout": layout,
        "batch": batch, "processor": processor,
        "mesh": {"data": 1, "graph": n_dev},
        "value": round(t_part * 1e3, 3), "unit": "ms",
        "global_step_ms": round(t_glob * 1e3, 3),
        "ratio_vs_global": round(t_part / t_glob, 3),
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()

"""Scaling sweep over the BASELINE.json configs (what fits one chip).

Measures forward and full-training-step time of the encode-process-decode
model at increasing mesh sizes, with the kernel chosen per scale:

* streamed-S (``WindowedDenseGraph``) where the S matrix fits HBM,
* blocked-ELL otherwise (tables are O(edges), not O(N × bandwidth)).

Writes one JSON object per config to stdout. Multi-host configs (BASELINE
configs 4-5 at full scale) need a pod slice; their sharding/collective path is
validated by ``__graft_entry__.dryrun_multichip`` and tests/test_parallel.py
on a virtual CPU mesh.

Usage: python benchmarks/scaling.py [levels ...]   (default: 5 6 7 8)
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def bench_level(levels: int, feats: int = 256, latent: int = 256,
                steps: int = 4, iters: int = 20, batch: int = 1) -> dict:
    import jax
    import jax.numpy as jnp
    import optax

    from gwen_tpu.graph import (
        apply_order, build_graph, icosphere_edges, rcm_order,
        to_block_ell, to_windowed_dense,
    )
    from gwen_tpu.nn import EncodeProcessDecode
    from gwen_tpu.train import TrainState

    cache = f"/tmp/gwen_bench_mesh_L{levels}.npz"
    if os.path.exists(cache):
        z = np.load(cache)
        s, r, n = z["s"], z["r"], int(z["n"])
    else:
        verts, s, r = icosphere_edges(levels)
        n = verts.shape[0]
        perm = rcm_order(s, r, n)
        s, r, _ = apply_order(perm, s, r)
        np.savez(cache, s=s, r=r, n=n)
    g = build_graph(s, r, n)
    edges = g.num_edges

    # Kernel selection: streamed-S while S fits comfortably in HBM.
    wd_bytes = ((n + 127) // 128 * 128) * 2  # per window column, bf16
    be = to_block_ell(g)
    s_mat_bytes = be.num_padded_nodes * be.window_size * 2
    # Threshold reflects placement cost too (host->device transfer of S);
    # above it, the memory-light ELL kernel wins on wall-clock setup.
    if s_mat_bytes < int(1.5 * 2**30):
        graph = to_windowed_dense(g)
        graph = graph.replace(
            s_mat=np.asarray(graph.s_mat, np.float32).astype(jnp.bfloat16)
        )
        kernel = "sdense"
    else:
        graph = be
        kernel = "ell"
    graph = jax.device_put(graph)  # containers hold numpy; place once

    model = EncodeProcessDecode(
        channels_in=feats, channels_out=feats, latent_size=latent,
        process_steps=steps, compute_dtype=jnp.bfloat16,
    )
    params = model.init(jax.random.key(0))
    opt = optax.adam(1e-4)
    state = TrainState.create(params, opt)

    shape = (batch, n, feats) if batch > 1 else (n, feats)
    # Generate on device — host->device transfers are slow in this env.
    x = jax.random.normal(jax.random.key(0), shape, jnp.float32)
    y = x * 0.9

    fwd = jax.jit(lambda p, gr, v: model.apply(p, gr, v))

    def train_step(st, gr, xx, yy):
        def loss(p):
            pred = model.apply(p, gr, xx)
            return jnp.mean((pred - yy) ** 2)

        lval, grads = jax.value_and_grad(loss)(st.params)
        updates, opt_state = opt.update(grads, st.opt_state, st.params)
        import optax as _o

        return TrainState(params=_o.apply_updates(st.params, updates),
                          opt_state=opt_state, step=st.step + 1), lval

    step = jax.jit(train_step, donate_argnums=(0,))

    def timed(fn, *args, donate_state=False):
        out = fn(*args)
        jax.block_until_ready(out)
        if donate_state:  # re-make state each timing? measure via chaining
            st = out[0]
            t0 = time.perf_counter()
            for _ in range(iters):
                st, l = fn(st, *args[1:])
            jax.block_until_ready(st)
            return (time.perf_counter() - t0) / iters
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters

    t_fwd = timed(fwd, state.params, graph, x)
    t_step = timed(step, state, graph, x, y, donate_state=True)
    eff_edges = edges * max(batch, 1) * steps  # per fwd pass
    return {
        "levels": levels,
        "nodes": n,
        "edges": edges,
        "batch": batch,
        "kernel": kernel,
        "fwd_ms": round(t_fwd * 1e3, 3),
        "train_step_ms": round(t_step * 1e3, 3),
        "fwd_edges_per_s": round(eff_edges / t_fwd, 1),
        "train_edges_per_s": round(eff_edges * 3 / t_step, 1),  # fwd+bwd≈3x fwd aggs
    }


def main() -> None:
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache"))
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass
    levels = [int(a) for a in sys.argv[1:]] or [5, 6, 7]
    for lv in levels:
        res = bench_level(lv)
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()

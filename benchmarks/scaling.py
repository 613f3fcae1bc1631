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
        to_block_ell, to_sliding_dense, to_sliding_packed, to_windowed_dense,
    )
    from gwen_tpu.nn import EncodeProcessDecode
    from gwen_tpu.train import TrainState

    kernel = os.environ.get("GWEN_SCALING_KERNEL", "")
    if not kernel:
        # Diagonal-window (v6) over the KD-patch ordering: narrow streamed
        # windows (S bytes and matmul flops ∝ window, 4-7.7x below the RCM
        # full band) with the ~2% out-of-window edges placed in-kernel.
        # Measured fastest at every level: L7 agg 1.17 ms vs 1.71 sliding,
        # L8 5.96 vs 9.4, and it is the only streamed layout whose S fits
        # HBM at L9 un-packed.
        kernel = "diag"

    ordering = "kd" if kernel in ("diag", "diag_packed") else "rcm"
    cache = (
        f"/tmp/gwen_bench_mesh_L{levels}.npz"
        if ordering == "rcm"
        else f"/tmp/gwen_bench_mesh_{ordering}_L{levels}.npz"
    )
    if os.path.exists(cache):
        z = np.load(cache)
        s, r, n = z["s"], z["r"], int(z["n"])
    else:
        from gwen_tpu.graph import kd_patch_order

        verts, s, r = icosphere_edges(levels)
        n = verts.shape[0]
        perm = (kd_patch_order(verts, s, r, n) if ordering == "kd"
                else rcm_order(s, r, n))
        s, r, _ = apply_order(perm, s, r)
        np.savez(cache, s=s, r=r, n=n)
    g = build_graph(s, r, n)
    edges = g.num_edges

    # S is expanded *on device* from the compact O(edges) ELL tables
    # (device_build=True), so placement cost is O(edges) regardless of S
    # size — the memory budget (S + x + grads + opt state within ~16 GB
    # HBM) is the only limit.
    processor = os.environ.get("GWEN_SCALING_PROCESSOR", "gcn")
    if kernel in ("diag", "diag_packed"):
        from gwen_tpu.graph import to_diag_window

        window = int(os.environ.get("GWEN_SCALING_WINDOW", "384"))
        graph = to_diag_window(g, window_size=window, dtype=jnp.bfloat16,
                               device_build=True,
                               packed=(kernel == "diag_packed"),
                               transpose_tables=(processor == "attention"))
    elif kernel == "sdense":
        graph = to_windowed_dense(g, dtype=jnp.bfloat16, device_build=True)
    elif kernel == "sliding":
        graph = to_sliding_dense(g, dtype=jnp.bfloat16, device_build=True)
    elif kernel == "packed":
        graph = to_sliding_packed(g, device_build=True)
    else:
        graph = to_block_ell(g)
    graph = jax.device_put(graph)  # numpy leaves place once; S already on device

    model = EncodeProcessDecode(
        channels_in=feats, channels_out=feats, latent_size=latent,
        process_steps=steps, compute_dtype=jnp.bfloat16,
        remat=(lambda r: r if r.startswith(("save_agg", "nested"))
               else bool(int(r)))(
            os.environ.get("GWEN_SCALING_REMAT", "0")),
        processor=processor,
        attn_heads=int(os.environ.get("GWEN_SCALING_HEADS", "2")),
        attn_pack={"": None, "1": True, "0": False}[
            os.environ.get("GWEN_SCALING_PACK", "")],
    )
    params = model.init(jax.random.key(0))
    opt = optax.adam(1e-4)
    state = TrainState.create(params, opt)

    shape = (batch, n, feats) if batch > 1 else (n, feats)
    # Generate on device — host->device transfers are slow in this env.
    # bf16 inputs: the model computes in bf16 anyway, and f32 copies of the
    # L9 field (2.7 GB each) are what pushed the forward scan out of HBM.
    x = jax.random.normal(jax.random.key(0), shape, jnp.bfloat16)
    y = x * 0.9

    def train_step(st, gr, xx, yy):
        def loss(p):
            pred = model.apply(p, gr, xx)
            return jnp.mean((pred - yy) ** 2)

        lval, grads = jax.value_and_grad(loss)(st.params)
        updates, opt_state = opt.update(grads, st.opt_state, st.params)
        import optax as _o

        return TrainState(params=_o.apply_updates(st.params, updates),
                          opt_state=opt_state, step=st.step + 1), lval

    # On-device scan chain + difference-method readout — the only timing
    # scheme that is trustworthy on the remote (axon) runtime (a Python
    # dispatch chain pays ~1 ms issue cost per iteration; see
    # gwen_tpu.profiling.scan_timeit). Graph/params are scan-invariant jit
    # arguments, never closed-over constants.
    from gwen_tpu.profiling import scan_timeit

    t_fwd = scan_timeit(
        lambda xx, gr, p: model.apply(p, gr, xx), x, graph, state.params,
        iters=iters,
    )["mean_s"]
    if os.environ.get("GWEN_SCALING_FWD_ONLY"):
        # Regimes whose backward provably OOMs on one chip (L9 attention:
        # 17.65 GB needed vs 15.75 even with the packed mask) still get an
        # honest forward number; training there is the partitioned path.
        ee = edges * max(batch, 1) * steps
        return {
            "levels": levels, "nodes": n, "edges": edges, "batch": batch,
            "kernel": kernel, "processor": processor,
            "fwd_ms": round(t_fwd * 1e3, 3),
            "fwd_only": True,
            "fwd_edges_per_s": round(ee / t_fwd, 1),
        }
    t_grad = None
    if os.environ.get("GWEN_SCALING_SECTIONS"):
        # value_and_grad WITHOUT the optimizer — isolates backward cost
        # (step − grad ≈ adam update; grad − fwd ≈ pure backward).
        def grad_only(p, gr, xx, yy):
            def loss(pp):
                pred = model.apply(pp, gr, xx)
                return jnp.mean((pred - yy) ** 2)

            return jax.grad(loss)(p)

        t_grad = scan_timeit(grad_only, state.params, graph, x, y,
                             iters=iters)["mean_s"]
    t_step = scan_timeit(
        lambda st, gr, xx, yy: train_step(st, gr, xx, yy)[0],
        state, graph, x, y, iters=iters,
    )["mean_s"]
    eff_edges = edges * max(batch, 1) * steps  # per fwd pass
    return {
        "levels": levels,
        "nodes": n,
        "edges": edges,
        "batch": batch,
        "kernel": kernel,
        "processor": processor,
        "attn_heads": (model.attn_heads if processor == "attention"
                       else None),
        "attn_pack": (os.environ.get("GWEN_SCALING_PACK", "auto")
                      if processor == "attention" else None),
        "fwd_ms": round(t_fwd * 1e3, 3),
        "grad_ms": (round(t_grad * 1e3, 3) if t_grad is not None else None),
        "train_step_ms": round(t_step * 1e3, 3),
        "remat": str(os.environ.get("GWEN_SCALING_REMAT", "0")),
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
    batch = int(os.environ.get("GWEN_SCALING_BATCH", "1"))
    for lv in levels:
        res = bench_level(lv, batch=batch)
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()

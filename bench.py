"""Benchmark: Pallas SpMM aggregation throughput on the weather mesh.

Prints ONE JSON line ``{"metric", "value", "unit", "vs_baseline"}``.

Metric: edges/sec/chip of the fused gather-MMA-scatter aggregation on an
RCM-ordered icosahedral mesh (BASELINE.json headline: "edges/sec/chip
(SpMM)"). The reference publishes no numbers (BASELINE.md), so
``vs_baseline`` is measured against the stock XLA path on the same chip —
``jax.ops.segment_sum`` gather/scatter, which is what a naive JAX port of the
reference's torch-scatter aggregation would use.

Env knobs: GWEN_BENCH_LEVELS (icosphere refinement, default 7 ≈ 164k nodes /
983k directed edges), GWEN_BENCH_FEATURES (default 256), GWEN_BENCH_ITERS.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def _build(levels: int, ordering: str = "rcm"):
    """Build (and cache) the mesh graph tables under the given ordering
    (``rcm`` full-band, or ``kd`` patches for the diag-window layout)."""
    from gwen_tpu.graph import (
        apply_order,
        build_graph,
        icosphere_edges,
        kd_patch_order,
        rcm_order,
        to_block_ell,
    )

    cache = (
        f"/tmp/gwen_bench_mesh_L{levels}.npz"
        if ordering == "rcm"
        else f"/tmp/gwen_bench_mesh_{ordering}_L{levels}.npz"
    )
    if os.path.exists(cache):
        z = np.load(cache)
        s, r, n = z["s"], z["r"], int(z["n"])
    else:
        verts, s, r = icosphere_edges(levels)
        n = verts.shape[0]
        perm = (kd_patch_order(verts, s, r, n) if ordering == "kd"
                else rcm_order(s, r, n))
        s, r, _ = apply_order(perm, s, r)
        np.savez(cache, s=s, r=r, n=n)
    g = build_graph(s, r, n)
    return g, to_block_ell(g), n


def _time(agg, graph, x, iters: int) -> float:
    """On-device scan chain with difference-method readout — the only timing
    scheme that is trustworthy on the remote (axon) runtime. See
    ``gwen_tpu.profiling.scan_timeit`` for the three rules it encodes.
    The graph is a scan-invariant jit *argument* (never a closed-over
    constant — big constants blow up remote compiles, CLAUDE.md)."""
    from gwen_tpu.profiling import scan_timeit

    return scan_timeit(lambda c, g: agg(g, c), x, graph, iters=iters)["mean_s"]


def main() -> None:
    import jax
    import jax.numpy as jnp

    # Persistent compile cache: compiles in this environment go over a tunnel.
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache"),
        )
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass

    levels = int(os.environ.get("GWEN_BENCH_LEVELS", "7"))
    feats = int(os.environ.get("GWEN_BENCH_FEATURES", "256"))
    iters = int(os.environ.get("GWEN_BENCH_ITERS", "50"))
    kernel = os.environ.get("GWEN_BENCH_KERNEL", "diag_packed")
    dtype = jnp.bfloat16 if os.environ.get("GWEN_BENCH_DTYPE", "bf16") == "bf16" else jnp.float32

    g_coo, g_bell, n = _build(
        levels, "kd" if kernel in ("diag", "diag_packed") else "rcm")
    edges = g_coo.num_edges  # includes self loops
    # Generate on device — host->device transfers are slow in this env.
    x32 = jax.random.normal(jax.random.key(0), (n, feats), jnp.float32)
    x = x32.astype(dtype)

    from gwen_tpu.graph import to_diag_window, to_sliding_dense, to_windowed_dense
    from gwen_tpu.ops import aggregate_segment
    from gwen_tpu.ops.spmm_pallas import (
        spmm_block_ell,
        spmm_diag_window,
        spmm_sliding_dense,
        spmm_windowed_dense,
    )

    # Graph tables are jit *arguments* (never closed-over constants). S is
    # expanded on device from the compact ELL tables (device_build) — only
    # O(edges) bytes cross the host->device link at any scale.
    if kernel in ("diag", "diag_packed"):
        dg = to_diag_window(
            g_coo, window_size=int(os.environ.get("GWEN_BENCH_WINDOW", "384")),
            dtype=dtype, device_build=True, packed=(kernel == "diag_packed"),
        )
        pg, pallas_agg = jax.device_put(dg), spmm_diag_window
    elif kernel == "sliding":
        sg = to_sliding_dense(g_coo, dtype=dtype, device_build=True)
        pg, pallas_agg = jax.device_put(sg), spmm_sliding_dense
    elif kernel == "sdense":
        wd = to_windowed_dense(g_coo, dtype=dtype, device_build=True)
        pg, pallas_agg = jax.device_put(wd), spmm_windowed_dense
    else:
        pg, pallas_agg = jax.device_put(g_bell), spmm_block_ell

    # Diag layouts are timed on the pre-padded node count — the deployed
    # configuration (EncodeProcessDecode keeps the chain at n_pad rows, so
    # in-training aggregations never pay a pad materialization). Identical
    # math; the segment baseline keeps its own preferred layout (exact n).
    if kernel in ("diag", "diag_packed"):
        n_pad_rows = pg.num_padded_nodes
        xb = jnp.zeros((n_pad_rows, feats), dtype).at[:n].set(x)
        t_pallas = _time(pallas_agg, pg, xb, iters)
    else:
        t_pallas = _time(pallas_agg, pg, x, iters)
    eps_pallas = edges / t_pallas
    # The segment baseline materializes (E, F) messages — 16 GB at the L9
    # stretch config; skip it there (GWEN_BENCH_BASELINE=0).
    if os.environ.get("GWEN_BENCH_BASELINE", "1") == "1":
        t_seg = _time(aggregate_segment, jax.device_put(g_coo), x32,
                      max(iters // 4, 5))
        eps_seg = edges / t_seg
    else:
        t_seg = float("nan")
        eps_seg = float("nan")

    print(
        json.dumps(
            {
                "metric": "spmm_edges_per_sec_per_chip",
                "value": round(eps_pallas, 1),
                "unit": "edges/s",
                "vs_baseline": (round(eps_pallas / eps_seg, 3) if eps_seg == eps_seg else None),
            }
        )
    )
    print(
        f"# mesh L{levels}: {n} nodes, {edges} edges (incl self-loops), "
        f"F={feats}, kernel={kernel}, dtype={jnp.dtype(dtype).name}; "
        f"pallas {t_pallas*1e3:.3f} ms/iter ({eps_pallas/1e9:.2f} Gedge/s), "
        f"xla-segment-f32 {t_seg*1e3:.3f} ms/iter ({eps_seg/1e9:.2f} Gedge/s), "
        f"backend={jax.default_backend()}",
        file=sys.stderr,
    )

    # Secondary machine-readable metrics (round-1 verdict #6): EPD train-step
    # time at the same level, written to BENCH_EXTRA.json next to this script
    # (stdout keeps the single-line driver contract above).
    if os.environ.get("GWEN_BENCH_TRAIN", "1") == "1":
        import optax

        from gwen_tpu.nn import EncodeProcessDecode
        from gwen_tpu.profiling import scan_timeit
        from gwen_tpu.train import TrainState

        latent, steps = 256, 4
        model = EncodeProcessDecode(
            channels_in=feats, channels_out=feats, latent_size=latent,
            process_steps=steps, compute_dtype=jnp.bfloat16,
        )
        params = model.init(jax.random.key(0))
        opt = optax.adam(1e-4)
        state = TrainState.create(params, opt)
        y = x * jnp.asarray(0.9, x.dtype)

        def train_step(st, gr, xx, yy):
            def loss(p):
                pred = model.apply(p, gr, xx)
                return jnp.mean((pred - yy) ** 2)

            lval, grads = jax.value_and_grad(loss)(st.params)
            updates, opt_state = opt.update(grads, st.opt_state, st.params)
            import optax as _o

            return TrainState(params=_o.apply_updates(st.params, updates),
                              opt_state=opt_state, step=st.step + 1)

        t_step = scan_timeit(train_step, state, pg, x, y,
                             iters=max(iters // 4, 5))["mean_s"]
        extra = {
            "metric": "epd_train_step_ms",
            "level": levels, "nodes": n, "edges": edges,
            "latent": latent, "process_steps": steps, "kernel": kernel,
            "value": round(t_step * 1e3, 3), "unit": "ms",
            "train_edges_per_s": round(edges * steps * 3 / t_step, 1),
            "agg_ms": round(t_pallas * 1e3, 3),
            "agg_edges_per_s": round(eps_pallas, 1),
            "vs_segment_baseline": (round(eps_pallas / eps_seg, 3)
                                    if eps_seg == eps_seg else None),
            "backend": jax.default_backend(),
            "ts": time.time(),
        }
        # Fused windowed-attention aggregation at the same level (needs the
        # diag layout's transpose tables — on diag_packed the kernels
        # unpack the S01 mask in-kernel; GWEN_BENCH_ATTN=0 skips).
        if (kernel in ("diag", "diag_packed")
                and os.environ.get("GWEN_BENCH_ATTN", "1") == "1"):
            from gwen_tpu.graph import diag_transpose_tables
            from gwen_tpu.ops.attention_pallas import windowed_attention

            tg = jax.device_put(diag_transpose_tables(dg))
            t_attn = scan_timeit(
                lambda c, gg: windowed_attention(gg, c, c, c), x, tg,
                iters=iters,
            )["mean_s"]
            extra["attn_agg_ms"] = round(t_attn * 1e3, 3)
            extra["attn_agg_edges_per_s"] = round(edges / t_attn, 1)

        out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "BENCH_EXTRA.json")
        with open(out_path, "w") as f:
            f.write(json.dumps(extra) + "\n")
        print(f"# train-step: {json.dumps(extra)}", file=sys.stderr)


if __name__ == "__main__":
    main()

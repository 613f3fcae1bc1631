"""Weak-scaling sweep of halo-partitioned training (BASELINE configs 4-5).

Grows the mesh proportionally with the partition count (grid graphs of
H × W·P cells, so each device always owns the same H×W block) and measures
the partitioned EPD train-step time at P = 1, 2, 4, ... devices. Weak-scaling
efficiency = t(P=1) / t(P): 1.0 is ideal; the loss is the halo-exchange
ppermute + gradient psum overhead.

On this single-chip environment the sweep runs on the virtual CPU mesh
(collectives are real XLA collectives; absolute times are NOT
TPU-representative — the number that transfers is the efficiency trend and
the harness itself). On a pod slice, run per-host under
``jax.distributed.initialize`` for real ICI numbers.

Usage: python benchmarks/weak_scaling.py [max_devices]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def measure(parts: int, height: int, width_per_part: int, feats: int = 32,
            latent: int = 64, steps: int = 2, iters: int = 10,
            batch: int = 2) -> dict:
    import jax
    import jax.numpy as jnp
    import optax

    from gwen_tpu.graph import grid2d_edges
    from gwen_tpu.nn import EncodeProcessDecode
    from gwen_tpu.parallel import make_partitioned_apply, partition_graph
    from gwen_tpu.train import make_mesh

    h, w = height, width_per_part * parts
    s, r = grid2d_edges(h, w)
    # Column-major ordering: bandwidth = h, so halos stay h*block-aligned and
    # per-partition windows are identical at every P (true weak scaling).
    n = h * w
    idx = np.arange(n).reshape(h, w)
    perm = idx.T.ravel()  # new node i = old perm[i] (column-major walk)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(n)
    s, r = inv[s], inv[r]

    pg = partition_graph(s, r, n, num_parts=parts, reorder=False, block_size=128)
    mesh = make_mesh(data=1, graph=parts,
                     devices=jax.devices()[:parts])
    model = EncodeProcessDecode(
        channels_in=feats, channels_out=feats, latent_size=latent,
        process_steps=steps, backend="segment",
    )
    params = model.init(jax.random.key(0))
    apply = make_partitioned_apply(model, pg, mesh)
    opt = optax.adam(1e-4)
    opt_state = opt.init(params)

    x = jnp.asarray(pg.pad_nodes(
        np.random.default_rng(0).normal(size=(batch, n, feats)).astype(np.float32)))
    y = x * 0.9

    def loss_fn(p, tables, xx, yy):
        pred = apply(p, xx, tables)
        return jnp.mean((pred - yy) ** 2)

    @jax.jit
    def step(p, o, tables, xx, yy):
        l, g = jax.value_and_grad(loss_fn)(p, tables, xx, yy)
        updates, o = opt.update(g, o, p)
        return optax.apply_updates(p, updates), o, l

    tables = apply.tables
    p_, o_, l_ = step(params, opt_state, tables, x, y)
    float(l_)  # compile + full execution (readback barrier)
    t0 = time.perf_counter()
    for _ in range(iters):
        p_, o_, l_ = step(p_, o_, tables, x, y)  # chained through params
    # Scalar readback of the chained loss — trustworthy barrier on the
    # remote runtime (block_until_ready can return early).
    float(l_)
    dt = (time.perf_counter() - t0) / iters
    return {
        "parts": parts,
        "nodes": n,
        "nodes_per_part": n // parts,
        "halo": pg.halo,
        "step_ms": round(dt * 1e3, 2),
    }


def main() -> None:
    import jax

    # Must run before any backend query (default_backend() would initialize
    # the TPU backend and lock the device count).
    try:
        jax.config.update("jax_num_cpu_devices", 8)
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass
    max_devices = int(sys.argv[1]) if len(sys.argv) > 1 else len(jax.devices())
    ncores = os.cpu_count() or 1
    rows = []
    p = 1
    while p <= max_devices:
        rows.append(measure(p, height=128, width_per_part=128))
        if len(rows) > 1:
            rows[-1]["weak_efficiency"] = round(
                rows[0]["step_ms"] / rows[-1]["step_ms"], 3
            )
            if jax.default_backend() == "cpu":
                # Virtual devices share physical cores: the efficiency
                # ceiling on this host is ncores/P, not 1.0.
                rows[-1]["cpu_core_ceiling"] = round(min(1.0, ncores / p), 3)
        print(json.dumps(rows[-1]), flush=True)
        p *= 2


if __name__ == "__main__":
    main()
